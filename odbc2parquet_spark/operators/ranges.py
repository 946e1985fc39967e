"""Range (point-in-interval) join — binned equi-join, not a theta join.

Spark plans ``p.v BETWEEN i.lo AND i.hi`` with no equality conjunct as
BroadcastNestedLoopJoin — O(|points| x |intervals|) comparisons, the
classic range-join trap. The scale formulation bins the number line:

1. each interval is replicated to every ``bin_width``-sized bin it
   overlaps (explode of a small sequence — intervals are the small side),
2. each point belongs to exactly ONE bin (floor(v / bin_width)),
3. equi-join on the bin key, then the exact BETWEEN filter.

Each point meets only the intervals overlapping its bin, so comparisons
drop from |points| x |intervals| to |points| x (intervals-per-bin). Because
a point has a single bin, no post-join dedup is needed. Pick ``bin_width``
near the median interval length: wider bins -> fewer interval replicas but
more false candidates; narrower -> the reverse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point_col < end_col`` (half-open).

    ``how`` may be ``inner`` or ``left`` (left keeps pointless rows with
    null interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    bw = F.lit(bin_width)
    binned_intervals = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bw).cast("long"),
                # half-open: an interval ending exactly on a bin edge does
                # not reach into that bin
                F.floor(
                    (F.col(end_col) - F.lit(1e-12)) / bw
                ).cast("long"),
            )
        ),
    )
    binned_points = points.withColumn(
        "__bin", F.floor(F.col(point_col) / bw).cast("long")
    )
    on = (
        (binned_points["__bin"] == binned_intervals["__bin"])
        & (binned_points[point_col] >= binned_intervals[start_col])
        & (binned_points[point_col] < binned_intervals[end_col])
    )
    joined = binned_points.join(binned_intervals, on, how)
    return joined.drop("__bin")
