"""Multi-touch conversion attribution as a bounded range join + credit fold.

``linear_attribution`` splits each conversion's value equally across the
same user's touch events inside a fixed look-back window — the "linear"
model of marketing attribution (first-touch / last-touch are argmin/argmax
specializations of the same joined frame).

Scale shape (the part Spark has to get right at 100 TB):

- conversions x touches is an EQUI-join on the user key with a time-range
  residual — never a theta/cross join. One shuffle per side, partitioned
  by user; per-task pair volume is bounded by one user's activity inside
  the look-back window, the same finiteness argument as a watermarked
  stream-stream interval join (streaming/transfer.py).
- the quadratic-ish pair set collapses to one row per
  (conversion, channel) BEFORE anything else happens (map-side partial
  counts), so the credit arithmetic and everything downstream is
  conversion-sized, not pair-sized.
- per-conversion totals come from a window over that collapsed frame —
  each partition holds at most |channels| rows per conversion.

Determinism: credit = value * n_channel / n_total is IEEE double
arithmetic (exact-rounded, engine-independent) cast to DECIMAL(25,12), so
downstream SUMs are order-independent — the same contract as the DSIR
lift sums (queries/textops.py).

Reference scope: pacman82/odbc2parquet delegates analytics like this to
the remote DBMS (src/main.rs query subcommand); here Spark is the engine,
so the operator inventory carries it natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def linear_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    key: str,
    channel_col: str = "channel",
    conv_id_col: str = "conv_id",
    value_col: str = "value",
    ts_col: str = "ts",
    window: str = "7 days",
) -> DataFrame:
    """Credit rows for the linear attribution model.

    ``conversions`` needs (key, conv_id_col, ts_col, value_col);
    ``touches`` needs (key, ts_col, channel_col). A touch participates if
    it happened at or before the conversion and no earlier than
    ``window`` before it. Conversions with zero in-window touches drop
    out (nothing to credit — count them upstream if the funnel report
    needs the orphan rate).

    Returns one row per (conversion, channel):
    ``conv_id, value, channel, n_channel, n_total, credit`` where
    ``credit`` is DECIMAL(25,12) and sums to ~value per conversion.
    """
    c = conversions.select(
        F.col(key).alias("_k"),
        F.col(conv_id_col).alias("conv_id"),
        F.col(ts_col).alias("_cts"),
        F.col(value_col).alias("value"),
    )
    t = touches.select(
        F.col(key).alias("_k"),
        F.col(ts_col).alias("_tts"),
        F.col(channel_col).alias("channel"),
    )
    pairs = c.join(
        t,
        on=[
            c["_k"] == t["_k"],
            t["_tts"] <= c["_cts"],
            t["_tts"] >= c["_cts"] - F.expr(f"INTERVAL {window}"),
        ],
        how="inner",
    )
    per = pairs.groupBy("conv_id", "value", "channel").agg(
        F.count(F.lit(1)).alias("n_channel")
    )
    w = Window.partitionBy("conv_id")
    per = per.withColumn("n_total", F.sum("n_channel").over(w))
    return per.withColumn(
        "credit",
        (F.col("value") * F.col("n_channel") / F.col("n_total")).cast(
            "decimal(25,12)"
        ),
    )
