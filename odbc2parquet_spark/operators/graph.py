"""Connected components — near-duplicate pairs to duplicate CLUSTERS.

Pair generation (MinHash/SimHash/cosine) yields edges; deduplication needs
components: every document labeled with its cluster so one canonical doc
per cluster survives. This is iterative min-label propagation:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Each round is one shuffle (groupBy dst) over the
edge list; rounds needed ~ graph diameter (near-dup clusters are shallow —
a handful of rounds in practice, bounded by ``max_iterations``). The
driver-side loop is inherent to the algorithm (iterative fixpoint, not
expressible as one SQL query without recursion) — per-round work is fully
distributed; the driver only checks the convergence counter.

At 100 TB scale the edge list is the near-dup pair output (orders of
magnitude smaller than the corpus); persisting the current labels between
rounds avoids recomputing the lineage each iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(id, component): every node labeled with the min node id reachable
    over the undirected edge set.

    ``nodes`` must contain every id (isolated nodes become their own
    component). Converges in rounds ~ component diameter.
    """
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    labels = nodes.select(F.col(node_col).alias("id"), F.col(node_col).alias("component"))
    sym = sym.persist()
    try:
        for _ in range(max_iterations):
            labels = labels.persist()
            neighbor_min = (
                sym.join(labels, sym.src == labels.id)
                .groupBy("dst")
                .agg(F.min("component").alias("nmin"))
            )
            new_labels = (
                labels.join(neighbor_min, labels.id == neighbor_min.dst, "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                    ).alias("component"),
                )
            )
            new_labels = new_labels.persist()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels
    finally:
        sym.unpersist()


def duplicate_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    node_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """(id, cluster_id, is_canonical): cluster near-dup pairs and mark the
    keeper (min id per cluster — the same keep-first policy as
    :func:`exact_duplicates`)."""
    cc = connected_components(nodes, pairs, node_col, src_col, dst_col)
    return cc.select(
        "id",
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )
