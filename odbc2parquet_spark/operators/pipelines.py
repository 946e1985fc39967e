"""End-to-end corpus preparation: the composed training-data pipeline.

quality filter -> exact dedup -> near-dup dedup -> cleaned corpus stats —
one DataFrame composition, so Catalyst plans the WHOLE pipeline (filters
and column pruning flow across stage boundaries; nothing materializes
between stages unless the caller persists deliberately).

Dedup policy: exact dedup keeps the min-id copy of each distinct text;
near-dup dedup then drops the max-id side of every verified MinHash pair
(greedy pairwise keep-min). Pairwise is the cheap rule — for transitive
clusters use operators/graph.duplicate_clusters on the pair output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from odbc2parquet_spark.operators.dedup import (
    drop_exact_duplicates,
    minhash_near_duplicates,
)
from odbc2parquet_spark.operators.text import TOKEN_RE, quality_score_col, words


def _corpus_stages(
    docs: DataFrame,
    min_quality: float,
    near_dup_threshold: float,
    text_col: str,
    id_col: str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The shared lazy stage chain: (gated, exact, survivors).

    ONE definition used by both :func:`prepare_corpus` (the output) and
    :func:`pipeline_funnel` (the report) — so the published funnel counts
    can never describe a different pipeline than the one that runs.
    """
    # Score in place (withColumn, no self-join back to a scored frame):
    # the gate is one scan with the score as a projected expression.
    gated = docs.withColumn("quality_score", quality_score_col(text_col)).filter(
        F.col("quality_score") >= min_quality
    )
    exact = drop_exact_duplicates(gated, text_col, id_col)
    pairs = minhash_near_duplicates(
        exact, threshold=near_dup_threshold, text_col=text_col, id_col=id_col
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    survivors = exact.join(losers, id_col, "left_anti")
    return gated, exact, survivors


def prepare_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cleaned corpus: (doc_id, n_ws_tokens, n_re_tokens, n_chars,
    quality_score) for every surviving document.

    Stages (all lazy, one composed plan):
    1. quality gate: drop docs scoring below ``min_quality``;
    2. exact dedup (hash-groupBy keep-first) on the survivors;
    3. near-dup dedup: MinHash/LSH pairs at ``near_dup_threshold``,
       drop the max-id side of each pair;
    4. token stats on what remains.
    """
    # Deliberately ONE composed plan, no persist: the `exact` stage is
    # scanned twice (pair join + final anti-join), but A/B at sf0.1 shows
    # recompute (median 6.1s) beating .persist() (10.3s) — caching
    # materializes the wide text column while the recomputed subtree is
    # scan + cheap expressions. At cluster scale the same holds until the
    # quality gate becomes compute-bound; then persist(StorageLevel.DISK_ONLY)
    # on `exact` AFTER dropping the text column is the right variant.
    # quality_score rides along from the gate onward: the quality subtree
    # is in the plan once, not re-joined (and thus recomputed) at the end.
    _, _, survivors = _corpus_stages(
        docs, min_quality, near_dup_threshold, text_col, id_col
    )
    t = F.col(text_col)
    return survivors.select(
        F.col(id_col),
        F.size(words(t)).cast("long").alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(TOKEN_RE)).cast("long").alias("n_re_tokens"),
        F.length(t).cast("long").alias("n_chars"),
        F.col("quality_score"),
    )


def pipeline_funnel(
    docs: DataFrame,
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Observability for :func:`prepare_corpus`: (stage, n_surviving) for
    raw -> quality gate -> exact dedup -> near-dup dedup.

    The funnel report every curation run publishes next to its output —
    how much each gate removed. Four count aggregates over the same lazy
    stage definitions (each count is a column-pruned subplan: Catalyst
    drops the text column wherever the stage doesn't need it); union of
    four 1-row frames, so the report itself costs four passes over
    successively smaller survivor sets and shuffles nothing wide.

    A/B note (sf0.1, same-session, 5 shuffled reps): folding the counts
    into ONE conditional aggregate over a flagged spine (count(*) /
    sum(gated) / count(distinct md5(text)) / exact − |losers| with the
    loser set left-joined in) measured SLOWER — median 3.94s vs 3.44s
    for this form. The independent 1-row subplans overlap across cores,
    while the single-agg serializes the whole report behind the MinHash
    loser join; the stages the fold would deduplicate (raw + gate
    counts) are the cheap ones. Keep the union form.
    """
    gated, exact, survivors = _corpus_stages(
        docs, min_quality, near_dup_threshold, text_col, id_col
    )
    stages = [
        ("0_raw", docs),
        ("1_quality_gate", gated),
        ("2_exact_dedup", exact),
        ("3_near_dedup", survivors),
    ]
    out = None
    for stage_name, df in stages:
        row = df.agg(F.count("*").cast("long").alias("n_surviving")).select(
            F.lit(stage_name).alias("stage"), "n_surviving"
        )
        out = row if out is None else out.unionByName(row)
    return out
