"""Deterministic sampling — reproducible corpus downsampling.

``df.sample()`` is seed-dependent AND partitioning-dependent: the same
seed over a repartitioned input selects different rows, which breaks
reproducibility guarantees for training-data lineage. Hash-threshold
sampling fixes that: keep a row iff md5(key) < fraction * 2^60 — a pure
function of the ROW, independent of partitioning, cluster size, or
execution order, and reproducible by any engine (the DuckDB oracle
recomputes the identical sample).

Both operators are narrow (zero shuffles): a filter over a hash
expression, whole-stage codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_DOMAIN = 1 << 60


def _hash60(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — deterministic,
    partitioning-independent, and stable across runs and engines."""
    return df.filter(_hash60(F.col(key_col)) < F.lit(int(fraction * _HASH_DOMAIN)))


def stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum hash sampling (e.g. downsample overrepresented
    languages). Strata absent from ``fractions`` are dropped; the
    threshold is a when-chain, so still a narrow filter with no join."""
    h = _hash60(F.col(key_col))
    thr = None
    for value, frac in fractions.items():
        cond = F.lit(int(frac * _HASH_DOMAIN))
        thr = (
            F.when(F.col(strata_col) == value, cond)
            if thr is None
            else thr.when(F.col(strata_col) == value, cond)
        )
    thr = thr.otherwise(F.lit(0))
    return df.filter(h < thr)
