"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` are the correctness gate at sf0.01
(Spark vs DuckDB, row-count + schema + order-insensitive value hash).

Determinism notes (both sides follow these rules):
- floating-point aggregates are computed on exact decimals then cast to
  double, so Spark's and DuckDB's summation order cannot change the result;
- every LIMIT query carries a total order (unique-key tiebreak);
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from odbc2parquet_spark.catalog import register_tables
from odbc2parquet_spark.queries import QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    register_tables(spark, sf_dir)
    return QUERIES["q1_pricing_summary"](spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
