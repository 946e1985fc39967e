"""File sources: CSV / JSON(L) ingestion with the reference's schema
semantics, feeding the same shaped-parquet sink as the query path.

The reference ingests from exactly one kind of source (an ODBC cursor);
a Spark-native engine's equivalent surface is the file formats Spark
ships readers for. What carries over from the reference is the SCHEMA
CONTRACT, not the transport (SURVEY §1 / conversion_strategy.rs:30-88):

- schema is inferred once per source, then fixed;
- unnamed columns get generated ``Column{i}`` names (here: headerless
  CSV, whose Spark default names ``_c{i}`` are rewritten);
- a zero-column source is an error;
- unknown/unparseable cells follow the "unknown -> text fallback" rule:
  in PERMISSIVE mode malformed rows land in a quarantine column instead
  of failing the read (the file twin of B14's text fallback).

Scale notes: both readers are Spark's built-in distributed scans —
splittable (CSV by line, JSONL by line), predicate/column pruning applies
after parsing, and ``schema_sample_files`` caps how much of a 100 TB
landing zone the one-time inference pass touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_QUARANTINE = "_corrupt_record"


class ZeroColumnSourceError(ValueError):
    """Source yielded no columns (conversion_strategy.rs:69-71 analogue)."""


def _normalize_headerless(df: DataFrame) -> DataFrame:
    """Spark names headerless CSV columns ``_c{i}``; the reference's rule
    for unnamed result columns is ``Column{i}`` (1-based,
    conversion_strategy.rs:52-56). Apply it only when EVERY column is
    auto-named, so real headers pass through untouched."""
    names = df.columns
    if names and all(
        n.startswith("_c") and n[2:].isdigit() for n in names if n != _QUARANTINE
    ):
        mapping = {
            n: f"Column{int(n[2:]) + 1}" for n in names if n != _QUARANTINE
        }
        df = df.withColumnsRenamed(mapping)
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    delimiter: str = ",",
    quarantine: bool = True,
    schema: str | None = None,
) -> DataFrame:
    """CSV -> typed DataFrame: one inference pass, fixed schema,
    Column{i} names when headerless.

    Inference mode follows the unknown -> text fallback rule: a column
    with mixed cell types degrades to string rather than failing (B14).
    With an explicit ``schema``, cells that violate it quarantine the row
    into ``_corrupt_record`` (PERMISSIVE) instead of killing the scan —
    append the quarantine column to the schema string to capture it."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE" if quarantine else "FAILFAST")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    if quarantine:
        reader = reader.option("columnNameOfCorruptRecord", _QUARANTINE)
    df = reader.csv(path)
    df = _normalize_headerless(df)
    if not df.columns:
        raise ZeroColumnSourceError(f"no columns inferred from {path}")
    return df


def read_jsonl(
    spark: SparkSession, path: str, quarantine: bool = True
) -> DataFrame:
    """JSON-lines -> typed DataFrame with the same contract; nested
    objects keep their struct types (the parquet sink writes them as
    parquet groups — richer than the reference's flat-only model, which
    is a deliberate Spark-side extension, not a gap)."""
    reader = spark.read.option(
        "mode", "PERMISSIVE" if quarantine else "FAILFAST"
    )
    if quarantine:
        reader = reader.option("columnNameOfCorruptRecord", _QUARANTINE)
    df = reader.json(path)
    if not df.columns:
        raise ZeroColumnSourceError(f"no columns inferred from {path}")
    return df


def transfer_file_to_parquet(
    spark: SparkSession,
    path: str,
    out: str,
    fmt: str = "csv",
    **source_kwargs,
) -> DataFrame:
    """File -> shaped parquet, reusing the query path's sink (zstd,
    splitting, tempfile-commit semantics). Returns the typed frame."""
    from odbc2parquet_spark.sinks.parquet_sink import SinkOptions, write_parquet

    if fmt == "csv":
        df = read_csv(spark, path, **source_kwargs)
    elif fmt in ("json", "jsonl"):
        df = read_jsonl(spark, path, **source_kwargs)
    else:
        raise ValueError(f"unsupported file source format: {fmt}")
    write_parquet(df, out, SinkOptions())
    return df
