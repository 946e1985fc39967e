"""Sinks: parquet output shaping and the write-back (insert/exec) path."""

from odbc2parquet_spark.sinks.parquet_sink import SinkOptions, write_parquet  # noqa: F401
