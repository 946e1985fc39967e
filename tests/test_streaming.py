"""Structured Streaming transfer + watermarked aggregation."""

import shutil

from odbc2parquet_spark.catalog import load_table, table_path
from odbc2parquet_spark.streaming.transfer import (
    sessionized_counts,
    stream_transfer,
    windowed_event_counts,
)


def test_stream_transfer_available_now(spark, sf_dir, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(table_path(sf_dir, "orders"), src / "part-0.parquet")
    schema = spark.read.parquet(str(src)).schema
    out = str(tmp_path / "out")
    q = stream_transfer(
        spark, str(src), schema, out, str(tmp_path / "ckpt"),
        transform=lambda df: df.filter("o_totalprice > 100000"),
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).count()
    want = spark.read.parquet(str(src)).filter("o_totalprice > 100000").count()
    assert got == want


def test_windowed_event_counts_batch_semantics(spark, sf_dir):
    # run the streaming aggregation shape on the batch frame: identical
    # plan semantics, verifiable counts
    ev = load_table(spark, sf_dir, "events")
    out = windowed_event_counts(ev, window="1 hour")
    total = sum(r.n for r in out.collect())
    assert total == ev.count()


def test_sessionized_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = sessionized_counts(ev, gap="30 minutes")
    rows = out.collect()
    assert sum(r.n_events for r in rows) == ev.count()
    assert all(r.session_end > r.session_start for r in rows)
