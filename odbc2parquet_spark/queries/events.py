"""Event-stream queries over ``events`` — oracle-checked batch semantics.

These are the BATCH duals of streaming/transfer.py: a Structured Streaming
windowed aggregate, run over a bounded input with availableNow, produces
exactly the groupBy-window result below — so the oracle certifies the
streaming operators' aggregation semantics while staying SQL-expressible.

Window timestamps are emitted as epoch seconds (BIGINT) on both sides so
engine-specific timestamp/timezone types can't affect the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odbc2parquet_spark.catalog import load_table
from odbc2parquet_spark.queries import query
from odbc2parquet_spark.streaming.transfer import (
    sessionized_counts,
    windowed_event_counts,
)


@query(
    "ev_windowed_counts",
    oracle="""
    SELECT CAST(FLOOR(epoch(ts) / 300) * 300 AS BIGINT) AS window_start,
           CAST(FLOOR(epoch(ts) / 300) * 300 + 300 AS BIGINT) AS window_end,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def ev_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling-window counts per event type — the batch dual of
    the watermarked streaming aggregate (identical plan modulo the
    watermark, which only bounds state)."""
    ev = load_table(spark, sf_dir, "events")
    return windowed_event_counts(ev).select(
        F.unix_seconds(F.col("window_start").cast("timestamp")).alias("window_start"),
        F.unix_seconds(F.col("window_end").cast("timestamp")).alias("window_end"),
        "event_type",
        "n",
        "total_value",
    )


@query(
    "ev_sessionized",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap_us
        FROM events
    ),
    flagged AS (
        SELECT user_id, ts,
               CASE WHEN gap_us IS NULL OR gap_us > 600000000 THEN 1 ELSE 0 END AS new_session
        FROM ordered
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id,
           epoch_us(MIN(ts)) // 1000000 AS session_start,
           (epoch_us(MAX(ts)) + 600000000) // 1000000 AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def ev_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (10 min) per user via the built-in
    session_window; the oracle recomputes them with gaps-and-islands SQL
    (lag -> new-session flag -> running sum -> group), proving the merge
    semantics. Session end = last event + gap, per Spark's definition."""
    ev = load_table(spark, sf_dir, "events")
    return sessionized_counts(ev, gap="10 minutes").select(
        "user_id",
        F.unix_seconds(F.col("session_start").cast("timestamp")).alias("session_start"),
        F.unix_seconds(F.col("session_end").cast("timestamp")).alias("session_end"),
        "n_events",
    )
