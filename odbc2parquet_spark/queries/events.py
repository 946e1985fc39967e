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
from odbc2parquet_spark.operators.asof import asof_join
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


@query(
    "ev_asof_last_purchase",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts, MAX(value) AS purchase_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    )
    SELECT c.event_id,
           c.user_id,
           epoch_us(c.ts) AS ts_us,
           epoch_us(p.ts) AS r_ts_us,
           p.purchase_value AS r_purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def ev_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click + the user's most recent purchase at or
    before it. Spark lacks the operator; operators/asof.py builds it as a
    union + one shuffle/sort + running last_value — sort-merge cost, no
    time-overlap fan-out. The oracle is DuckDB's NATIVE ASOF JOIN, so the
    two independent formulations must agree row-for-row."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(clicks, purchases, key="user_id", left_ts="ts", right_ts="ts")
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.unix_micros(F.col("r_ts").cast("timestamp")).alias("r_ts_us"),
        "r_purchase_value",
    )


def _bands() -> list[tuple[int, float, float]]:
    """20 deterministic, overlapping value bands over [0, 500)."""
    return [
        (i, float((i * 37) % 450), float((i * 37) % 450 + 30 + (i % 7) * 10))
        for i in range(20)
    ]


_BANDS_SQL = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in _bands())


@query(
    "ev_range_join_bands",
    oracle=f"""
    WITH bands(band_id, lo, hi) AS (VALUES {_BANDS_SQL})
    SELECT e.event_id, b.band_id, e.value
    FROM events e JOIN bands b
      ON e.value >= b.lo AND e.value < b.hi
    """,
)
def ev_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join of events to overlapping value bands. The
    oracle is the naive theta join (fine at sf0.01); the Spark side runs
    operators/ranges.range_join's binned equi-join — a hash match proves
    the binned plan loses/duplicates nothing."""
    from odbc2parquet_spark.operators.ranges import range_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    bands = spark.createDataFrame(_bands(), ["band_id", "lo", "hi"])
    out = range_join(ev, bands, "value", "lo", "hi", bin_width=50.0)
    return out.select("event_id", "band_id", "value")


@query(
    "ev_rollup_daily",
    oracle="""
    SELECT CAST(FLOOR(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket_start,
           event_type AS key,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def ev_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the daily rollup is computed
    from the hourly, which is computed from the 5-minute, which alone reads
    raw events (operators/rollup.rollup_cascade). The oracle aggregates the
    raw events directly — a hash match proves the cascade re-aggregates
    EXACTLY (decimal partials, no float drift)."""
    from odbc2parquet_spark.operators.rollup import rollup_cascade

    ev = load_table(spark, sf_dir, "events")
    daily = rollup_cascade(ev)["1 day"]
    return daily.select(
        "bucket_start", "key", "n", F.col("sum_value").cast("double").alias("total")
    )
