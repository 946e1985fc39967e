"""SparkSession construction.

Local test/bench runs use ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
same builder is used without the master override (spark-submit supplies it).
Every knob here is chosen for the 100 TB target, then scaled down by env for
local runs:

- AQE on (runtime coalescing, skew-join splitting) — at 1000 executors the
  static shuffle-partition guess is always wrong somewhere.
- shuffle partitions default to cores locally; a cluster run should set
  ``spark.sql.shuffle.partitions`` ~ 2-3x total cores (AQE coalesces down).
- Arrow enabled: every pandas_udf / toPandas boundary is Arrow-batched.
- session timezone pinned UTC so timestamp semantics are deterministic and
  match the reference's instant-normalization behavior
  (reference src/query/timestamp_tz.rs:92-108 normalizes to UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _jvm_options() -> str:
    """Driver/executor JVM flags (same reasoning both sides; a real
    cluster puts these on spark.executor.extraJavaOptions via submit).

    SPARK_GRAFT_CODECACHE_MB optionally sizes the JIT code cache —
    tools/suite_pressure.py's A/B knob for the suite-inflation carrier."""
    opts = (
        "-XX:+UnlockExperimentalVMOptions -XX:G1NewSizePercent=40"
        " -XX:G1MaxNewSizePercent=70"
    )
    cc = os.environ.get("SPARK_GRAFT_CODECACHE_MB")
    if cc:
        opts += f" -XX:ReservedCodeCacheSize={int(cc)}m"
    return opts


def get_spark(app_name: str = "odbc2parquet_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the session. ``master=None`` -> local[$SPARK_GRAFT_CPUS]."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Broadcast decisions: the STATIC threshold stays at the stock
        # 10 MB because static sizeInBytes estimates are only trustworthy
        # in the file-backed regime (scan size x column pruning) — after
        # an explode/aggregate/window chain they stay scan-sized while the
        # true relation grows with the corpus. At amplified sf31 the
        # 64 MB static threshold used through round 10 broadcast the
        # corpus-sized distinct-shingle and candidate-pair tables inside
        # minhash_near_duplicates (estimated <64 MB, actual >1 GiB: the
        # materialization died on spark.driver.maxResultSize). The
        # aggressive 64 MB threshold moves to the ADAPTIVE knob, which
        # decides from MEASURED shuffle sizes at runtime: genuinely small
        # sides (dims, per-doc count tables) still become broadcasts, a
        # data-sized intermediate never can. Bench-scale (sf0.1) plans are
        # unchanged — every side there is both estimated and actually tiny.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # G1 young generation sized for 32 allocation-heavy tasks in one
        # JVM: the decimal-exact aggregation contract allocates per row
        # (sum buffers above precision 18 leave the unsafe fixed-width
        # path), and G1's default adaptive young gen collapses per-thread
        # throughput ~20x under that pressure (measured at amplified sf10,
        # one decimal(18,6) sum over 60M rows: 18.8s default G1, 5.5s
        # ParallelGC, 3.4s G1 with a 40-70% young gen — which also keeps
        # G1's better behavior on the scan/write-heavy queries where
        # ParallelGC cost 15-25%). Same flags belong on
        # spark.executor.extraJavaOptions on a real cluster.
        .config("spark.driver.extraJavaOptions", _jvm_options())
        .config("spark.executor.extraJavaOptions", _jvm_options())
        # default 100 thrashes on multi-query sessions (the bench's ~70
        # workloads evict every compiled stage between repetitions; the
        # big composed plans then pay multi-second recompiles per run —
        # measured 11s vs 4.5s warm for prepare_corpus). Memory cost is
        # bounded: cached entries are generated classes, not data.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
    )
    # SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2": session-level conf overrides for
    # measurement studies (e.g. spark.sql.execution.arrow.maxRecordsPerBatch
    # sweeps, spark.python.worker.reuse A/Bs) without editing code — the
    # production defaults above stay the committed contract.
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for kv in filter(None, (s.strip() for s in extra.split(";"))):
        k, _, v = kv.partition("=")
        builder = builder.config(k.strip(), v.strip())
    if master is None:
        master = f"local[{cpus}]"
    if master.startswith("local"):
        builder = (
            builder.master(master)
            .config("spark.sql.shuffle.partitions", cpus)
            .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        )
    return builder.getOrCreate()
