"""Interleaved A/B for catalog.spread_scan at a query's scan site.

    python tools/ab_spread.py <table> <query> [query ...]

For each query, alternates REPS pairs of (A: natural layout, B: load_table
wrapped in spread_scan for <table>) inside ONE session, cold caches per
rep (the judge/standalone protocol), and prints both medians and mins.
The B variant monkeypatches the query module's `load_table` reference —
measurement only; a win is landed as an explicit call-site edit.

This box shows ±15-20% session-to-session drift on identical plans, so
same-session interleaving is the only defensible comparison (see
OPTIMIZATION_r12.md measurement note). $SPARK_GRAFT_SF_DIR, reps via
$SPARK_GRAFT_BENCH_REPS (default 3 pairs).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    table = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    from odbc2parquet_spark import cachereg, catalog
    from odbc2parquet_spark.queries import QUERIES
    from odbc2parquet_spark.queries import similarity as QS
    from odbc2parquet_spark.session import get_spark

    spark = get_spark("ab_spread")
    spark.sparkContext.setLogLevel("ERROR")

    orig_load = catalog.load_table

    def spread_load(sp, sfd, name):
        df = orig_load(sp, sfd, name)
        return catalog.spread_scan(df) if name == table else df

    def run(fn, label: str) -> float:
        spark.catalog.clearCache()
        QS._LSH_GRAPH_CACHE.clear()
        cachereg.release_all()
        spark._jvm.System.gc()
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    import importlib

    for qname in names:
        fn = QUERIES[qname]
        mod = importlib.import_module(fn.__module__)
        a_times, b_times = [], []
        run(fn, f"warmup:{qname}")  # codegen/JIT warmup, untimed
        for i in range(reps):
            a_times.append(run(fn, f"A{i}:{qname}"))
            mod.load_table = spread_load  # type: ignore[attr-defined]
            try:
                b_times.append(run(fn, f"B{i}:{qname}"))
            finally:
                mod.load_table = orig_load  # type: ignore[attr-defined]
        print(
            f"{qname} table={table}: "
            f"A(natural) med={statistics.median(a_times):.3f} min={min(a_times):.3f} "
            f"B(spread)  med={statistics.median(b_times):.3f} min={min(b_times):.3f} "
            f"A={[round(v, 3) for v in a_times]} B={[round(v, 3) for v in b_times]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
