"""Scale join strategies: salting correctness + bucketed zero-shuffle."""

import pytest
from pyspark.sql import functions as F

from odbc2parquet_spark.operators.joins import bucketed_join, salted_join, write_bucketed


def _explain(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_salted_join_equals_plain_join(spark):
    # skewed big side: 90% of rows share key 1
    big = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("dim"))
    plain = big.join(small, "k").groupBy().agg(
        F.count("*").alias("n"), F.sum("payload").alias("sp"), F.sum("dim").alias("sd")
    ).first()
    salted = salted_join(big, small, "k", salt=8).groupBy().agg(
        F.count("*").alias("n"), F.sum("payload").alias("sp"), F.sum("dim").alias("sd")
    ).first()
    assert (plain.n, plain.sp, plain.sd) == (salted.n, salted.sp, salted.sd)


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.range(0, 100).select((F.col("id") % 7).alias("k"), F.col("id").alias("p"))
    small = spark.range(0, 3).select(F.col("id").alias("k"), F.lit("x").alias("d"))
    plain = big.join(small, "k", "left")
    salted = salted_join(big, small, "k", how="left", salt=4)
    assert salted.count() == plain.count()
    assert salted.filter(F.col("d").isNull()).count() == plain.filter(F.col("d").isNull()).count()


def test_salted_join_rejects_unsupported_how(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full")


def test_bucketed_join_has_no_exchange(spark):
    left = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("a"))
    right = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") * 5).alias("b"))
    write_bucketed(left, "t_bleft", "k", buckets=8)
    write_bucketed(right, "t_bright", "k", buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_bleft", "t_bright", "k")
        plan = _explain(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


def test_asof_join_semantics(spark):
    from odbc2parquet_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 15, "d")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 18, 200.0), (2, 99, 300.0)], ["k", "ts", "v"]
    )
    out = {
        r.tag: (r.r_ts, r.r_v)
        for r in asof_join(left, right, "k", "ts", "ts").collect()
    }
    assert out["a"] == (10, 100.0)  # equal ts matches (<= semantics)
    assert out["b"] == (18, 200.0)  # latest at-or-before wins
    assert out["c"] == (None, None)  # nothing at-or-before -> nulls
    assert out["d"] == (None, None)  # right exists but only later


def test_range_join_edges(spark):
    from odbc2parquet_spark.operators.ranges import range_join

    pts = spark.createDataFrame([(1, 0.0), (2, 9.999), (3, 10.0), (4, 25.0)], ["pid", "v"])
    iv = spark.createDataFrame([(100, 0.0, 10.0), (200, 5.0, 30.0)], ["iid", "lo", "hi"])
    out = {(r.pid, r.iid) for r in range_join(pts, iv, "v", "lo", "hi", 10.0).collect()}
    # half-open: v=10.0 not in [0,10), but in [5,30)
    assert out == {(1, 100), (2, 100), (2, 200), (3, 200), (4, 200)}
    left = range_join(pts.union(spark.createDataFrame([(5, 99.0)], ["pid", "v"])),
                      iv, "v", "lo", "hi", 10.0, how="left")
    assert left.filter("pid = 5").first().iid is None


def test_blocked_fuzzy_match_argmin_and_cutoff(spark):
    from odbc2parquet_spark.operators.joins import blocked_fuzzy_match

    master = spark.createDataFrame(
        [(1, "A", "alpha"), (2, "A", "alpine"), (3, "B", "beta")],
        ["id", "blk", "name"],
    )
    probes = spark.createDataFrame(
        [(10, "A", "alphq"), (11, "B", "zzzzzz")], ["id", "blk", "name"]
    )
    got = {
        r.probe_id: (r.matched_id, r.distance)
        for r in blocked_fuzzy_match(
            probes, master, "blk", "name", "id", "id"
        ).collect()
    }
    assert got[10] == (1, 1)      # alphq->alpha dist 1 beats alpine dist 3
    assert got[11][0] == 3        # only candidate in block B
    capped = blocked_fuzzy_match(
        probes, master, "blk", "name", "id", "id", max_distance=2
    ).collect()
    assert {r.probe_id for r in capped} == {10}  # zzzzzz has no match <= 2


def test_blocked_fuzzy_match_block_cap(spark):
    from odbc2parquet_spark.operators.joins import blocked_fuzzy_match

    # block A holds 3 master rows (hot), block B holds 1; cap at 2 drops
    # every candidate in A so its probe emits nothing, B still matches
    master = spark.createDataFrame(
        [(1, "A", "aaa"), (2, "A", "aab"), (3, "A", "abb"), (4, "B", "bbb")],
        ["id", "blk", "name"],
    )
    probes = spark.createDataFrame(
        [(10, "A", "aaa"), (11, "B", "bbc")], ["id", "blk", "name"]
    )
    capped = blocked_fuzzy_match(
        probes, master, "blk", "name", "id", "id", max_block=2
    ).collect()
    assert {(r.probe_id, r.matched_id) for r in capped} == {(11, 4)}


def test_deletion_blocked_fuzzy_match_single_typo(spark):
    from odbc2parquet_spark.operators.joins import deletion_blocked_fuzzy_match

    # master tokens are 4-digit ids; probe 10 typos ONE digit of master 1's
    # token (1234 -> 1239): deletion-neighborhood keys still collide on the
    # key that removes the typo'd position, so the match is found without
    # any population-sized block
    master = spark.createDataFrame(
        [(1, "1234", "acct-1234"), (2, "5678", "acct-5678"), (3, "1299", "acct-1299")],
        ["id", "tok", "name"],
    )
    probes = spark.createDataFrame(
        [(10, "1239", "acct-1239"), (11, "5678", "acct-5678")], ["id", "tok", "name"]
    )
    got = {
        r.probe_id: (r.matched_id, r.distance)
        for r in deletion_blocked_fuzzy_match(
            probes, master, "tok", "name", "id", "id", token_len=4
        ).collect()
    }
    assert got[10] == (1, 1)  # 1239 vs 1234: one edit; 1299 is dist 2
    assert got[11] == (2, 0)  # exact token -> exact name


def test_deletion_blocked_fuzzy_match_bounded_blocks(spark):
    from odbc2parquet_spark.operators.joins import deletion_blocked_fuzzy_match

    # every master shares the same 3-char suffix; a coarse block would put
    # all of them in one block, but deletion keys keep each block to the
    # <=|alphabet| records agreeing on ALL other positions — assert the
    # backstop cap never drops the true match even with max_block=10
    master = spark.createDataFrame(
        [(i, f"{i:03d}X", f"m-{i:03d}X") for i in range(100)],
        ["id", "tok", "name"],
    )
    probes = spark.createDataFrame([(1000, "042Y", "m-042Y")], ["id", "tok", "name"])
    got = deletion_blocked_fuzzy_match(
        probes, master, "tok", "name", "id", "id", token_len=4, max_block=10
    ).collect()
    assert len(got) == 1 and got[0].matched_id == 42 and got[0].distance == 1
