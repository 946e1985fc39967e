"""Known-value checks for operators/drift.py — statistics with closed
forms on hand-built inputs, so a regression is a wrong NUMBER, not just
a changed hash."""

import pytest
from pyspark.sql import functions as F

from odbc2parquet_spark.operators.drift import (
    chi_square_independence,
    covariance_matrix,
    gini_concentration,
    ks_two_sample,
    prefix_sums,
    psi_drift,
    rank_auc,
)


def test_prefix_sums_matches_global_window(spark):
    rows = [(i, (i * 7) % 5 + 1, (i * 3) % 4) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    out = {
        r.k: (r.c_x, r.c_y)
        for r in prefix_sums(df, ["k"], ["x", "y"], num_partitions=8).collect()
    }
    cx = cy = 0
    for k, x, y in rows:
        cx += x
        cy += y
        assert out[k] == (cx, cy)


def test_prefix_sums_empty_input(spark):
    df = spark.createDataFrame([], "k long, x long")
    assert prefix_sums(df, ["k"], ["x"]).count() == 0


def test_ks_identical_samples_is_zero(spark):
    # same distribution in both populations -> every CDF gap is 0
    rows = [(float(v), b) for v in range(50) for b in (True, False)]
    df = spark.createDataFrame(rows, ["v", "b"])
    r = ks_two_sample(df, "v", F.col("b")).collect()[0]
    assert (r.n_a, r.n_b, r.d_stat) == (50, 50, 0.0)


def test_ks_disjoint_samples_is_one(spark):
    rows = [(float(v), False) for v in range(30)] + [
        (float(v + 100), True) for v in range(30)
    ]
    df = spark.createDataFrame(rows, ["v", "b"])
    assert ks_two_sample(df, "v", F.col("b")).collect()[0].d_stat == 1.0


def test_auc_perfect_separation(spark):
    rows = [(float(s), True) for s in range(10, 20)] + [
        (float(s), False) for s in range(10)
    ]
    df = spark.createDataFrame(rows, ["s", "p"])
    r = rank_auc(df, "s", F.col("p")).collect()[0]
    assert (r.n_pos, r.n_neg, r.auc) == (10, 10, 1.0)


def test_auc_ties_average_to_half(spark):
    # all scores equal -> AUC must be exactly 0.5 via average-rank ties
    rows = [(1.0, i % 2 == 0) for i in range(40)]
    df = spark.createDataFrame(rows, ["s", "p"])
    assert rank_auc(df, "s", F.col("p")).collect()[0].auc == 0.5


def test_gini_equal_values_is_zero(spark):
    from decimal import Decimal

    df = spark.createDataFrame(
        [(Decimal("5.000000"),)] * 20, "v decimal(18,6)"
    )
    r = gini_concentration(df, "v").collect()[0]
    assert r.n == 20 and r.gini == 0.0


def test_gini_single_owner(spark):
    # one unit owns everything: G = (n-1)/n
    from decimal import Decimal

    vals = [(Decimal("0.000000"),)] * 9 + [(Decimal("10.000000"),)]
    df = spark.createDataFrame(vals, "v decimal(18,6)")
    assert gini_concentration(df, "v").collect()[0].gini == pytest.approx(
        0.9, abs=1e-9
    )


def test_chi_square_independent_is_zero(spark):
    # perfectly proportional table -> expected == observed -> chi2 = 0
    rows = []
    for a in ("x", "y"):
        for b, c in (("u", 10), ("w", 30)):
            rows += [(a, b)] * c
    df = spark.createDataFrame(rows, ["a", "b"])
    r = chi_square_independence(df, "a", "b").collect()[0]
    assert (r.n, r.dof, r.chi2) == (80, 1, 0.0)


def test_chi_square_missing_cell_counts_expectation(spark):
    # a zero-observed cell must still contribute (0-e)^2/e = e
    rows = [("x", "u")] * 10 + [("x", "w")] * 10 + [("y", "u")] * 10
    df = spark.createDataFrame(rows, ["a", "b"])
    r = chi_square_independence(df, "a", "b").collect()[0]
    # classic 2x2 chi2 = n(ad-bc)^2 / (row1 row2 col1 col2)
    expected = 30 * (10 * 0 - 10 * 10) ** 2 / (20 * 10 * 20 * 10)
    assert r.chi2 == pytest.approx(expected, abs=1e-6)
    assert r.dof == 1


def test_psi_identical_populations_near_zero(spark):
    rows = [(float(v % 37), v % 2 == 0) for v in range(1000)]
    df = spark.createDataFrame(rows, ["v", "b"])
    out = psi_drift(df, "v", F.col("b"), n_bins=10).collect()
    assert len(out) == 10
    assert sum(abs(r.psi_term) for r in out) < 0.01


def test_psi_shifted_population_detects_drift(spark):
    rows = [(float(v % 50), False) for v in range(1000)] + [
        (float(v % 50) + 40.0, True) for v in range(1000)
    ]
    df = spark.createDataFrame(rows, ["v", "b"])
    out = psi_drift(df, "v", F.col("b"), n_bins=10).collect()
    assert sum(r.psi_term for r in out) > 0.5  # "significant drift" band
    # every bin emits a row even if one side is empty there
    assert {r.bin for r in out} == set(range(10))


def test_covariance_matrix_known_values(spark):
    # three 2-d vectors with hand-computable covariance:
    # x = [1,2,3], y = [2,4,6] -> var(x)=1, cov(x,y)=2, var(y)=4 (n-1 denom)
    rows = [([1.0, 2.0],), ([2.0, 4.0],), ([3.0, 6.0],)]
    df = spark.createDataFrame(rows, "embedding array<double>")
    out = {(r.i, r.j): r.cov for r in covariance_matrix(df, dim=2).collect()}
    assert out == {(0, 0): 1.0, (0, 1): 2.0, (1, 1): 4.0}


def test_covariance_matrix_zero_is_positive(spark):
    # a constant dimension must emit +0.0 (never IEEE -0.0 — the
    # cross-engine hash canonicalizes by repr)
    import math

    rows = [([5.0, float(i)],) for i in range(4)]
    df = spark.createDataFrame(rows, "embedding array<double>")
    out = {(r.i, r.j): r.cov for r in covariance_matrix(df, dim=2).collect()}
    assert out[(0, 0)] == 0.0 and math.copysign(1.0, out[(0, 0)]) > 0
    assert out[(0, 1)] == 0.0 and math.copysign(1.0, out[(0, 1)]) > 0


def test_covariance_twins_identical(spark, sf_dir):
    # the Arrow matmul scale path and the pure-Catalyst decimal twin must
    # produce bit-identical rows (shared integer-scaled projection)
    from odbc2parquet_spark.catalog import load_table
    from odbc2parquet_spark.operators.drift import covariance_matrix_decimal

    emb = load_table(spark, sf_dir, "embeddings")
    fast = {(r.i, r.j): (r.n, r.cov) for r in covariance_matrix(emb, dim=64).collect()}
    slow = {
        (r.i, r.j): (r.n, r.cov)
        for r in covariance_matrix_decimal(emb, dim=64).collect()
    }
    assert fast == slow and len(fast) == 64 * 65 // 2


def test_correlation_matrix_known_values(spark):
    from odbc2parquet_spark.operators.drift import correlation_matrix

    # dim0 and dim1 perfectly correlated, dim2 anti-correlated with dim0,
    # dim3 constant (zero variance -> NULL)
    rows = [
        ([1.0, 2.0, -1.0, 7.0],),
        ([2.0, 4.0, -2.0, 7.0],),
        ([3.0, 6.0, -3.0, 7.0],),
    ]
    df = spark.createDataFrame(rows, "embedding array<double>")
    out = {(r.i, r.j): r.corr for r in correlation_matrix(df, dim=4).collect()}
    assert out[(0, 0)] == 1.0 and out[(1, 1)] == 1.0
    assert out[(0, 1)] == 1.0
    assert out[(0, 2)] == -1.0
    assert out[(0, 3)] is None and out[(3, 3)] is None


def test_cusum_changepoint_level_shift(spark):
    import datetime

    from odbc2parquet_spark.operators.drift import cusum_changepoint

    # 10 days at 1.0 then 10 days at 5.0: |cusum| peaks at the shift
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(days=d), "m", 1.0 if d < 10 else 5.0)
        for d in range(20)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = cusum_changepoint(df, "ts", "value", "event_type").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == 20
    assert r.change_day == datetime.date(2024, 1, 10)  # last pre-shift day
    # mean = 3.0; S_10 = 10*(1-3) = -20 -> d_stat = 20.0
    assert r.d_stat == 20.0


def test_psi_constant_column_collapses_to_bin0(spark):
    """A constant value column (mx == mn) must not NULL every bin via a
    zero-width divide: all rows land in bin 0, the other bins emit their
    smoothed-empty terms, and counts reconcile with the totals."""
    rows = [(7.0, v % 2 == 0) for v in range(100)]
    df = spark.createDataFrame(rows, ["v", "b"])
    out = {r.bin: r for r in psi_drift(df, "v", F.col("b"), n_bins=10).collect()}
    assert set(out) == set(range(10))
    assert out[0].n_a == 50 and out[0].n_b == 50
    assert all(out[b].n_a == 0 and out[b].n_b == 0 for b in range(1, 10))
    # no row vanished: terms are finite numbers, not NULL
    assert all(out[b].psi_term is not None for b in range(10))


@pytest.mark.slow
def test_covariance_large_magnitude_chunked_exact(spark):
    """|x| ~ 1e3 vectors: each int64 Gram product is ~1e18, so an
    unchunked per-batch sum would wrap after ~9 rows. The chunked
    accumulation must stay EXACT — bit-identical to the pure-Catalyst
    decimal twin on 200 such rows in a single Arrow batch."""
    from odbc2parquet_spark.operators.drift import covariance_matrix_decimal

    rows = [
        ([1000.0 - i * 0.5, -999.0 + i * 0.25],)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "embedding array<double>").coalesce(1)
    fast = {(r.i, r.j): (r.n, r.cov) for r in covariance_matrix(df, dim=2).collect()}
    slow = {
        (r.i, r.j): (r.n, r.cov)
        for r in covariance_matrix_decimal(df, dim=2).collect()
    }
    assert fast == slow and len(fast) == 3
    # sanity: the values are the right order of magnitude, not wrapped
    assert fast[(0, 0)][1] > 0 and fast[(1, 1)][1] > 0


@pytest.mark.slow
def test_two_pass_ops_leave_no_persistent_rdds(spark):
    """The two-pass prefix-sum family must not pin blocks in the session
    cache manager (localCheckpoint, not persist): after running each
    operator to completion the persistent-RDD registry is empty."""
    from odbc2parquet_spark.operators.ranges import sweep_line_concurrency
    from odbc2parquet_spark.operators.sampling import pps_sample
    from odbc2parquet_spark.operators.sharding import pack_shards_two_pass

    df = spark.createDataFrame([(i, (i * 7) % 5 + 1) for i in range(300)], ["k", "x"])
    prefix_sums(df, ["k"], ["x"], num_partitions=4).count()
    iv = spark.createDataFrame([(i, i + 3) for i in range(300)], ["s", "e"])
    sweep_line_concurrency(iv, "s", "e", num_partitions=4).count()
    pack_shards_two_pass(
        df.withColumnRenamed("x", "n_tokens"), budget=50, order_col="k",
        num_partitions=4,
    ).count()
    pps_sample(df, "x", k=10, id_col="k", num_partitions=4).count()
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() == 0


def test_iterative_fixpoints_release_superseded_rounds(spark):
    """Iterative operators checkpoint per round; every SUPERSEDED round's
    blocks must be explicitly released, so after a run at most the final
    state (plus nothing else) stays registered."""
    from odbc2parquet_spark.operators.graph import connected_components

    base = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    nodes = spark.createDataFrame([(i,) for i in range(20)], ["id"])
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 18, 2)], ["src", "dst"]
    )
    connected_components(nodes, edges, node_col="id", src_col="src", dst_col="dst").count()
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    # only the final labels checkpoint may remain registered
    assert after - base <= 1


def test_weighted_median_known_values(spark):
    from odbc2parquet_spark.operators.drift import weighted_median

    # values 1..4 with weights 1,1,1,7: total 10, half 5 -> value 4
    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 1), (4.0, 7)], ["v", "w"]
    )
    r = weighted_median(df, "v", "w").collect()[0]
    assert r.wmedian == 4.0 and r.w_total == 10 and r.n_distinct == 4

    # symmetric weights: lower weighted median at the first value
    # reaching half the total (2*cum >= W picks 2: cum(2)=2, W=4)
    df2 = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 1), (4.0, 1)], ["v", "w"]
    )
    assert weighted_median(df2, "v", "w").collect()[0].wmedian == 2.0

    # duplicate values merge their weights before the cumulative pass
    df3 = spark.createDataFrame(
        [(5.0, 1), (5.0, 1), (1.0, 1)], ["v", "w"]
    )
    r3 = weighted_median(df3, "v", "w").collect()[0]
    assert r3.wmedian == 5.0 and r3.n_distinct == 2


@pytest.mark.slow
def test_sweep_line_boundary_proxy_exact(spark):
    """A boundary proxy (even a badly-skewed one) changes only bucket
    balance — concurrency output must be identical to the self-sampled
    form."""
    from pyspark.sql import functions as F

    from odbc2parquet_spark.operators.ranges import sweep_line_concurrency

    iv = spark.createDataFrame(
        [((i * 13) % 97, (i * 13) % 97 + 5) for i in range(500)], ["s", "e"]
    )
    base = sweep_line_concurrency(iv, "s", "e", num_partitions=4)
    # good proxy: the start column itself
    proxy = iv.select(F.col("s").alias("p"))
    good = sweep_line_concurrency(
        iv, "s", "e", num_partitions=4, boundary_source=(proxy, "p")
    )
    # pathological proxy: constant column -> a single bucket
    bad = sweep_line_concurrency(
        iv, "s", "e", num_partitions=4,
        boundary_source=(iv.select(F.lit(0.0).alias("p")), "p"),
    )
    want = sorted(map(tuple, base.collect()))
    assert sorted(map(tuple, good.collect())) == want
    assert sorted(map(tuple, bad.collect())) == want


def test_seasonal_decompose_rejects_even_period(spark):
    from pyspark.sql import functions as F

    from odbc2parquet_spark.operators.drift import seasonal_decompose

    daily = spark.createDataFrame(
        [(d, float(d)) for d in range(30)], "day long, v double"
    ).select("day", F.col("v").cast("decimal(18,6)").alias("val_dec"))
    with pytest.raises(ValueError, match="odd"):
        seasonal_decompose(daily, "day", "val_dec", period=12)


def test_bucketing_date_keys(spark):
    """DateType ordering keys must bucket (DATE has no DOUBLE cast —
    unix_date is the monotone numeric form)."""
    import datetime

    from odbc2parquet_spark.operators.bucketing import order_bucket_col

    rows = [(datetime.date(2024, 1, 1) + datetime.timedelta(days=i), i) for i in range(200)]
    df = spark.createDataFrame(rows, "d date, x long")
    b = df.withColumn("_bk_", order_bucket_col(df, "d", 4))
    got = b.groupBy("_bk_").count().collect()
    assert sum(r["count"] for r in got) == 200
    assert len(got) >= 2  # genuinely split, monotone boundaries
    # monotonicity: max date of bucket k < min date of bucket k+1
    import itertools

    stats = sorted(
        (r["_bk_"], r["mn"], r["mx"])
        for r in b.groupBy("_bk_").agg(
            F.min("d").alias("mn"), F.max("d").alias("mx")
        ).collect()
    )
    for (b1, _, mx1), (b2, mn2, _) in itertools.pairwise(stats):
        assert mx1 < mn2, (b1, b2)
