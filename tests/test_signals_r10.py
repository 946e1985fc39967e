"""Round tests: HITS, label propagation, ACF, Theil-Sen, Markov removal
effect, audio constellation fingerprint, BLEU-2, DP histogram."""

import math

import pytest
from pyspark.sql import functions as F


def test_hits_int_hand_computed(spark):
    from odbc2parquet_spark.operators.graph import hits_int

    nodes = spark.createDataFrame([(i,) for i in range(1, 5)], ["id"])
    edges = spark.createDataFrame(
        [(1, 2), (3, 2), (2, 4)], ["src", "dst"]
    )
    rows = {r.id: r for r in hits_int(nodes, edges, rounds=2).collect()}
    # a0=1; h1=(1,1,1,0); a1=(0,2,0,1); h2=(2,1,2,0); a2=(0,4,0,1)
    assert (rows[1].hub, rows[1].auth) == (2, 0)
    assert (rows[2].hub, rows[2].auth) == (1, 4)
    assert (rows[3].hub, rows[3].auth) == (2, 0)
    assert (rows[4].hub, rows[4].auth) == (0, 1)


def test_label_propagation_tiebreak_and_isolated(spark):
    from odbc2parquet_spark.operators.graph import label_propagation_int

    nodes = spark.createDataFrame([(i,) for i in range(1, 5)], ["id"])
    tri = [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2)]
    edges = spark.createDataFrame(tri, ["src", "dst"])
    rows = {
        r.id: r.label
        for r in label_propagation_int(nodes, edges, rounds=3).collect()
    }
    # round1: (2,1,1) via min tie-break; round2: (1,1,1); stable after
    assert rows == {1: 1, 2: 1, 3: 1, 4: 4}


def test_acf_daily_hand_computed(spark):
    from odbc2parquet_spark.operators.drift import acf_daily

    rows = []
    eid = 0
    for day, c in [(1, 1), (2, 2), (3, 3), (4, 4)]:
        for _ in range(c):
            rows.append((eid, f"2024-01-0{day} 10:00:00", "a"))
            eid += 1
    ev = spark.createDataFrame(rows, ["event_id", "ts", "event_type"]).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    out = {
        r.lag: r
        for r in acf_daily(ev, "ts", "event_type", max_lag=2).collect()
    }
    # n=4, T=10: dev=(-6,-2,2,6), den=80, num1=20, num2=-24
    assert out[1].n_days == 4
    assert out[1].acf6 == pytest.approx(0.25)
    assert out[2].acf6 == pytest.approx(-0.3)


def test_theil_sen_lower_median(spark):
    from odbc2parquet_spark.operators.drift import theil_sen_daily

    rows = []
    eid = 0
    for day, c in [(1, 1), (2, 2), (3, 4)]:
        for _ in range(c):
            rows.append((eid, f"2024-01-0{day} 10:00:00", "a"))
            eid += 1
    ev = spark.createDataFrame(rows, ["event_id", "ts", "event_type"]).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    r = theil_sen_daily(ev, "ts", "event_type").collect()[0]
    # slopes {1, 1.5, 2}: lower median at rank 2 -> 1.5
    assert r.n_days == 3 and r.n_pairs == 3
    assert r.slope_med == pytest.approx(1.5)


def test_markov_removal_effect_hand_computed(spark):
    from odbc2parquet_spark.operators.attribution import (
        journey_transitions,
        markov_removal_effect,
    )

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 100, "click"),
            (2, "2024-01-01 11:00:00", 100, "purchase"),
            (3, "2024-01-01 10:00:00", 200, "view"),
        ],
        ["event_id", "ts", "user_id", "event_type"],
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type",
    )
    tr = {
        (r.src, r.dst): r.cnt for r in journey_transitions(ev).collect()
    }
    assert tr == {
        ("start", "click"): 1,
        ("click", "conv"): 1,
        ("start", "view"): 1,
        ("view", "null"): 1,
    }
    out = {r.removed: r for r in markov_removal_effect(ev).collect()}
    # start splits 1/2 to click (converts) and view (dies)
    assert out["none"].p_start_micro == 500_000_000_000
    assert out["click"].p_start_micro == 0
    assert out["click"].removal_effect6 == pytest.approx(1.0)
    assert out["view"].p_start_micro == 500_000_000_000
    assert out["view"].removal_effect6 == pytest.approx(0.0)
    assert out["signup"].removal_effect6 == pytest.approx(0.0)


def test_audio_landmark_hash_hand_computed(spark):
    from odbc2parquet_spark.operators.multimodal import audio_landmarks

    peaks = spark.createDataFrame(
        [(1, 0, 1, 1), (1, 1, 2, 3), (1, 2, 3, 0), (1, 3, 5, 7)],
        ["doc_id", "fi", "peak_bin", "peak_power"],
    )
    rows = {r.fi: r.l for r in audio_landmarks(peaks).collect()}
    # fi0: ((1*8+2)*8+3)*64 + bitlen(1)=1 -> 5313
    # fi1: ((2*8+3)*8+5)*64 + bitlen(3)=2 -> 10050
    assert rows == {0: 5313, 1: 10050}


def test_audio_fingerprint_probe_self_match(spark, sf_dir):
    from odbc2parquet_spark.queries import QUERIES

    df = QUERIES["mm_audio_fingerprint"](spark, sf_dir)
    r1 = df.filter("rank = 1")
    n = r1.count()
    good = r1.filter("matched_doc = probe_doc AND offset = 1").count()
    assert n > 0
    # most probes identify themselves at the cut offset; the rank-1
    # mismatches are low-vote collisions on very short clips — a genuine
    # match concentrates votes at one offset, collisions cannot
    assert good >= n * 0.7
    assert r1.filter("matched_doc != probe_doc AND votes > 2").count() == 0


def test_bleu2_hand_computed(spark):
    from odbc2parquet_spark.operators.text import bleu2_pairs

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a b a b")], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    r = bleu2_pairs(docs, pairs).collect()[0]
    assert (r.len_ref, r.len_hyp) == (3, 4)
    assert r.p1_6 == pytest.approx(0.75)
    assert r.p2_6 == pytest.approx(round(2 / 3, 6))
    assert r.bleu2_6 == pytest.approx(round(math.sqrt(0.5), 6))


def test_bleu2_brevity_penalty_and_zero_overlap(spark):
    from odbc2parquet_spark.operators.text import bleu2_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "x y")], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
    rows = {r.id_b: r for r in bleu2_pairs(docs, pairs).collect()}
    # hyp "a b" vs ref "a b c d": p1=1, p2=1, bp=e^(1-2)=e^-1
    assert rows[2].bleu2_6 == pytest.approx(round(math.exp(-1.0), 6))
    # zero n-gram overlap -> 0 (no log-domain blowup)
    assert rows[3].bleu2_6 == 0.0


def test_dp_histogram_noise_bounds_and_reproducibility(spark, sf_dir):
    from odbc2parquet_spark.queries import QUERIES

    a = QUERIES["q_dp_histogram"](spark, sf_dir).collect()
    b = QUERIES["q_dp_histogram"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for r in a:
        assert -30 <= r.noise <= 30
        assert r.n_noisy == r.n_true + r.noise


def test_pca_power_axis_aligned(spark):
    from odbc2parquet_spark.operators.drift import pca_top_component

    # variance only along dim 0: pc1 = e0, lambda = var = 1.0
    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [2.0, 0.0])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.i: r for r in pca_top_component(emb, "embedding", dim=2).collect()}
    assert out[0].pc1_milli == 1000 and out[1].pc1_milli == 0
    assert out[0].lambda6 == pytest.approx(1.0)


def test_pca_power_general_direction_and_rayleigh(spark):
    from odbc2parquet_spark.operators.drift import pca_top_component

    # non-axis-aligned: variance concentrated along (1, 1)/sqrt(2); the
    # milli-normalized iterate must land on equal components and the
    # Rayleigh quotient on the dominant eigenvalue of the 2x2 covariance
    # [[1, 1], [1, 1]] (within the x10^6 truncation of the iterate)
    rows = [(1, [1.0, 1.0]), (2, [-1.0, -1.0]), (3, [0.0, 0.0])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.i: r for r in pca_top_component(emb, "embedding", dim=2).collect()}
    assert out[0].pc1_milli == 1000 and out[1].pc1_milli == 1000
    assert out[0].lambda6 == pytest.approx(2.0, abs=1e-6)


def test_pca_power_zero_covariance_fails_loudly(spark):
    from odbc2parquet_spark.operators.drift import pca_top_component

    # constant embeddings -> all-zero covariance -> the max-normalizer is
    # 0 and pc1 is undefined. The distributed form died with ANSI
    # DIVIDE_BY_ZERO; the driver-side replay must keep the loud failure
    # (never emit a silently arbitrary direction).
    rows = [(i, [1.5, 2.5]) for i in range(4)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    with pytest.raises(ZeroDivisionError):
        pca_top_component(emb, "embedding", dim=2).collect()


def test_pca_power_unit_scale_and_registry(spark, sf_dir):
    from odbc2parquet_spark.queries import QUERIES

    rows = QUERIES["sim_pca_power"](spark, sf_dir).collect()
    assert len(rows) == 64
    assert max(abs(r.pc1_milli) for r in rows) == 1000
    lam = {r.lambda6 for r in rows}
    assert len(lam) == 1 and lam.pop() > 0


def test_cohort_ltv_monotone_and_consistent(spark, sf_dir):
    from odbc2parquet_spark.queries import QUERIES

    rows = QUERIES["ev_cohort_ltv"](spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, []).append(r)
        assert r.ltv6 == pytest.approx(
            round(r.cum_rev6 / 1e6 / r.n_users, 6)
        )
    for rs in by_cohort.values():
        rs.sort(key=lambda r: r.age_week)
        for a, b in zip(rs, rs[1:]):
            assert b.cum_rev6 >= a.cum_rev6  # cumulative never decreases
            assert b.n_users == a.n_users    # cohort size is fixed


def test_video_align_probe_recovers_offset(spark, sf_dir):
    from odbc2parquet_spark.queries import QUERIES

    df = QUERIES["mm_video_align"](spark, sf_dir).cache()
    r1 = df.filter("rank = 1")
    n = r1.count()
    assert n > 0
    # every index landmark a probe holds also exists in its own doc, so
    # NO candidate can out-vote the self-match at offset 1 — it can only
    # TIE it (word-soup docs share short samples) and win the doc-asc
    # tie-break. Pin the theorem: rank-1 votes == self-match votes.
    self_rows = df.filter(
        "matched_doc = probe_doc AND offset = 1"
    ).selectExpr("probe_doc", "votes AS self_votes")
    joined = r1.join(self_rows, "probe_doc").collect()
    # the self row can drop out of the top-3 when >=3 duplicates tie at
    # max votes with lower ids — allow that sliver, pin the rest
    assert len(joined) >= n * 0.95
    for r in joined:
        assert r.votes == r.self_votes
    df.unpersist()


def test_clustering_coeff_triangle_vs_star(spark):
    from odbc2parquet_spark.operators.graph import clustering_coefficient

    edges = spark.createDataFrame(
        # triangle {1,2,3} + star center 10 -> {11,12,13}
        [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (10, 13)],
        ["id_a", "id_b"],
    )
    rows = {r.id: r for r in clustering_coefficient(edges).collect()}
    assert rows[1].coeff6 == 1.0 and rows[1].n_triangles == 1
    assert rows[10].coeff6 == 0.0 and rows[10].degree == 3
    assert 11 not in rows  # degree-1 leaves have no defined coefficient


def test_sprt_decision_consistent_with_walk(spark, sf_dir):
    from odbc2parquet_spark.queries import QUERIES

    A = 2944439
    rows = QUERIES["ev_sprt"](spark, sf_dir).collect()
    assert {r.variant for r in rows} == {"A", "B"}
    for r in rows:
        if r.decision == "accept_h1":
            assert r.llr_micro >= A and r.decision_day is not None
        elif r.decision == "accept_h0":
            assert r.llr_micro <= -A and r.decision_day is not None
        else:
            assert -A < r.llr_micro < A and r.decision_day is None


def test_ht_estimate_close_to_exact(spark, sf_dir):
    from odbc2parquet_spark.queries import QUERIES

    r = QUERIES["tx_ht_estimate"](spark, sf_dir).collect()[0]
    assert r.k == 500 and r.exact_words > 0
    # chars-weighted PPS is nearly self-weighting for token totals
    assert abs(r.rel_err6) < 0.05
    assert r.rel_err6 == pytest.approx(
        round((r.ht_words - r.exact_words) / r.exact_words, 6)
    )


def test_phash_duplicate_and_bounds(spark, sf_dir):
    from odbc2parquet_spark.operators import multimodal as M
    from odbc2parquet_spark.queries import QUERIES

    # identical text -> identical BMP -> identical pHash; a different
    # text -> (generically) different spectrum
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta " * 8),
         (2, "alpha beta gamma delta " * 8),
         (3, "zzz qqq " * 30)],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in
            M.phash_dct_bmp(M.encode_bmp(docs)).collect()}
    assert rows[1].phash == rows[2].phash
    assert rows[1].phash != rows[3].phash
    # registry output: 63 AC bits, strictly-above-lower-median <= 31
    for r in QUERIES["mm_phash_dct"](spark, sf_dir).collect():
        assert 0 <= r.n_above <= 31
        assert 0 <= r.phash < (1 << 63)


def test_phash_pairs_pigeonhole_complete(spark, sf_dir):
    from odbc2parquet_spark.operators import multimodal as M
    from odbc2parquet_spark.catalog import load_table
    from odbc2parquet_spark.queries import QUERIES

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in QUERIES["mm_phash_pairs"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    h = {
        r.doc_id: r.phash
        for r in M.phash_dct_bmp(M.encode_bmp(docs)).collect()
    }
    # exhaustive truth at this sf: banding with 7 bands recalls EVERY
    # pair within hamming 6 (pigeonhole), and reported distances match
    ids = sorted(h)
    truth = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(h[a] ^ h[b]).count("1")
            if d <= 6:
                truth[(a, b)] = d
    assert pairs == truth


def test_cell_medoid_is_true_argmin(spark, sf_dir):
    from odbc2parquet_spark.queries import QUERIES
    from odbc2parquet_spark.catalog import load_table
    from odbc2parquet_spark.operators import similarity as S

    med = {
        r.centroid_id: r
        for r in QUERIES["sim_cell_medoids"](spark, sf_dir).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings")
    cell = S.ivf_assign(emb, S.ivf_seed_centroids(emb, 16))
    vecs, cells = {}, {}
    for r in emb.join(cell.select("vec_id", "centroid_id"), "vec_id").collect():
        vecs[r.vec_id] = [float(x) for x in r.embedding]
        cells.setdefault(r.centroid_id, []).append(r.vec_id)
    from decimal import Decimal

    for cid, members in cells.items():
        best = None
        for a in members:
            s = sum(
                Decimal(
                    str(
                        round(
                            sum(
                                (x - y) * (x - y)
                                for x, y in zip(vecs[a], vecs[b])
                            ),
                            4,
                        )
                    )
                )
                for b in members
            )
            key = (s, a)
            if best is None or key < best:
                best = key
        assert med[cid].medoid_id == best[1]
        assert med[cid].n_members == len(members)


def test_ivf_delta_assign_equals_rebuild(spark, sf_dir):
    from odbc2parquet_spark.catalog import load_table
    from odbc2parquet_spark.operators import similarity as S
    from odbc2parquet_spark.queries import QUERIES

    emb = load_table(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") < 400)
    cents = S.ivf_seed_centroids(old, 16)
    # full rebuild over old+new, restricted to the delta rows, must be
    # bit-identical to the incremental path (same centroid set)
    rebuild = {
        r.vec_id: (r.centroid_id, r.cos4)
        for r in S.ivf_assign(emb, cents)
        .filter(F.col("vec_id") >= 400)
        .collect()
    }
    delta = {
        r.vec_id: (r.centroid_id, r.cos4)
        for r in QUERIES["sim_ivf_delta_assign"](spark, sf_dir).collect()
    }
    assert delta == rebuild and len(delta) > 0


def test_bot_regularity_flags_ticking_user(spark):
    rows = []
    eid = 0
    # user 1: perfect 60s ticker (bot); user 2: bursty human
    for i in range(8):
        rows.append((eid, f"2024-01-01 10:{i:02d}:00", 1, "view")); eid += 1
    for sec in [0, 3, 9, 400, 405, 2000, 2004, 9000]:
        rows.append((eid, f"2024-01-01 {10 + sec // 3600}:{(sec % 3600) // 60:02d}:{sec % 60:02d}", 2, "view")); eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type",
    )
    from pyspark.sql import Window

    # the exact-integer variance construction the registered query uses
    uw = Window.partitionBy("user_id").orderBy("t", "event_id")
    gaps = ev.select(
        "user_id", F.unix_timestamp("ts").alias("t"), "event_id"
    ).select("user_id", (F.col("t") - F.lag("t").over(uw)).alias("g"))
    s = (
        gaps.filter(F.col("g").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("g").alias("n_gaps"),
            F.sum("g").alias("sg"),
            F.sum(F.col("g") * F.col("g")).alias("sg2"),
        )
    )
    out = {
        r.user_id: r
        for r in s.select(
            "user_id",
            "n_gaps",
            (F.col("n_gaps") * F.col("sg2") - F.col("sg") * F.col("sg")).alias("v"),
        ).collect()
    }
    # ticker: all gaps 60 -> variance numerator exactly 0
    assert out[1].v == 0 and out[1].n_gaps == 7
    assert out[2].v > out[2].n_gaps ** 2 * 3600  # bursty: not regular


def test_holt_winters_matches_python_recursion(spark):
    from odbc2parquet_spark.operators.rollup import holt_winters_forecast

    xs = [10.0, 12.0, 8.0, 11.0, 13.0, 9.0, 14.0, 10.5, 12.5, 8.5, 15.0]
    daily = spark.createDataFrame(
        [("a", d, x) for d, x in enumerate(xs)], ["key", "day", "x"]
    )
    r = holt_winters_forecast(daily, period=7, horizons=(1, 7)).collect()[0]
    l, b, s = None, 0.0, [0.0] * 7
    for t, x in enumerate(xs):
        idx = t % 7
        if l is None:
            l_new, b_new = x, 0.0
        else:
            l_new = ((x - s[idx]) + (l + b)) / 2.0
            b_new = ((l_new - l) + b) / 2.0
        s[idx] = ((x - l_new) + s[idx]) / 2.0
        l = l_new
        b = b_new
    n = len(xs)
    assert r.n_days == n
    assert r.level == round(l, 6) and r.trend == round(b, 6)
    assert r.f1 == round(l + 1.0 * b + s[n % 7], 6)
    assert r.f7 == round(l + 7.0 * b + s[(n + 6) % 7], 6)


def test_round10_property_batch(spark):
    """Seeded reference-batch property sweep (one Spark pass per operator,
    many random cases per pass — the hypothesis-style bounds without a
    job per example)."""
    import random

    rng = random.Random(1041)

    # BLEU-2 bounds + identity: scores in [0,1]; a doc paired with
    # itself scores exactly 1 in every component
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30))))
        for i in range(40)
    ]
    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    pairs = [(i, i + 20) for i in range(20)]
    from odbc2parquet_spark.operators.text import bleu2_pairs

    for r in bleu2_pairs(ddf, spark.createDataFrame(pairs, ["id_a", "id_b"])).collect():
        assert 0.0 <= r.p1_6 <= 1.0 and 0.0 <= r.p2_6 <= 1.0
        assert 0.0 <= r.bleu2_6 <= 1.0
    dup = ddf.selectExpr("doc_id + 100 AS doc_id", "text")
    both = ddf.union(dup)
    self_pairs = spark.createDataFrame(
        [(i, i + 100) for i in range(40)], ["id_a", "id_b"]
    )
    for r in bleu2_pairs(both, self_pairs).collect():
        assert (r.p1_6, r.p2_6, r.bleu2_6) == (1.0, 1.0, 1.0)

    # ACF bounds (Cauchy-Schwarz: every lag's |acf| <= 1) and Theil-Sen
    # median-between-extremes on the same random daily series
    rows, eid = [], 0
    for g in range(4):
        for d in range(1, 21):
            for _ in range(rng.randint(1, 9)):
                rows.append(
                    (eid, f"2024-01-{d:02d} 12:00:00", f"t{g}")
                )
                eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "event_type"]
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    from odbc2parquet_spark.operators.drift import acf_daily, theil_sen_daily

    for r in acf_daily(ev, "ts", "event_type", max_lag=5).collect():
        assert abs(r.acf6) <= 1.0
    for r in theil_sen_daily(ev, "ts", "event_type").collect():
        # counts in [1,9]: every pairwise slope lies in [-8, 8]
        assert -8.0 <= r.slope_med <= 8.0
        assert r.n_pairs == r.n_days * (r.n_days - 1) // 2

    # Markov removal effect: probabilities and effects stay in range on
    # random journeys
    rows2, eid2 = [], 0
    types = ["click", "view", "signup", "purchase"]
    for u in range(30):
        for k in range(rng.randint(1, 8)):
            rows2.append(
                (eid2, f"2024-01-01 10:{k:02d}:00", u, rng.choice(types))
            )
            eid2 += 1
    ev2 = spark.createDataFrame(
        rows2, ["event_id", "ts", "user_id", "event_type"]
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type"
    )
    from odbc2parquet_spark.operators.attribution import markov_removal_effect

    out = {r.removed: r for r in markov_removal_effect(ev2).collect()}
    assert out["none"].removal_effect6 == 0.0
    for r in out.values():
        assert 0 <= r.p_start_micro <= 10**12
        assert 0.0 <= r.removal_effect6 <= 1.0
        # removing a channel can never HELP conversion
        assert r.p_start_micro <= out["none"].p_start_micro


def test_occupancy_hand_computed(spark):
    from odbc2parquet_spark.operators.attribution import journey_occupancy

    # user 100: click -> purchase; user 200: view -> (end).
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 100, "click"),
            (2, "2024-01-01 11:00:00", 100, "purchase"),
            (3, "2024-01-01 10:00:00", 200, "view"),
        ],
        ["event_id", "ts", "user_id", "event_type"],
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type"
    )
    out = {r.state: r.visits_micro for r in journey_occupancy(ev).collect()}
    # start visited once; start splits half to click, half to view;
    # neither channel has onward transient edges
    assert out["start"] == 10**12
    assert out["click"] == 5 * 10**11
    assert out["view"] == 5 * 10**11


def test_template_groups_detects_slot_substitution(spark):
    from odbc2parquet_spark.queries.dedup import dd_template_groups  # noqa: F401
    from odbc2parquet_spark.queries import QUERIES as _Q  # noqa: F401
    from odbc2parquet_spark.operators import dedup as D  # noqa: F401
    from pyspark.sql import functions as F2

    # same skeleton, different substituted values -> one family;
    # a structurally different doc stays out
    docs = spark.createDataFrame(
        [
            (1, "name alice age 31 city rome"),
            (2, "name carol age 57 city oslo"),
            (3, "title bb pages 7"),
        ],
        ["doc_id", "text"],
    )
    skel = F2.md5(
        F2.array_join(
            F2.transform(
                F2.filter(F2.split(F2.col("text"), " "), lambda x: x != ""),
                lambda w: F2.length(w).cast("string"),
            ),
            ",",
        )
    )
    groups = (
        docs.select("doc_id", skel.alias("h"))
        .groupBy("h")
        .agg(F2.count(F2.lit(1)).alias("n"), F2.min("doc_id").alias("m"))
        .filter(F2.col("n") > 1)
        .collect()
    )
    assert len(groups) == 1
    assert groups[0].n == 2 and groups[0].m == 1


def test_hw_backtest_prefix_fit_excludes_target(spark):
    from odbc2parquet_spark.operators.rollup import (
        holt_winters_forecast,
        hw_backtest,
    )

    xs = [10.0, 12.0, 8.0, 11.0, 13.0, 9.0, 14.0, 10.5]
    daily = spark.createDataFrame(
        [("a", d, x) for d, x in enumerate(xs)], ["key", "day", "x"]
    )
    rows = {r.origin: r for r in hw_backtest(daily, n_origins=3).collect()}
    assert sorted(rows) == [6, 7, 8]
    # each origin's forecast equals the batch fit on the strict prefix
    for tgt, r in rows.items():
        prefix = spark.createDataFrame(
            [("a", d, x) for d, x in enumerate(xs[: tgt - 1])],
            ["key", "day", "x"],
        )
        fit = holt_winters_forecast(prefix, horizons=(1,)).collect()[0]
        assert r.f1_6 == fit.f1
        assert r.actual == xs[tgt - 1]
        assert r.naive_err6 == round(abs(xs[tgt - 2] - xs[tgt - 1]), 6)


def test_winnowing_guarantee_and_density(spark):
    from odbc2parquet_spark.operators.dedup import (
        winnowing_fingerprints,
        winnowing_pairs,
    )

    # docs 1 and 2 share a 7-word run (>= window + n - 1 = 6) inside
    # otherwise different text -> the guarantee forces >= 1 shared
    # fingerprint; doc 3 shares nothing
    shared = "one two three four five six seven"
    docs = spark.createDataFrame(
        [
            (1, "aa bb " + shared + " cc dd"),
            (2, "xx yy zz " + shared + " qq"),
            (3, "p q r s t u v w"),
        ],
        ["doc_id", "text"],
    )
    fp = winnowing_fingerprints(docs, n=3, window=4)
    rows = fp.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.id, set()).add(r.h)
    assert by_doc[1] & by_doc[2]          # guarantee: shared run detected
    assert not (by_doc[1] & by_doc[3])    # no false sharing
    # density: far fewer selections than grams
    n_grams_1 = len("aa bb ".split() + shared.split() + " cc dd".split()) - 2
    assert len(by_doc[1]) < n_grams_1
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnowing_pairs(fp, min_shared=1).collect()
    }
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_decontaminate_13gram_gate(spark):
    from pyspark.sql import functions as F2
    from odbc2parquet_spark.queries.textops import tx_decontaminate_13gram  # noqa: F401

    run = " ".join(f"w{i}" for i in range(13))
    # doc 0 is the eval doc (0 % 97 == 0); doc 1 embeds its 13-gram;
    # doc 2 shares only 12 consecutive words -> clean
    docs = spark.createDataFrame(
        [
            (0, run),
            (1, "pre " + run + " post"),
            (2, "x " + " ".join(f"w{i}" for i in range(12)) + " y"),
        ],
        ["doc_id", "text"],
    )
    ws = docs.select(
        "doc_id",
        F2.filter(F2.split(F2.col("text"), " "), lambda x: x != "").alias("ws"),
    )
    gram = F2.explode(
        F2.expr(
            "CASE WHEN size(ws) >= 13 THEN transform(sequence(1, size(ws) - 12), "
            "i -> concat_ws(' ', slice(ws, i, 13))) ELSE array() END"
        )
    ).alias("g")
    h = F2.conv(F2.substring(F2.md5(F2.col("g")), 1, 15), 16, 10).cast("long")
    eg = ws.filter(F2.col("doc_id") % 97 == 0).select(gram).select(h.alias("h")).distinct()
    dg = ws.filter(F2.col("doc_id") % 97 != 0).select("doc_id", gram).select(
        "doc_id", h.alias("h")
    ).distinct()
    hits = {r.doc_id: r.n for r in dg.join(eg, "h").groupBy("doc_id").agg(
        F2.count(F2.lit(1)).alias("n")).collect()}
    assert hits.get(1, 0) >= 1   # contaminated: the full run leaked
    assert hits.get(2, 0) == 0   # 12 shared words are not enough


def test_hw_backtest_single_day_group_emits_nothing(spark):
    # n=1 regression (round-9 advice): Spark's sequence(2, 1) is
    # DESCENDING, so an unguarded explode produced a phantom origin=2
    # row with NULL actual while the oracle emitted none
    from odbc2parquet_spark.operators.rollup import hw_backtest

    daily = spark.createDataFrame(
        [("solo", 0, 42.0), ("pair", 0, 1.0), ("pair", 1, 2.0)],
        ["key", "day", "x"],
    )
    rows = hw_backtest(daily, n_origins=3).collect()
    keys = {r.key for r in rows}
    assert "solo" not in keys            # 1-day group: no backtestable origin
    assert [r.origin for r in rows if r.key == "pair"] == [2]


def test_winnowing_blocks_cover_overlong_docs(spark):
    # >1024-gram documents are winnowed in independent 1024-gram blocks
    # (round-10: replaces the round-9 truncation — every gram is covered,
    # and each block equals winnowing the corresponding sub-document)
    from odbc2parquet_spark.operators.dedup import winnowing_fingerprints

    words = [f"w{i}" for i in range(1100)]  # 1098 grams at n=3
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "a b c d e f")], ["doc_id", "text"]
    )
    rows = winnowing_fingerprints(docs, n=3, window=4).collect()
    got = {(r.pos, r.h) for r in rows if r.id == 1}
    assert max(p for p, _ in got) > 1023  # the tail IS fingerprinted now
    # block 0 equals winnowing a doc cut at exactly 1024 grams
    cut = " ".join(words[:1026])
    want0 = {
        (r.pos, r.h)
        for r in winnowing_fingerprints(
            spark.createDataFrame([(1, cut)], ["doc_id", "text"]), n=3, window=4
        ).collect()
    }
    assert {ph for ph in got if ph[0] <= 1023} == want0
    # block 1 equals winnowing the sub-document starting at token 1024,
    # with positions offset by 1024 (blocks are independent by spec)
    tail = " ".join(words[1024:])
    want1 = {
        (r.pos + 1024, r.h)
        for r in winnowing_fingerprints(
            spark.createDataFrame([(1, tail)], ["doc_id", "text"]), n=3, window=4
        ).collect()
    }
    assert {ph for ph in got if ph[0] >= 1024} == want1


def test_markov_removal_effect_zero_conversion_corpus(spark):
    # p_full = 0 (no conversions anywhere): both engines must agree on
    # NULL, not Spark-NULL vs DuckDB inf (round-9 advice)
    from pyspark.sql import functions as F2

    from odbc2parquet_spark.operators.attribution import markov_removal_effect

    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100, "click")],
        ["event_id", "ts", "user_id", "event_type"],
    ).select(
        "event_id", F2.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type",
    )
    out = {r.removed: r for r in markov_removal_effect(ev).collect()}
    assert out["none"].p_start_micro == 0
    assert all(r.removal_effect6 is None for r in out.values())


def test_pagerank_intermediate_checkpoint_branch(spark):
    # iterations > checkpoint_every exercises the every-8-rounds
    # checkpoint path added in round 9; invariants: one row per node,
    # total rank mass never exceeds the teleport-complete 10^12
    from odbc2parquet_spark.operators.graph import pagerank_int

    nodes = spark.createDataFrame([(i,) for i in range(6)], ["id"])
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4)], ["src", "dst"]
    )
    out = pagerank_int(nodes, edges, iterations=9).collect()
    assert len(out) == 6
    assert sum(r["rank"] for r in out) <= 10**12
    assert all(r["rank"] >= (15 * (10**12 // 6)) // 100 for r in out)


def test_value_anomalies_constant_group_no_nan_rows(spark):
    # a constant-valued group cancels s2 - s1^2/n to +-epsilon; the
    # GREATEST clamp must pin sd to 0 (filtered) instead of Spark's NaN
    # (which sorts ABOVE every double, so `sd > 0` would pass it)
    import pyspark.sql.functions as F2

    from odbc2parquet_spark.queries import QUERIES
    import tempfile, os
    # value 1.21 x 7 rows: s2 - s1^2/n = -1.78e-15 in doubles (verified) —
    # the sign that made unclamped DuckDB SQRT error and Spark emit NaN
    rows = [(i, "2024-01-01 10:00:00", i, "flat", 1.21) for i in range(7)]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).select(
        "event_id", F2.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value",
    )
    with tempfile.TemporaryDirectory() as tmp:
        ev.write.parquet(os.path.join(tmp, "events.parquet"))
        out = QUERIES["ev_value_anomalies"](spark, tmp).collect()
    assert out == []  # no NaN-z rows from the degenerate group


def test_lsh_graph_pairs_memo_keyed_by_sf_dir(spark):
    # the graph family shares one materialized LSH edge list per
    # (application, sf_dir); a key bug would silently serve one scale's
    # edges to another scale's query in the same session
    import odbc2parquet_spark.queries.similarity as QS

    QS._LSH_GRAPH_CACHE.clear()
    a = QS._lsh_graph_pairs(spark, "/root/testdata/sf0.001")
    b = QS._lsh_graph_pairs(spark, "/root/testdata/sf0.01")
    assert len(QS._LSH_GRAPH_CACHE) == 2
    assert a.count() != b.count()
    # same key -> the SAME checkpointed frame, not a rebuild
    assert QS._lsh_graph_pairs(spark, "/root/testdata/sf0.001") is a
