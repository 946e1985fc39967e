"""Embedding similarity search: brute-force baseline + LSH scale path.

The embedding column is ``array<float>``; all arithmetic is element-cast to
double and folded with built-in higher-order functions (zip_with/aggregate)
— JVM-side, no Python in the hot path.

Scale notes:
- Brute-force top-k is a cross join: correct baseline, O(Q x N). Fine when
  Q is small (a probe set) or N fits a broadcast; it broadcasts the query
  side so the corpus never shuffles.
- Random-hyperplane LSH assigns each vector a b-bit signature in one
  narrow projection pass (no shuffle at all); bucket join replaces the
  cross join. Hyperplanes are md5-derived constants — deterministic
  across runs and engines.
- Exact-cosine outputs are rounded to 4 decimals before ranking/filtering
  so independent engines (different summation order, same values) agree.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _fold_sum(arr: F.Column, dim: int | None = None) -> F.Column:
    """Left-fold sum of a double array (deterministic order).

    ``dim`` unrolls the fold into a literal chain of ``dim`` additions.
    Trade-off, measured at sf0.1 (round 11): Catalyst higher-order
    functions are CodegenFallback — interpreted per element with boxing
    — so the unrolled chain EXECUTES ~3x faster; but the 64-term tree
    costs ~1s of driver-side analysis/optimization per action where the
    HOF form costs ~0.2s. Unrolling therefore wins only where the
    per-element work dominates (hundreds of thousands of pairs or more
    behind one action: the medoid pairwise pass, the all-pairs cosine
    verification arm) and LOSES on small-cardinality expressions
    (ivf_assign's corpus x 16 scoring measured 0.5s HOF vs 1.1s
    unrolled, all of it planning). Fold order is the same left fold, so
    results are bit-identical WHEN the array length equals ``dim`` (a
    short array yields NULL instead of a partial sum — the louder
    failure). ``dim=None`` keeps the generic interpreted form."""
    if dim is None:
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    acc = F.lit(0.0)
    for k in range(dim):
        acc = acc + F.get(arr, F.lit(k))
    return acc


def dot(a: F.Column, b: F.Column, dim: int | None = None) -> F.Column:
    """Dot product; ``dim`` unrolls (see :func:`_fold_sum` trade-off)."""
    if dim is None:
        return _fold_sum(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
        )
    acc = F.lit(0.0)
    for k in range(dim):
        acc = acc + F.get(a, F.lit(k)).cast("double") * F.get(b, F.lit(k)).cast(
            "double"
        )
    return acc


def norm_sq(a: F.Column, dim: int | None = None) -> F.Column:
    """Squared L2 norm; ``dim`` unrolls (see :func:`_fold_sum`)."""
    if dim is None:
        return _fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double")))
    acc = F.lit(0.0)
    for k in range(dim):
        x = F.get(a, F.lit(k)).cast("double")
        acc = acc + x * x
    return acc


def cosine(a: F.Column, b: F.Column, dim: int | None = None) -> F.Column:
    return dot(a, b, dim) / F.sqrt(norm_sq(a, dim) * norm_sq(b, dim))


def _checked_dim(vec: F.Column, dim: int, where: str) -> F.Column:
    """Fail LOUDLY when the embedding width disagrees with ``dim``: a
    zip_with against a wrong-width plane pads with NULLs, the fold goes
    NULL, and every signature silently collapses to 0 (one mega-bucket
    the cap then drops — zero candidates, no error). Codegen'd
    comparison; free when widths match."""
    return F.when(
        F.size(vec) != dim,
        F.raise_error(
            F.concat(
                F.lit(f"{where}: embedding length "),
                F.size(vec).cast("string"),
                F.lit(f" != dim={dim}"),
            )
        ),
    ).otherwise(vec)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Broadcasts the (small) query side; corpus partitioning untouched —
    at 100 TB the corpus streams through map tasks, each scoring against
    the in-memory probe set, then a per-query top-k (window over rounded
    cosine with id tiebreak for determinism). Norms are computed once per
    row BEFORE the cross-scoring, so each pair costs one fold (the dot),
    not three.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            norm_sq(F.col(vec_col)).alias("qnsq"),
        )
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        norm_sq(F.col(vec_col)).alias("nnsq"),
    )
    scored = (
        v.join(q, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos4",
            F.round(
                dot(F.col("qvec"), F.col("nvec"))
                / F.sqrt(F.col("qnsq") * F.col("nnsq")),
                4,
            ),
        )
        .select("query_id", "neighbor_id", "cos4")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos4"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            # + 0.0 pins IEEE signed zero (see knn_graph)
            (F.col("cos4") + F.lit(0.0)).alias("cosine4"),
            "rank",
        )
    )


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1).

    Components derive from md5(f"{plane}:{dim}") — reproducible anywhere
    (the DuckDB oracle embeds the same literals).
    """
    planes = []
    for j in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{j}:{d}".encode()).hexdigest()[:8], 16)
            row.append(h / float(2**31) - 1.0)
        planes.append(row)
    return planes


def lsh_signatures(
    vectors: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """b-bit random-hyperplane signature per vector: (vec_id, sig).

    One narrow projection pass, no shuffle; signatures feed a bucket
    equi-join (same shape as MinHash banding) in place of a cross join.
    """
    planes = hyperplanes(n_planes, dim)
    # One packed plane-matrix literal + a single indexed transform: the
    # projection is ONE expression (a loop over planes in codegen) instead
    # of n_planes unrolled aggregate folds — same signatures (bit j set
    # iff dot(v, plane_j) > 0), ~n_planes-times smaller expression tree.
    mat = F.array(*[F.array(*[F.lit(x) for x in plane]) for plane in planes])
    vec = _checked_dim(F.col(vec_col), dim, "lsh_signatures")
    bits = F.transform(
        mat,
        lambda plane, j: F.when(
            dot(vec, plane) > 0, F.pow(F.lit(2.0), j.cast("double"))
        ).otherwise(F.lit(0.0)),
    )
    sig = _fold_sum(bits).cast("long")
    # (round-12 A/B: routing `vectors` through catalog.spread_scan here
    # measured a wash-to-slightly-worse on the composed consumers —
    # sim_lsh_bucket_pairs 1.28->1.39 — the projection is cheap enough
    # that the extra exchange is not repaid; left on the natural layout)
    return vectors.select(F.col(id_col).alias("vec_id"), sig.alias("sig"))


def capped_bucket_pairs(
    bucketed: DataFrame,
    bucket_cols: list[str],
    max_bucket: int,
    directed: bool = False,
    keep_bucket: bool = False,
    dedupe: bool = False,
) -> DataFrame:
    """THE single-shuffle capped bucket-to-pairs expansion, shared by
    every LSH candidate generator (prefix, multi-probe, banded — and the
    plan-shape guarantee pinned by tests/test_plans.py covers this one
    definition): shuffle once on ``bucket_cols``, window-count drops
    buckets above ``max_bucket`` (a hot bucket would otherwise go
    quadratic inside one task), then collect_list + double-explode
    expands pairs locally on the SAME partitioning — the window runs
    before collect_list so a mega-bucket spills in WindowExec, never in
    an aggregation buffer. ``directed`` emits both orientations;
    ``dedupe`` collapses pairs that met in several buckets.

    ``bucketed`` must be (vec_id, *bucket_cols).
    """
    w = W.partitionBy(*bucket_cols)
    bounded = (
        bucketed.withColumn("_bn_", F.count("*").over(w))
        .filter(F.col("_bn_") <= max_bucket)
        .drop("_bn_")
    )
    buckets = bounded.groupBy(*bucket_cols).agg(
        F.collect_list("vec_id").alias("ids")
    )
    pred = (
        (F.col("id_a") != F.col("id_b"))
        if directed
        else (F.col("id_a") < F.col("id_b"))
    )
    out = (
        buckets.filter(F.size("ids") >= 2)
        .select(*bucket_cols, F.explode("ids").alias("id_a"), "ids")
        .select(*bucket_cols, "id_a", F.explode("ids").alias("id_b"))
        .filter(pred)
        .select("id_a", "id_b", *(bucket_cols if keep_bucket else []))
    )
    return out.distinct() if dedupe else out


def derived_prefix_bits(
    n_vectors: int,
    target_occupancy: int = 64,
    min_bits: int = 4,
    max_bits: int = 24,
) -> int:
    """Occupancy-scaled LSH bucket width: hold expected per-bucket
    occupancy constant as the corpus grows (buckets ~ n / target_occupancy,
    so prefix_bits = ceil(log2(n / target_occupancy)), clamped).

    This is the scaling rule SCALE.md measured at the amplified-sf10
    decade (200k vectors): a FIXED prefix_bits=8 (256 buckets) lets
    occupancy rise linearly with the corpus and the candidate-pair list
    quadratically with occupancy (92.9M edges, 51s edge build at sf10);
    deriving the width from the corpus restores linear edge growth
    (prefix_bits=12 -> 7.3M edges / 12.9s; 16 -> 0.6M / near-linear vs
    sf0.1). Exactly like an IVF deployment scales k_cells, a 100 TB
    deployment sets the bucket count from a cheap corpus count before
    building the graph — this function is that rule as code.

    The formula is one double-precision ceil(log2(n / occ)) so external
    engines (the DuckDB oracles) reproduce the derived value bit-for-bit
    from the same COUNT(*). Callers must give the signature at least
    ``max_bits`` planes (cap ``max_bits`` at their n_planes).
    """
    import math

    if n_vectors < 0:
        raise ValueError(f"n_vectors must be >= 0, got {n_vectors}")
    if target_occupancy <= 0:
        raise ValueError(f"target_occupancy must be > 0, got {target_occupancy}")
    if n_vectors == 0:
        return min_bits
    raw = math.ceil(math.log2(n_vectors / float(target_occupancy)))
    return min(max_bits, max(min_bits, raw))


def lsh_bucket_pairs(
    signatures: DataFrame,
    prefix_bits: int = 8,
    max_bucket: int = 100_000,
    directed: bool = False,
    target_occupancy: int | None = None,
    n_vectors: int | None = None,
    max_prefix_bits: int = 24,
) -> DataFrame:
    """Candidate pairs sharing a signature prefix bucket.

    ``directed=True`` emits BOTH orientations of every pair in the same
    single bucket pass (for per-node neighbor lists, e.g.
    :func:`knn_graph`) instead of the canonical ``id_a < id_b`` half —
    cheaper than unioning a flipped copy, which would re-run the whole
    bucket expansion.

    Single-shuffle capped shape (same as the MinHash twin,
    dedup.lsh_candidate_pairs): shuffle once on ``bucket``, window-count
    drops buckets above ``max_bucket`` (one hot bucket — e.g. the
    all-zeros signature region of a clustered corpus — would otherwise go
    quadratic inside one task at scale), then collect_list +
    double-explode expands pairs locally on the same partitioning. The
    window runs BEFORE collect_list so a mega-bucket spills in WindowExec
    instead of ballooning an aggregation buffer. No self-join: the old
    join-on-bucket shape shuffled twice and recomputed the signature
    projection per branch.
    """
    if target_occupancy is not None:
        # occupancy-scaled width: derive the bucket count from the corpus
        # size (explicit prefix_bits callers keep their pinned operating
        # point untouched). n_vectors, when the caller already knows it,
        # avoids the count job; otherwise one cheap count over the
        # signature frame (parquet-metadata-cheap when signatures are a
        # narrow projection of a parquet scan).
        n = n_vectors if n_vectors is not None else signatures.count()
        # max_prefix_bits caps at the signature's plane count — a derived
        # width beyond the available bits would alias buckets silently
        prefix_bits = derived_prefix_bits(
            n, target_occupancy, max_bits=max_prefix_bits
        )
    mask = (1 << prefix_bits) - 1
    bucketed = signatures.select(
        "vec_id", F.col("sig").bitwiseAND(F.lit(mask)).alias("bucket")
    )
    return capped_bucket_pairs(
        bucketed, ["bucket"], max_bucket, directed=directed, keep_bucket=True
    )


# ------------------------------------------------------------------ IVF
#
# Inverted-file index: partition the corpus into cells around coarse
# centroids; a query scores only the vectors in its ``nprobe`` nearest
# cells. At 100 TB the assignment is one broadcast-map pass (centroids are
# tiny), the cell layout is a disk partitioning (write the corpus
# partitioned by centroid_id -> partition pruning serves each probe), and
# search touches nprobe/k_cells of the data instead of all of it.


def ivf_seed_centroids(vectors: DataFrame, k_cells: int = 16, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic seed centroids: the ``k_cells`` lowest-id vectors.

    No RNG so any engine reproduces the index bit-for-bit; refine with
    :func:`ivf_refine_centroids` (Lloyd steps) when quality matters more
    than reproducibility.
    """
    return vectors.orderBy(id_col).limit(k_cells).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid")
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, centroid_id, cos4): each vector's nearest centroid.

    Broadcast the centroids (tiny) against the corpus — a map-side join,
    the corpus never shuffles its vectors; the argmax is a groupBy min
    over a PACKED long ((10000 - cos4*10^4) << 43 | centroid_id) —
    lexicographically identical to the (-cos4, centroid_id) struct-min
    it replaces (cos4 is 4-decimal quantized, so the integer scaling is
    exact and order-preserving), but a primitive min HASH-aggregates
    with map-side partials where a struct-min forces a SortAggregate
    over the corpus x k_cells candidate rows. raise_error guards pin
    the centroid_id < 2^43 packing bound. Norms computed once per row
    before the cross: one fold per pair.
    """
    c = F.broadcast(centroids.withColumn("csq", norm_sq(F.col("centroid"))))
    scored = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        norm_sq(F.col(vec_col)).alias("vsq"),
    ).join(c).withColumn(
        "cos4",
        F.round(
            dot(F.col("v"), F.col("centroid")) / F.sqrt(F.col("vsq") * F.col("csq")), 4
        ),
    )
    # cos4*10^4 is within 1 ulp of an integer (4-decimal quantized), so
    # round-to-0-decimals + long cast recovers it exactly
    ncos_scaled = F.lit(10000) - F.round(F.col("cos4") * 10000, 0).cast("long")
    enc = F.when(
        (F.col("centroid_id") < 0) | (F.col("centroid_id") >= F.lit(1 << 43)),
        F.expr(
            "raise_error('ivf_assign: centroid_id outside the packing bound')"
        ).cast("long"),
    ).otherwise(ncos_scaled * F.lit(1 << 43) + F.col("centroid_id").cast("long"))
    return (
        scored.groupBy("vec_id")
        .agg(F.min(enc).alias("best_enc"))
        .select(
            "vec_id",
            (F.col("best_enc") % F.lit(1 << 43)).alias("centroid_id"),
            (
                (F.lit(10000) - F.shiftright(F.col("best_enc"), 43))
                .cast("double") / F.lit(10000.0)
            ).alias("cos4"),
        )
    )


def ivf_silhouette(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell simplified silhouette over an IVF index — the clustering
    QA gate: how well-separated each cell is, from centroid distances
    only (Hruschka et al.'s simplified silhouette — O(N x k_cells), no
    pairwise pass). Per vector, with cosine distance to the nearest
    centroid a = 1 - cos_own and to the runner-up b = 1 - cos_next:
    s = (b - a) / max(a, b) = (cos_own - cos_next) / (1 - cos_next),
    in [0, 1) — 0 on the cell boundary, ->1 deep inside the cell. A cell
    whose mean silhouette collapses toward 0 is not separating its
    vectors and needs a re-seed/Lloyd pass (the signal sim_centroid_shift
    then quantifies).

    Determinism: distances reuse ivf_assign's 4-decimal quantized cos
    and its packed-long ordering ((10000 - cos4*10^4) << 43 |
    centroid_id), so best/runner-up are the same tie-broken pair on any
    engine; per-vector s rounds to 6 then decimal-sums per cell. Scale
    shape: centroids broadcast, corpus never shuffles its vectors — two
    hash-aggregations over the N x k scored rows (best enc, then min enc
    above best), both map-side partial; no sort, no window over the
    corpus."""
    c = F.broadcast(centroids.withColumn("csq", norm_sq(F.col("centroid"))))
    scored = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        norm_sq(F.col(vec_col)).alias("vsq"),
    ).join(c).withColumn(
        "cos4",
        F.round(
            dot(F.col("v"), F.col("centroid")) / F.sqrt(F.col("vsq") * F.col("csq")), 4
        ),
    )
    ncos_scaled = F.lit(10000) - F.round(F.col("cos4") * 10000, 0).cast("long")
    enc_col = (ncos_scaled * F.lit(1 << 43) + F.col("centroid_id").cast("long")).alias(
        "enc"
    )
    from odbc2parquet_spark import cachereg

    encs = cachereg.track(scored.select("vec_id", enc_col).persist())
    best = encs.groupBy("vec_id").agg(F.min("enc").alias("e1"))
    second = (
        encs.join(best, "vec_id")
        .filter(F.col("enc") > F.col("e1"))
        .groupBy("vec_id")
        .agg(F.min("enc").alias("e2"), F.min("e1").alias("e1"))
    )
    def _cos(e):  # noqa: ANN001 - column helper
        return (
            F.lit(10000) - F.shiftright(F.col(e), 43)
        ).cast("double") / F.lit(10000.0)

    sil = second.select(
        "vec_id",
        (F.col("e1") % F.lit(1 << 43)).alias("centroid_id"),
        F.when(
            _cos("e2") < 1.0,
            F.round((_cos("e1") - _cos("e2")) / (F.lit(1.0) - _cos("e2")), 6),
        )
        .otherwise(F.lit(0.0))
        .cast("decimal(18,6)")
        .alias("s"),
    )
    return sil.groupBy("centroid_id").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.sum("s").cast("double") / F.count("*"), 6).alias("mean_sil"),
    )


def ivf_refine_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd refinement: mean of assigned vectors per cell, ``iterations``
    times. Each step is one broadcast assign + one posexplode/groupBy
    mean (shuffle keyed on (centroid, dim) — k_cells*dim groups, tiny).

    The per-cell mean follows the module's determinism contract — exact
    DECIMAL sums (order-independent), ONE final division rounded to 6 —
    by delegating to :func:`label_centroids`, the same step the
    oracle-gated sim_ivf_refine query certifies; a raw float ``avg``
    here would make the refined index depend on shuffle merge order.
    Spark-only (iterative; no SQL oracle for the composed loop)."""
    cur = centroids
    for _ in range(iterations):
        assigned = ivf_assign(vectors, cur, id_col, vec_col).join(
            vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")),
            "vec_id",
        )
        means = assemble_centroids(
            label_centroids(assigned, label_col="centroid_id", vec_col="v")
        ).select(
            F.col("label").alias("centroid_id"),
            F.transform(F.col("centroid"), lambda x: x.cast("float")).alias(
                "centroid"
            ),
        )
        cur = means
    return cur


def ivf_search(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score each query against its ``nprobe`` nearest
    cells only.

    Plan shape at scale: corpus->cell assignment is the (cachable /
    disk-partitionable) index; probes (queries x nprobe, small) broadcast
    against it, so the only corpus-sized operation is one semi-join-like
    broadcast filter + per-query top-k window.
    """
    assign = ivf_assign(vectors, centroids, id_col, vec_col).select(
        F.col("vec_id").alias("neighbor_id"), "centroid_id"
    )
    qprobe = (
        ivf_probe_cells(queries, centroids, nprobe, id_col, vec_col)
        .select("query_id", "centroid_id")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    cand = (
        assign.join(F.broadcast(qprobe), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    # the corpus-side vector fetch streams v map-side against BROADCAST
    # candidate/query tables (ids + a few query vectors) — a plain join
    # on neighbor_id would shuffle every corpus row's embedding a second
    # time after ivf_assign already streamed them once
    scored = (
        v.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cos4", F.round(cosine(F.col("qvec"), F.col("nvec")), 4))
    )  # candidate set is already nprobe/k_cells of the corpus; per-pair
    # norm folds are acceptable here (queries are few)
    w = W.partitionBy("query_id").orderBy(F.desc("cos4"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            # + 0.0 pins IEEE signed zero (see knn_graph)
            (F.col("cos4") + F.lit(0.0)).alias("cosine4"),
            "rank",
        )
    )


def ivf_probe_cells(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, centroid_id, rank): each query's nprobe nearest cells."""
    c = F.broadcast(centroids)
    scored = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).join(c).withColumn("cos4", F.round(cosine(F.col("qv"), F.col("centroid")), 4))
    w = W.partitionBy("query_id").orderBy(F.desc("cos4"), F.asc("centroid_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= nprobe)
        .select("query_id", "centroid_id", "rank")
    )


# ---------------------------------------------------------- storage ops


def normalize_vectors(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, unit): L2-normalized vectors — after this, cosine becomes a
    plain dot product (saves a sqrt + two folds per pair downstream).
    Zero vectors pass through unchanged. Narrow, no shuffle.

    The norm is materialized as its own column FIRST: a higher-order
    transform re-evaluates its whole bound expression per element (no
    subexpression caching), so embedding the O(d) norm fold in the
    lambda would cost O(d²) per row."""
    staged = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v_"),
        F.sqrt(norm_sq(F.col(vec_col))).alias("_n_"),
    )
    n = F.col("_n_")
    unit = F.when(n == 0, F.col("_v_")).otherwise(
        F.transform(F.col("_v_"), lambda x: (x.cast("double") / n).cast("float"))
    )
    return staged.select("vec_id", unit.alias("unit"))


def quantize_int8(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, scale, q): symmetric int8 quantization — 4x smaller than
    float32 at ~0.4% max error, the standard storage layout for
    100 TB-scale embedding stores. value ~= q * scale with
    scale = max|x| / 127; FLOOR(x/scale + 0.5) spells the rounding
    explicitly so any engine reproduces the exact codes. Narrow pass.

    absmax/scale are materialized as columns FIRST — a per-element
    lambda re-evaluates its whole bound expression per element, so an
    embedded absmax fold would cost O(d²) per row."""
    staged = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v_"),
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
        ).alias("_absmax_"),
    )
    absmax = F.col("_absmax_")
    scale = absmax / F.lit(127.0)
    q = F.when(absmax == 0, F.transform(F.col("_v_"), lambda x: F.lit(0))).otherwise(
        F.transform(
            F.col("_v_"),
            lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"),
        )
    )
    return staged.select("vec_id", scale.alias("scale"), q.alias("q"))


def label_centroids(
    vectors: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """(label, dim, c): element-wise mean embedding per label — the
    mean-pooled class centroid used for nearest-centroid classification
    and embedding-space curation.

    Determinism across engines: per-(label, dim) sums run on exact
    DECIMAL (order-independent), cast to double only for the final
    division, rounded to ``decimals``. One posexplode + one groupBy on
    (label, dim) — k*d groups, tiny shuffle regardless of corpus size.
    The exploded scalar form IS the output (narrow, hashable);
    :func:`assemble_centroids` packs it back into arrays for joins.
    """
    return (
        vectors.select(
            F.col(label_col).alias("label"), F.posexplode(F.col(vec_col)).alias("dim", "x")
        )
        .groupBy("label", "dim")
        .agg(
            F.sum(F.col("x").cast("double").cast("decimal(25,10)")).alias("s"),
            F.count("*").alias("n"),
        )
        .select(
            "label",
            "dim",
            F.round(F.col("s").cast("double") / F.col("n"), decimals).alias("c"),
        )
    )


def assemble_centroids(centroids: DataFrame) -> DataFrame:
    """(label, centroid): pack (label, dim, c) scalar rows into ordered
    double arrays (dimension-sorted struct collect)."""
    return (
        centroids.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select("label", F.transform(F.col("dc"), lambda s: s.getField("c")).alias("centroid"))
    )


def centroid_outliers(
    vectors: DataFrame,
    top_k: int = 20,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, label, dist, rk): the ``top_k`` vectors farthest from their
    OWN label's centroid, per label — mislabeled/noise candidates for
    embedding-space quality filtering.

    Scale shape: centroids are k rows — broadcast; the distance is a
    per-row zip_with fold (no shuffle over the corpus); only the top-k
    window shuffles, keyed on label with per-partition work bounded by the
    label's row count (at extreme per-label cardinality swap the window
    for a groupBy min_by-heap variant). Distance folds run in array order
    on both engines, so the rounded values are bit-identical to the
    oracle's list_sum.
    """
    cents = assemble_centroids(label_centroids(vectors, label_col, vec_col))
    d2 = _fold_sum(
        F.zip_with(
            F.col(vec_col),
            F.col("centroid"),
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        )
    )
    w = W.partitionBy("label").orderBy(F.desc("dist"), F.asc("vec_id"))
    return (
        vectors.select(F.col(id_col).alias("vec_id"), F.col(label_col).alias("label"), F.col(vec_col).alias(vec_col))
        .join(F.broadcast(cents), "label")
        .withColumn("dist", F.round(F.sqrt(d2), 4))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("vec_id", "label", "dist", F.col("rk").cast("long").alias("rk"))
    )


def _pq_split(dim: int, m: int) -> int:
    """Subspace width, rejecting lossy splits: with dim % m != 0 the
    trailing dimensions would silently vanish from codebook, codes and
    LUT alike."""
    if dim % m:
        raise ValueError(f"dim={dim} must be divisible by m={m} subspaces")
    return dim // m


def _subspace_melt(vec_col: str, m: int, sub: int, field: str) -> F.Column:
    """array<struct(subspace, <field>)> of the vector's m contiguous
    slices — the ONE definition of the PQ subspace layout, shared by
    codebook build, code assignment and the probe LUT so the three can
    never disagree on which dimensions belong to which subspace."""
    return F.array(
        *[
            F.struct(
                F.lit(s).alias("subspace"),
                F.slice(F.col(vec_col), s * sub + 1, sub).alias(field),
            )
            for s in range(m)
        ]
    )


def pq_codebook(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(subspace, cid, c8): a product-quantization codebook — the vector
    space split into ``m`` contiguous subspaces, each with ``k`` centroids
    taken deterministically from the ``k`` lowest-id vectors' slices (the
    same no-RNG seeding rule as :func:`ivf_seed_centroids`, so any engine
    rebuilds the codebook bit-for-bit; run Lloyd per subspace when recall
    matters more than reproducibility)."""
    sub = _pq_split(dim, m)
    seeds = vectors.orderBy(id_col).limit(k)
    return seeds.select(
        F.col(id_col).alias("cid"),
        F.explode(_subspace_melt(vec_col, m, sub, "c8")).alias("sc"),
    ).select("cid", F.col("sc.subspace").alias("subspace"), F.col("sc.c8").alias("c8"))


def pq_refine_codebook(
    vectors: DataFrame,
    codebook: DataFrame,
    m: int = 8,
    dim: int = 64,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace Lloyd refinement of a PQ codebook — the quality lever
    over the deterministic low-id seeding: assign codes, replace each
    centroid with the mean of its assigned slices, repeat.

    Each iteration is one broadcast assign (pq_assign) + one
    (subspace, code, pos) mean — m*k*sub groups, tiny — so the corpus is
    scanned twice per round and nothing corpus-sized ever shuffles wide
    rows. Cells that attract no vectors drop out (dead centroids —
    identical semantics in the SQL oracle, which groups by assigned
    codes only).

    Determinism contract (the reason this refines hash-identically on
    any engine): per-position means are DECIMAL(25,12) exact sums
    divided once, rounded to 6 decimals, cast to float — the same
    order-independence rule as every other cross-engine aggregate here.
    """
    sub = _pq_split(dim, m)
    cur = codebook
    for _ in range(iterations):
        melted = vectors.select(
            F.col(id_col).alias("vec_id"),
            F.explode(_subspace_melt(vec_col, m, sub, "v8")).alias("sv"),
        ).select(
            "vec_id", F.col("sv.subspace").alias("subspace"), F.col("sv.v8").alias("v8")
        )
        codes = pq_assign(vectors, cur, m=m, dim=dim, id_col=id_col, vec_col=vec_col)
        assigned = codes.join(melted, ["vec_id", "subspace"]).select(
            "subspace", "code", "v8"
        )
        cur = (
            assigned.select("subspace", "code", F.posexplode("v8").alias("pos", "x"))
            .groupBy("subspace", "code", "pos")
            .agg(
                F.round(
                    F.sum(F.col("x").cast("double").cast("decimal(25,12)")).cast(
                        "double"
                    )
                    / F.count(F.lit(1)),
                    6,
                ).alias("mval")
            )
            .groupBy("subspace", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mval"))).alias("pm"))
            .select(
                F.col("code").alias("cid"),
                "subspace",
                F.transform(
                    F.col("pm"), lambda s: s.getField("mval").cast("float")
                ).alias("c8"),
            )
        )
    return cur


def _dense_values(col, n_rows: int, dim: int):
    """Flat float values of an Arrow list column, REFUSING nulls and
    ragged lengths: a null vector or a wrong-length vector would
    otherwise silently misalign the (n, m, sub) reshape and corrupt
    every row after it in the batch."""
    if col.null_count:
        raise ValueError("PQ kernel: null embedding vectors are not supported")
    flat = col.flatten().to_numpy(zero_copy_only=False)
    if flat.size != n_rows * dim:
        raise ValueError(
            f"PQ kernel: expected {n_rows} x {dim} embedding values, got "
            f"{flat.size} (ragged or wrong-dim vectors)"
        )
    return flat


def _collect_codebook(codebook: DataFrame, m: int, sub: int):
    """Codebook as per-subspace (cid array, centroid matrix) numpy pairs,
    cid-sorted — a bounded driver reduction (a PQ codebook is m*k tiny
    rows BY DEFINITION; it exists to be memory-resident). Shared by the
    assignment and probe-LUT Arrow kernels so both see the identical
    cid order the tiebreak contract depends on. Rejects sub > 8: numpy's
    pairwise summation is sequential only below 8 terms, and the
    cross-engine bit-exactness contract needs in-order sums."""
    import numpy as np

    if sub > 8:
        raise ValueError(
            f"subspace width {sub} > 8: numpy's pairwise summation would "
            "reassociate the distance sum and break the cross-engine "
            "bit-exactness contract"
        )
    rows = codebook.select("subspace", "cid", "c8").collect()
    by_s: dict[int, list] = {}
    for r in rows:
        by_s.setdefault(r.subspace, []).append((r.cid, list(r.c8)))
    cb_cids, cb_mats = [], []
    for s in range(m):
        entries = sorted(by_s.get(s, []))
        if not entries:
            raise ValueError(f"codebook has no centroids for subspace {s}")
        cb_cids.append(np.array([c for c, _ in entries], dtype=np.int64))
        cb_mats.append(np.array([v for _, v in entries], dtype=np.float64))
    return cb_cids, cb_mats


def pq_assign(
    vectors: DataFrame,
    codebook: DataFrame,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrays=None,
) -> DataFrame:
    """(vec_id, subspace, code, dist4): per-subspace nearest-centroid codes
    — the PQ compression step that stores a 64-float vector as ``m`` small
    codes (8 bytes + codebook), the standard layout for billion-scale ANN
    memory residency.

    Scale shape — the FAISS kernel layout, not a join: a PQ codebook is
    m*k tiny rows BY DEFINITION (it exists to be memory-resident), so it
    collects once (bounded driver reduction, like the per-bucket offsets
    in bucketing.py) and ships in the task closure; the n*m*k distance
    matrix is then a vectorized numpy kernel inside ``mapInArrow`` —
    never materialized as rows. The expression forms (a min(struct)
    aggregate, or a per-row transform/array_min fold) were measured
    22-38s at sf0.1 m=32/k=256 — Spark higher-order functions don't
    codegen, and 16M interpreted lambda evals is their floor; the Arrow
    kernel does the same arithmetic in ~100ms.

    Determinism contract: the argmin compares UNROUNDED squared
    distances — float32 slices widened to float64, (a-b)*(a-b), summed
    in index order — an IEEE-exact sequence that numpy, the JVM and
    DuckDB reproduce bit-for-bit (no libm, no reassociation: numpy's
    pairwise summation is sequential below 8 terms, and ``POWER(x, 2)``
    is avoided in the oracle in favor of explicit multiplication). Ties
    break to the lowest cid (codewords scanned in cid order, strict-less
    replacement). Only the OUTPUT distance is rounded (dist4, 4
    decimals), and that happens Spark-side with exact decimal rounding.
    """
    import numpy as np
    import pyarrow as pa

    sub = _pq_split(dim, m)
    # ``arrays``: a precollected _collect_codebook result, so composers
    # that feed the SAME codebook to both the assignment and probe-LUT
    # kernels (adc/ivf-pq search) evaluate its groupBy DAG once, not
    # twice — the codebook build is the dominant fixed cost per search.
    cb_cids, cb_mats = arrays or _collect_codebook(codebook, m, sub)
    subspaces = np.arange(m, dtype=np.int32)

    def assign_batches(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            ids = b.column(0).to_numpy(zero_copy_only=False)
            flat = _dense_values(b.column(1), n, m * sub)
            Vs = flat.astype(np.float64).reshape(n, m, sub)
            codes = np.empty((n, m), dtype=np.int64)
            d2min = np.empty((n, m), dtype=np.float64)
            for s in range(m):
                diff = Vs[:, s, None, :] - cb_mats[s][None, :, :]
                d = np.square(diff).sum(axis=-1)
                j = np.argmin(d, axis=1)  # ties -> first = lowest cid
                codes[:, s] = cb_cids[s][j]
                d2min[:, s] = d[np.arange(n), j]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(ids, m), type=pa.int64()),
                    pa.array(np.tile(subspaces, n), type=pa.int32()),
                    pa.array(codes.reshape(-1), type=pa.int64()),
                    pa.array(d2min.reshape(-1), type=pa.float64()),
                ],
                names=["vec_id", "subspace", "code", "d2"],
            )

    raw = vectors.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col)
    ).mapInArrow(assign_batches, "vec_id long, subspace int, code long, d2 double")
    return raw.select(
        "vec_id", "subspace", "code", F.round("d2", 4).alias("dist4")
    )


def _pq_probe_lut(
    probes: DataFrame,
    codebook: DataFrame,
    m: int,
    dim: int,
    id_col: str,
    vec_col: str,
    arrays=None,
) -> DataFrame:
    """(query_id, subspace, code, pd2): the ADC lookup table — every
    probe's squared distance to every subspace centroid, each term
    rounded to 4 decimals then held as DECIMAL(20,4) so downstream sums
    are order-independent. n_probes*m*k rows; always broadcast.

    Distances come from the same Arrow kernel as :func:`pq_assign`
    (bit-exact raw float64), with the round-4 + decimal cast applied
    Spark-side so decimal rounding stays an exact JVM operation — the
    melt/zip_with expression form this replaces spent ~1.6s of
    interpreted HOF time on 82k rows at sf0.1."""
    import numpy as np
    import pyarrow as pa

    sub = _pq_split(dim, m)
    cb_cids, cb_mats = arrays or _collect_codebook(codebook, m, sub)

    def lut_batches(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            ids = b.column(0).to_numpy(zero_copy_only=False)
            flat = _dense_values(b.column(1), n, m * sub)
            Vs = flat.astype(np.float64).reshape(n, m, sub)
            out_q, out_s, out_c, out_d = [], [], [], []
            for s in range(m):
                d = np.square(Vs[:, s, None, :] - cb_mats[s][None, :, :]).sum(axis=-1)
                k_s = d.shape[1]
                out_q.append(np.repeat(ids, k_s))
                out_s.append(np.full(n * k_s, s, dtype=np.int32))
                out_c.append(np.tile(cb_cids[s], n))
                out_d.append(d.reshape(-1))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_q), type=pa.int64()),
                    pa.array(np.concatenate(out_s), type=pa.int32()),
                    pa.array(np.concatenate(out_c), type=pa.int64()),
                    pa.array(np.concatenate(out_d), type=pa.float64()),
                ],
                names=["query_id", "subspace", "code", "pd2raw"],
            )

    raw = probes.select(
        F.col(id_col).cast("long").alias("query_id"), F.col(vec_col)
    ).mapInArrow(
        lut_batches, "query_id long, subspace int, code long, pd2raw double"
    )
    return raw.select(
        "query_id",
        "subspace",
        "code",
        F.round("pd2raw", 4).cast("decimal(20,4)").alias("pd2"),
    )


def _adc_rank(scored: DataFrame, top_k: int) -> DataFrame:
    """(query_id, vec_id, adc_dec) -> the ranked ADC result frame. One
    definition of the output contract (asc-distance/asc-id tiebreak,
    double cast, column names) shared by full-scan ADC and IVF-PQ so the
    two search shapes can never return inconsistently ranked results."""
    w = W.partitionBy("query_id").orderBy(F.asc("adc_dec"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("adc_dec").cast("double").alias("adc4"),
            "rank",
        )
    )


def pq_adc_topk(
    vectors: DataFrame,
    probes: DataFrame,
    m: int = 8,
    k_centroids: int = 16,
    dim: int = 64,
    top_k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes — the search half of
    product quantization (cf. reference's query surface: the engine only
    moves typed columns; here the "column" is the small code vector).

    For each probe, distance to a corpus vector is approximated from its
    codes alone: d2(probe, vec) ~= sum_s ||probe_s - centroid[code_s]||^2.
    The probe-side lookup table (probe x subspace x centroid -> partial
    d2) has n_probes*m*k rows — BROADCAST; the corpus contributes only
    its code rows (narrow ints, 64 floats never re-read). This is the
    billion-scale ANN serving layout: the big side is 8 bytes/vector and
    the float arithmetic happens once, on the tiny LUT.

    Shuffle budget: one groupBy (query_id, vec_id) whose input partially
    aggregates map-side (m rows -> 1), then the per-probe top-k window —
    both carry corpus x n_probes NARROW rows, never vectors. Partial
    distances are summed as DECIMAL(20,4) (each term rounded to 4
    first), so the total is order-independent and engines agree
    bit-for-bit; the final adc4 is the double cast of that exact sum.

    ``codebook`` overrides the default deterministic-seed build — pass a
    :func:`pq_refine_codebook` output to search on Lloyd-refined cells.
    """
    cb = (
        codebook
        if codebook is not None
        else pq_codebook(
            vectors, m=m, k=k_centroids, dim=dim, id_col=id_col, vec_col=vec_col
        )
    )
    cba = _collect_codebook(cb, m, _pq_split(dim, m))
    codes = pq_assign(
        vectors, cb, m=m, dim=dim, id_col=id_col, vec_col=vec_col, arrays=cba
    ).select("vec_id", "subspace", "code")
    lut = _pq_probe_lut(probes, cb, m, dim, id_col, vec_col, arrays=cba)
    scored = (
        codes.join(F.broadcast(lut), ["subspace", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd2").alias("adc_dec"))
    )
    return _adc_rank(scored, top_k)


def ivf_pq_search(
    vectors: DataFrame,
    probes: DataFrame,
    nprobe: int = 4,
    k_cells: int = 16,
    m: int = 8,
    k_centroids: int = 16,
    dim: int = 64,
    top_k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the full billion-scale ANN index — coarse cell routing
    (IVF) composed with code-book distances (ADC over PQ codes).

    Each query visits only its ``nprobe`` nearest cells, and within them
    distances come from narrow code rows + the broadcast probe LUT — the
    corpus's float vectors are touched exactly twice, both at INDEX BUILD
    (cell assignment + code assignment), never at search. At 100 TB the
    (cell, codes) table is stored partitioned by ``centroid_id``, so the
    probed-cell filter becomes partition pruning and a search touches
    ~nprobe/k_cells of the files; the local plan plays the same
    restriction as one broadcast hash join.

    Shuffle budget at search time: the codes⋈candidates join keyed on
    vec_id (corpus-sized narrow rows — pre-co-partitioned in the stored
    layout), the partially-aggregated (query, vec) distance groupBy, and
    the per-query top-k window. DECIMAL(20,4) partial sums keep results
    engine-exact.
    """
    cents = ivf_seed_centroids(vectors, k_cells, id_col, vec_col)
    cell = ivf_assign(vectors, cents, id_col, vec_col).select("vec_id", "centroid_id")
    cb = pq_codebook(vectors, m=m, k=k_centroids, dim=dim, id_col=id_col, vec_col=vec_col)
    cba = _collect_codebook(cb, m, _pq_split(dim, m))
    codes = pq_assign(
        vectors, cb, m=m, dim=dim, id_col=id_col, vec_col=vec_col, arrays=cba
    ).select("vec_id", "subspace", "code")
    qprobe = ivf_probe_cells(probes, cents, nprobe, id_col, vec_col).select(
        "query_id", "centroid_id"
    )
    lut = _pq_probe_lut(probes, cb, m, dim, id_col, vec_col, arrays=cba)
    cand = (
        cell.join(F.broadcast(qprobe), "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    scored = (
        codes.join(cand, "vec_id")
        .join(F.broadcast(lut), ["query_id", "subspace", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd2").alias("adc_dec"))
    )
    return _adc_rank(scored, top_k)


def ivf_pq_residual_search(
    vectors: DataFrame,
    probes: DataFrame,
    nprobe: int = 4,
    k_cells: int = 16,
    m: int = 8,
    k_centroids: int = 16,
    dim: int = 64,
    top_k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — the index layout FAISS's IndexIVFPQ
    actually ships: PQ codes quantize each vector's residual v - c(cell)
    rather than the raw vector, so the codebook only has to cover the
    (much smaller) within-cell spread and code distortion drops for the
    same m/k budget. Query side mirrors it: for each probed cell the
    query's OWN residual against that cell's centroid builds the LUT, so
    ADC distances approximate ||(q - c) - (v - c)||^2 = ||q - v||^2 with
    cell-local codebooks.

    Determinism: residuals are exact float64 subtractions (float32
    widened first — both exact IEEE ops); everything downstream is the
    standard PQ contract (sequential in-order distance sums, lowest-cid
    ties, round-4 decimal LUT partials). The per-(query, cell) LUT keys
    pack as query_id * 1024 + centroid_id (k_cells < 1024 asserted) to
    ride the shared probe-LUT kernel unchanged.

    Scale shape: identical to :func:`ivf_pq_search` — the corpus's float
    vectors are touched at index build only; search joins narrow code
    rows against a broadcast LUT that is merely nprobe x bigger. The one
    extra build cost is the residual projection, a broadcast map pass.
    """
    if k_cells >= 1024:
        raise ValueError("k_cells must stay < 1024 for the packed LUT key")
    cents = ivf_seed_centroids(vectors, k_cells, id_col, vec_col)
    cell = ivf_assign(vectors, cents, id_col, vec_col).select("vec_id", "centroid_id")
    cvecs = F.broadcast(
        cents.select(
            "centroid_id",
            F.transform(F.col("centroid"), lambda x: x.cast("double")).alias("cvec"),
        )
    )
    rv = (
        vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
        .join(cell, "vec_id")
        .join(cvecs, "centroid_id")
        .select(
            "vec_id",
            "centroid_id",
            F.zip_with(
                "v", "cvec", lambda a, b: a.cast("double") - b
            ).alias("rvec"),
        )
    )
    cb = pq_codebook(rv, m=m, k=k_centroids, dim=dim, id_col="vec_id", vec_col="rvec")
    cba = _collect_codebook(cb, m, _pq_split(dim, m))
    codes = pq_assign(
        rv, cb, m=m, dim=dim, id_col="vec_id", vec_col="rvec", arrays=cba
    ).select("vec_id", "subspace", "code")
    qprobe = ivf_probe_cells(probes, cents, nprobe, id_col, vec_col).select(
        "query_id", "centroid_id"
    )
    qres = (
        probes.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q"))
        .join(F.broadcast(qprobe), "query_id")
        .join(cvecs, "centroid_id")
        .select(
            (F.col("query_id") * 1024 + F.col("centroid_id")).alias("qc"),
            F.zip_with(
                "q", "cvec", lambda a, b: a.cast("double") - b
            ).alias("qrvec"),
        )
    )
    lut = (
        _pq_probe_lut(qres, cb, m, dim, "qc", "qrvec", arrays=cba)
        .select(
            F.expr("query_id div 1024").alias("query_id"),
            (F.col("query_id") % 1024).alias("centroid_id"),
            "subspace",
            "code",
            "pd2",
        )
    )
    cand = (
        cell.join(F.broadcast(qprobe), "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "centroid_id", "vec_id")
    )
    scored = (
        codes.join(cand, "vec_id")
        .join(F.broadcast(lut), ["query_id", "centroid_id", "subspace", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd2").alias("adc_dec"))
    )
    return _adc_rank(scored, top_k)


def knn_graph(
    vectors: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    dim: int = 64,
    prefix_bits: int = 8,
    max_bucket: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-nearest-neighbor GRAPH over the whole corpus:
    (vec_id, neighbor_id, cosine4, rank<=k) for every vector.

    The self-join that would be O(N^2) becomes LSH-bucket candidates
    (single capped shuffle — :func:`lsh_bucket_pairs`), symmetrized, then
    exact-cosine reranked with a per-source top-k window. Candidates per
    node are bucket-bounded, so the window sorts tiny per-key groups.
    This is the substrate for graph-based semantic dedup and diversity
    sampling; at 100 TB the bucket prefix widens (more, smaller buckets)
    and ``max_bucket`` caps any hot region.
    """
    sig = lsh_signatures(vectors, n_planes, dim, id_col, vec_col)
    sym = lsh_bucket_pairs(sig, prefix_bits, max_bucket, directed=True).select(
        "id_a", "id_b"
    )
    # norms once per NODE before the pair joins — cosine() inline would
    # re-fold both norms for every candidate pair (3x the flops)
    v = vectors.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_vec"),
        norm_sq(F.col(vec_col)).alias("_nsq"),
    )
    a = v.withColumnsRenamed({"_vid": "_a_id", "_vec": "_a_vec", "_nsq": "_a_nsq"})
    b = v.withColumnsRenamed({"_vid": "_b_id", "_vec": "_b_vec", "_nsq": "_b_nsq"})
    scored = (
        sym.join(a, sym.id_a == a._a_id)
        .join(b, sym.id_b == b._b_id)
        .select(
            F.col("id_a").alias("vec_id"),
            F.col("id_b").alias("neighbor_id"),
            F.round(
                dot(F.col("_a_vec"), F.col("_b_vec"))
                / F.sqrt(F.col("_a_nsq") * F.col("_b_nsq")),
                4,
            ).alias("cos4"),
        )
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cos4"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        # + 0.0 pins IEEE signed zero: a near-orthogonal pair rounds to
        # -0.0 on DuckDB but 0.0 on Spark (ordering is unaffected — the
        # zeros compare equal — but the displayed cell diverges)
        .select(
            "vec_id",
            "neighbor_id",
            (F.col("cos4") + F.lit(0.0)).alias("cosine4"),
            "rank",
        )
    )


def random_projection(
    vectors: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: dense ``dim``-d embeddings
    down to ``out_dim`` coordinates (y_j = dot(v, plane_j) / sqrt(out_dim))
    using the same md5-derived plane matrix as the LSH signatures.

    One packed-matrix transform per row — no shuffle, no Python; the
    cheap dimensionality cut that precedes clustering / ANN when 100 TB
    of full-width vectors won't fit the candidate stage. Deterministic
    planes mean two engines (and two runs) agree exactly.
    """
    planes = hyperplanes(out_dim, dim)
    mat = F.array(*[F.array(*[F.lit(x) for x in plane]) for plane in planes])
    scale = 1.0 / (out_dim ** 0.5)
    vec = _checked_dim(F.col(vec_col), dim, "random_projection")
    proj = F.transform(mat, lambda plane: F.round(dot(vec, plane) * scale, 6))
    return vectors.select(F.col(id_col).alias("vec_id"), proj.alias("projected"))


def lsh_multiprobe_pairs(
    signatures: DataFrame,
    prefix_bits: int = 8,
    probes: int = 2,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Multi-probe LSH candidates: each vector registers under its own
    prefix bucket AND the ``probes`` buckets at Hamming distance 1 (lowest
    bits flipped) — near-misses that landed one bit apart still collide,
    recovering recall that single-bucket LSH loses without adding tables.

    Still the capped single-expansion shape: explode to (1 + probes)
    bucket rows per vector, one shuffle on bucket, window cap, local pair
    expansion, then a distinct since a pair can now meet in several
    buckets. Candidate volume scales by (1 + probes), not by table count
    — the standard trade for higher recall at fixed index size.
    """
    mask = (1 << prefix_bits) - 1
    base = F.col("sig").bitwiseAND(F.lit(mask))
    bucket_list = F.array(
        base, *[base.bitwiseXOR(F.lit(1 << j)) for j in range(probes)]
    )
    bucketed = signatures.select(
        "vec_id", F.explode(bucket_list).alias("bucket")
    )
    return capped_bucket_pairs(bucketed, ["bucket"], max_bucket, dedupe=True)


def lsh_banded_pairs(
    signatures: DataFrame,
    bands: int = 4,
    band_bits: int = 4,
    max_bucket: int = 100_000,
) -> DataFrame:
    """OR-amplified LSH candidates: split the b-bit signature into
    ``bands`` disjoint ``band_bits``-bit keys; a pair is a candidate if
    it collides in ANY band (same amplification as MinHash banding).

    For moderate-similarity targets a single wide prefix is the wrong
    shape — collision probability decays exponentially in prefix bits
    (measured: 3/59 true cos>=0.4 pairs found by one 8-bit prefix).
    Banding trades candidate volume for recall with the same single
    explode -> capped bucket expansion; (band_id, key) is the bucket key,
    so all bands ride ONE shuffle.
    """
    band_exprs = []
    for j in range(bands):
        key = F.shiftright(F.col("sig"), j * band_bits).bitwiseAND(
            F.lit((1 << band_bits) - 1)
        )
        band_exprs.append(F.struct(F.lit(j).alias("band"), key.alias("key")))
    melted = signatures.select(
        "vec_id", F.explode(F.array(*band_exprs)).alias("bk")
    ).select("vec_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    return capped_bucket_pairs(melted, ["band", "key"], max_bucket, dedupe=True)


def semantic_dedup_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic dedup: prune a vector when a LOWER-id
    vector in the SAME IVF cell has cosine >= ``threshold``.

    Returns (vec_id, cell, kept). The scale contract: the pairwise pass
    is scoped to one cell (join key = centroid_id), so cost is
    sum(cell_size^2) instead of N^2 — with k cells of balanced size
    that is N^2/k, and at 100 TB the cell id doubles as the disk
    partition key so each task joins one cell locally. The all-pairs
    dd_embedding_cosine operator remains the verification tier; this is
    the linear-memory production path (cf. Abbas et al., SemDeDup —
    public method, reimplemented on DataFrame ops from scratch).
    """
    assign = ivf_assign(vectors, centroids, id_col, vec_col).select(
        "vec_id", F.col("centroid_id").alias("cell")
    )
    # ONE persisted per-vector relation carries (id, cell, vec, norm): a
    # self-join re-evaluates its input subplan per side, which would run
    # the assign pass (corpus x k dot products) three times here — twice
    # for the pairing sides, once for the output join. Persist trades one
    # materialized copy for the re-computation (ContextCleaner reclaims
    # it once the plan is unreferenced); at 100 TB the same role is
    # played by writing assign out as a cell-partitioned table before
    # the pairwise pass.
    from pyspark import StorageLevel

    from odbc2parquet_spark import cachereg

    v = cachereg.track(
        vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("v"),
            norm_sq(F.col(vec_col)).alias("vsq"),
        )
        .join(assign, "vec_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a, b = v.alias("a"), v.alias("b")
    dup_b = (
        a.join(b, (F.col("a.cell") == F.col("b.cell"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn(
            "cos4",
            F.round(
                dot(F.col("a.v"), F.col("b.v"))
                / F.sqrt(F.col("a.vsq") * F.col("b.vsq")),
                4,
            ),
        )
        .filter(F.col("cos4") >= threshold)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        v.select("vec_id", "cell")
        .join(dup_b.withColumn("dup", F.lit(True)), "vec_id", "left")
        .select("vec_id", "cell", F.coalesce(F.col("dup"), F.lit(False)).alias("pruned"))
        .withColumn("kept", ~F.col("pruned"))
        .drop("pruned")
    )



def mmr_rerank(
    vectors: DataFrame,
    queries: DataFrame,
    k_cand: int = 12,
    k_sel: int = 4,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k: greedily pick
    ``k_sel`` of the ``k_cand`` most-relevant candidates per probe, each
    step taking argmax of ``lam * rel - (1 - lam) * max_sim_to_selected``
    (Carbonell & Goldstein '98 — the standard de-redundancy re-rank for
    retrieval-augmented training-data selection).

    Scale shape: candidate generation is the broadcast-probe top-k scan
    (corpus never shuffles); then each probe's candidates COLLAPSE TO ONE
    ROW (an array of k_cand (id, rel, emb, nsq) structs) and the entire
    greedy loop runs as row-level higher-order expressions — unrolled
    into ``k_sel`` chained projections, each a fold-argmax over the
    remaining candidates with the pairwise cosine computed inline. No
    joins after the one collect_list groupBy, no windows, no UDF, no
    recomputation: the plan is scan -> shuffle(probe) -> k_sel narrow
    projections. (A join-per-step formulation measured 70 shuffle
    exchanges for the same semantics; this is the idiomatic Spark shape
    for bounded per-group iterative algorithms.) All similarities round
    to 4 decimals before any comparison so independent engines agree;
    lam = 0.5 keeps the score arithmetic exact in binary floating point.

    Emits (query_id, step, vec_id, score): step 1 score = relevance,
    later steps the MMR objective (rounded to 6).
    """
    ranked = brute_force_topk(
        vectors, queries, k=k_cand, id_col=id_col, vec_col=vec_col
    )
    cembs = ranked.join(
        vectors.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("emb"),
            norm_sq(F.col(vec_col)).alias("nsq"),
        ),
        "neighbor_id",
    )
    # one row per probe: candidates sorted by (rel DESC, id ASC) — struct
    # sort is lexicographic, so negate rel for the descending component
    cand_struct = F.struct(
        (-F.col("cosine4")).alias("nr"),
        F.col("neighbor_id").alias("c"),
        F.col("cosine4").alias("rel"),
        F.col("emb").alias("emb"),
        F.col("nsq").alias("nsq"),
    )
    per_probe = cembs.groupBy("query_id").agg(
        F.array_sort(F.collect_list(cand_struct)).alias("C")
    )

    def pair_cos(x: F.Column, s: F.Column) -> F.Column:
        return F.round(
            dot(x["emb"], s["emb"]) / F.sqrt(x["nsq"] * s["nsq"]), 4
        )

    def argmax_step(cm_col: F.Column, sel_ids: F.Column) -> F.Column:
        """Fold-argmax over candidates not yet selected, scoring from the
        CARRIED running max ``m`` — plain arithmetic, no dim-folds here.
        Returns struct(score, cand) with min-id tiebreak."""
        remaining = F.filter(
            cm_col, lambda x: ~F.array_contains(sel_ids, x["c"])
        )
        zero = F.struct(
            F.lit(-1e308).alias("score"),
            F.when(F.lit(False), F.element_at(cm_col, 1)).alias("cand"),
        )

        def merge(acc: F.Column, x: F.Column) -> F.Column:
            sx = F.round(F.lit(lam) * x["rel"] - F.lit(1 - lam) * x["m"], 6)
            better = (sx > acc["score"]) | (
                (sx == acc["score"]) & (x["c"] < acc["cand"]["c"])
            )
            return F.when(
                better, F.struct(sx.alias("score"), x.alias("cand"))
            ).otherwise(acc)

        return F.aggregate(remaining, zero, merge)

    def bump_m(cm_col: F.Column, new_sel: F.Column) -> F.Column:
        """Incremental max-sim-to-selected — the oracle's GREATEST(m,
        new_sim) recurrence: ONE pairwise cosine per candidate per step
        instead of re-scanning the whole selected set (O(k_sel·k_cand)
        dim-folds total, not O(k_sel²·k_cand))."""
        return F.transform(
            cm_col,
            lambda x: F.struct(
                x["c"].alias("c"),
                x["rel"].alias("rel"),
                x["emb"].alias("emb"),
                x["nsq"].alias("nsq"),
                F.greatest(x["m"], pair_cos(x, new_sel)).alias("m"),
            ),
        )

    df = per_probe.withColumn("sel1", F.element_at(F.col("C"), 1))
    df = df.withColumn(
        "CM1",
        F.transform(
            F.col("C"),
            lambda x: F.struct(
                x["c"].alias("c"),
                x["rel"].alias("rel"),
                x["emb"].alias("emb"),
                x["nsq"].alias("nsq"),
                pair_cos(x, F.col("sel1")).alias("m"),
            ),
        ),
    )
    df = df.withColumn("ids1", F.array(F.col("sel1")["c"]))
    outputs = [
        F.struct(
            F.lit(1).alias("step"),
            F.col("sel1")["c"].alias("vec_id"),
            F.round(F.col("sel1")["rel"], 6).alias("score"),
        )
    ]
    for t in range(2, k_sel + 1):
        df = df.withColumn(
            f"best{t}", argmax_step(F.col(f"CM{t - 1}"), F.col(f"ids{t - 1}"))
        )
        df = df.withColumn(
            f"ids{t}",
            F.concat(
                F.col(f"ids{t - 1}"), F.array(F.col(f"best{t}")["cand"]["c"])
            ),
        )
        if t < k_sel:
            df = df.withColumn(
                f"CM{t}", bump_m(F.col(f"CM{t - 1}"), F.col(f"best{t}")["cand"])
            )
        outputs.append(
            F.struct(
                F.lit(t).alias("step"),
                F.col(f"best{t}")["cand"]["c"].alias("vec_id"),
                F.col(f"best{t}")["score"].alias("score"),
            )
        )
    # exhausted steps (fewer candidates than k_sel) carry a NULL id —
    # filter on the UNCAST id so non-integer id types survive (a
    # cast('long') here silently emptied string-id outputs)
    return (
        df.select("query_id", F.explode(F.array(*outputs)).alias("o"))
        .select(
            "query_id",
            F.col("o.step").alias("step"),
            F.col("o.vec_id").alias("vec_id"),
            F.col("o.score").alias("score"),
        )
        .filter(F.col("vec_id").isNotNull())
    )


def ivf_pq_nprobe_curve(
    vectors: DataFrame,
    probes: DataFrame,
    nprobes: tuple[int, ...] = (1, 2, 4, 8),
    k_cells: int = 16,
    m: int = 8,
    k_centroids: int = 16,
    dim: int = 64,
    top_k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ top-k at SEVERAL nprobe operating points from ONE index
    build — how a real deployment sweeps the knob (the index is immutable;
    only the router's cell cutoff moves). Key identity: the candidate set
    at nprobe=p is exactly the scored set at max(nprobes) filtered to
    probe rank <= p (each corpus vector lives in one cell, so a (query,
    vec) candidate carries one well-defined cell rank). The rank-annotated
    ADC table is localCheckpointed once — bounded by candidates(max
    nprobe) ~ |probes| * N * max(nprobes)/k_cells narrow rows — and every
    operating point is a filter + per-query top-k window over those
    materialized blocks, not a rebuild. (The blocks live until the
    session drops the result; they are candidate-sized, not corpus-sized.)

    Returns (nprobe, query_id, neighbor_id, adc4, rank) — the per-point
    result contract of :func:`ivf_pq_search` with the operating point
    attached.
    """
    pmax = max(nprobes)
    cents = ivf_seed_centroids(vectors, k_cells, id_col, vec_col)
    cell = ivf_assign(vectors, cents, id_col, vec_col).select(
        "vec_id", "centroid_id"
    )
    cb = pq_codebook(vectors, m=m, k=k_centroids, dim=dim, id_col=id_col, vec_col=vec_col)
    cba = _collect_codebook(cb, m, _pq_split(dim, m))
    codes = pq_assign(
        vectors, cb, m=m, dim=dim, id_col=id_col, vec_col=vec_col, arrays=cba
    ).select("vec_id", "subspace", "code")
    qprobe = ivf_probe_cells(probes, cents, pmax, id_col, vec_col).select(
        "query_id", "centroid_id", F.col("rank").alias("prank")
    )
    lut = _pq_probe_lut(probes, cb, m, dim, id_col, vec_col, arrays=cba)
    cand = (
        cell.join(F.broadcast(qprobe), "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "prank")
    )
    scored = (
        codes.join(cand, "vec_id")
        .join(F.broadcast(lut), ["query_id", "subspace", "code"])
        .groupBy("query_id", "vec_id", "prank")
        .agg(F.sum("pd2").alias("adc_dec"))
        .localCheckpoint(eager=True)
    )
    out = None
    for p in nprobes:
        ranked = _adc_rank(
            scored.filter(F.col("prank") <= p).drop("prank"), top_k
        ).select(F.lit(p).alias("nprobe"), "query_id", "neighbor_id", "adc4", "rank")
        out = ranked if out is None else out.unionByName(ranked)
    return out
