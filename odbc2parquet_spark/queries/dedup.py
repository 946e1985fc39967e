"""Deduplication queries over ``documents`` — oracle-checked.

Thin wrappers over operators/dedup.py with fixed parameters; the DuckDB
oracles restate the full pipelines (shingling, md5 hash family, banding,
Jaccard verification) independently, so a hash match certifies every step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odbc2parquet_spark import cachereg
from odbc2parquet_spark.catalog import load_table, spread_scan
from odbc2parquet_spark.operators import dedup as D
from odbc2parquet_spark.queries import query

# shared oracle CTE: distinct 3-word shingles per document
_SHINGLES_CTE = """
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents{where}),
sh AS (
    SELECT DISTINCT doc_id AS id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
    FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
)"""


def _minhash_min(j: int) -> str:
    """Two-hash family h_j = (h1 + j*h2) mod 2^60 from one md5 per shingle
    (mirrors operators/dedup.minhash_signatures)."""
    h1 = "CAST('0x' || substring(md5(g), 1, 15) AS BIGINT)"
    h2 = "CAST('0x' || substring(md5(g), 16, 15) AS BIGINT)"
    return f"MIN(({h1} + {j} * {h2}) % {1 << 60}) AS mh{j}"


@query(
    "dd_exact",
    oracle="""
    SELECT md5(text) AS content_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
    FROM documents
    GROUP BY md5(text)
    """,
)
def dd_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one hash-groupBy (the 100 TB path — shuffle on content
    hash with map-side partial aggregation)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_duplicates(docs)


@query(
    "dd_ngram_jaccard",
    oracle="WITH "
    + _SHINGLES_CTE.format(where=" WHERE doc_id < 200")
    + """,
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS common
        FROM sh a JOIN sh b ON a.g = b.g AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT id_a, id_b, common, sa.n AS n_a, sb.n AS n_b
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE common / (sa.n + sb.n - common) >= 0.5
    """,
)
def dd_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs 3-word-shingle Jaccard on a bounded slice (quadratic —
    the verification operator, not the scale path; see dd_minhash_lsh)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return D.jaccard_pairs(D.word_shingles(docs, 3), threshold=0.5)


@query(
    "dd_minhash_signatures",
    oracle="WITH "
    + _SHINGLES_CTE.format(where="")
    + f"""
    SELECT id AS doc_id, {', '.join(_minhash_min(j) for j in range(8))}
    FROM sh GROUP BY id
    """,
)
def dd_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=8, md5 hash family) — one shuffle, k min-aggs.

    Its r11 suite median (0.14s) was a cross-query cache SUBSIDY: an
    earlier same-rep query's persisted signature subtree matched this
    lineage in the CacheManager; the round-12 spread change to
    minhash_near_duplicates altered the donor's lineage and the true
    ~1.0s standalone cost surfaced (identical on r11-close code,
    measured via worktree). spread_scan cuts the real cost instead:
    interleaved A/B (sf0.1) 0.99 -> 0.70s median, min 0.82 -> 0.62."""
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    sig = D.minhash_signatures(D.word_shingle_stream(docs, 3), num_hashes=8)
    return sig.select(F.col("id").alias("doc_id"), *[f"mh{j}" for j in range(8)])


@query(
    "dd_minhash_lsh",
    oracle="WITH "
    + _SHINGLES_CTE.format(where="")
    + f""",
    sig AS (
        SELECT id, {', '.join(_minhash_min(j) for j in range(8))}
        FROM sh GROUP BY id
    ),
    bands AS (
        SELECT id, 0 AS band, mh0 || '_' || mh1 AS key FROM sig
        UNION ALL SELECT id, 1, mh2 || '_' || mh3 FROM sig
        UNION ALL SELECT id, 2, mh4 || '_' || mh5 FROM sig
        UNION ALL SELECT id, 3, mh6 || '_' || mh7 FROM sig
    ),
    bands_capped AS (
        SELECT id, band, key FROM bands
        QUALIFY COUNT(*) OVER (PARTITION BY band, key) <= 1000
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands_capped a JOIN bands_capped b ON a.band = b.band AND a.key = b.key AND a.id < b.id
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS common
        FROM cand c
        JOIN sh a ON a.id = c.id_a
        JOIN sh b ON b.id = c.id_b AND b.g = a.g
        GROUP BY c.id_a, c.id_b
    )
    SELECT id_a, id_b, common, sa.n AS n_a, sb.n AS n_b
    FROM common
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE common / (sa.n + sb.n - common) >= 0.5
    """,
)
def dd_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup scale pipeline: shingle -> minhash -> LSH bands ->
    candidates -> exact-Jaccard verify (linear-time candidate generation)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_near_duplicates(docs, threshold=0.5)


def _simhash_bit_sums_sql(bits: int = 32) -> str:
    terms = [
        f"SUM(CASE WHEN (h & {1 << i}) != 0 THEN 1 ELSE -1 END) AS s{i}" for i in range(bits)
    ]
    return ", ".join(terms)


def _simhash_cte(bits: int = 32) -> str:
    """words -> truncated-md5 word hash -> per-bit majority -> packed sig,
    parameterized by signature width (ceil(bits/4) hex chars of md5 — the
    same rule operators.dedup.simhash applies)."""
    hexchars = (bits + 3) // 4
    return (
        f"""
    words AS (
        SELECT DISTINCT doc_id AS id, w
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE w != ''
    ),
    hashed AS (
        SELECT id, CAST('0x' || substring(md5(w), 1, {hexchars}) AS BIGINT) AS h FROM words
    ),
    sums AS (SELECT id, """
        + _simhash_bit_sums_sql(bits)
        + """ FROM hashed GROUP BY id),
    sig AS (
        SELECT id, """
        + " + ".join(f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(bits))
        + """ AS simhash FROM sums
    )"""
    )


_SIMHASH_CTE = _simhash_cte(32)


@query(
    "dd_simhash",
    oracle="WITH " + _SIMHASH_CTE + " SELECT id AS doc_id, simhash FROM sig",
)
def dd_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit unweighted SimHash per document (majority sign per bit over
    md5 word hashes) — one explode + one groupBy, no joins."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash(docs).select(F.col("id").alias("doc_id"), "simhash")


@query(
    "dd_simhash_pairs",
    oracle="WITH "
    + _SIMHASH_CTE
    + """
    SELECT a.id AS id_a, b.id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sig a JOIN sig b ON a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
)
def dd_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= 6 (all-pairs on the
    bounded doc set; the scale path buckets signature bytes first)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_near_pairs(D.simhash(docs), max_hamming=6)


@query(
    "dd_simhash_banded",
    oracle="WITH "
    + _SIMHASH_CTE
    + """,
    bands AS (
        SELECT id, simhash, t.band, (simhash >> (t.band * 8)) & 255 AS key
        FROM sig, UNNEST([0, 1, 2, 3]) AS t(band)
    ),
    bounded AS (
        SELECT * FROM bands
        QUALIFY COUNT(*) OVER (PARTITION BY band, key) <= 10000
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM bounded a JOIN bounded b
      ON a.band = b.band AND a.key = b.key AND a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dd_simhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash SCALE path: pigeonhole banding (4 bands of 8 bits; any pair
    within hamming 3 shares a bit-identical band) + hamming verify. The
    oracle encodes the SAME banded + bucket-capped (<=10000) spec the
    operator enforces, so engine and oracle agree even on a corpus with a
    degenerate hot band. Zero recall loss vs all-pairs (guaranteed by
    bands > max_hamming when no bucket caps) is pinned separately by
    tests/test_operators.test_banded_pairs_catch_identical_signatures and
    the bucket-cap-semantics unit tests. 8-bit band keys keep buckets
    sparse (256 per band); the hamming<=3 radius is the realistic
    near-dup setting (the <=6 all-pairs variant above matches ~40% of
    ALL pairs on this corpus — a threshold that loose makes any method
    output-bound)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_banded_pairs(D.simhash(docs), max_hamming=3, bits=32, bands=4)


@query(
    "dd_simhash_banded_auto",
    oracle="WITH "
    + _simhash_cte(60)
    + """,
    p AS (
        SELECT LEAST(15, GREATEST(4,
               CAST(CEIL(LOG2(COUNT(*) / 64.0)) AS INT))) AS bb
        FROM documents
    ),
    bands AS (
        SELECT id, simhash, t.band,
               (simhash >> (t.band * (SELECT bb FROM p)))
               & (CAST(POW(2, (SELECT bb FROM p)) AS BIGINT) - 1) AS key
        FROM sig, UNNEST([0, 1, 2, 3]) AS t(band)
    ),
    bounded AS (
        SELECT * FROM bands
        QUALIFY COUNT(*) OVER (PARTITION BY band, key) <= 10000
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming,
           (SELECT bb FROM p) AS band_bits
    FROM bounded a JOIN bounded b
      ON a.band = b.band AND a.key = b.key AND a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dd_simhash_banded_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash at the OCCUPANCY-DERIVED band width — the dedup twin
    of sim_lsh_auto_occupancy, closing the one finding of the round-11
    sf31 family sweep: dd_simhash_banded's FIXED 8-bit bands (256 buckets)
    emitted 574M pairs at 1.56M docs (per-band occupancy ~6,100, pairs
    quadratic in occupancy — the exact failure law SCALE.md measured for
    fixed prefix_bits). Here the signature is 60 bits (truncated-md5 word
    hash, 15 hex chars — the repo-standard wide hash) and the per-band key
    width is derived from the corpus count: bb = ceil(log2(n/64)) clamped
    [4,15], bands = 4, band keys the low 4*bb bits. The pigeonhole
    guarantee is width-independent (<=3 differing bits across 4 banded
    slices leave >=1 slice identical, wherever the other 60-4*bb bits
    land), so recall within hamming radius 3 stays exact while bucket
    count scales with the corpus: sf0.01 derives bb=4, sf0.1 7, sf31 15
    (32k buckets/band, ~48 docs each — linear pair growth restored).
    Hamming verifies over the full 60-bit signature; the emitted
    ``band_bits`` column pins the derivation cross-engine."""
    from odbc2parquet_spark.operators.similarity import derived_prefix_bits

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    bb = derived_prefix_bits(n, target_occupancy=64, min_bits=4, max_bits=15)
    pairs = D.simhash_banded_pairs(
        D.simhash(docs, bits=60), max_hamming=3, bits=4 * bb, bands=4
    )
    return pairs.withColumn("band_bits", F.lit(bb))


@query(
    "dd_embedding_cosine",
    oracle="""
    WITH n AS (
        SELECT vec_id,
               list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nsq,
               embedding
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / SQRT(a.nsq * b.nsq), 4) AS cosine4
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE ROUND(
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / SQRT(a.nsq * b.nsq), 4) >= 0.4
    """,
)
def dd_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: pairs with cosine >= 0.4 (rounded to 4 decimals
    so independent engines agree bit-for-bit; emitted as DOUBLE on both
    sides — a DECIMAL output column would hash-diverge in pandas-based
    canonicalizers that render DuckDB decimals as float64). All-pairs here;
    the scale path is sim_lsh_* bucketing."""
    from odbc2parquet_spark.operators.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine4", F.round(cosine(F.col("ea"), F.col("eb")), 4))
        .filter(F.col("cosine4") >= 0.4)
        .select("id_a", "id_b", "cosine4")
    )


# Shared by dd_dup_clusters (min-label propagation) and
# dd_dup_clusters_star (large-star/small-star): both must reproduce the
# recursive-CTE fixpoint exactly.
_CLUSTERS_ORACLE = """
    WITH RECURSIVE n AS (
        SELECT vec_id,
               list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nsq,
               embedding
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE ROUND(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                    / SQRT(a.nsq * b.nsq), 4) >= 0.4
    ),
    sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    cc(id, label) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT s.dst, c.label FROM cc c JOIN sym s ON s.src = c.id
    )
    SELECT id, MIN(label) AS cluster_id, (id = MIN(label)) AS is_canonical
    FROM cc GROUP BY id
    """


@query("dd_dup_clusters", oracle=_CLUSTERS_ORACLE)
def dd_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> duplicate CLUSTERS via iterative min-label
    propagation (operators/graph.connected_components) with min-id keeper
    marking. The oracle recomputes components with a recursive CTE — two
    utterly different fixpoint engines must agree on every label."""
    from odbc2parquet_spark.operators.graph import duplicate_clusters

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dd_embedding_cosine(spark, sf_dir).select("id_a", "id_b")
    nodes = emb.select(F.col("vec_id").alias("id"))
    return duplicate_clusters(nodes, pairs)


@query("dd_dup_clusters_star", oracle=_CLUSTERS_ORACLE)
def dd_dup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clusters via large-star/small-star contraction
    (operators/graph.connected_components_star) — the O(log n)-round scale
    path for deep pair graphs; must match the recursive-CTE oracle label
    for label."""
    from odbc2parquet_spark.operators.graph import duplicate_clusters

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dd_embedding_cosine(spark, sf_dir).select("id_a", "id_b")
    nodes = emb.select(F.col("vec_id").alias("id"))
    return duplicate_clusters(nodes, pairs, algorithm="star")


@query(
    "dd_incremental_exact",
    oracle="""
    WITH existing AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 250),
    batch AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id >= 250),
    keepers AS (
        SELECT b.doc_id FROM batch b
        JOIN (SELECT h, MIN(doc_id) AS doc_id FROM batch GROUP BY h) k
          ON b.doc_id = k.doc_id AND b.h = k.h
    )
    SELECT b.doc_id FROM batch b
    JOIN keepers USING (doc_id)
    WHERE b.h NOT IN (SELECT h FROM existing)
    """,
)
def dd_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: batch (doc_id >= 250) against the
    existing corpus's hash index (doc_id < 250) — within-batch keep-first,
    then one anti-join against the index; the corpus never rescans."""
    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") < 250)
    batch = docs.filter(F.col("doc_id") >= 250)
    return D.incremental_exact_dedup(batch, existing).select("doc_id")


_SIMHASH_WEIGHTED_CTE = (
    """
    words AS (
        SELECT doc_id AS id, w
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE w != ''
    ),
    hashed AS (
        SELECT id, CAST('0x' || substring(md5(w), 1, 8) AS BIGINT) AS h FROM words
    ),
    sums AS (SELECT id, """
    + _simhash_bit_sums_sql()
    + """ FROM hashed GROUP BY id),
    sig AS (
        SELECT id, """
    + " + ".join(f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(32))
    + """ AS simhash FROM sums
    )"""
)


@query(
    "dd_simhash_weighted",
    oracle="WITH " + _SIMHASH_WEIGHTED_CTE + " SELECT id AS doc_id, simhash FROM sig",
)
def dd_simhash_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-weighted SimHash (every token votes, not distinct types) —
    template-heavy near-dups keep closer signatures than the unweighted
    variant."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_weighted(docs).select(F.col("id").alias("doc_id"), "simhash")


@query(
    "dd_streaming_dedup",
    oracle="SELECT DISTINCT md5(text) AS content_hash FROM documents",
)
def dd_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch dual of streaming/transfer.streaming_exact_dedup: the
    surviving content-hash set after keep-first dedup. Which physical row
    wins dropDuplicates is arrival-order-dependent (and unordered in
    batch), but the distinct hash SET is identical either way — that set
    is what the oracle certifies."""
    from odbc2parquet_spark.streaming.transfer import streaming_exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    return streaming_exact_dedup(docs).select("content_hash")


@query(
    "dd_repeated_ngrams",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    g AS (
        SELECT doc_id,
               substring(md5(array_to_string(list_slice(ws, i, i + 7), ' ')), 1, 16) AS g
        FROM w, UNNEST(generate_series(1, len(ws) - 7)) AS t(i)
        WHERE len(ws) >= 8
    ),
    d AS (SELECT g FROM g GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
    tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM g GROUP BY doc_id),
    dup AS (
        SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_grams
        FROM g JOIN d ON g.g = d.g
        GROUP BY g.doc_id
    )
    SELECT doc.doc_id,
           CAST(COALESCE(tot.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(dup.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
           ROUND(CAST(COALESCE(dup.n_dup_grams, 0) AS DOUBLE)
                 / CAST(GREATEST(COALESCE(tot.n_grams, 0), 1) AS DOUBLE), 4) AS dup_frac
    FROM documents doc
    LEFT JOIN tot ON doc.doc_id = tot.doc_id
    LEFT JOIN dup ON doc.doc_id = dup.doc_id
    """,
)
def dd_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication: per-document count/fraction of 8-gram
    occurrences shared with at least one OTHER document
    (operators/dedup.repeated_ngram_stats — the Lee et al. repeated-span
    signal that document-level MinHash/SimHash misses)."""
    # spread_scan: the 8-gram explode + md5 stage is scan-task-pinned
    # JVM CPU; round-12 interleaved A/B (sf0.1): 2.37 -> 1.74s median
    # (1.37x), min 2.31 -> 1.63. No-op on any multi-split corpus.
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    return D.repeated_ngram_stats(docs, n=8, min_docs=2)


@query(
    "dd_incremental_minhash",
    oracle="WITH "
    + _SHINGLES_CTE.format(where="")
    + f""",
    sig AS (
        SELECT id, {', '.join(_minhash_min(j) for j in range(8))}
        FROM sh GROUP BY id
    ),
    bands AS (
        SELECT id, 0 AS band, mh0 || '_' || mh1 AS key FROM sig
        UNION ALL SELECT id, 1, mh2 || '_' || mh3 FROM sig
        UNION ALL SELECT id, 2, mh4 || '_' || mh5 FROM sig
        UNION ALL SELECT id, 3, mh6 || '_' || mh7 FROM sig
    ),
    bands_capped AS (
        SELECT id, band, key FROM bands
        QUALIFY COUNT(*) OVER (PARTITION BY band, key) <= 1000
    ),
    cand AS (
        SELECT DISTINCT b.id AS new_id, a.id AS old_id
        FROM bands_capped a JOIN bands_capped b ON a.band = b.band AND a.key = b.key
        WHERE a.id < 250 AND b.id >= 250
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    common AS (
        SELECT c.new_id, c.old_id, COUNT(*) AS common
        FROM cand c
        JOIN sh x ON x.id = c.new_id
        JOIN sh y ON y.id = c.old_id AND y.g = x.g
        GROUP BY c.new_id, c.old_id
    ),
    dropped AS (
        SELECT DISTINCT common.new_id
        FROM common
        JOIN sizes sa ON sa.id = common.new_id
        JOIN sizes sb ON sb.id = common.old_id
        WHERE common / (sa.n + sb.n - common) >= 0.5
    )
    SELECT doc_id FROM documents
    WHERE doc_id >= 250 AND doc_id NOT IN (SELECT new_id FROM dropped)
    """,
)
def dd_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion near-dup gate (operators/dedup.incremental_minhash_dedup):
    docs >= 250 arrive as a batch against the < 250 corpus; survivors have
    no verified MinHash near-dup in the corpus. At scale the corpus side
    is a stored band-key index — per-batch cost scales with the batch."""
    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") < 250)
    batch = docs.filter(F.col("doc_id") >= 250)
    return D.incremental_minhash_dedup(existing, batch, threshold=0.5)


@query(
    "dd_keep_best",
    oracle=f"""
    SELECT cluster_id, keep_id, keep_quality, cluster_size,
           cluster_size - 1 AS n_dropped
    FROM (
        SELECT c.cluster_id, c.id AS keep_id, d.n_chars AS keep_quality,
               COUNT(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
               ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                  ORDER BY d.n_chars DESC, c.id ASC) AS rn
        FROM ({_CLUSTERS_ORACLE}) c
        JOIN documents d ON c.id = d.doc_id
    ) ranked
    WHERE rn = 1
    """,
)
def dd_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best retention after clustering: within each semantic near-dup
    cluster elect the LONGEST document (tiebreak min id) as the canonical
    survivor — the curation policy that replaces min-id keep-first. One
    join + one struct-max aggregation (no per-cluster sort); the oracle
    re-derives the same winners with a rank window over the recursive-CTE
    clusters."""
    from odbc2parquet_spark.operators.graph import duplicate_clusters, canonical_representatives

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dd_embedding_cosine(spark, sf_dir).select("id_a", "id_b")
    nodes = emb.select(F.col("vec_id").alias("id"))
    clusters = duplicate_clusters(nodes, pairs)
    quality = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), F.col("n_chars").alias("quality")
    )
    return canonical_representatives(clusters, quality).select(
        "cluster_id", "keep_id",
        F.col("keep_quality").cast("long").alias("keep_quality"),
        "cluster_size", "n_dropped",
    )


_MINHASH_EDGES_CTES = (
    _SHINGLES_CTE.format(where="")
    + f""",
    sig AS (
        SELECT id, {', '.join(_minhash_min(j) for j in range(8))}
        FROM sh GROUP BY id
    ),
    bands AS (
        SELECT id, 0 AS band, mh0 || '_' || mh1 AS key FROM sig
        UNION ALL SELECT id, 1, mh2 || '_' || mh3 FROM sig
        UNION ALL SELECT id, 2, mh4 || '_' || mh5 FROM sig
        UNION ALL SELECT id, 3, mh6 || '_' || mh7 FROM sig
    ),
    bands_capped AS (
        SELECT id, band, key FROM bands
        QUALIFY COUNT(*) OVER (PARTITION BY band, key) <= 1000
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands_capped a JOIN bands_capped b ON a.band = b.band AND a.key = b.key AND a.id < b.id
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS common
        FROM cand c
        JOIN sh a ON a.id = c.id_a
        JOIN sh b ON b.id = c.id_b AND b.g = a.g
        GROUP BY c.id_a, c.id_b
    ),
    verified AS (
        SELECT id_a, id_b
        FROM common
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE common / (sa.n + sb.n - common) >= 0.5
    )"""
)


@query(
    "dd_keep_best_minhash",
    oracle="WITH RECURSIVE "
    + _MINHASH_EDGES_CTES
    + """,
    sym AS (SELECT id_a AS src, id_b AS dst FROM verified
            UNION SELECT id_b, id_a FROM verified),
    cc(id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT s.dst, c.label FROM cc c JOIN sym s ON s.src = c.id
    ),
    lab AS (SELECT id, MIN(label) AS cluster_id FROM cc GROUP BY id)
    SELECT cluster_id, keep_id, keep_quality, cluster_size,
           cluster_size - 1 AS n_dropped
    FROM (
        SELECT l.cluster_id, l.id AS keep_id, d.n_chars AS keep_quality,
               COUNT(*) OVER (PARTITION BY l.cluster_id) AS cluster_size,
               ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                                  ORDER BY d.n_chars DESC, l.id ASC) AS rn
        FROM lab l JOIN documents d ON l.id = d.doc_id
    ) ranked
    WHERE rn = 1
    """,
)
def dd_keep_best_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-PATH keep-best retention: near-dup edges from the
    MinHash+LSH pipeline (linear candidate generation, no all-pairs),
    clustered, then one struct-max aggregation electing the longest doc
    per cluster. This is the composition a 100 TB curation run actually
    executes; dd_keep_best (cosine edges) is its verification twin."""
    from odbc2parquet_spark.operators.graph import duplicate_clusters, canonical_representatives

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_duplicates(docs, threshold=0.5).select("id_a", "id_b")
    nodes = docs.select(F.col("doc_id").alias("id"))
    clusters = duplicate_clusters(nodes, pairs)
    quality = docs.select(F.col("doc_id").alias("id"), F.col("n_chars").alias("quality"))
    return canonical_representatives(clusters, quality).select(
        "cluster_id", "keep_id",
        F.col("keep_quality").cast("long").alias("keep_quality"),
        "cluster_size", "n_dropped",
    )


@query(
    "dd_bloom_gate",
    oracle="""
    WITH hashes AS (
        SELECT doc_id, md5(text) AS h FROM documents
    ),
    pos AS (
        SELECT doc_id,
               (CAST('0x' || substring(h, 1, 15) AS BIGINT)
                + j * CAST('0x' || substring(h, 16, 15) AS BIGINT)) % 4096 AS p
        FROM hashes, UNNEST(generate_series(0, 2)) AS t(j)
    ),
    bloom AS (
        SELECT p // 32 AS word, BIT_OR(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS bits
        FROM pos WHERE doc_id < 250
        GROUP BY p // 32
    ),
    probe AS (
        SELECT pos.doc_id, pos.p,
               CASE WHEN b.bits IS NOT NULL
                     AND (b.bits & (CAST(1 AS BIGINT) << CAST(pos.p % 32 AS INTEGER)))
                         = (CAST(1 AS BIGINT) << CAST(pos.p % 32 AS INTEGER))
                    THEN 1 ELSE 0 END AS set_
        FROM pos LEFT JOIN bloom b ON b.word = pos.p // 32
        WHERE pos.doc_id >= 250
    )
    SELECT doc_id, MIN(set_) = 1 AS maybe_dup
    FROM probe GROUP BY doc_id
    """,
)
def dd_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter ingestion gate: the corpus half (doc_id < 250) builds
    a 4096-bit filter as a distributed bit_or bitset (128 longs total);
    the batch half (doc_id >= 250) probes it without touching the corpus.
    No false negatives by construction; the deterministic md5 two-hash
    family means even the false positives hash-match across engines."""
    docs = load_table(spark, sf_dir, "documents")
    bloom = D.bloom_build(docs.filter(F.col("doc_id") < 250))
    return D.bloom_probe(docs.filter(F.col("doc_id") >= 250), bloom)


@query(
    "dd_containment",
    oracle="WITH "
    + _SHINGLES_CTE.format(where=" WHERE doc_id < 200")
    + """,
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS common
        FROM sh a JOIN sh b ON a.g = b.g AND a.id != b.id
        GROUP BY a.id, b.id
    )
    SELECT id_a, id_b, common, sa.n AS n_a,
           ROUND(common / sa.n, 6) AS containment
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    WHERE common / sa.n >= 0.8
    """,
)
def dd_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup: shingle containment |A∩B| / |A| >= 0.8 flags
    documents SUBSUMED by another (quotes, excerpts, page-of-a-larger-doc)
    that symmetric Jaccard misses when sizes differ. Directed pairs on a
    bounded slice (verification tier, like dd_ngram_jaccard); at scale the
    same score runs on LSH candidates."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sh = D.word_shingles(docs, 3)
    sizes = sh.groupBy(F.col("id").alias("s_id")).agg(F.count("*").alias("n"))
    a = sh.select(F.col("id").alias("id_a"), "g")
    b = sh.select(F.col("id").alias("id_b"), F.col("g").alias("g_b"))
    inter = (
        a.join(b, (a.g == b.g_b) & (F.col("id_a") != F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        inter.join(sizes, inter.id_a == sizes.s_id)
        .withColumn("containment", F.round(F.col("common") / F.col("n"), 6))
        .filter(F.col("common") / F.col("n") >= 0.8)
        .select("id_a", "id_b", "common", F.col("n").alias("n_a"), "containment")
    )


@query(
    "dd_containment_lsh",
    oracle="WITH "
    + _MINHASH_EDGES_CTES.replace("verified AS", "jacc_unused AS")
    + """,
    directed AS (
        SELECT id_a, id_b, common FROM common
        UNION ALL SELECT id_b, id_a, common FROM common
    )
    SELECT d.id_a, d.id_b, d.common, s.n AS n_a,
           ROUND(d.common / s.n, 6) AS containment
    FROM directed d
    JOIN sizes s ON s.id = d.id_a
    WHERE d.common / s.n >= 0.8
    """,
)
def dd_containment_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-PATH containment detector: candidates come from the
    MinHash+LSH bands (linear generation), then the directed containment
    score |A∩B|/|A| >= 0.8 flags subsumed documents in BOTH directions of
    each candidate pair. dd_containment (bounded all-pairs) is its
    verification twin. Note the recall caveat: LSH bands target Jaccard,
    which under-recalls very asymmetric containment (a tiny doc inside a
    huge one has low Jaccard) — at scale pair this with the repeated
    n-gram span stats for the asymmetric tail."""
    docs = load_table(spark, sf_dir, "documents")
    sh = D.word_shingles(docs, 3)
    # signatures from the NON-distinct shingle stream (min over a multiset
    # equals min over its set) — the distinct set `sh` is needed only for
    # the set-semantics containment arithmetic below
    sig = D.minhash_signatures(D.word_shingle_stream(docs, 3), num_hashes=8)
    cand = D.lsh_candidate_pairs(sig, bands=4, rows_per_band=2)
    sizes = sh.groupBy(F.col("id").alias("s_id")).agg(F.count("*").alias("n"))
    a = sh.select(F.col("id").alias("ca"), F.col("g").alias("g_a"))
    b = sh.select(F.col("id").alias("cb"), F.col("g").alias("g_b"))
    # The directed union below references `common` twice, so the
    # signature + banding + double shingle-join subtree is evaluated
    # once per direction. An eager localCheckpoint of the pair-sized
    # table was A/B'd in round 11 and LOST (standalone median 2.65s ->
    # 3.37s): the two branches overlap across cores inside one job,
    # while the checkpoint serializes subtree-then-union and pays the
    # materialization. Contrast q_entity_resolution, where the SAME
    # move won — there the subtree fanned out 5+ ways into a fixpoint
    # loop; a 2-way union is cheaper recomputed.
    common = (
        cand.join(a, cand.id_a == a.ca)
        .join(b, (cand.id_b == b.cb) & (F.col("g_a") == b.g_b))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    directed = common.unionByName(
        common.select(
            F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "common"
        )
    )
    return (
        directed.join(sizes, directed.id_a == sizes.s_id)
        .withColumn("containment", F.round(F.col("common") / F.col("n"), 6))
        .filter(F.col("common") / F.col("n") >= 0.8)
        .select("id_a", "id_b", "common", F.col("n").alias("n_a"), "containment")
    )


@query(
    "dd_span_scrub",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    tok AS (
        SELECT doc_id, i - 1 AS pos, ws[i] AS w
        FROM w, UNNEST(generate_series(1, len(ws))) AS t(i)
    ),
    gr AS (
        SELECT doc_id, i - 1 AS pos,
               substring(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                             || ws[i+3] || ' ' || ws[i+4]), 1, 16) AS g
        FROM w, UNNEST(generate_series(1, len(ws) - 4)) AS t(i)
        WHERE i - 1 < 2097152
    ),
    occ AS (
        SELECT doc_id, pos, g,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
        FROM gr
    ),
    dup AS (SELECT g FROM gr GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
    rm AS (
        SELECT DISTINCT occ.doc_id, occ.pos + k AS rm_pos
        FROM occ JOIN dup USING (g), UNNEST(generate_series(0, 4)) AS t(k)
        WHERE rn >= 2
    ),
    kept AS (
        SELECT tok.doc_id, tok.pos, tok.w
        FROM tok LEFT JOIN rm ON tok.doc_id = rm.doc_id AND tok.pos = rm.rm_pos
        WHERE rm.doc_id IS NULL
    ),
    ka AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               md5(string_agg(w, ' ' ORDER BY pos)) AS h
        FROM kept GROUP BY doc_id
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_tokens FROM tok GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(tot.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(tot.n_tokens, 0) - COALESCE(ka.n_kept, 0) AS BIGINT)
               AS n_removed,
           COALESCE(ka.h, md5('')) AS scrubbed_hash
    FROM documents d
    LEFT JOIN tot ON d.doc_id = tot.doc_id
    LEFT JOIN ka ON d.doc_id = ka.doc_id
    """,
)
def dd_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-span REMOVAL with document reassembly
    (operators/dedup.span_scrub): every 5-gram seen in >= 2 docs keeps only
    its globally-first occurrence; later occurrences' tokens are scrubbed
    and the hash of each surviving token sequence is emitted."""
    docs = load_table(spark, sf_dir, "documents")
    return D.span_scrub(docs, n=5)


@query(
    "dd_lsh_recall",
    oracle="WITH "
    + _SHINGLES_CTE.format(where="")
    + f""",
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS common
        FROM sh a JOIN sh b ON a.g = b.g AND a.id < b.id
        GROUP BY a.id, b.id
    ),
    truth AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE common / (sa.n + sb.n - common) >= 0.5
    ),
    sig AS (
        SELECT id, {', '.join(_minhash_min(j) for j in range(8))}
        FROM sh GROUP BY id
    ),
    bands AS (
        SELECT id, 0 AS band, mh0 || '_' || mh1 AS key FROM sig
        UNION ALL SELECT id, 1, mh2 || '_' || mh3 FROM sig
        UNION ALL SELECT id, 2, mh4 || '_' || mh5 FROM sig
        UNION ALL SELECT id, 3, mh6 || '_' || mh7 FROM sig
    ),
    bands_capped AS (
        SELECT id, band, key FROM bands
        QUALIFY COUNT(*) OVER (PARTITION BY band, key) <= 1000
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands_capped a
        JOIN bands_capped b ON a.band = b.band AND a.key = b.key AND a.id < b.id
    ),
    hit AS (SELECT t.id_a, t.id_b FROM truth t JOIN cand c
            ON c.id_a = t.id_a AND c.id_b = t.id_b)
    SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
           CAST((SELECT COUNT(*) FROM hit) AS BIGINT) AS n_found,
           ROUND(CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
                 / GREATEST((SELECT COUNT(*) FROM truth), 1), 4) AS recall
    """,
)
def dd_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured candidate recall of the MinHash-LSH banding (4 bands x 2
    rows) against the exact all-pairs Jaccard >= 0.5 ground truth — the
    dedup twin of sim_candidate_recall. The all-pairs side is the bounded
    VERIFICATION operator (oracle-scale only); the banding side is the
    linear scale path whose recall this certifies."""
    sh = D.word_shingles(docs := load_table(spark, sf_dir, "documents"), 3)
    truth = D.jaccard_pairs(sh, threshold=0.5).select("id_a", "id_b")
    sig = D.minhash_signatures(D.word_shingle_stream(docs, 3), num_hashes=8)
    cand = D.lsh_candidate_pairs(sig, bands=4, rows_per_band=2).select(
        "id_a", "id_b"
    )
    hit = truth.join(cand, ["id_a", "id_b"], "left_semi")
    n_true = truth.agg(F.count("*").cast("long").alias("n_true"))
    n_found = hit.agg(F.count("*").cast("long").alias("n_found"))
    return n_true.crossJoin(n_found).select(
        "n_true",
        "n_found",
        F.round(
            F.col("n_found").cast("double")
            / F.greatest(F.col("n_true"), F.lit(1)),
            4,
        ).alias("recall"),
    )


@query(
    "dd_group_split",
    oracle="WITH RECURSIVE "
    + _SHINGLES_CTE.format(where="").lstrip()
    + f""",
    sig AS (
        SELECT id, {', '.join(_minhash_min(j) for j in range(8))}
        FROM sh GROUP BY id
    ),
    bands AS (
        SELECT id, 0 AS band, mh0 || '_' || mh1 AS key FROM sig
        UNION ALL SELECT id, 1, mh2 || '_' || mh3 FROM sig
        UNION ALL SELECT id, 2, mh4 || '_' || mh5 FROM sig
        UNION ALL SELECT id, 3, mh6 || '_' || mh7 FROM sig
    ),
    bands_capped AS (
        SELECT id, band, key FROM bands
        QUALIFY COUNT(*) OVER (PARTITION BY band, key) <= 1000
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands_capped a
        JOIN bands_capped b ON a.band = b.band AND a.key = b.key AND a.id < b.id
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS common
        FROM cand c
        JOIN sh a ON a.id = c.id_a
        JOIN sh b ON b.id = c.id_b AND b.g = a.g
        GROUP BY c.id_a, c.id_b
    ),
    dup_pairs AS (
        SELECT id_a, id_b FROM common
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE common / (sa.n + sb.n - common) >= 0.5
    ),
    sym AS (SELECT id_a AS src, id_b AS dst FROM dup_pairs
            UNION SELECT id_b, id_a FROM dup_pairs),
    cc(id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT s.dst, c.label FROM cc c JOIN sym s ON s.src = c.id
    ),
    clusters AS (SELECT id, MIN(label) AS cluster_id FROM cc GROUP BY id)
    SELECT c.id AS doc_id, c.cluster_id,
           CASE WHEN CAST('0x' || substring(md5(CAST(c.cluster_id AS VARCHAR)),
                                            1, 15) AS BIGINT) % 10 < 9
                THEN 'train' ELSE 'val' END AS split
    FROM clusters c
    """,
)
def dd_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split: near-dup CLUSTERS (MinHash-LSH pairs
    -> connected components), then a deterministic hash split keyed on
    the CLUSTER id — every near-duplicate lands on the same side, so the
    eval set cannot contain paraphrases of training documents (the
    contamination mode a doc-level split misses). 90/10 by md5 of the
    cluster label; the oracle recomputes pipeline + components + split
    end-to-end."""
    from odbc2parquet_spark.operators.graph import duplicate_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_duplicates(docs, threshold=0.5).select("id_a", "id_b")
    clusters = duplicate_clusters(
        docs.select(F.col("doc_id").alias("id")), pairs
    )
    h = F.conv(
        F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    return clusters.select(
        F.col("id").alias("doc_id"),
        "cluster_id",
        F.when(h % 10 < 9, F.lit("train")).otherwise(F.lit("val")).alias("split"),
    )


@query(
    "dd_boundary_overlap",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x != '') AS w
        FROM documents
    ),
    hb AS (
        SELECT doc_id,
               array_to_string(w[1:3], ' ') AS head3,
               array_to_string(w[-3:], ' ') AS tail3
        FROM t WHERE len(w) >= 6
    )
    SELECT a.doc_id AS src_id, b.doc_id AS dst_id, a.tail3 AS boundary
    FROM hb a JOIN hb b ON a.tail3 = b.head3 AND a.doc_id <> b.doc_id
    ORDER BY src_id, dst_id
    """,
)
def dd_boundary_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-boundary duplication: document pairs where one doc's last
    3 tokens equal another's first 3 — the signature of a single source
    document split across ingestion shards (each half passes exact and
    MinHash dedup because neither contains the other). Scale shape: the
    corpus collapses to one (head-key, tail-key) row per doc, and the
    pair generation is an EQUI-join on the 3-token boundary key — no
    similarity scan, no quadratic shape; skewed boundary keys (boilerplate
    openings) would surface as hot join keys and are exactly what the
    operator is meant to expose."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    hb = docs.select(
        "doc_id",
        F.concat_ws(" ", F.slice(w, 1, 3)).alias("head3"),
        F.concat_ws(" ", F.slice(w, -3, 3)).alias("tail3"),
        F.size(w).alias("nw"),
    ).filter(F.col("nw") >= 6)
    a = hb.select(F.col("doc_id").alias("src_id"), F.col("tail3").alias("boundary"))
    b = hb.select(F.col("doc_id").alias("dst_id"), F.col("head3").alias("boundary"))
    return (
        a.join(b, "boundary")
        .filter(F.col("src_id") != F.col("dst_id"))
        .select("src_id", "dst_id", "boundary")
        .orderBy("src_id", "dst_id")
    )


@query(
    "dd_prefix_jaccard",
    oracle="WITH "
    + _SHINGLES_CTE.format(where="")
    + """,
    shh AS (
        SELECT DISTINCT id,
               CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) AS gh
        FROM sh
    ),
    dftab AS (SELECT gh, COUNT(*) AS df FROM shh GROUP BY gh),
    sized AS (
        SELECT id, gh,
               ROW_NUMBER() OVER (PARTITION BY id ORDER BY df, gh) AS rn,
               COUNT(*) OVER (PARTITION BY id) AS sz
        FROM shh JOIN dftab USING (gh)
    ),
    prefix AS (
        SELECT id, gh, sz, rn FROM sized WHERE rn <= sz - (3 * sz + 4) // 5 + 1
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM prefix a JOIN prefix b ON a.gh = b.gh AND a.id < b.id
        WHERE 5 * b.sz >= 3 * a.sz AND 5 * a.sz >= 3 * b.sz
          AND 1 + LEAST(a.sz - a.rn, b.sz - b.rn)
              >= (3 * (a.sz + b.sz) + 7) // 8
    ),
    inter AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
        FROM cand c
        JOIN shh ta ON ta.id = c.id_a
        JOIN shh tb ON tb.id = c.id_b AND tb.gh = ta.gh
        GROUP BY c.id_a, c.id_b
    ),
    szs AS (SELECT id, COUNT(*) AS sz FROM shh GROUP BY id)
    SELECT i.id_a, i.id_b, CAST(n_inter AS BIGINT) AS n_inter,
           ROUND(CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter), 6)
               AS jaccard
    FROM inter i
    JOIN szs sa ON sa.id = i.id_a
    JOIN szs sb ON sb.id = i.id_b
    WHERE ROUND(CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter), 6) >= 0.6
    """,
)
def dd_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-word-shingle Jaccard >= 0.6 self-join by prefix filtering
    (operators/dedup.prefix_jaccard_pairs, PPJoin family) over the FULL
    corpus: recall 1.0 with NO all-pairs shape — candidates come only
    from equi-joins on each doc's rarest df-ranked prefix shingles, the
    buckets that stay small by construction. The exact complement to the
    probabilistic MinHash path (dd_minhash_lsh, same shingle stream,
    same threshold regime): zero miss rate, for corpora where a
    contractual no-missed-duplicates bound matters. Contrast
    dd_ngram_jaccard, whose all-pairs verify shape needs a doc_id < 200
    slice — this one runs unsliced."""
    from odbc2parquet_spark.operators.dedup import prefix_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    return prefix_jaccard_pairs(D.word_shingles(docs, 3), threshold=0.6)


@query(
    "dd_soft_dedup",
    oracle="""
    WITH nf AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
                   AS norm_hash
        FROM documents
    ),
    grp AS (
        SELECT norm_hash, COUNT(*) AS group_size, MIN(doc_id) AS group_id
        FROM nf GROUP BY norm_hash
    )
    SELECT n.doc_id, g.group_id, g.group_size,
           ROUND(CAST(1 AS DOUBLE) / g.group_size, 6) AS weight
    FROM nf n JOIN grp g ON g.norm_hash = n.norm_hash
    """,
)
def dd_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication: instead of DROPPING duplicates, every document
    keeps a training weight of 1/group_size over its exact-duplicate
    group (normal-form hash), so duplicated content contributes the same
    total gradient mass as a unique document — the down-weighting
    alternative (SoftDedup) to hard removal when near-duplicate text still
    carries signal. One hash-keyed groupBy + one hash-keyed join back;
    rides the dd_exact shuffle shape at 100 TB. Weight is a single IEEE
    division of exact integers, rounded to 6."""
    from odbc2parquet_spark.operators.text import dedup_normal_form

    docs = load_table(spark, sf_dir, "documents")
    nf = docs.select(
        "doc_id", F.md5(dedup_normal_form("text")).alias("norm_hash")
    )
    grp = nf.groupBy("norm_hash").agg(
        F.count("*").alias("group_size"), F.min("doc_id").alias("group_id")
    )
    return nf.join(grp, "norm_hash").select(
        "doc_id",
        "group_id",
        "group_size",
        F.round(F.lit(1).cast("double") / F.col("group_size"), 6).alias(
            "weight"
        ),
    )


@query(
    "dd_cdc_chunks",
    oracle="""
    WITH w AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ws
        FROM documents
    ),
    tok AS (
        SELECT doc_id, i AS pos, ws[i] AS w
        FROM w, UNNEST(generate_series(1, len(ws))) AS t(i)
    ),
    b AS (
        SELECT doc_id, pos, w,
               CASE WHEN CAST('0x' || substring(md5(w), 1, 15) AS BIGINT)
                         % 16 = 0
                    THEN 1 ELSE 0 END AS bd
        FROM tok
    ),
    c AS (
        SELECT doc_id, pos, w,
               COALESCE(SUM(bd) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS chunk_id
        FROM b
    ),
    ch AS (
        SELECT doc_id, chunk_id,
               md5(string_agg(w, ' ' ORDER BY pos)) AS chunk_hash
        FROM c GROUP BY doc_id, chunk_id
    )
    SELECT chunk_hash, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ,
           MIN(doc_id) AS first_doc
    FROM ch GROUP BY chunk_hash
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def dd_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup at token granularity: a token whose
    md5 is 0 mod 16 ENDS a chunk (so boundaries move with content, not
    offsets — the CDC property that makes chunk identity survive
    insertions, unlike fixed-size blocks), chunk identity is the md5 of
    its token run, and the output is every chunk shared by >= 2
    documents with occurrence counts. This catches partially-copied
    documents that whole-doc hashing misses at sub-document resolution.
    Scale shape: boundary flags are a scan; chunk assembly is ONE
    doc-keyed window + groupBy (doc-local, no corpus-wide shuffle by
    content); the cross-doc share count is one chunk-hash-keyed groupBy
    — expected chunk length is geometric (mean 16 tokens), so rows
    entering it are ~n_tokens/16."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    from odbc2parquet_spark.operators.text import words

    tok = docs.select(
        "doc_id", F.posexplode(words(F.col("text"))).alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    bd = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10).cast("long") % 16
        == 0
    ).cast("long")
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = tok.withColumn(
        "chunk_id", F.coalesce(F.sum(bd).over(win), F.lit(0))
    )
    ch = (
        c.groupBy("doc_id", "chunk_id")
        .agg(
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "w"))
                        ),
                        lambda s: s.getField("w"),
                    ),
                )
            ).alias("chunk_hash")
        )
    )
    return (
        ch.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occ"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "dd_minhash_estimate",
    oracle="WITH "
    + _SHINGLES_CTE.format(where="")
    + f""",
    sig AS (
        SELECT id, {', '.join(_minhash_min(j) for j in range(8))}
        FROM sh GROUP BY id
    ),
    bands AS (
        SELECT id, 0 AS band, mh0 || '_' || mh1 AS key FROM sig
        UNION ALL SELECT id, 1, mh2 || '_' || mh3 FROM sig
        UNION ALL SELECT id, 2, mh4 || '_' || mh5 FROM sig
        UNION ALL SELECT id, 3, mh6 || '_' || mh7 FROM sig
    ),
    bands_capped AS (
        SELECT id, band, key FROM bands
        QUALIFY COUNT(*) OVER (PARTITION BY band, key) <= 1000
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands_capped a
        JOIN bands_capped b ON a.band = b.band AND a.key = b.key
                           AND a.id < b.id
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS common
        FROM cand c
        JOIN sh a ON a.id = c.id_a
        JOIN sh b ON b.id = c.id_b AND b.g = a.g
        GROUP BY c.id_a, c.id_b
    ),
    agree AS (
        SELECT c.id_a, c.id_b,
               ((CASE WHEN x.mh0 = y.mh0 THEN 1 ELSE 0 END)
              + (CASE WHEN x.mh1 = y.mh1 THEN 1 ELSE 0 END)
              + (CASE WHEN x.mh2 = y.mh2 THEN 1 ELSE 0 END)
              + (CASE WHEN x.mh3 = y.mh3 THEN 1 ELSE 0 END)
              + (CASE WHEN x.mh4 = y.mh4 THEN 1 ELSE 0 END)
              + (CASE WHEN x.mh5 = y.mh5 THEN 1 ELSE 0 END)
              + (CASE WHEN x.mh6 = y.mh6 THEN 1 ELSE 0 END)
              + (CASE WHEN x.mh7 = y.mh7 THEN 1 ELSE 0 END)) AS matches
        FROM cand c
        JOIN sig x ON x.id = c.id_a
        JOIN sig y ON y.id = c.id_b
    )
    SELECT cm.id_a, cm.id_b, ag.matches, cm.common,
           sa.n AS n_a, sb.n AS n_b,
           CAST(ag.matches AS DOUBLE) / 8 AS est8,
           ROUND(cm.common / (sa.n + sb.n - cm.common), 6) AS jacc6,
           ROUND(ABS(CAST(ag.matches AS DOUBLE) / 8
                     - cm.common / (sa.n + sb.n - cm.common)), 6) AS abs_err
    FROM common cm
    JOIN agree ag ON ag.id_a = cm.id_a AND ag.id_b = cm.id_b
    JOIN sizes sa ON sa.id = cm.id_a
    JOIN sizes sb ON sb.id = cm.id_b
    """,
)
def dd_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator CALIBRATION: for every LSH candidate pair, the
    signature-agreement Jaccard estimate (matches/8 — the unbiased
    estimator the sketch stands on; exact dyadic, no rounding) beside
    the exact shingle Jaccard and the absolute error. This is the
    measurement that justifies the pipeline's shape: at sf0.1 the 8-hash
    estimator's mean |error| is 0.20 (max 0.74, consistent with the
    binomial sd sqrt(J(1-J)/8) ~ 0.17) — far too coarse to THRESHOLD on,
    which is exactly why every registered dedup path treats signatures
    as a candidate filter and verifies with exact shingle Jaccard
    downstream (complements dd_lsh_recall, which measures candidate
    RECALL).
    Scale shape: the agreement join touches two signature rows per
    candidate (signature table is one row per doc); the exact-Jaccard
    side is the usual candidate-bounded verification join."""
    # spread_scan: four shingle/signature consumers hang off the
    # single-file scan; round-12 interleaved A/B (sf0.1):
    # 2.54 -> 2.05s median (1.24x), min 2.25 -> 1.95.
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    sh = D.word_shingles(docs, 3)
    sig = D.minhash_signatures(D.word_shingle_stream(docs, 3), 8)
    cand = D.lsh_candidate_pairs(sig, 4, 2)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("id").alias("id_a"), "g")
    b = sh.select(F.col("id").alias("id_b"), "g")
    common = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "g"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    sx = sig.select(
        F.col("id").alias("id_a"), *[F.col(f"mh{j}").alias(f"xa{j}") for j in range(8)]
    )
    sy = sig.select(
        F.col("id").alias("id_b"), *[F.col(f"mh{j}").alias(f"yb{j}") for j in range(8)]
    )
    matches = sum(
        (F.col(f"xa{j}") == F.col(f"yb{j}")).cast("int") for j in range(8)
    )
    agree = (
        cand.join(sx, "id_a").join(sy, "id_b").select(
            "id_a", "id_b", matches.alias("matches")
        )
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    jacc = F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common"))
    est = F.col("matches").cast("double") / F.lit(8)
    return (
        common.join(agree, ["id_a", "id_b"])
        .join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "matches",
            "common",
            "n_a",
            "n_b",
            est.alias("est8"),
            F.round(jacc, 6).alias("jacc6"),
            F.round(F.abs(est - jacc), 6).alias("abs_err"),
        )
    )


def _band_cfg_sql(bands: int, rows: int) -> str:
    """UNION ALL arms of one banding config over the 8-hash signature."""
    arms = []
    for b in range(bands):
        key = " || '_' || ".join(f"mh{b * rows + j}" for j in range(rows))
        arms.append(
            f"SELECT id, '{bands}x{rows}' AS cfg, {b} AS band, {key} AS key FROM sig"
        )
    return "\n        UNION ALL ".join(arms)


@query(
    "dd_band_curve",
    oracle="WITH "
    + _SHINGLES_CTE.format(where="")
    + f""",
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS common
        FROM sh a JOIN sh b ON a.g = b.g AND a.id < b.id
        GROUP BY a.id, b.id
    ),
    truth AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE common / (sa.n + sb.n - common) >= 0.5
    ),
    sig AS (
        SELECT id, {', '.join(_minhash_min(j) for j in range(8))}
        FROM sh GROUP BY id
    ),
    bands AS (
        {_band_cfg_sql(8, 1)}
        UNION ALL {_band_cfg_sql(4, 2)}
        UNION ALL {_band_cfg_sql(2, 4)}
        UNION ALL {_band_cfg_sql(1, 8)}
    ),
    bands_capped AS (
        SELECT cfg, id, band, key FROM bands
        QUALIFY COUNT(*) OVER (PARTITION BY cfg, band, key) <= 1000
    ),
    cand AS (
        SELECT DISTINCT a.cfg, a.id AS id_a, b.id AS id_b
        FROM bands_capped a
        JOIN bands_capped b ON a.cfg = b.cfg AND a.band = b.band
                           AND a.key = b.key AND a.id < b.id
    ),
    per AS (
        SELECT c.cfg, COUNT(*) AS n_cand,
               SUM(CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END) AS n_found
        FROM cand c
        LEFT JOIN truth t ON t.id_a = c.id_a AND t.id_b = c.id_b
        GROUP BY c.cfg
    )
    SELECT per.cfg, CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
           CAST(per.n_cand AS BIGINT) AS n_cand,
           CAST(per.n_found AS BIGINT) AS n_found,
           ROUND(per.n_found * 1.0 / GREATEST(per.n_cand, 1), 4) AS precision4,
           ROUND(per.n_found * 1.0
                 / GREATEST((SELECT COUNT(*) FROM truth), 1), 4) AS recall4
    FROM per
    """,
)
def dd_band_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH OPERATING CURVE: candidate precision AND recall at
    four bandings of the same 8-hash signature — 8x1 (most permissive),
    4x2, 2x4, 1x8 (exact-signature match, most precise) — against the
    exact all-pairs Jaccard >= 0.5 ground truth. This is the S-curve
    table a deployment reads to pick its banding for a target
    recall/candidate-volume trade, the dedup twin of sim_nprobe_curve;
    dd_lsh_recall certifies the chosen point, this certifies the menu.
    One signature build feeds all four bandings (explode-melted, bucket-
    capped); the all-pairs truth side is the bounded verification tier."""
    from odbc2parquet_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sh = D.word_shingles(docs, 3)
    # the all-pairs truth subtree is the dominant cost and is referenced
    # FIVE times (four left-semi probes + the n_true count) — persist it
    # so it evaluates once (measured 6.8s -> its recompute share at sf0.1)
    truth = cachereg.track(
        D.jaccard_pairs(sh, threshold=0.5).select("id_a", "id_b").persist()
    )
    sig = D.minhash_signatures(D.word_shingle_stream(docs, 3), num_hashes=8)
    n_true = truth.agg(F.count("*").cast("long").alias("n_true"))
    # Round 12: ONE melt over all four bandings + ONE (cfg, band, key)
    # shuffle (lsh_candidate_pairs_multi) replaces four per-config
    # candidate subtrees that were each evaluated TWICE (count + semi
    # probe) — the before plan carried 37 shuffle exchanges, and the
    # signature build needed a persist just to stop 8 re-evaluations.
    # One LEFT join against the persisted truth then yields n_cand and
    # n_found in a single aggregation pass per cfg (truth pairs are
    # unique, so count(marker) == the old semi-join count). A cfg with
    # zero candidates now produces no row — exactly the oracle's GROUP
    # BY semantics (the old per-config agg emitted an n_cand=0 row that
    # the oracle never would).
    cand = D.lsh_candidate_pairs_multi(sig, [(8, 1), (4, 2), (2, 4), (1, 8)])
    per = (
        cand.join(truth.withColumn("_t_", F.lit(1)), ["id_a", "id_b"], "left")
        .groupBy("cfg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cand"),
            F.count("_t_").cast("long").alias("n_found"),
        )
    )
    return per.crossJoin(F.broadcast(n_true)).select(
        "cfg",
        "n_true",
        "n_cand",
        "n_found",
        F.round(
            F.col("n_found") * 1.0 / F.greatest(F.col("n_cand"), F.lit(1)), 4
        ).alias("precision4"),
        F.round(
            F.col("n_found") * 1.0 / F.greatest(F.col("n_true"), F.lit(1)), 4
        ).alias("recall4"),
    )


_CAND_CTE = (
    _SHINGLES_CTE.format(where="")
    + f""",
    sig AS (
        SELECT id, {', '.join(_minhash_min(j) for j in range(8))}
        FROM sh GROUP BY id
    ),
    bands AS (
        SELECT id, 0 AS band, mh0 || '_' || mh1 AS key FROM sig
        UNION ALL SELECT id, 1, mh2 || '_' || mh3 FROM sig
        UNION ALL SELECT id, 2, mh4 || '_' || mh5 FROM sig
        UNION ALL SELECT id, 3, mh6 || '_' || mh7 FROM sig
    ),
    bands_capped AS (
        SELECT id, band, key FROM bands
        QUALIFY COUNT(*) OVER (PARTITION BY band, key) <= 1000
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands_capped a
        JOIN bands_capped b
            ON a.band = b.band AND a.key = b.key AND a.id < b.id
    )"""
)


@query(
    "dd_bleu_pairs",
    oracle="WITH "
    + _CAND_CTE
    + """,
    w2 AS (
        SELECT doc_id AS id,
               list_filter(string_split(text, ' '), x -> x != '') AS ws
        FROM documents
    ),
    grams AS (
        SELECT id, 1 AS n, u AS g FROM w2, UNNEST(ws) AS t(u)
        UNION ALL
        SELECT id, 2, ws[i] || ' ' || ws[i+1]
        FROM w2, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
        WHERE len(ws) >= 2
    ),
    cnts AS (SELECT id, n, g, COUNT(*) AS c FROM grams GROUP BY 1, 2, 3),
    lens AS (SELECT id, n, CAST(SUM(c) AS BIGINT) AS len FROM cnts GROUP BY 1, 2),
    ov AS (
        SELECT cd.id_a, cd.id_b, ca.n, SUM(LEAST(ca.c, cb.c)) AS num
        FROM cand cd
        JOIN cnts ca ON ca.id = cd.id_a
        JOIN cnts cb ON cb.id = cd.id_b AND cb.n = ca.n AND cb.g = ca.g
        GROUP BY 1, 2, 3
    ),
    base AS (
        SELECT cd.id_a, cd.id_b,
               l1a.len AS len_ref, l1b.len AS len_hyp,
               COALESCE(n1.num, 0) AS num1, COALESCE(n2.num, 0) AS num2,
               COALESCE(l2b.len, 0) AS len2_hyp
        FROM cand cd
        JOIN lens l1a ON l1a.id = cd.id_a AND l1a.n = 1
        JOIN lens l1b ON l1b.id = cd.id_b AND l1b.n = 1
        LEFT JOIN lens l2b ON l2b.id = cd.id_b AND l2b.n = 2
        LEFT JOIN ov n1 ON n1.id_a = cd.id_a AND n1.id_b = cd.id_b AND n1.n = 1
        LEFT JOIN ov n2 ON n2.id_a = cd.id_a AND n2.id_b = cd.id_b AND n2.n = 2
    )
    SELECT id_a, id_b, len_ref, len_hyp,
           ROUND(CAST(num1 AS DOUBLE) / len_hyp, 6) AS p1_6,
           ROUND(CASE WHEN len2_hyp = 0 THEN 0.0
                      ELSE CAST(num2 AS DOUBLE) / len2_hyp END, 6) AS p2_6,
           ROUND(CASE WHEN num1 = 0 OR num2 = 0 OR len2_hyp = 0 THEN 0.0
                      ELSE (CASE WHEN len_hyp >= len_ref THEN 1.0
                                 ELSE EXP(1.0 - CAST(len_ref AS DOUBLE)
                                                / len_hyp) END)
                           * SQRT((CAST(num1 AS DOUBLE) / len_hyp)
                                  * (CAST(num2 AS DOUBLE) / len2_hyp)) END,
                 6) AS bleu2_6
    FROM base
    """,
)
def dd_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 scoring of LSH near-dup candidate pairs (operators/text.
    bleu2_pairs over operators/dedup.lsh_candidate_pairs): the MT-metric
    complement to Jaccard verification — clipped n-gram precisions see
    REPETITION (a doc that copies one paragraph five times caps at the
    reference's counts) and the brevity penalty sees length, so a
    "high-Jaccard but structurally different" pair is separable. Clipped
    counts and lengths are exact int64; the per-pair scalar float chain
    (two exact divisions, sqrt, the EXP the repo's LN convention covers)
    is rounded to 6. Candidates come from the same capped 4x2 MinHash
    banding as dd_minhash_lsh — bounded, never all-pairs."""
    from odbc2parquet_spark.operators.text import bleu2_pairs

    docs = load_table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(D.word_shingle_stream(docs, 3), num_hashes=8)
    cand = D.lsh_candidate_pairs(sig, bands=4, rows_per_band=2, max_bucket=1000)
    return bleu2_pairs(docs, cand)


import re as _re

_SIMHASH_NS = _SIMHASH_CTE
for _a, _b in [("words", "zwords"), ("hashed", "zhashed"),
               ("sums", "zsums"), ("sig", "zsig")]:
    _SIMHASH_NS = _re.sub(rf"\b{_a}\b", _b, _SIMHASH_NS)


@query(
    "dd_method_agreement",
    oracle="WITH "
    + _CAND_CTE
    + ","
    + _SIMHASH_NS
    + """,
    msizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    mcommon AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS common
        FROM cand c
        JOIN sh a ON a.id = c.id_a
        JOIN sh b ON b.id = c.id_b AND b.g = a.g
        GROUP BY c.id_a, c.id_b
    ),
    mh_pairs AS (
        SELECT id_a, id_b FROM mcommon
        JOIN msizes sa ON sa.id = id_a
        JOIN msizes sb ON sb.id = id_b
        WHERE common / (sa.n + sb.n - common) >= 0.5
    ),
    sh_bands AS (
        SELECT id, simhash, t.band, (simhash >> (t.band * 8)) & 255 AS key
        FROM zsig, UNNEST([0, 1, 2, 3]) AS t(band)
    ),
    sh_bounded AS (
        SELECT * FROM sh_bands
        QUALIFY COUNT(*) OVER (PARTITION BY band, key) <= 10000
    ),
    sh_pairs AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM sh_bounded a JOIN sh_bounded b
          ON a.band = b.band AND a.key = b.key AND a.id < b.id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ),
    u AS (
        SELECT COALESCE(m.id_a, s.id_a) AS id_a,
               COALESCE(m.id_b, s.id_b) AS id_b,
               (m.id_a IS NOT NULL) AS in_m,
               (s.id_a IS NOT NULL) AS in_s
        FROM mh_pairs m FULL OUTER JOIN sh_pairs s
          ON m.id_a = s.id_a AND m.id_b = s.id_b
    )
    SELECT CAST(SUM(CASE WHEN in_m AND in_s THEN 1 ELSE 0 END) AS BIGINT)
               AS n_both,
           CAST(SUM(CASE WHEN in_m AND NOT in_s THEN 1 ELSE 0 END) AS BIGINT)
               AS n_minhash_only,
           CAST(SUM(CASE WHEN in_s AND NOT in_m THEN 1 ELSE 0 END) AS BIGINT)
               AS n_simhash_only
    FROM u
    """,
)
def dd_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-agreement audit between the two certified TEXT near-dup
    pipelines at their operating points (MinHash-LSH at Jaccard >= 0.5
    vs banded SimHash at Hamming <= 3) — the text twin of
    mm_hash_agreement: MinHash sees shingle-SET overlap, SimHash sees
    weighted token profiles, so their disagreement set is precisely the
    "reordered/lightly-edited vs re-worded" boundary a dedup deployment
    tunes on. Composes two already-certified pipelines; one full-outer
    join of two bounded pair sets, three counts."""
    docs = load_table(spark, sf_dir, "documents")
    mh = D.minhash_near_duplicates(docs, threshold=0.5).select("id_a", "id_b")
    sh = D.simhash_banded_pairs(
        D.simhash(docs), max_hamming=3, bits=32, bands=4
    ).select("id_a", "id_b")
    u = mh.withColumn("in_m", F.lit(True)).join(
        sh.withColumn("in_s", F.lit(True)), ["id_a", "id_b"], "full_outer"
    )
    return u.agg(
        F.sum(
            F.when(F.col("in_m").isNotNull() & F.col("in_s").isNotNull(), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_both"),
        F.sum(
            F.when(F.col("in_m").isNotNull() & F.col("in_s").isNull(), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_minhash_only"),
        F.sum(
            F.when(F.col("in_s").isNotNull() & F.col("in_m").isNull(), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_simhash_only"),
    )


@query(
    "dd_rouge_pairs",
    oracle="WITH "
    + _CAND_CTE
    + """,
    w2 AS (
        SELECT doc_id AS id,
               list_filter(string_split(text, ' '), x -> x != '') AS ws
        FROM documents
    ),
    cnts AS (
        SELECT id, u AS g, COUNT(*) AS c
        FROM w2, UNNEST(ws) AS t(u) GROUP BY 1, 2
    ),
    lens AS (SELECT id, CAST(SUM(c) AS BIGINT) AS len FROM cnts GROUP BY 1),
    ov AS (
        SELECT cd.id_a, cd.id_b, SUM(LEAST(ca.c, cb.c)) AS num
        FROM cand cd
        JOIN cnts ca ON ca.id = cd.id_a
        JOIN cnts cb ON cb.id = cd.id_b AND cb.g = ca.g
        GROUP BY 1, 2
    )
    SELECT cd.id_a, cd.id_b,
           la.len AS len_ref, lb.len AS len_hyp,
           CAST(COALESCE(ov.num, 0) AS BIGINT) AS n_overlap,
           ROUND(COALESCE(ov.num, 0) * 1.0 / la.len, 6) AS rouge1_recall6,
           ROUND(COALESCE(ov.num, 0) * 1.0 / lb.len, 6) AS rouge1_prec6,
           ROUND(CASE WHEN COALESCE(ov.num, 0) = 0 THEN 0.0
                      ELSE 2.0 * (COALESCE(ov.num, 0) * 1.0 / la.len)
                           * (COALESCE(ov.num, 0) * 1.0 / lb.len)
                           / ((COALESCE(ov.num, 0) * 1.0 / la.len)
                              + (COALESCE(ov.num, 0) * 1.0 / lb.len)) END,
                 6) AS rouge1_f6
    FROM cand cd
    JOIN lens la ON la.id = cd.id_a
    JOIN lens lb ON lb.id = cd.id_b
    LEFT JOIN ov ON ov.id_a = cd.id_a AND ov.id_b = cd.id_b
    """,
)
def dd_rouge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 precision/recall/F1 over the LSH candidate pairs — the
    RECALL-oriented third pair metric beside exact Jaccard (sets) and
    BLEU-2 (clipped precision + brevity): ROUGE-1 recall answers "how
    much of the reference's content does the candidate reproduce?",
    which is the right question for superset/expansion duplicates that
    Jaccard under-scores and BLEU's hypothesis-side precision misses.
    Clipped counts and lengths are exact int64; the three scores are
    per-pair scalar divisions rounded to 6. Same capped MinHash banding
    candidates as dd_minhash_lsh / dd_bleu_pairs — bounded, never
    all-pairs."""
    # spread_scan: both consumers (shingle signatures + token arrays)
    # hang off the single-file scan; round-12 interleaved A/B (sf0.1):
    # 2.00 -> 1.75s median, min 1.98 -> 1.66. The otherwise-similar
    # dd_bleu_pairs LOST the same A/B (2.74 -> 3.21) and stays natural.
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    sig = D.minhash_signatures(D.word_shingle_stream(docs, 3), num_hashes=8)
    cand = D.lsh_candidate_pairs(sig, bands=4, rows_per_band=2, max_bucket=1000)
    ws = docs.select(
        F.col("doc_id").alias("id"),
        F.filter(F.split(F.col("text"), " "), lambda x: x != "").alias("ws"),
    )
    cnts = ws.select("id", F.explode("ws").alias("g")).groupBy("id", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    lens = cnts.groupBy("id").agg(F.sum("c").alias("len"))
    cd = cand.select("id_a", "id_b")
    ov = (
        cd.join(
            cnts.select(F.col("id").alias("id_a"), "g", F.col("c").alias("ca")),
            "id_a",
        )
        .join(
            cnts.select(F.col("id").alias("id_b"), "g", F.col("c").alias("cb")),
            ["id_b", "g"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("ca", "cb")).alias("num"))
    )
    base = (
        cd.join(lens.select(F.col("id").alias("id_a"), F.col("len").alias("len_ref")), "id_a")
        .join(lens.select(F.col("id").alias("id_b"), F.col("len").alias("len_hyp")), "id_b")
        .join(ov, ["id_a", "id_b"], "left")
        .select(
            "id_a", "id_b", "len_ref", "len_hyp",
            F.coalesce("num", F.lit(0)).cast("long").alias("n_overlap"),
        )
    )
    rec = F.col("n_overlap") * 1.0 / F.col("len_ref")
    prec = F.col("n_overlap") * 1.0 / F.col("len_hyp")
    f1 = F.when(F.col("n_overlap") == 0, F.lit(0.0)).otherwise(
        2.0 * rec * prec / (rec + prec)
    )
    return base.select(
        "id_a", "id_b", "len_ref", "len_hyp", "n_overlap",
        F.round(rec, 6).alias("rouge1_recall6"),
        F.round(prec, 6).alias("rouge1_prec6"),
        F.round(f1, 6).alias("rouge1_f6"),
    )


@query(
    "dd_template_groups",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               md5(array_to_string(
                   list_transform(
                       list_filter(string_split(text, ' '), x -> x != ''),
                       w -> CAST(length(w) AS VARCHAR)),
                   ',')) AS template_hash
        FROM documents
    )
    SELECT template_hash,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS min_doc
    FROM t GROUP BY template_hash HAVING COUNT(*) > 1
    """,
)
def dd_template_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPLATE detection: documents sharing an identical word-length
    SKELETON (the md5 of their token-length sequence) — the
    mail-merge/boilerplate generator signature that exact dedup misses
    (every instance differs in the substituted values) and MinHash
    under-scores (low shingle overlap when the slots dominate). Grouping
    on the skeleton hash is ONE map-side-combining shuffle — the
    dd_exact shape applied to structure instead of content; groups >1
    are template families, min_doc the canonical exemplar. At 100 TB
    this is the cheapest first pass of a template-aware dedup cascade:
    skeleton groups feed slot-level diffing only WITHIN groups."""
    docs = load_table(spark, sf_dir, "documents")
    skel = F.md5(
        F.array_join(
            F.transform(
                F.filter(F.split(F.col("text"), " "), lambda x: x != ""),
                lambda w: F.length(w).cast("string"),
            ),
            ",",
        )
    )
    return (
        docs.select("doc_id", skel.alias("template_hash"))
        .groupBy("template_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


@query(
    "dd_winnowing_pairs",
    oracle="""
    WITH ws AS (
        SELECT doc_id AS id, string_split(text, ' ') AS ws FROM documents
    ),
    grams AS (
        SELECT id, t.i - 1 AS pos,
               ws[t.i] || ' ' || ws[t.i + 1] || ' ' || ws[t.i + 2] AS g
        FROM ws, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
        WHERE len(ws) >= 3
    ),
    packed AS (
        SELECT id, pos, pos // 1024 AS block,
               CAST('0x' || substring(md5(g), 1, 12) AS BIGINT) * 1024
               + (1023 - pos % 1024) AS pk
        FROM grams
    ),
    sel AS (
        SELECT id, MIN(pk) OVER (PARTITION BY id, block ORDER BY pos
                                 ROWS BETWEEN 3 PRECEDING
                                          AND CURRENT ROW) AS mpk
        FROM packed
    ),
    fp AS (SELECT DISTINCT id, mpk // 1024 AS h FROM sel),
    freq AS (
        SELECT h FROM (SELECT h, COUNT(*) AS nd FROM fp GROUP BY h)
        WHERE nd <= 64
    ),
    idx AS (SELECT fp.id, fp.h FROM fp JOIN freq USING (h))
    SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM idx a JOIN idx b ON a.h = b.h AND a.id < b.id
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """,
)
def dd_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINNOWING document-similarity pairs (Schleimer/Wilkerson/Aiken's
    MOSS, SIGMOD'03 — operators/dedup.winnowing_fingerprints +
    winnowing_pairs): per-position 3-word-gram hashes, a 4-gram sliding
    window selecting the minimum (ties rightmost, the robust rule), and
    pairs sharing >= 2 distinct selected hashes. The guarantee the other
    near-dup operators don't give: ANY shared run of >= 6 words yields a
    shared fingerprint while only ~2/5 of positions are stored — the
    plagiarism/code-clone detector's storage-recall dial, complementing
    MinHash (whole-doc sets) and span_scrub (exact substring table).
    Packed (hash asc, pos desc) argmin keeps the window MIN a primitive
    hash-aggregate; leading partial windows are included by both engines
    (a superset of strict winnowing — the guarantee is preserved). Cap +
    keyed joins, never all-pairs."""
    # spread_scan: the fingerprint stage (per-position 3-gram md5 + packed
    # argmin windows) is CPU-dense JVM work pinned to the single-file scan
    # task; round-12 interleaved A/B (tools/ab_spread.py, sf0.1):
    # 3.32 -> 1.91s median (1.74x), min 2.94 -> 1.66. No-op on any
    # multi-split corpus.
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    fp = D.winnowing_fingerprints(docs, n=3, window=4)
    return D.winnowing_pairs(fp, min_shared=2, max_docs_per_fp=64)


@query(
    "dd_truncation_audit",
    oracle="""
    WITH t AS (
        SELECT source,
               GREATEST(len(string_split(text, ' ')) - 2, 0) AS n_grams3,
               GREATEST(len(string_split(text, ' ')) - 4, 0) AS n_grams5
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_grams3 > 1024 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_winnow_multiblock,
           CAST(SUM(CASE WHEN n_grams5 > 2097152 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_scrub_truncated,
           CAST(MAX(n_grams3) AS BIGINT) AS max_grams3
    FROM t GROUP BY source
    """,
)
def dd_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OBSERVABILITY for the bounded-document policies:
    winnowing_fingerprints winnows long documents in independent
    1024-gram BLOCKS (the 10-bit packed-argmin tiebreak budget — full
    coverage, but block-boundary-straddling runs are only guaranteed
    from their within-block windows), and span_scrub scans the first
    2^21 tokens only (the 21-bit position packing). This audit makes
    both VISIBLE: per source, how many documents are multi-block for
    winnowing / truncated for span_scrub, and the corpus's maximum gram
    count — the numbers an operator reads before trusting near-dup
    recall on long documents. Pure map-side arithmetic over one corpus
    scan + a |sources|-row aggregate — runs at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " "))
    t = docs.select(
        "source",
        F.greatest(n_words - 2, F.lit(0)).alias("n_grams3"),
        F.greatest(n_words - 4, F.lit(0)).alias("n_grams5"),
    )
    return t.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n_grams3") > 1024, 1).otherwise(0))
        .cast("long")
        .alias("n_winnow_multiblock"),
        F.sum(F.when(F.col("n_grams5") > (1 << 21), 1).otherwise(0))
        .cast("long")
        .alias("n_scrub_truncated"),
        F.max("n_grams3").cast("long").alias("max_grams3"),
    )


@query(
    "dd_suffix_lcp",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               list_transform(
                   list_filter(string_split(text, ' '), x -> x != ''),
                   w -> CAST('0x' || substring(md5(w), 1, 15) AS BIGINT)
               ) AS ws
        FROM documents
    ),
    suf AS (
        SELECT doc_id, list_slice(ws, i, i + 15) AS s
        FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
        WHERE len(ws) >= 2
    ),
    b AS (
        SELECT doc_id, s, s[1] AS k1, s[2] AS k2 FROM suf
        QUALIFY COUNT(*) OVER (PARTITION BY s[1], s[2]) <= 100000
    ),
    adj AS (
        SELECT doc_id, s,
               LAG(doc_id) OVER (PARTITION BY k1, k2 ORDER BY s) AS pdoc,
               LAG(s) OVER (PARTITION BY k1, k2 ORDER BY s) AS ps
        FROM b
    ),
    credited AS (
        SELECT UNNEST([doc_id, pdoc]) AS doc_id,
               list_position(
                   list_transform(list_zip(s, ps),
                       p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END) || [0],
                   0) - 1 AS lcp
        FROM adj
        WHERE pdoc IS NOT NULL AND pdoc != doc_id
    )
    SELECT doc_id, CAST(MAX(lcp) AS BIGINT) AS max_dup_span
    FROM credited WHERE lcp >= 2
    GROUP BY doc_id
    """,
)
def dd_suffix_lcp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUFFIX-ARRAY duplicated-span detection (operators/dedup.
    suffix_lcp_spans): per document, the LONGEST token span (capped at 16)
    also occurring in another document, via lexicographically adjacent
    suffix LCPs — the published exact-substring-dedup construction (Lee et
    al. 2022) whose fixed-n approximations this repo already carries
    (span_scrub at n=5, tx_decontaminate_13gram at n=13). One suffix
    explode (linear in corpus tokens), a (token1, token2)-KEYED window
    sort (never a global funnel — LCP >= 2 forces a shared bigram, so
    cross-group adjacencies are irrelevant by construction), and a
    per-doc max; the 100k stop-bigram cap bounds window skew exactly like
    winnowing's stop-fingerprint rule. ORDER BY the token ARRAY keeps
    the contiguous-prefix-block property exact (a joined-string key would
    break it for tokens containing sub-space characters); per-doc maxima
    are tie-order invariant, so the two engines agree on every row."""
    # spread_scan: the per-position suffix explode + banding is
    # scan-task-pinned; round-12 interleaved A/B (sf0.1):
    # 1.53 -> 1.04s median (1.48x), min 1.43 -> 1.00.
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    return D.suffix_lcp_spans(docs, k_max=16)
