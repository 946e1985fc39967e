"""Similarity-search queries over ``embeddings`` — oracle-checked.

The brute-force top-k is the exactness baseline; the LSH signature/bucket
queries are the scale path. Hyperplanes are md5-derived constants embedded
as literals in BOTH the Spark plan and the DuckDB oracle, so the two
engines compute the same signatures from first principles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odbc2parquet_spark.catalog import load_table
from odbc2parquet_spark.operators import similarity as S
from odbc2parquet_spark.queries import query

_N_PLANES = 16
_DIM = 64

_DOT = (
    "list_sum(list_transform(list_zip(a.embedding, b.embedding), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)


@query(
    "sim_bruteforce_topk",
    oracle=f"""
    WITH n AS (
        SELECT vec_id, embedding,
               list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nsq
        FROM embeddings
    ),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROUND({_DOT} / SQRT(a.nsq * b.nsq), 4) AS cos4
        FROM n a JOIN n b ON a.vec_id < 10 AND a.vec_id != b.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos4,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos4 DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, CAST(cos4 AS DECIMAL(8,4)) AS cosine4, rank
    FROM ranked WHERE rank <= 10
    """,
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for a 10-vector probe set (broadcast the probes,
    stream the corpus — the O(Q x N) baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=10)


def _planes_sql() -> list[str]:
    planes = S.hyperplanes(_N_PLANES, _DIM)
    return ["[" + ", ".join(repr(x) for x in row) + "]" for row in planes]


def _sig_sql() -> str:
    """Signature expression: sum of (dot(embedding, H_j) > 0) << j."""
    planes = _planes_sql()
    bits = []
    for j, lits in enumerate(planes):
        dot = (
            f"list_sum(list_transform(list_zip(embedding, {lits}), "
            f"x -> CAST(x[1] AS DOUBLE) * x[2]))"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(bits)


@query(
    "sim_lsh_signatures",
    oracle=f"""
    SELECT vec_id, CAST({_sig_sql()} AS BIGINT) AS sig
    FROM embeddings
    """,
)
def sim_lsh_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit random-hyperplane signatures — one projection pass, no
    shuffle; the index build of the ANN scale path."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.lsh_signatures(emb, _N_PLANES, _DIM)


@query(
    "sim_lsh_bucket_pairs",
    oracle=f"""
    WITH sig AS (
        SELECT vec_id, CAST({_sig_sql()} AS BIGINT) AS sig
        FROM embeddings
    ),
    b AS (SELECT vec_id, sig & 255 AS bucket FROM sig)
    SELECT x.vec_id AS id_a, y.vec_id AS id_b, x.bucket
    FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    """,
)
def sim_lsh_bucket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN candidate pairs sharing an 8-bit signature-prefix bucket — the
    equi-join that replaces the cross join at scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.lsh_bucket_pairs(S.lsh_signatures(emb, _N_PLANES, _DIM), prefix_bits=8)
