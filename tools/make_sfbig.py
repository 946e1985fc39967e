"""Amplify a testdata SF directory by an integer factor (default: sf0.1
-> a synthetic "sf1") for scale-decade measurements beyond the driver's
largest generated SF. TESTDATA is read-only, so the amplified tables are
written under the repo (.sfdata/, gitignored).

Replica k (k = 0..factor-1) offsets every entity key by k * |table| so
key CARDINALITY grows with the data (the property scaling measurements
need — replicating ids verbatim would instead multiply per-key row counts
and turn every query into a skew test). Foreign keys get the matching
offset; name columns that embed their key are regenerated
(Customer#/Supplier# + zero-padded key, the same format the generator
uses). The fixed dims (region, nation) stay fixed, like TPC-H at every SF.

CONTENT columns must become DISTINCT items, not clones: a first cut that
appended a replica suffix to text and copied embeddings verbatim gave
every document 9 near-duplicates, so pair-emitting dedup operators
(banded SimHash, SemDeDup) measured a ~30x OUTPUT blowup for 10x input —
a property of the synthetic corpus, not of the operators. Instead:
- document text is caesar-rotated per replica (letters shifted by k,
  case-preserving): lengths, token boundaries and byte geometry are
  unchanged (so decode/regex/PII costs stay representative) while every
  shingle differs — near-dup rate per item stays at the base corpus rate.
- embeddings are circular-shifted by k components: same norm and
  component distribution, but ~orthogonal to the original, so cosine
  near-dup structure grows linearly, not quadratically.

Usage: python tools/make_sfbig.py [src_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

AMPLIFY = {
    "region": None,   # fixed dim: straight copy
    "nation": None,
    "customer": """
        SELECT c_custkey + k * 15000 AS c_custkey,
               'Customer#' || lpad(CAST(c_custkey + k * 15000 AS VARCHAR), 9, '0')
                   AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM src CROSS JOIN reps
    """,
    "supplier": """
        SELECT s_suppkey + k * 1000 AS s_suppkey,
               'Supplier#' || lpad(CAST(s_suppkey + k * 1000 AS VARCHAR), 9, '0')
                   AS s_name,
               s_nationkey, s_acctbal
        FROM src CROSS JOIN reps
    """,
    "part": """
        SELECT p_partkey + k * 20000 AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM src CROSS JOIN reps
    """,
    "orders": """
        SELECT o_orderkey + k * 150000 AS o_orderkey,
               o_custkey + k * 15000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM src CROSS JOIN reps
    """,
    "lineitem": """
        SELECT l_orderkey + k * 150000 AS l_orderkey,
               l_partkey + k * 20000 AS l_partkey,
               l_suppkey + k * 1000 AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM src CROSS JOIN reps
    """,
    "events": """
        SELECT event_id + k * 100000 AS event_id, ts,
               user_id + k * 1500 AS user_id,
               event_type, value, props
        FROM src CROSS JOIN reps
    """,
    # documents: per-replica AFFINE letter permutation i -> (a*i + b) mod 26
    # (a coprime to 26, from the `perms` side table built per factor).
    # Rotation alone (a = 1) has only 26 distinct values, so replicas 26+
    # would clone replica k-26's text verbatim and every doc would gain
    # exact duplicates — a property of the amplifier, not the corpus. For
    # k < 26 the affine family reduces to a = 1, b = k: bit-identical to
    # the original caesar rotation, so factor <= 26 outputs (the sf1 used
    # by every existing SCALING row) are unchanged. Any letter bijection
    # preserves lengths, token boundaries and byte geometry exactly.
    "documents": """
        SELECT doc_id + k * 5000 AS doc_id,
               translate(text,
                         'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ',
                         p.lower_t || p.upper_t) AS text,
               lang, source, n_chars
        FROM src CROSS JOIN reps JOIN perms p USING (k)
    """,
    # embeddings: circular shift by k mod 64 composed with a sign flip for
    # k >= 64 (shift alone wraps at the 64-dim width; negation preserves
    # the norm and component distribution while staying distinct). k < 64
    # is bit-identical to the original shift-only transform.
    "embeddings": """
        SELECT vec_id + k * 2000 AS vec_id,
               CASE WHEN k >= 64 THEN list_transform(shifted, x -> -x)
                    ELSE shifted END AS embedding,
               label
        FROM (
            SELECT vec_id, label, k,
                   CASE WHEN k % 64 = 0 THEN embedding
                        ELSE embedding[(k % 64 + 1):]
                             || embedding[1:(k % 64)] END AS shifted
            FROM src CROSS JOIN reps
        )
    """,
}

#: multipliers coprime to 26 for the affine letter permutation family
_AFFINE_AS = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]


def affine_targets(factor: int) -> list[tuple[int, str, str]]:
    """(k, lower_target, upper_target) translate targets: letter i maps to
    (a*i + b) mod 26 with a = _AFFINE_AS[k // 26 % 12], b = k % 26 —
    312 distinct bijections before any repeat; a = 1 (k < 26) is the
    original caesar rotation."""
    rows = []
    for k in range(factor):
        a = _AFFINE_AS[(k // 26) % len(_AFFINE_AS)]
        b = k % 26
        lower = "".join(chr(ord("a") + (a * i + b) % 26) for i in range(26))
        rows.append((k, lower, lower.upper()))
    return rows


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.sfdata/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    # optional 4th arg: comma-separated table subset. Beyond 312 replicas
    # the affine letter family repeats, so document text would clone —
    # factor > 312 therefore REQUIRES a subset that excludes `documents`.
    # (embeddings repeat their 128 distinct transforms beyond factor 128:
    # fine for per-vector operators like ivf_assign, INVALID for
    # pair-emitting dedup/ANN queries — clones manufacture quadratic
    # near-dup structure the real corpus doesn't have.)
    tables = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    os.makedirs(out, exist_ok=True)
    if factor > 26 * len(_AFFINE_AS) and (tables is None or "documents" in tables):
        raise SystemExit(
            f"factor {factor} exceeds the {26 * len(_AFFINE_AS)} distinct "
            "affine letter permutations — replica text would repeat; pass an "
            "explicit table subset without `documents` for key-only decades"
        )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT unnest(range(0, {factor})) AS k")
    con.execute("CREATE TABLE perms (k BIGINT, lower_t VARCHAR, upper_t VARCHAR)")
    con.executemany("INSERT INTO perms VALUES (?, ?, ?)", affine_targets(factor))
    for table, sql in AMPLIFY.items():
        if tables is not None and table not in tables:
            continue
        src_path = os.path.join(src, f"{table}.parquet")
        out_path = os.path.join(out, f"{table}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{src_path}'")
        body = sql if sql is not None else "SELECT * FROM src"
        con.execute(
            f"COPY ({body}) TO '{out_path}' (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out_path}'").fetchone()[0]
        print(f"{table}: {n} rows -> {out_path}")


if __name__ == "__main__":
    main()
