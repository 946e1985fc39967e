"""Join strategies for scale: skew salting and bucketed co-location.

AQE's skew-join split (on in session.py) handles most skew at runtime by
splitting oversized partitions; these helpers cover the two cases it can't:

- ``salted_join``: one key so hot that even a split partition's *build* side
  explodes (e.g. joining events to a dimension where 40% of rows share one
  key). Salting multiplies the small side by ``salt`` and spreads the big
  side's hot key across ``salt`` reducers — bounded memory per task by
  construction, at the cost of replicating the small side.
- ``write_bucketed`` / bucketed reads: repeated big-big joins on a stable
  key (fact-to-fact). Pre-bucketing both sides on the join key turns every
  subsequent join into a zero-shuffle sort-merge — pay the shuffle once at
  write time, never again. At 100 TB this is the difference between an
  hours-long exchange and a local merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 16,
    distribute_by: str | None = None,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread across ``salt`` buckets.

    The big side gets a deterministic salt from ``distribute_by`` (a
    high-cardinality column; defaults to a hash of the whole row) so one
    join key lands in ``salt`` different reducers; the small side is
    replicated once per salt value (explode of a ``salt``-element array —
    rows x salt, fine for dimension-sized inputs). Result equals
    ``big.join(small, key, how)`` exactly.

    Supported ``how``: inner / left — the shapes where the small side is a
    lookup table. (Right/full would need the small side un-duplicated on
    no-match; use the plain join + AQE there.)
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    dist = F.col(distribute_by) if distribute_by else F.hash(*[F.col(c) for c in big.columns])
    b = big.withColumn("__salt", F.pmod(F.hash(dist), F.lit(salt)))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Both sides of a recurring join bucketed with the SAME (key, buckets)
    join with no Exchange — Catalyst sees the matching output partitioning
    and plans a local sort-merge (and skips even the sort when
    ``sort=True``).
    """
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — zero-shuffle when bucket specs match."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def _argmin_match(scored: DataFrame) -> DataFrame:
    """(probe_id, matched_id, distance): per-probe argmin over candidate
    match rows, shared by both fuzzy-match blockers. The min runs over a
    PACKED long (distance << 43 | matched_id) — lexicographically equal
    to the (distance, matched_id) struct-min for non-negative values,
    but a primitive long min HASH-aggregates with map-side partials
    where a struct-min forces a SortAggregate over the candidate table
    (its quadratic part). raise_error guards pin the packing bounds
    (distance < 2^20, 0 <= matched_id < 2^43) instead of silently
    corrupting the order."""
    enc = (
        F.when(
            (F.col("distance") >= F.lit(1 << 20))
            | (F.col("matched_id") < 0)
            | (F.col("matched_id") >= F.lit(1 << 43)),
            F.expr(
                "raise_error('fuzzy match argmin: distance or matched_id "
                "outside the (distance << 43 | id) packing bounds')"
            ).cast("long"),
        )
        .otherwise(
            F.col("distance").cast("long") * F.lit(1 << 43)
            + F.col("matched_id").cast("long")
        )
    )
    return (
        scored.groupBy("probe_id")
        .agg(F.min(enc).alias("best_enc"))
        .select(
            "probe_id",
            (F.col("best_enc") % F.lit(1 << 43)).alias("matched_id"),
            F.shiftright(F.col("best_enc"), 43).cast("integer").alias("distance"),
        )
    )


def blocked_fuzzy_match(
    probes: DataFrame,
    master: DataFrame,
    block_col: str,
    text_col: str,
    probe_id: str,
    master_id: str,
    max_distance: int | None = None,
    max_block: int | None = None,
) -> DataFrame:
    """Entity resolution: match each probe record to the master record
    with the minimum Levenshtein distance WITHIN its blocking key.

    Returns (probe_id, matched_id, distance). Blocking is the classic ER
    scale move: the pairwise edit-distance pass runs inside one block
    (equi-join on ``block_col``), so cost is sum(block^2) not |probe| x
    |master|; at 100 TB the block key is also the shuffle key, and
    ``max_block`` caps a skewed block the same way the LSH bucket caps
    work — master rows in an over-cap block are dropped (a window count
    before the join), trading those probes' matches for boundedness,
    exactly the recall/boundedness trade the LSH paths make. The
    argmin is a groupBy min over a PACKED long (distance << 43 |
    matched_id) — lexicographically identical to the (distance, id)
    struct-min it replaces for non-negative values (guards enforce the
    packing bounds), but a primitive min HASH-aggregates where a
    struct-min can only SortAggregate (sorting the candidate table, the
    quadratic part of this operator). Map-side partials mean the
    per-probe exchange carries one row per probe, never the
    probe x block_master candidate volume;
    ``max_distance`` optionally drops non-matches first so a probe with
    no plausible candidate emits nothing.
    """
    from pyspark.sql import Window as W

    p = probes.select(
        F.col(probe_id).alias("probe_id"),
        F.col(block_col).alias("blk"),
        F.col(text_col).alias("ptext"),
    )
    m = master.select(
        F.col(master_id).alias("matched_id"),
        F.col(block_col).alias("blk"),
        F.col(text_col).alias("mtext"),
    )
    if max_block is not None:
        wb = W.partitionBy("blk")
        m = (
            m.withColumn("block_n", F.count("*").over(wb))
            .filter(F.col("block_n") <= max_block)
            .drop("block_n")
        )
    scored = p.join(m, "blk").withColumn(
        "distance", F.levenshtein(F.col("ptext"), F.col("mtext"))
    )
    if max_distance is not None:
        scored = scored.filter(F.col("distance") <= max_distance)
    return _argmin_match(scored)


def deletion_blocked_fuzzy_match(
    probes: DataFrame,
    master: DataFrame,
    token_col: str,
    text_col: str,
    probe_id: str,
    master_id: str,
    token_len: int,
    block_col: str | None = None,
    max_block: int | None = 50,
) -> DataFrame:
    """Entity resolution with DELETION-NEIGHBORHOOD blocking: each record
    emits ``token_len`` block keys — its identifying token with one
    character position removed — so a record with a single-character typo
    in the token still shares a key with its master, and each block holds
    at most |alphabet| candidates NO MATTER how large the table grows
    (two records share the key for position i iff they agree on every
    other token character, so a block is one token-neighborhood, not a
    population slice). This is the bounded-block fix for the classic ER
    scale failure where a coarse demographic block (nation, zip, ...)
    grows linearly with the data and pairwise work grows quadratically.

    Candidate pairs from ANY shared key are deduplicated, scored with
    full-text Levenshtein, and reduced to a per-probe argmin via the
    packed-long hash aggregate (:func:`_argmin_match`) — map-side
    partials, so the exchange carries one row per probe. ``block_col`` optionally
    prefixes keys with a coarse partition (tenant, nation) purely for key
    namespacing; ``max_block`` is a backstop cap on master rows per key
    (cannot trigger for single-typo neighborhoods over a digit alphabet,
    where blocks are <= 10, but guards degenerate token distributions).

    Returns (probe_id, matched_id, distance).
    """
    from pyspark.sql import Window as W

    def keyed(df: DataFrame, id_col: str, out_id: str, out_text: str) -> DataFrame:
        prefix = (
            F.concat(F.col(block_col).cast("string"), F.lit(":"))
            if block_col is not None
            else F.lit("")
        )
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(text_col).alias(out_text),
            F.explode(F.sequence(F.lit(0), F.lit(token_len - 1))).alias("pos"),
            F.col(token_col).alias("tok"),
            prefix.alias("pfx"),
        ).select(
            out_id,
            out_text,
            F.concat(
                F.col("pfx"),
                F.col("pos").cast("string"),
                F.lit(":"),
                F.expr("concat(substring(tok, 1, pos), substring(tok, pos + 2))"),
            ).alias("bkey"),
        )

    pk = keyed(probes, probe_id, "probe_id", "ptext")
    mk = keyed(master, master_id, "matched_id", "mtext")
    if max_block is not None:
        wb = W.partitionBy("bkey")
        mk = (
            mk.withColumn("block_n", F.count("*").over(wb))
            .filter(F.col("block_n") <= max_block)
            .drop("block_n")
        )
    pairs = pk.join(mk, "bkey").select(
        "probe_id", "ptext", "matched_id", "mtext"
    ).distinct()
    return _argmin_match(
        pairs.withColumn("distance", F.levenshtein(F.col("ptext"), F.col("mtext")))
    )


def skew_profile(df: DataFrame, key_col: str, top_n: int = 5, parallelism: int = 32) -> DataFrame:
    """Shuffle-skew diagnostic for a prospective join/groupBy key: the
    ``top_n`` hottest keys with their share of all rows and the salt
    factor that would re-balance each across ``parallelism`` reducers.

    At 100 TB the first question before any keyed operation is "which keys
    melt a reducer"; this answers it with one map-side-combined count and
    a TakeOrdered top-n (top_n rows to the driver-side reduce — never the
    key histogram itself). ``suggested_salt`` = ceil(cnt * parallelism /
    total): 1 means the key fits an average reducer, s > 1 means split it
    into s sub-keys (the :func:`salted_join` fan-out parameter).

    All emitted ratios are exact-integer divisions cast to double, so an
    external engine reproduces them bit-for-bit. The key is emitted as a
    STRING so any join-key type (string, date, numeric, composite concat)
    survives in the profile output — a long cast would NULL every
    non-numeric hot key and collapse the diagnostic; tiebreak ordering
    still happens on the native key type before the cast.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("cnt")
    )
    stats = counts.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("total_rows"),
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(top_n)
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return (
        top.crossJoin(F.broadcast(stats))
        .withColumn("hot_rank", F.row_number().over(w))
        .select(
            "hot_rank",
            F.col("key").cast("string").alias("key"),
            F.col("cnt").cast("long").alias("cnt"),
            "total_rows",
            "n_keys",
            (F.col("cnt") * F.col("n_keys") / F.col("total_rows"))
            .cast("double")
            .alias("skew_ratio"),
            F.ceil(F.col("cnt") * F.lit(parallelism) / F.col("total_rows"))
            .cast("long")
            .alias("suggested_salt"),
        )
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Semi-join with a Bloom runtime filter: build a compact bitset from
    the small side's keys, pre-filter the big side AT THE SCAN (broadcast
    bitset words, no shuffle), then the exact semi-join removes the Bloom
    false positives. Result is EXACTLY ``big`` semi-join ``small`` — the
    Bloom stage only changes how many big-side rows survive to the real
    join's exchange.

    This is the optimization that matters at 100 TB: the big side's
    shuffle volume drops to (true matches + false-positive rate), while
    the filter itself costs one broadcast of m_bits/32 longs. Spark's own
    runtime-filter rule does this opportunistically; making it an
    explicit operator pins the semantics and lets the pipeline author
    size m for the expected key cardinality.

    Hash family: md5 two-hash (h1 + j*h2) mod m — the oracle-reproducible
    family every sketch in this repo uses.
    """
    def positions(key_col: F.Column) -> F.Column:
        hexd = F.md5(key_col.cast("string"))
        h1 = F.conv(F.substring(hexd, 1, 15), 16, 10).cast("long")
        h2 = F.conv(F.substring(hexd, 16, 15), 16, 10).cast("long")
        return F.array(*[((h1 + F.lit(j) * h2) % m_bits) for j in range(k)])

    bloom = (
        small.select(F.explode(positions(F.col(small_key))).alias("p"))
        .select(
            (F.col("p") / 32).cast("long").alias("word"),
            F.expr("shiftleft(1L, cast(p % 32 as int))").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )
    # probe: k broadcast hash joins (one per hash function) — NO explode
    # and NO re-group: the first version exploded 3x rows and regrouped on
    # every big-side column (a wide-row shuffle that cost more than the
    # join it was saving); this shape adds zero exchanges to the big side
    hexd = F.md5(F.col(big_key).cast("string"))
    h1 = F.conv(F.substring(hexd, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(hexd, 16, 15), 16, 10).cast("long")
    probe = big
    conds = []
    for j in range(k):
        pos = (h1 + F.lit(j) * h2) % m_bits
        bj = bloom.withColumnsRenamed({"word": f"_w{j}", "bits": f"_bits{j}"})
        probe = probe.withColumn(f"_p{j}", pos).join(
            F.broadcast(bj),
            (F.col(f"_p{j}") / 32).cast("long") == F.col(f"_w{j}"),
            "left_outer",
        )
        conds.append(
            F.coalesce(F.col(f"_bits{j}"), F.lit(0)).bitwiseAND(
                F.expr(f"shiftleft(1L, cast(_p{j} % 32 as int))")
            )
            != 0
        )
    all_set = conds[0]
    for c in conds[1:]:
        all_set = all_set & c
    hit = probe.filter(all_set).select(*big.columns)
    keys = small.select(F.col(small_key).alias(big_key)).distinct()
    return hit.join(keys, big_key, "left_semi")
