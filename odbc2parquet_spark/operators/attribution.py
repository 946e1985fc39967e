"""Multi-touch conversion attribution as a bounded range join + credit fold.

``linear_attribution`` splits each conversion's value equally across the
same user's touch events inside a fixed look-back window — the "linear"
model of marketing attribution (first-touch / last-touch are argmin/argmax
specializations of the same joined frame).

Scale shape (the part Spark has to get right at 100 TB):

- conversions x touches is an EQUI-join on the user key with a time-range
  residual — never a theta/cross join. One shuffle per side, partitioned
  by user; per-task pair volume is bounded by one user's activity inside
  the look-back window, the same finiteness argument as a watermarked
  stream-stream interval join (streaming/transfer.py).
- the quadratic-ish pair set collapses to one row per
  (conversion, channel) BEFORE anything else happens (map-side partial
  counts), so the credit arithmetic and everything downstream is
  conversion-sized, not pair-sized.
- per-conversion totals come from a window over that collapsed frame —
  each partition holds at most |channels| rows per conversion.

Determinism: credit = value * n_channel / n_total is IEEE double
arithmetic (exact-rounded, engine-independent) cast to DECIMAL(25,12), so
downstream SUMs are order-independent — the same contract as the DSIR
lift sums (queries/textops.py).

Reference scope: pacman82/odbc2parquet delegates analytics like this to
the remote DBMS (src/main.rs query subcommand); here Spark is the engine,
so the operator inventory carries it natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def linear_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    key: str,
    channel_col: str = "channel",
    conv_id_col: str = "conv_id",
    value_col: str = "value",
    ts_col: str = "ts",
    window: str = "7 days",
) -> DataFrame:
    """Credit rows for the linear attribution model.

    ``conversions`` needs (key, conv_id_col, ts_col, value_col);
    ``touches`` needs (key, ts_col, channel_col). A touch participates if
    it happened at or before the conversion and no earlier than
    ``window`` before it. Conversions with zero in-window touches drop
    out (nothing to credit — count them upstream if the funnel report
    needs the orphan rate).

    Returns one row per (conversion, channel):
    ``conv_id, value, channel, n_channel, n_total, credit`` where
    ``credit`` is DECIMAL(25,12) and sums to ~value per conversion.
    """
    c = conversions.select(
        F.col(key).alias("_k"),
        F.col(conv_id_col).alias("conv_id"),
        F.col(ts_col).alias("_cts"),
        F.col(value_col).alias("value"),
    )
    t = touches.select(
        F.col(key).alias("_k"),
        F.col(ts_col).alias("_tts"),
        F.col(channel_col).alias("channel"),
    )
    pairs = c.join(
        t,
        on=[
            c["_k"] == t["_k"],
            t["_tts"] <= c["_cts"],
            t["_tts"] >= c["_cts"] - F.expr(f"INTERVAL {window}"),
        ],
        how="inner",
    )
    per = pairs.groupBy("conv_id", "value", "channel").agg(
        F.count(F.lit(1)).alias("n_channel")
    )
    w = Window.partitionBy("conv_id")
    per = per.withColumn("n_total", F.sum("n_channel").over(w))
    return per.withColumn(
        "credit",
        (F.col("value") * F.col("n_channel") / F.col("n_total")).cast(
            "decimal(25,12)"
        ),
    )


def shapley_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    key: str,
    channels: list[str],
    channel_col: str = "channel",
    conv_id_col: str = "conv_id",
    ts_col: str = "ts",
    window: str = "7 days",
) -> DataFrame:
    """EXACT Shapley-value attribution over the channel coalition lattice.

    The game: v(T) = number of conversions whose in-window touched-channel
    set is contained in T (conversions "reachable" using only the
    channels in T). The Shapley value of channel i is the weighted sum of
    its marginal contributions v(T+i) - v(T) over every coalition T not
    containing i — the unique credit split satisfying efficiency /
    symmetry / dummy. Linear attribution (above) divides by touch counts;
    Shapley divides by COALITION counts, so a channel that only ever
    co-occurs with a stronger one gets credit only where it actually
    changes reachability.

    Exactness: everything is integer. Per-conversion channel sets become
    bitmasks (bit i = channels[i]); v() is a zeta transform (subset-sum)
    over the 2^c-point lattice; the factorial weights are scaled by c! so
    every Shapley numerator is a BIGINT — the only division is the final
    presentation divide by c!.

    Scale shape: the conversions x touches pair join is the SAME bounded
    equi+range join as linear_attribution (never a cross join) and
    collapses map-side to one bitmask per conversion, then to <= 2^c mask
    counts. The lattice work (zeta transform, marginals) runs on 2^c
    rows — constants like 16 — via explode over literal ranges, no join
    wider than 2^c x 2^c with c <= ~8 by construction.

    Returns one row per channel: ``channel``, ``shapley_num`` (BIGINT,
    the Shapley value times c!), ``shapley_conversions`` (num / c!,
    rounded 6).
    """
    import math

    c_n = len(channels)
    full = (1 << c_n) - 1
    fact = math.factorial(c_n)
    idx_expr = "CASE " + " ".join(
        f"WHEN _ch = '{ch}' THEN {i}" for i, ch in enumerate(channels)
    ) + " END"
    w_expr = "CASE " + " ".join(
        f"WHEN bit_count(t_mask) = {s} "
        f"THEN {math.factorial(s) * math.factorial(c_n - 1 - s)}"
        for s in range(c_n)
    ) + " END"

    c = conversions.select(
        F.col(key).alias("_k"),
        F.col(conv_id_col).alias("conv_id"),
        F.col(ts_col).alias("_cts"),
    )
    t = touches.select(
        F.col(key).alias("_k"),
        F.col(ts_col).alias("_tts"),
        F.col(channel_col).alias("_ch"),
    )
    pairs = c.join(
        t,
        on=[
            c["_k"] == t["_k"],
            t["_tts"] <= c["_cts"],
            t["_tts"] >= c["_cts"] - F.expr(f"INTERVAL {window}"),
        ],
        how="left",
    )
    masks = pairs.groupBy("conv_id").agg(
        F.coalesce(
            F.expr(f"bit_or(shiftleft(1, {idx_expr}))"), F.lit(0)
        ).alias("mask")
    )
    cnt = masks.groupBy("mask").agg(F.count(F.lit(1)).alias("n"))
    # zeta transform: every observed mask fans out to its supersets
    # T = mask | x, x ranging over subsets of the complement — 2^c
    # literal candidates per mask, filtered, never a theta join.
    zeta = (
        cnt.withColumn(
            "x", F.explode(F.array(*[F.lit(i) for i in range(full + 1)]))
        )
        .filter(F.expr("(x & mask) = 0"))
        .groupBy(F.expr("mask | x").alias("t_mask"))
        .agg(F.sum("n").alias("v"))
    )
    vt = (
        conversions.sparkSession.range(full + 1)
        .select(F.col("id").cast("int").alias("t_mask"))
        .join(zeta, "t_mask", "left")
        .fillna(0, subset=["v"])
    )
    marg = (
        vt.withColumn(
            "i", F.explode(F.array(*[F.lit(i) for i in range(c_n)]))
        )
        .filter(F.expr("(t_mask & shiftleft(1, i)) = 0"))
        .join(
            vt.select(
                F.col("t_mask").alias("t2_mask"), F.col("v").alias("v2")
            ),
            F.expr("t2_mask = (t_mask | shiftleft(1, i))"),
        )
        .select(
            "i",
            (F.expr(w_expr) * (F.col("v2") - F.col("v"))).alias("num"),
        )
    )
    ch_expr = "CASE " + " ".join(
        f"WHEN i = {i} THEN '{ch}'" for i, ch in enumerate(channels)
    ) + " END"
    return (
        marg.groupBy("i")
        .agg(F.sum("num").alias("shapley_num"))
        .select(
            F.expr(ch_expr).alias("channel"),
            F.col("shapley_num").cast("long"),
            F.round(F.col("shapley_num") / F.lit(float(fact)), 6).alias(
                "shapley_conversions"
            ),
        )
    )
