"""Streaming duals of the drift monitors (operators/drift.py).

The batch monitors (PSI, CUSUM) compare two snapshots after the fact; a
100 TB ingest wants the same statistics ON the stream — per-key state
carried across micro-batches in the state store, alarm rows emitted the
batch a threshold is crossed. Same applyInPandasWithState shape as
stateful.py: O(1) state per key (a fixed-width histogram / two CUSUM
accumulators), Arrow-batched per-batch work, no driver involvement.

Reference parity note: the reference engine has no streaming surface at
all (it runs one cursor to completion); these are port extensions pinned
by pytest (tests/test_streaming.py) rather than SQL oracles — the batch
twins they must agree with ARE oracle-gated (ev_psi_drift, ev_cusum).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

PSI_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_total", T.LongType()),
        T.StructField("psi", T.DoubleType()),
    ]
)


def streaming_psi(
    events: DataFrame,
    edges: list[float],
    ref_probs: list[float],
    key_col: str = "event_type",
    value_col: str = "value",
    eps: float = 1e-6,
) -> DataFrame:
    """Per-key Population Stability Index against a FROZEN reference
    histogram, updated every micro-batch.

    ``edges`` are the interior bin edges of the reference binning (the
    batch psi_drift bins the same way); ``ref_probs`` the reference bin
    probabilities (len(edges) + 1 of them, summing to 1). State per key
    is the running bin-count vector — len(edges)+1 longs, O(1) per key
    regardless of stream length. Each batch emits the post-batch
    (key, n_total, psi); psi uses eps-smoothed proportions so empty bins
    stay finite, matching the batch operator's guard.
    """
    import math

    n_bins = len(edges) + 1
    if len(ref_probs) != n_bins:
        raise ValueError(f"need {n_bins} ref_probs for {len(edges)} edges")
    edges_t = tuple(float(e) for e in edges)
    ref_t = tuple(float(p) for p in ref_probs)

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import bisect

        counts = list(state.get[0]) if state.exists else [0] * n_bins
        for pdf in pdfs:
            for v in pdf[value_col]:
                counts[bisect.bisect_right(edges_t, float(v))] += 1
        state.update((counts,))
        n = sum(counts)
        psi = 0.0
        if n:
            for c, r in zip(counts, ref_t):
                a = max(c / n, eps)
                b = max(r, eps)
                psi += (a - b) * math.log(a / b)
        yield pd.DataFrame(
            {"key": [key[0]], "n_total": [n], "psi": [round(psi, 6)]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=PSI_SCHEMA,
        stateStructType="counts ARRAY<LONG>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("s_pos", T.DoubleType()),
        T.StructField("s_neg", T.DoubleType()),
        T.StructField("alarm", T.BooleanType()),
    ]
)


def streaming_cusum(
    events: DataFrame,
    target_mean: float,
    slack: float,
    threshold: float,
    key_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Tabular two-sided CUSUM per key (Page '54): s_pos tracks upward
    level shifts, s_neg downward; ``alarm`` fires the first batch either
    exceeds ``threshold`` and stays latched (state remembers the crossing
    — a restart replays to the same latch, so alerting is exactly-once
    per shift). The batch twin (operators/drift.cusum_changepoint)
    answers "when did it shift?" retrospectively; this answers "has it
    shifted?" online with two doubles of state per key.

    In-batch order sorts by ``ts_col`` (stable) so replays are
    deterministic; recursions are plain IEEE adds in a fixed order.
    """

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s_pos, s_neg, latched = (
            state.get if state.exists else (0, 0.0, 0.0, False)
        )
        # applyInPandasWithState may deliver one key's micro-batch as
        # SEVERAL Arrow chunks in arbitrary post-shuffle order; the CUSUM
        # recursion is order-sensitive (max/min clamping), so sort the
        # CONCATENATION, never chunk-by-chunk, or replays would diverge.
        chunks = list(pdfs)
        whole = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame({value_col: []})
        )
        if ts_col in whole.columns:
            whole = whole.sort_values(ts_col, kind="stable")
        for v in whole[value_col]:
            x = float(v) - target_mean
            s_pos = max(0.0, s_pos + x - slack)
            s_neg = min(0.0, s_neg + x + slack)
            n += 1
            # latch INSIDE the recursion: a crossing that decays back
            # before batch end must still alarm
            if s_pos > threshold or -s_neg > threshold:
                latched = True
        latched = bool(latched)
        state.update((n, s_pos, s_neg, latched))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n": [n],
                "s_pos": [round(s_pos, 6)],
                "s_neg": [round(s_neg, 6)],
                "alarm": [latched],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=CUSUM_SCHEMA,
        stateStructType="n LONG, s_pos DOUBLE, s_neg DOUBLE, latched BOOLEAN",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DISTINCT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("estimate", T.DoubleType()),
    ]
)


def streaming_distinct(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "user_id",
    p: int = 8,
) -> DataFrame:
    """Per-key approximate distinct count ON the stream: the HLL
    register array of operators/sketches.hll_distinct_per_group carried
    in the state store — m = 2^p one-byte registers per key, O(1)
    state regardless of stream length, each batch emitting the post-
    batch (key, n_rows, estimate).

    Same md5 hash split and estimator arithmetic as the batch operator
    (the tie between them is pytest-pinned: streaming two micro-batches
    equals the batch sketch over their union, because registers merge by
    MAX). The batch twin is oracle-gated (ev_hll_daily_users); values
    are hashed via str(value), so feed integer or string keys — floats
    would depend on repr.
    """
    import hashlib

    m = 1 << p
    suffix_bits = 60 - p
    alpha_num = (0.7213 / (1.0 + 1.079 / m)) * m * m * float(1 << 61)

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, regs_b = state.get
            regs = bytearray(regs_b)
        else:
            n, regs = 0, bytearray(m)
        for pdf in pdfs:
            for v in pdf[value_col]:
                h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
                idx = h & (m - 1)
                rest = h >> p
                rho = (
                    suffix_bits + 1
                    if rest == 0
                    else suffix_bits + 1 - rest.bit_length()
                )
                if rho > regs[idx]:
                    regs[idx] = rho
                n += 1
        # exact integer harmonic numerator (common denominator 2^61),
        # one IEEE division — the batch operator's arithmetic verbatim
        z_num = sum(1 << (61 - r) for r in regs if r) + regs.count(0) * (1 << 61)
        raw = alpha_num / float(z_num)
        v_zero = regs.count(0)
        if raw <= 2.5 * m and v_zero > 0:
            import math

            est = float(m) * math.log(float(m) / v_zero)
        else:
            est = raw
        state.update((n, bytes(regs)))
        yield pd.DataFrame(
            {"key": [key[0]], "n_rows": [n], "estimate": [round(est, 2)]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=DISTINCT_SCHEMA,
        stateStructType="n LONG, regs BINARY",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TOPK_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("mg_count", T.LongType()),
        T.StructField("n_rows", T.LongType()),
    ]
)


def streaming_topk(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 8,
) -> DataFrame:
    """Per-key heavy hitters ON the stream: a Misra-Gries summary of at
    most ``k`` counters per key in the state store — the O(k)-state dual
    of the batch operators/sketches.heavy_hitters. Every value whose
    true frequency exceeds n/(k+1) is GUARANTEED present in the summary
    (the classic MG bound; pytest-pinned against the exact batch top
    counts), and each counter undercounts by at most n/(k+1).

    Each batch emits the post-batch summary rows (key, value, mg_count,
    n_rows), largest counters first — candidates for an exact second
    pass, or alert fodder on their own ("one user id is suddenly >n/9 of
    the stream"). Values travel as str(value), like streaming_distinct.
    """

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, vals, cnts = state.get
            counters = dict(zip(vals, cnts))
        else:
            n, counters = 0, {}
        for pdf in pdfs:
            for v in pdf[value_col]:
                s = str(v)
                n += 1
                if s in counters:
                    counters[s] += 1
                elif len(counters) < k:
                    counters[s] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    counters = {
                        w: c - 1 for w, c in counters.items() if c > 1
                    }
        state.update((n, list(counters.keys()), list(counters.values())))
        ordered = sorted(counters.items(), key=lambda wc: (-wc[1], wc[0]))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(ordered),
                "value": [w for w, _ in ordered],
                "mg_count": [c for _, c in ordered],
                "n_rows": [n] * len(ordered),
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=TOPK_SCHEMA,
        stateStructType="n LONG, vals ARRAY<STRING>, cnts ARRAY<LONG>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KMVQ_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_sample", T.LongType()),
        T.StructField("est_median", T.DoubleType()),
    ]
)


def streaming_kmv_quantile(
    events: DataFrame,
    key_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    k: int = 63,
) -> DataFrame:
    """Per-key streaming median estimate from a KMV/bottom-k sample: the
    state store carries only the ``k`` rows with the smallest md5 id
    hashes (a uniform without-replacement sample of everything seen —
    bottom-k sets merge by union-then-truncate, so batching cannot
    change the final sample), and each batch emits the post-batch lower
    median of the sampled values. O(k) state per key regardless of
    stream length — the quantile monitor a 100 TB ingest can actually
    afford.

    Same md5-prefix hash as operators/sampling._hash60 and the same
    element-pick median (ORDER BY value, hash; no averaging) as the
    oracle-gated batch twin ev_kmv_quantile, so streaming over any
    micro-batch split equals the batch sample over the union —
    pytest-pinned in tests/test_streaming.py.
    """
    import hashlib

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, hks, vals = state.get
            pairs = list(zip(hks, vals))
        else:
            n, pairs = 0, []
        for pdf in pdfs:
            for i, v in zip(pdf[id_col], pdf[value_col]):
                h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
                pairs.append((h, float(v)))
                n += 1
        pairs.sort(key=lambda p: p[0])
        pairs = pairs[:k]
        m = len(pairs)
        by_val = sorted(pairs, key=lambda p: (p[1], p[0]))
        est = by_val[(m + 1) // 2 - 1][1] if m else None
        state.update((n, [p[0] for p in pairs], [p[1] for p in pairs]))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_rows": [n],
                "n_sample": [m],
                "est_median": [est],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=KMVQ_SCHEMA,
        stateStructType="n LONG, hks ARRAY<LONG>, vals ARRAY<DOUBLE>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HW_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_days", T.LongType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("f1", T.DoubleType()),
        T.StructField("f7", T.DoubleType()),
    ]
)


def streaming_holt_winters(
    daily: DataFrame,
    key_col: str = "key",
    day_col: str = "day",
    value_col: str = "x",
    period: int = 7,
) -> DataFrame:
    """Online Holt-Winters additive smoothing per key (alpha = beta =
    gamma = 1/2, period 7): the streaming twin of operators/rollup.
    holt_winters_forecast, carrying (level, trend, the seasonal slots,
    t) in the state store and emitting the current fit + 1/7-step
    forecasts each micro-batch — the live forecaster a monitoring
    pipeline runs where the batch fold runs nightly. The dyadic
    recursion is the SAME pinned add/halve sequence, so after an
    availableNow drain over in-order days the emitted row is
    bit-identical to the batch operator (pytest-pinned, state carried
    across restarts). In-batch order sorts the concatenated chunks by
    day; cross-batch order is the source's append order, as for every
    recursive monitor here.
    """

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            l, b, t = st[0], st[1], st[2]
            s = list(st[3])
        else:
            l, b, t, s = None, 0.0, 0, [0.0] * period
        chunks = list(pdfs)
        whole = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame({day_col: [], value_col: []})
        )
        whole = whole.sort_values(day_col, kind="stable")
        for x in whole[value_col]:
            x = float(x)
            idx = t % period
            if l is None:
                l_new, b_new = x, 0.0
            else:
                l_new = ((x - s[idx]) + (l + b)) / 2.0
                b_new = ((l_new - l) + b) / 2.0
            s[idx] = ((x - l_new) + s[idx]) / 2.0
            l, b = l_new, b_new
            t += 1
        state.update((l, b, t, s))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_days": [t],
                "level": [None if l is None else round(l, 6)],
                "trend": [round(b, 6)],
                "f1": [
                    None
                    if l is None
                    else round(l + 1.0 * b + s[t % period], 6)
                ],
                "f7": [
                    None
                    if l is None
                    else round(
                        l + 7.0 * b + s[(t - 1 + 7) % period], 6
                    )
                ],
            }
        )

    return daily.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=HW_SCHEMA,
        stateStructType=(
            "l DOUBLE, b DOUBLE, t LONG, s ARRAY<DOUBLE>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
