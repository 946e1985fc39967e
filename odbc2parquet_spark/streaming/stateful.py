"""Custom stateful streaming operators (applyInPandasWithState).

The built-in windowed/session aggregates (transfer.py) cover time-bucketed
state; this module is the arbitrary-state shape — per-key accumulators that
survive across micro-batches via the state store, the Spark analogue of a
hand-written stateful operator. Used where groupBy can't express the
semantics (running totals emitted every batch, custom eviction, per-entity
counters over an unbounded stream).

Scale notes: state lives in the executor state store partitioned by key —
no driver involvement; a watermark + state timeout bounds state size. The
per-batch work is Arrow-batched pandas (vectorized), not per-row Python.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = "n LONG, total DOUBLE"


def _update_running_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) emitted on every micro-batch.

    State is one (long, double) pair per user — O(users), not O(events).
    Operator runs in append mode (each micro-batch appends the post-batch
    snapshot per key touched), compatible with the exactly-once file sink;
    the same operator shape handles any per-key accumulator the built-in
    aggregates can't express.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DECAYED_RATE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

_EWMA_STATE_SCHEMA = "n LONG, ewma DOUBLE"


def _update_decayed_rate(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, ewma = state.get if state.exists else (0, None)
    # one key's micro-batch may arrive as several Arrow chunks in
    # arbitrary post-shuffle order; the EWMA recursion is order-sensitive,
    # so sort the CONCATENATION by event time, never chunk-by-chunk
    chunks = list(pdfs)
    whole = (
        pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame({"value": []})
    )
    if "ts" in whole.columns:
        whole = whole.sort_values("ts", kind="stable")
    for v in whole["value"]:
        v = float(v)
        ewma = v if ewma is None else 0.5 * v + 0.5 * ewma
        n += 1
    state.update((n, ewma))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "ewma": [ewma]})


def decayed_user_rate(events: DataFrame) -> DataFrame:
    """Streaming twin of operators/rollup.ewma_last_n: a per-user
    recursively decayed value (alpha = 1/2, ewma' = v/2 + ewma/2) carried
    across micro-batches in the state store — the unbounded-stream form
    of the decayed engagement metric (the batch operator is the adjusted
    last-n window; the streaming form is the classic recursive filter,
    O(1) state per key: one long + one double).

    With alpha = 1/2 every update is halving arithmetic — exact double
    scaling plus one rounding add — so a restart-and-replay from the
    checkpoint reproduces bit-identical state. Emits the post-batch
    (n_events, ewma) snapshot per key touched; append-mode compatible.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_decayed_rate,
        outputStructType=DECAYED_RATE_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TOTALS_TTL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("closed", T.BooleanType()),
    ]
)


def running_user_totals_ttl(events: DataFrame, idle_ttl_ms: int = 3_600_000) -> DataFrame:
    """:func:`running_user_totals` with idle-key eviction — the version
    a 100 TB stream actually needs: per-user state is O(users) and the
    user universe only grows, so keys idle longer than ``idle_ttl_ms``
    time out (processing-time timeout), emit one final snapshot with
    ``closed = true``, and their state is REMOVED. A returning user restarts
    from zero — the documented trade for bounded state; route the closed
    snapshots to the batch layer (upsert/agg-merge) for lifetime totals.
    """

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "closed": [True],
                }
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(idle_ttl_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "closed": [False],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=TOTALS_TTL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
