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
