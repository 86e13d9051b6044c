"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in windowed aggregations can't express —
cross-batch running state per key, custom eviction, emit-on-change —
Structured Streaming's arbitrary-state API is the Spark-native shape:
state lives in the state store (checkpointed, partitioned by key), and
each micro-batch streams Arrow batches of that key's new rows through
Python.

Scale: state is partitioned by the group key across executors; the
shuffle per micro-batch moves only new rows. Keep per-key state tiny
(fixed-width aggregates, never raw rows) and always configure a timeout
for keys that go quiet — unbounded key cardinality with NoTimeout is a
state-store leak.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("m", DoubleType()),
    ]
)


def running_user_totals(
    events: DataFrame,
    timeout: str = GroupStateTimeout.ProcessingTimeTimeout,
    idle_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Per-user running (count, sum, max) across micro-batches, emitted
    on every batch that touches the user — the arbitrary-stateful analog
    of a streaming ``groupBy(user_id).agg(...)`` in update mode, but
    with explicit control of state shape and eviction.

    Input must be a *streaming* DataFrame with columns
    (user_id long, value double). Idle users' state is dropped after
    ``idle_timeout_ms`` of processing time; their next event restarts
    from zero (documented semantics of eviction, not a bug).
    """

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            if len(pdf):
                m = max(m, float(pdf["value"].max()))
        state.update((n, s, m))
        if timeout == GroupStateTimeout.ProcessingTimeTimeout:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "max_value": [m],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def running_user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch analog of the final state ``running_user_totals`` converges
    to on a bounded input — the cross-check used by tests."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.max("value").alias("max_value"),
    )
