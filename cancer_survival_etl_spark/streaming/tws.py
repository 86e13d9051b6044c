"""Spark 4 ``transformWithStateInPandas`` operators — the successor to
``applyInPandasWithState`` with typed state variables, per-key timers,
and state TTL.

Why both APIs are in this repo: ``stateful.py`` carries the
``applyInPandasWithState`` shape (one opaque state tuple per key,
manual timeout plumbing) that every Spark 3.x deployment uses;
this module carries the Spark 4 ``StatefulProcessor`` shape —
composable named state variables (value/list/map), TTL handled by the
state store itself, and timers as first-class callbacks. New pipelines
should use this one.

Scale/state notes: state is keyed and partitioned across executors
exactly like any shuffle; per-key state here is a fixed-width struct
(ema, n, last value) so the store grows with key cardinality only.
``ttl_ms`` bounds idle-key state without any manual timeout
bookkeeping — the store evicts expired values itself.

Environment note: the transformWithState wire protocol needs the
``protobuf`` package (and the RocksDB state store provider); in
sandboxes without it the end-to-end streaming test auto-skips
(``pytest.importorskip``) and the processor's fold logic is pinned
directly against the batch reference with a fake state handle — the
same honest-guard pattern as the multimodal codecs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

EMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ema", DoubleType()),
        StructField("last_value", DoubleType()),
        StructField("n_spikes", LongType()),
    ]
)

_EMA_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("ema", DoubleType()),
        StructField("n_spikes", LongType()),
    ]
)


class EmaSpikeProcessor(StatefulProcessor):
    """Per-key exponential moving average with spike flagging, emitted
    once per micro-batch that touches the key.

    ema ← α·x + (1−α)·ema, processed in (ts, tiebreak) order within
    each batch, and the spike counter is CUMULATIVE state, so every
    emitted row — including the final one — is independent of Arrow
    batch boundaries, micro-batch slicing, and partition arrival order:
    the same determinism discipline as the batch operators. A point is
    a spike when it exceeds ``spike_ratio`` × the EMA *before* it is
    folded in.
    """

    def __init__(
        self,
        alpha: float = 0.2,
        spike_ratio: float = 3.0,
        value_col: str = "value",
        ts_col: str = "ts",
        tiebreak_col: str = "event_id",
        ttl_ms: int | None = None,
    ) -> None:
        self._alpha = float(alpha)
        self._ratio = float(spike_ratio)
        self._value_col = value_col
        self._ts_col = ts_col
        self._tiebreak_col = tiebreak_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "ema", _EMA_STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        n, ema, n_spikes = (
            self._state.get() if self._state.exists() else (0, 0.0, 0)
        )
        last = None
        for pdf in rows:
            pdf = pdf.sort_values([self._ts_col, self._tiebreak_col])
            for x in pdf[self._value_col].astype(float):
                if n > 0 and x > self._ratio * ema:
                    n_spikes += 1
                ema = x if n == 0 else (
                    self._alpha * x + (1.0 - self._alpha) * ema
                )
                n += 1
                last = x
        self._state.update((n, ema, n_spikes))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "ema": [ema],
                "last_value": [last],
                "n_spikes": [n_spikes],
            }
        )

    def close(self) -> None:
        pass


def running_ema_spikes(
    events: DataFrame,
    alpha: float = 0.2,
    spike_ratio: float = 3.0,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming per-user EMA + spike detector over (user_id, ts,
    event_id, value) via ``transformWithStateInPandas`` — update-mode
    output, processing-time semantics, state TTL optional."""
    return events.select(
        "user_id", "ts", "event_id", "value"
    ).groupBy("user_id").transformWithStateInPandas(
        EmaSpikeProcessor(
            alpha=alpha, spike_ratio=spike_ratio, ttl_ms=ttl_ms
        ),
        outputStructType=EMA_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def running_ema_batch(
    events: DataFrame,
    alpha: float = 0.2,
    spike_ratio: float = 3.0,
) -> pd.DataFrame:
    """Batch reference for ``running_ema_spikes``'s END STATE: fold the
    whole history per user in (ts, event_id) order. Pins the streaming
    processor in tests: the final micro-batch emission per user must
    equal this, regardless of how the stream was batched."""
    pdf = (
        events.select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    out = []
    for uid, grp in pdf.groupby("user_id"):
        n, ema, n_spikes, last = 0, 0.0, 0, None
        for x in grp["value"].astype(float):
            if n > 0 and x > spike_ratio * ema:
                n_spikes += 1
            ema = x if n == 0 else alpha * x + (1.0 - alpha) * ema
            n += 1
            last = x
        out.append((uid, n, ema, last, n_spikes))
    return pd.DataFrame(
        out,
        columns=["user_id", "n_events", "ema", "last_value", "n_spikes"],
    )
