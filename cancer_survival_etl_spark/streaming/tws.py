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
    ArrayType,
    DoubleType,
    LongType,
    StringType,
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


SS_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("item", LongType()),
        StructField("count_est", LongType()),
        StructField("err_bound", LongType()),
        StructField("n_total", LongType()),
    ]
)

_SS_STATE_SCHEMA = StructType(
    [
        StructField("n_total", LongType()),
        StructField("items", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errs", ArrayType(LongType())),
    ]
)


class SpaceSavingProcessor(StatefulProcessor):
    """Streaming Space-Saving heavy hitters (Metwally et al.): per key
    (e.g. per event type), track at most ``capacity`` candidate items
    with the classic guarantees — ``count_est ≥ true ≥ count_est −
    err_bound`` for every tracked item, and ANY item whose true
    frequency exceeds ``n_total / capacity`` is guaranteed tracked.
    State is a fixed-capacity struct-of-arrays (bounded regardless of
    stream length or item cardinality — the point of the sketch).

    Rows are folded in (ts, tiebreak) order within each batch, and the
    fold is a pure left fold, so consecutive micro-batches of an
    ordered stream reproduce the single-pass batch result exactly —
    the same batching-independence contract as ``EmaSpikeProcessor``.
    Eviction picks the (count, item)-smallest tracked entry; the
    replacement inherits its count (+1) as ``err_bound`` — every
    tie-break is total, so the summary is deterministic.
    """

    def __init__(
        self,
        capacity: int = 8,
        item_col: str = "user_id",
        ts_col: str = "ts",
        tiebreak_col: str = "event_id",
        ttl_ms: int | None = None,
    ) -> None:
        self._capacity = int(capacity)
        self._item_col = item_col
        self._ts_col = ts_col
        self._tiebreak_col = tiebreak_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "ss", _SS_STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    @staticmethod
    def fold(counters: dict, n_total: int, xs, capacity: int):
        """The Space-Saving step for a sequence of items; ``counters``
        maps item → [count, err] and is mutated in place."""
        for x in xs:
            n_total += 1
            if x in counters:
                counters[x][0] += 1
            elif len(counters) < capacity:
                counters[x] = [1, 0]
            else:
                evict = min(counters, key=lambda i: (counters[i][0], i))
                m = counters.pop(evict)[0]
                counters[x] = [m + 1, m]
        return n_total

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            n_total, items, counts, errs = self._state.get()
            counters = {
                int(i): [int(c), int(e)]
                for i, c, e in zip(items, counts, errs)
            }
        else:
            n_total, counters = 0, {}
        for pdf in rows:
            pdf = pdf.sort_values([self._ts_col, self._tiebreak_col])
            n_total = self.fold(
                counters,
                n_total,
                (int(x) for x in pdf[self._item_col]),
                self._capacity,
            )
        tracked = sorted(counters)
        self._state.update(
            (
                n_total,
                tracked,
                [counters[i][0] for i in tracked],
                [counters[i][1] for i in tracked],
            )
        )
        yield pd.DataFrame(
            {
                "event_type": key[0],
                "item": tracked,
                "count_est": [counters[i][0] for i in tracked],
                "err_bound": [counters[i][1] for i in tracked],
                "n_total": n_total,
            }
        )

    def close(self) -> None:
        pass


def running_heavy_hitters(
    events: DataFrame,
    capacity: int = 8,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming per-event-type Space-Saving heavy hitters over
    (event_type, ts, event_id, user_id) via
    ``transformWithStateInPandas`` — update-mode output; each
    micro-batch emission is the key's full current summary (at most
    ``capacity`` rows), so the latest emission per key IS the sketch."""
    return events.select(
        "event_type", "ts", "event_id", "user_id"
    ).groupBy("event_type").transformWithStateInPandas(
        SpaceSavingProcessor(capacity=capacity, ttl_ms=ttl_ms),
        outputStructType=SS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def space_saving_batch(
    events: DataFrame, capacity: int = 8
) -> pd.DataFrame:
    """Batch reference for ``running_heavy_hitters``'s END STATE: the
    same Space-Saving fold over each type's full history in (ts,
    event_id) order. Pins the streaming processor in tests."""
    pdf = (
        events.select("event_type", "ts", "event_id", "user_id")
        .toPandas()
        .sort_values(["event_type", "ts", "event_id"])
    )
    out = []
    for et, grp in pdf.groupby("event_type"):
        counters: dict = {}
        n_total = SpaceSavingProcessor.fold(
            counters, 0, (int(x) for x in grp["user_id"]), capacity
        )
        for i in sorted(counters):
            out.append((et, i, counters[i][0], counters[i][1], n_total))
    return pd.DataFrame(
        out,
        columns=["event_type", "item", "count_est", "err_bound", "n_total"],
    )


CM_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("item", LongType()),
        StructField("count_est", LongType()),
        StructField("n_total", LongType()),
    ]
)

_CM_STATE_SCHEMA = StructType(
    [
        StructField("n_total", LongType()),
        StructField("counters", ArrayType(LongType())),
    ]
)


def _cm_buckets(item: int, depth: int, width: int) -> list[int]:
    """Deterministic md5-derived bucket per hash row — engine- and
    session-independent (no Python hash randomization)."""
    import hashlib

    return [
        int(hashlib.md5(f"{j}|{item}".encode()).hexdigest()[:8], 16) % width
        for j in range(depth)
    ]


class CountMinProcessor(StatefulProcessor):
    """Streaming count-min sketch (Cormode & Muthukrishnan): per key, a
    depth×width counter matrix answering point frequency queries with
    the one-sided guarantee est ≥ true and est ≤ true + εn (ε = e/width)
    with probability 1−(1/e)^depth. State is depth·width longs — FIXED
    regardless of stream length or item cardinality, and updates are
    pure counting, so the sketch is batching- AND order-independent
    (stronger than the Space-Saving processor's ordered-fold contract).

    Each micro-batch emits the current estimate for every item the
    batch touched (the practical point-query contract — emit what
    changed); the batch sibling ``count_min_batch`` replays the full
    history for the end-state pin.
    """

    def __init__(
        self,
        depth: int = 4,
        width: int = 64,
        item_col: str = "user_id",
        ttl_ms: int | None = None,
    ) -> None:
        self._depth = int(depth)
        self._width = int(width)
        self._item_col = item_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "cm", _CM_STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        d, w = self._depth, self._width
        if self._state.exists():
            n_total, counters = self._state.get()
            counters = list(counters)
        else:
            n_total, counters = 0, [0] * (d * w)
        touched = set()
        for pdf in rows:
            for x in pdf[self._item_col]:
                x = int(x)
                touched.add(x)
                n_total += 1
                for j, b in enumerate(_cm_buckets(x, d, w)):
                    counters[j * w + b] += 1
        self._state.update((n_total, counters))
        items = sorted(touched)
        ests = [
            min(
                counters[j * w + b]
                for j, b in enumerate(_cm_buckets(x, d, w))
            )
            for x in items
        ]
        yield pd.DataFrame(
            {
                "event_type": key[0],
                "item": items,
                "count_est": ests,
                "n_total": n_total,
            }
        )

    def close(self) -> None:
        pass


def running_count_min(
    events: DataFrame,
    depth: int = 4,
    width: int = 64,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming per-event-type count-min point estimates via
    ``transformWithStateInPandas`` — update mode; the latest emission
    per (type, item) carries that item's current estimate."""
    return events.select(
        "event_type", "ts", "event_id", "user_id"
    ).groupBy("event_type").transformWithStateInPandas(
        CountMinProcessor(depth=depth, width=width, ttl_ms=ttl_ms),
        outputStructType=CM_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def count_min_batch(
    events: DataFrame, depth: int = 4, width: int = 64
) -> pd.DataFrame:
    """Batch reference for ``running_count_min``'s end state: build the
    sketch over each type's full history, emit every item's estimate."""
    pdf = events.select("event_type", "user_id").toPandas()
    out = []
    for et, grp in pdf.groupby("event_type"):
        counters = [0] * (depth * width)
        n_total = 0
        for x in grp["user_id"]:
            n_total += 1
            for j, b in enumerate(_cm_buckets(int(x), depth, width)):
                counters[j * width + b] += 1
        for x in sorted(set(int(v) for v in grp["user_id"])):
            est = min(
                counters[j * width + b]
                for j, b in enumerate(_cm_buckets(x, depth, width))
            )
            out.append((et, x, est, n_total))
    return pd.DataFrame(
        out, columns=["event_type", "item", "count_est", "n_total"]
    )
