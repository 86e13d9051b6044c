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
from pyspark.sql import functions as F
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


GK_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_total", LongType()),
        StructField("n_tuples", LongType()),
        StructField("p50", DoubleType()),
        StructField("p95", DoubleType()),
        StructField("p99", DoubleType()),
    ]
)

_GK_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("vs", ArrayType(DoubleType())),
        StructField("gs", ArrayType(LongType())),
        StructField("ds", ArrayType(LongType())),
    ]
)


class GkQuantileProcessor(StatefulProcessor):
    """Streaming per-key quantiles via a Greenwald-Khanna summary —
    the DETERMINISTIC mergeless quantile sketch (no compaction coin
    flips, unlike KLL): per key, a sorted list of (v, g, Δ) tuples
    maintaining the invariant g_i + Δ_i ≤ 2εn, which guarantees every
    φ-quantile answer is within rank εn of exact. State is
    O((1/ε)·log(εn)) tuples — logarithmic in stream length — vs
    unbounded exact buffering.

    Like Space-Saving (and unlike count-min), the summary is an
    ORDERED fold: the batch sibling ``gk_quantile_batch`` replays the
    identical (ts, event_id)-ordered history for the end-state pin,
    and the ε-rank guarantee holds for ANY order. Each micro-batch
    emits the key's current (n, #tuples, p50/p95/p99)."""

    def __init__(
        self,
        eps: float = 0.01,
        value_col: str = "value",
        ttl_ms: int | None = None,
    ) -> None:
        self._eps = float(eps)
        self._value_col = value_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "gk", _GK_STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    @staticmethod
    def fold(summary: list, n: int, values, eps: float) -> int:
        """Insert ``values`` into the (v, g, d) tuple list in order,
        compressing every ⌊1/(2ε)⌋ inserts; returns the new n."""
        import bisect

        period = max(1, int(1.0 / (2.0 * eps)))
        vs_key = [t[0] for t in summary]
        for v in values:
            v = float(v)
            i = bisect.bisect_right(vs_key, v)
            d = int(2.0 * eps * n) if 0 < i < len(summary) else 0
            summary.insert(i, [v, 1, d])
            vs_key.insert(i, v)
            n += 1
            if n % period == 0:
                thresh = 2.0 * eps * n
                j = len(summary) - 2
                while j >= 1:
                    g, gn, dn = (
                        summary[j][1],
                        summary[j + 1][1],
                        summary[j + 1][2],
                    )
                    if g + gn + dn <= thresh:
                        summary[j + 1][1] = g + gn
                        del summary[j]
                        del vs_key[j]
                    j -= 1
        return n

    @staticmethod
    def query(summary: list, n: int, phi: float, eps: float) -> float:
        """First v whose r_max exceeds ⌈φn⌉ + εn, stepped back one —
        the textbook GK answer, within rank εn of exact."""
        if not summary:
            return float("nan")
        import math

        r = max(1, math.ceil(phi * n))
        bound = r + eps * n
        rmin = 0
        for i, (v, g, d) in enumerate(summary):
            rmin += g
            if rmin + d > bound:
                return summary[max(0, i - 1)][0]
        return summary[-1][0]

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            n, vs, gs, ds = self._state.get()
            summary = [[float(v), int(g), int(d)]
                       for v, g, d in zip(vs, gs, ds)]
        else:
            n, summary = 0, []
        for pdf in rows:
            n = self.fold(summary, n, pdf[self._value_col], self._eps)
        self._state.update(
            (
                n,
                [t[0] for t in summary],
                [t[1] for t in summary],
                [t[2] for t in summary],
            )
        )
        q = lambda p: self.query(summary, n, p, self._eps)  # noqa: E731
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_total": [n],
                "n_tuples": [len(summary)],
                "p50": [q(0.5)],
                "p95": [q(0.95)],
                "p99": [q(0.99)],
            }
        )

    def close(self) -> None:
        pass


def running_gk_quantiles(
    events: DataFrame,
    eps: float = 0.01,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming per-event-type GK quantiles via
    ``transformWithStateInPandas`` — update mode; the latest emission
    per type carries its current p50/p95/p99 within rank εn."""
    return events.select(
        "event_type", "ts", "event_id", "value"
    ).groupBy("event_type").transformWithStateInPandas(
        GkQuantileProcessor(eps=eps, ttl_ms=ttl_ms),
        outputStructType=GK_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def gk_quantile_batch(
    events: DataFrame, eps: float = 0.01
) -> pd.DataFrame:
    """Batch reference for ``running_gk_quantiles``'s END STATE: the
    same GK fold over each type's full history in (ts, event_id)
    order. Pins the streaming processor in tests."""
    pdf = (
        events.select("event_type", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["event_type", "ts", "event_id"])
    )
    out = []
    for et, grp in pdf.groupby("event_type"):
        summary: list = []
        n = GkQuantileProcessor.fold(summary, 0, grp["value"], eps)
        q = lambda p: GkQuantileProcessor.query(summary, n, p, eps)  # noqa: E731
        out.append((et, n, len(summary), q(0.5), q(0.95), q(0.99)))
    return pd.DataFrame(
        out,
        columns=["event_type", "n_total", "n_tuples", "p50", "p95", "p99"],
    )


KLL_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_total", LongType()),
        StructField("n_items", LongType()),
        StructField("p50", DoubleType()),
        StructField("p95", DoubleType()),
        StructField("p99", DoubleType()),
    ]
)

_KLL_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("values", ArrayType(DoubleType())),
        StructField("lvl", ArrayType(LongType())),
        StructField("parity", ArrayType(LongType())),
    ]
)


class KllQuantileProcessor(StatefulProcessor):
    """Streaming per-key quantiles via a DETERMINISTIC-compaction KLL
    compactor ladder — the ``transformWithState`` twin of the batch
    ``operators/incremental.py::incremental_update_sketched`` path
    (which folds the JVM datasketches KLL into keyed state), closing
    the batch/streaming symmetry the engine already has for dedup and
    heavy hitters.

    Level l holds items of weight 2^l; level capacities follow KLL's
    geometric schedule cap(l) = max(2, ⌈k·(2/3)^(H−1−l)⌉) (top levels
    widest). A full level compacts: sort, promote every other item
    (doubled weight) to level l+1, discard the rest — KLL's random
    offset coin is replaced by a PER-LEVEL ALTERNATING PARITY so the
    fold is bit-reproducible (the repo's exact-adjudication posture;
    alternation keeps the compactor unbiased across compactions). An
    odd level leaves its largest item in place so total weight always
    equals n EXACTLY — rank queries never drift from the true count.

    Like GK and Space-Saving, the fold is an ORDERED one: the batch
    sibling ``kll_quantile_batch`` replays the identical
    (ts, event_id)-ordered history for the end-state pin, and the
    rank-error guarantee (O(log(n/k)/k) for the deterministic
    variant) holds for ANY arrival order. State is O(k·log(n/k))
    per key — vs GK's O((1/ε)log(εn)) tuples, KLL's footprint is
    set by k alone, the same knob the batch JVM sketch uses, so the
    two paths are capacity-comparable."""

    def __init__(
        self,
        k: int = 200,
        value_col: str = "value",
        ttl_ms: int | None = None,
    ) -> None:
        self._k = int(k)
        self._value_col = value_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "kll", _KLL_STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    @staticmethod
    def _cap(level: int, height: int, k: int) -> int:
        import math

        return max(2, math.ceil(k * (2.0 / 3.0) ** (height - 1 - level)))

    @classmethod
    def fold(cls, levels: list, parity: list, values, k: int) -> None:
        """Insert ``values`` into the ladder in order, compacting
        full levels bottom-up with alternating-parity selection."""
        if not levels:
            levels.append([])
            parity.append(0)
        for v in values:
            # Append through ``levels[0]`` (never an alias): compaction
            # below mutates the level lists in place, so a name bound to
            # the original list object would be orphaned after the first
            # level-0 compaction and every later insert silently lost.
            levels[0].append(float(v))
            lv = 0
            while lv < len(levels) and len(levels[lv]) >= cls._cap(
                lv, len(levels), k
            ):
                items = sorted(levels[lv])
                keep_last = len(items) % 2 == 1
                tail = items[-1] if keep_last else None
                body = items[:-1] if keep_last else items
                promoted = body[parity[lv]::2]
                parity[lv] ^= 1
                levels[lv][:] = [tail] if keep_last else []
                if lv + 1 == len(levels):
                    levels.append([])
                    parity.append(0)
                levels[lv + 1].extend(promoted)
                lv += 1

    @staticmethod
    def query(levels: list, phi: float, n: int) -> float:
        """Smallest value whose cumulative weight reaches ⌈φn⌉ —
        total ladder weight equals n exactly by construction."""
        if n <= 0:
            return float("nan")
        import math

        target = max(1, math.ceil(phi * n))
        pairs = sorted(
            (v, 1 << lv) for lv, items in enumerate(levels)
            for v in items
        )
        acc = 0
        for v, w in pairs:
            acc += w
            if acc >= target:
                return v
        raise AssertionError(
            "KLL ladder weight deficit: cumulative weight "
            f"{acc} < target {target} (phi={phi}, n={n}) — the "
            "total-weight==n invariant is violated"
        )

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            n, vals, lvls, par = self._state.get()
            h = (max(lvls) + 1) if len(lvls) else 1
            levels: list = [[] for _ in range(h)]
            for v, lv in zip(vals, lvls):
                levels[int(lv)].append(float(v))
            parity = [int(x) for x in par]
        else:
            n, levels, parity = 0, [[]], [0]
        for pdf in rows:
            vs = pdf[self._value_col]
            self.fold(levels, parity, vs, self._k)
            n += len(vs)
        flat_v = [v for items in levels for v in items]
        flat_l = [lv for lv, items in enumerate(levels) for _ in items]
        self._state.update((n, flat_v, flat_l, parity))
        q = lambda p: self.query(levels, p, n)  # noqa: E731
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_total": [n],
                "n_items": [len(flat_v)],
                "p50": [q(0.5)],
                "p95": [q(0.95)],
                "p99": [q(0.99)],
            }
        )

    def close(self) -> None:
        pass


def running_kll_quantiles(
    events: DataFrame,
    k: int = 200,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming per-event-type KLL quantiles via
    ``transformWithStateInPandas`` — update mode; the latest emission
    per type carries its current p50/p95/p99. The streaming face of
    the batch ``incremental_update_sketched`` → ``state_quantile``
    maintenance loop."""
    return events.select(
        "event_type", "ts", "event_id", "value"
    ).groupBy("event_type").transformWithStateInPandas(
        KllQuantileProcessor(k=k, ttl_ms=ttl_ms),
        outputStructType=KLL_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def kll_quantile_batch(events: DataFrame, k: int = 200) -> pd.DataFrame:
    """Batch reference for ``running_kll_quantiles``'s END STATE: the
    same deterministic KLL fold over each type's full history in
    (ts, event_id) order. Pins the streaming processor in tests."""
    pdf = (
        events.select("event_type", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["event_type", "ts", "event_id"])
    )
    out = []
    for et, grp in pdf.groupby("event_type"):
        levels: list = [[]]
        parity: list = [0]
        KllQuantileProcessor.fold(levels, parity, grp["value"], k)
        n = len(grp)
        q = lambda p: KllQuantileProcessor.query(levels, p, n)  # noqa: E731
        out.append(
            (et, n, sum(len(x) for x in levels), q(0.5), q(0.95),
             q(0.99))
        )
    return pd.DataFrame(
        out,
        columns=["event_type", "n_total", "n_items", "p50", "p95",
                 "p99"],
    )


CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("cusum_pos", LongType()),
        StructField("cusum_neg", LongType()),
        StructField("n_alarm_pos", LongType()),
        StructField("n_alarm_neg", LongType()),
    ]
)

_CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s_pos", LongType()),
        StructField("s_neg", LongType()),
        StructField("a_pos", LongType()),
        StructField("a_neg", LongType()),
    ]
)


class CusumProcessor(StatefulProcessor):
    """Streaming two-sided CUSUM chart per key (Page 1954) — the
    ONLINE form of ``timeseries.cusum_changepoints``: the batch
    operator references each key's own full-series mean (unknowable
    mid-stream), so the streaming twin takes the classic KNOWN
    in-control target ``ref_cents`` and runs the textbook recursion

        S⁺ ← max(0, S⁺ + (y − ref − k)),  alarm & restart at S⁺ ≥ h
        S⁻ ← max(0, S⁻ + (ref − y − k)),  alarm & restart at S⁻ ≥ h

    with Page's restart-after-alarm convention. ALL state is exact
    integer cents (value cents via banker's rounding, shared with
    the batch reference), so the fold is bit-identical under any
    Arrow-batch slicing and micro-batch arrival order — the sliced-
    fold == batch pin holds EXACTLY, no float drift. Rows fold in
    (ts, tiebreak) order within each batch; state is a fixed-width
    5-long struct per key (store grows with key cardinality only;
    ``ttl_ms`` bounds idle keys)."""

    def __init__(
        self,
        ref_cents: int,
        k_slack_cents: int = 0,
        h_cents: int = 500,
        value_col: str = "value",
        ts_col: str = "ts",
        tiebreak_col: str = "event_id",
        ttl_ms: int | None = None,
    ) -> None:
        self._ref = int(ref_cents)
        self._k = int(k_slack_cents)
        self._h = int(h_cents)
        self._value_col = value_col
        self._ts_col = ts_col
        self._tiebreak_col = tiebreak_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "cusum", _CUSUM_STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def fold(self, st, values):
        n, s_pos, s_neg, a_pos, a_neg = st
        for x in values:
            y = int(round(float(x) * 100))
            s_pos = max(0, s_pos + (y - self._ref - self._k))
            if s_pos >= self._h:
                a_pos += 1
                s_pos = 0
            s_neg = max(0, s_neg + (self._ref - y - self._k))
            if s_neg >= self._h:
                a_neg += 1
                s_neg = 0
            n += 1
        return n, s_pos, s_neg, a_pos, a_neg

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        st = (
            self._state.get()
            if self._state.exists()
            else (0, 0, 0, 0, 0)
        )
        for pdf in rows:
            pdf = pdf.sort_values([self._ts_col, self._tiebreak_col])
            st = self.fold(st, pdf[self._value_col])
        self._state.update(st)
        n, s_pos, s_neg, a_pos, a_neg = st
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "cusum_pos": [s_pos],
                "cusum_neg": [s_neg],
                "n_alarm_pos": [a_pos],
                "n_alarm_neg": [a_neg],
            }
        )

    def close(self) -> None:
        pass


def running_cusum(
    events: DataFrame,
    ref_cents: int,
    k_slack_cents: int = 0,
    h_cents: int = 500,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming per-user two-sided CUSUM drift chart over (user_id,
    ts, event_id, value) via ``transformWithStateInPandas`` —
    update-mode emissions of the exact-integer chart state."""
    return events.select(
        "user_id", "ts", "event_id", "value"
    ).groupBy("user_id").transformWithStateInPandas(
        CusumProcessor(
            ref_cents=ref_cents,
            k_slack_cents=k_slack_cents,
            h_cents=h_cents,
            ttl_ms=ttl_ms,
        ),
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def cusum_batch(
    events: DataFrame,
    ref_cents: int,
    k_slack_cents: int = 0,
    h_cents: int = 500,
) -> pd.DataFrame:
    """Batch reference for ``running_cusum``'s END STATE: fold each
    user's full history in (ts, event_id) order with the identical
    integer recursion. Test-only single-process reference (the
    running_ema_batch contract)."""
    pdf = (
        events.select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    proc = CusumProcessor(
        ref_cents=ref_cents,
        k_slack_cents=k_slack_cents,
        h_cents=h_cents,
    )
    out = []
    for uid, grp in pdf.groupby("user_id"):
        st = proc.fold((0, 0, 0, 0, 0), grp["value"])
        out.append((uid, *st))
    return pd.DataFrame(
        out,
        columns=[
            "user_id", "n_events", "cusum_pos", "cusum_neg",
            "n_alarm_pos", "n_alarm_neg",
        ],
    )


BOTTOMK_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_seen", LongType()),
        StructField("sample_ids", ArrayType(LongType())),
    ]
)

_BOTTOMK_STATE_SCHEMA = StructType(
    [
        StructField("n_seen", LongType()),
        StructField("hashes", ArrayType(StringType())),
        StructField("ids", ArrayType(LongType())),
    ]
)


class BottomKSampleProcessor(StatefulProcessor):
    """Streaming uniform k-sample per key via the bottom-k / KMV
    priority trick: every element's priority is md5(id) and the
    state keeps the k SMALLEST (priority, id) pairs — a mergeable,
    fully deterministic sketch (the streaming twin of
    ``llm/sampling.py::weighted_hash_sample``'s A-ES idea with unit
    weights). Because priorities are pure functions of the ids, the
    retained set is independent of arrival order, Arrow batch
    slicing, and micro-batch boundaries — the sliced-fold == batch
    pin holds EXACTLY, and the same ids fall out of a batch
    ORDER BY md5(id) LIMIT k. State is O(k) strings per key."""

    def __init__(
        self,
        k: int = 32,
        id_col: str = "event_id",
        ttl_ms: int | None = None,
    ) -> None:
        self._k = int(k)
        self._id_col = id_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "bottomk", _BOTTOMK_STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def fold(self, st, ids):
        import hashlib

        n_seen, hashes, kept = st
        pairs = list(zip(hashes, kept))
        for i in ids:
            i = int(i)
            h = hashlib.md5(str(i).encode()).hexdigest()
            pairs.append((h, i))
            n_seen += 1
        pairs.sort()
        # dedup identical ids (same priority) then truncate to k
        seen = set()
        uniq = []
        for h, i in pairs:
            if i not in seen:
                seen.add(i)
                uniq.append((h, i))
        uniq = uniq[: self._k]
        return (
            n_seen,
            [h for h, _ in uniq],
            [i for _, i in uniq],
        )

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        st = (
            tuple(self._state.get())
            if self._state.exists()
            else (0, [], [])
        )
        for pdf in rows:
            st = self.fold(st, pdf[self._id_col])
        self._state.update(st)
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_seen": [st[0]],
                "sample_ids": [list(st[2])],
            }
        )

    def close(self) -> None:
        pass


def running_bottom_k_sample(
    events: DataFrame,
    k: int = 32,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming per-event-type uniform k-sample over (event_type,
    event_id) via ``transformWithStateInPandas`` — update-mode
    emissions of the deterministic bottom-k sketch."""
    return events.select(
        "event_type", "event_id"
    ).groupBy("event_type").transformWithStateInPandas(
        BottomKSampleProcessor(k=k, ttl_ms=ttl_ms),
        outputStructType=BOTTOMK_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def bottom_k_sample_batch(
    events: DataFrame, k: int = 32
) -> pd.DataFrame:
    """Batch reference for ``running_bottom_k_sample``'s END STATE:
    the k smallest md5 priorities per event_type over the full
    history (test-only single-process reference)."""
    import hashlib

    pdf = events.select("event_type", "event_id").toPandas()
    out = []
    for et, grp in pdf.groupby("event_type"):
        ids = sorted(set(int(i) for i in grp["event_id"]))
        pairs = sorted(
            (hashlib.md5(str(i).encode()).hexdigest(), i)
            for i in ids
        )
        out.append(
            (et, len(grp), [i for _, i in pairs[:k]])
        )
    return pd.DataFrame(
        out, columns=["event_type", "n_seen", "sample_ids"]
    )


KM_OUTPUT_SCHEMA = StructType(
    [
        StructField("group_key", StringType()),
        StructField("n_total", LongType()),
        StructField("duration", LongType()),
        StructField("n_risk", LongType()),
        StructField("n_event", LongType()),
        StructField("n_censored", LongType()),
        StructField("survival", DoubleType()),
    ]
)

_KM_STATE_SCHEMA = StructType(
    [
        StructField("durations", ArrayType(LongType())),
        StructField("d", ArrayType(LongType())),
        StructField("c", ArrayType(LongType())),
    ]
)


def _half_up_micro(v: float) -> int:
    """Python twin of the operator lattice's ``F.round(x·1e6, 0)``
    (HALF_UP on the binary double) — floor(|t|+0.5) with the sign
    restored, evaluated on the same double product the JVM sees."""
    import math

    t = v * 1000000.0
    m = int(math.floor(abs(t) + 0.5))
    return m if t >= 0 else -m


class KmCurveProcessor(StatefulProcessor):
    """Streaming Kaplan-Meier curve per key — the online twin of
    ``operators.survival.km_curve``: subjects arrive as (group,
    duration, event) rows and the processor maintains the EXACT
    per-duration cell counts (d_t events, c_t censorings) as integer
    state, then re-emits the full product-limit curve each
    micro-batch. Because the state is pure counters, the fold is
    commutative and associative — the emitted curve is bit-identical
    under ANY arrival order, batch slicing, or late data (no
    watermark needed for correctness; a watermark on the source
    merely bounds replay). The curve evaluation reuses the batch
    operator's micro log-lattice (HALF_UP 1e-6 terms, S pinned to
    exactly 0 once d == n_risk), so the end state pins against
    ``km_curve``'s distributed output cell-for-cell.

    State per key is one (durations[], d[], c[]) struct — bounded by
    the #distinct durations (the caller picks the granularity:
    integer days/weeks keep it small), NOT by subject count; store
    grows with key cardinality only; ``ttl_ms`` bounds idle keys."""

    def __init__(
        self,
        duration_col: str = "duration",
        event_col: str = "event",
        ttl_ms: int | None = None,
    ) -> None:
        self._duration_col = duration_col
        self._event_col = event_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "km_cells", _KM_STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def fold(self, st, durations, events):
        """Accumulate (d, c) counters per duration — pure integer
        counts, so slicing/order independence is exact."""
        acc = {
            t: [dv, cv]
            for t, dv, cv in zip(st[0], st[1], st[2])
        }
        for t, e in zip(durations, events):
            cell = acc.setdefault(int(t), [0, 0])
            if int(e):
                cell[0] += 1
            else:
                cell[1] += 1
        ts = sorted(acc)
        return (
            ts,
            [acc[t][0] for t in ts],
            [acc[t][1] for t in ts],
        )

    @staticmethod
    def curve(st):
        """The km_curve lattice, sequentially over the sorted cells:
        n_risk by suffix count, micro HALF_UP log terms, survival =
        exp(Σ terms / 1e6) pinned to exactly 0 once d == n_risk."""
        import math

        ts, ds, cs = st
        n_total = sum(ds) + sum(cs)
        rows = []
        removed = 0
        acc = 0
        dead = False
        for t, d, c in zip(ts, ds, cs):
            n_risk = n_total - removed
            if 0 < d < n_risk:
                acc += _half_up_micro(math.log(1.0 - d / n_risk))
            if d > 0 and d == n_risk:
                dead = True
            # same 6-dp HALF_UP publication rounding as km_curve
            surv = (
                0.0
                if dead
                else _half_up_micro(math.exp(acc / 1000000.0)) / 1000000.0
            )
            rows.append((t, n_risk, d, c, surv))
            removed += d + c
        return rows

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        st = (
            tuple(self._state.get())
            if self._state.exists()
            else ([], [], [])
        )
        for pdf in rows:
            st = self.fold(
                st, pdf[self._duration_col], pdf[self._event_col]
            )
        self._state.update(st)
        curve = self.curve(st)
        n_total = sum(st[1]) + sum(st[2])
        yield pd.DataFrame(
            {
                "group_key": [key[0]] * len(curve),
                # n_total is MONOTONE per key, so an update-mode sink
                # can select the final curve with max_by(·, n_total)
                "n_total": [n_total] * len(curve),
                "duration": [r[0] for r in curve],
                "n_risk": [r[1] for r in curve],
                "n_event": [r[2] for r in curve],
                "n_censored": [r[3] for r in curve],
                "survival": [r[4] for r in curve],
            }
        )

    def close(self) -> None:
        pass


def running_km_curve(
    subjects: DataFrame,
    group_col: str = "event_type",
    duration_col: str = "duration",
    event_col: str = "event",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming per-group Kaplan-Meier survival curve over
    (group, duration, event) subject rows via
    ``transformWithStateInPandas`` — update-mode emissions of the
    full exact-counter product-limit curve. Apply a watermark on the
    SOURCE's event-time column to bound state replay; the curve
    itself is arrival-order exact by construction."""
    return subjects.select(
        F.col(group_col).cast("string").alias("group_key"),
        F.col(duration_col).cast("long").alias("duration"),
        F.col(event_col).cast("int").alias("event"),
    ).groupBy("group_key").transformWithStateInPandas(
        KmCurveProcessor(ttl_ms=ttl_ms),
        outputStructType=KM_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def km_stream_batch(
    subjects: DataFrame,
    group_col: str = "event_type",
    duration_col: str = "duration",
    event_col: str = "event",
) -> pd.DataFrame:
    """Batch reference for ``running_km_curve``'s END STATE: fold each
    group's full history through the identical counter state and emit
    the identical lattice curve (test-only single-process reference —
    and pinned cell-for-cell against the DISTRIBUTED
    ``operators.survival.km_curve`` in tests)."""
    pdf = subjects.select(
        F.col(group_col).cast("string").alias("group_key"),
        F.col(duration_col).cast("long").alias("duration"),
        F.col(event_col).cast("int").alias("event"),
    ).toPandas()
    proc = KmCurveProcessor()
    out = []
    for g, grp in pdf.groupby("group_key"):
        st = proc.fold(([], [], []), grp["duration"], grp["event"])
        n_total = sum(st[1]) + sum(st[2])
        for t, n_risk, d, c, surv in proc.curve(st):
            out.append((g, n_total, t, n_risk, d, c, surv))
    return pd.DataFrame(
        out,
        columns=[
            "group_key", "n_total", "duration", "n_risk", "n_event",
            "n_censored", "survival",
        ],
    )


AJ_OUTPUT_SCHEMA = StructType(
    [
        StructField("group_key", StringType()),
        StructField("n_total", LongType()),
        StructField("duration", LongType()),
        StructField("cause", LongType()),
        StructField("n_risk", LongType()),
        StructField("n_event", LongType()),
        StructField("survival_allcause", DoubleType()),
        StructField("cif", DoubleType()),
    ]
)

_AJ_STATE_SCHEMA = StructType(
    [
        StructField("durations", ArrayType(LongType())),
        StructField("censored", ArrayType(LongType())),
        # row-major (duration, cause) grid: len == len(durations) * k
        StructField("cause_counts", ArrayType(LongType())),
    ]
)


class AjCifProcessor(StatefulProcessor):
    """Streaming Aalen-Johansen cumulative incidence per key — the
    competing-risks twin of ``KmCurveProcessor`` and the online twin
    of ``operators.survival.cif_competing_risks``: subjects arrive as
    (group, duration, cause) rows with cause ∈ {0} ∪ causes (0 =
    censored), the processor maintains EXACT per-duration integer
    counters (censorings + one count per declared cause), and
    re-emits the full CIF table each micro-batch:

        CIF_k(t) = Σ_{s ≤ t}  S(s−) · d_k(s) / n(s)

    with S(s−) the all-cause KM left limit. Counter state makes the
    fold commutative/associative, so the emitted table is
    bit-identical under any arrival order, batch slicing, or late
    data — no watermark needed for correctness. The curve evaluation
    replays the batch operator's exact lattice (HALF_UP 1e-6 micro
    log terms for S, micro increments for each CIF partial sum, 6-dp
    HALF_UP publication rounding), so the end state pins against the
    distributed ``cif_competing_risks`` CELL-FOR-CELL (counts
    exactly, survival/cif to float parity — pinned in tests).

    State per key is one (durations[], censored[], cause_counts[])
    struct — bounded by #distinct durations × |causes|, never by
    subject count; ``ttl_ms`` bounds idle keys."""

    def __init__(
        self,
        causes: list[int],
        duration_col: str = "duration",
        cause_col: str = "cause",
        ttl_ms: int | None = None,
    ) -> None:
        ks = [int(k) for k in causes]
        if len(ks) == 0 or len(set(ks)) != len(ks) or any(
            k <= 0 for k in ks
        ):
            raise ValueError(
                "AjCifProcessor: causes must be distinct positive "
                "integers (0 is the censoring code)"
            )
        self._causes = ks
        self._duration_col = duration_col
        self._cause_col = cause_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "aj_cells", _AJ_STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def fold(self, st, durations, causes):
        """Accumulate (censored, d_k per declared cause) counters per
        duration — pure integer counts, so slicing/order independence
        is exact. An undeclared positive cause code raises (silently
        dropping a competing event would bias every CIF)."""
        nk = len(self._causes)
        pos = {k: j for j, k in enumerate(self._causes)}
        acc = {
            t: [cv, *st[2][i * nk:(i + 1) * nk]]
            for i, (t, cv) in enumerate(zip(st[0], st[1]))
        }
        for t, k in zip(durations, causes):
            cell = acc.setdefault(int(t), [0] * (nk + 1))
            k = int(k)
            if k == 0:
                cell[0] += 1
            elif k in pos:
                cell[1 + pos[k]] += 1
            else:
                raise ValueError(
                    f"AjCifProcessor: undeclared cause code {k} "
                    f"(declared: {self._causes})"
                )
        ts = sorted(acc)
        return (
            ts,
            [acc[t][0] for t in ts],
            [acc[t][1 + j] for t in ts for j in range(nk)],
        )

    def curve(self, st):
        """The cif_competing_risks lattice, sequentially over the
        sorted cells: n_risk by suffix count, micro HALF_UP log terms
        for all-cause S with the d == n_risk death pin, S(s−) as the
        EXCLUSIVE prefix, micro HALF_UP CIF increments
        S(s−)·d_k/n(s), 6-dp HALF_UP publication rounding on both
        survival_allcause and cif."""
        import math

        ts, cs, grid = st
        nk = len(self._causes)
        n_total = sum(cs) + sum(grid)
        rows = []
        removed = 0
        lt0 = 0          # exclusive micro log-S prefix
        dead0 = False    # any prior cell with d == n_risk
        t_acc = [0] * nk  # exclusive micro CIF prefixes
        for i, t in enumerate(ts):
            dk = grid[i * nk:(i + 1) * nk]
            d = sum(dk)
            c = cs[i]
            n_risk = n_total - removed
            lt = (
                _half_up_micro(math.log(1.0 - d / n_risk))
                if 0 < d < n_risk
                else 0
            )
            dall = d > 0 and d == n_risk
            s_left = 0.0 if dead0 else math.exp(lt0 / 1000000.0)
            s_incl = (
                0.0
                if dead0 or dall
                else math.exp((lt0 + lt) / 1000000.0)
            )
            surv_pub = _half_up_micro(s_incl) / 1000000.0
            for j, k in enumerate(self._causes):
                tk = (
                    _half_up_micro(s_left * dk[j] / n_risk)
                    if dk[j] > 0
                    else 0
                )
                cif_pub = (
                    _half_up_micro((t_acc[j] + tk) / 1000000.0)
                    / 1000000.0
                )
                rows.append(
                    (t, k, n_risk, dk[j], surv_pub, cif_pub)
                )
                t_acc[j] += tk
            lt0 += lt
            dead0 = dead0 or dall
            removed += d + c
        return rows, n_total

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        st = (
            tuple(self._state.get())
            if self._state.exists()
            else ([], [], [])
        )
        for pdf in rows:
            st = self.fold(
                st, pdf[self._duration_col], pdf[self._cause_col]
            )
        self._state.update(st)
        curve, n_total = self.curve(st)
        yield pd.DataFrame(
            {
                "group_key": [key[0]] * len(curve),
                # n_total is MONOTONE per key → update-mode sinks
                # select the final table with max_by(·, n_total)
                "n_total": [n_total] * len(curve),
                "duration": [r[0] for r in curve],
                "cause": [r[1] for r in curve],
                "n_risk": [r[2] for r in curve],
                "n_event": [r[3] for r in curve],
                "survival_allcause": [r[4] for r in curve],
                "cif": [r[5] for r in curve],
            }
        )

    def close(self) -> None:
        pass


def running_aj_cif(
    subjects: DataFrame,
    causes: list[int],
    group_col: str = "event_type",
    duration_col: str = "duration",
    cause_col: str = "cause",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming per-group Aalen-Johansen cumulative incidence under
    competing risks over (group, duration, cause) subject rows via
    ``transformWithStateInPandas`` — update-mode emissions of the
    full exact-counter CIF table (one row per duration × cause).
    Apply a watermark on the SOURCE's event-time column to bound
    state replay; the table itself is arrival-order exact by
    construction."""
    return subjects.select(
        F.col(group_col).cast("string").alias("group_key"),
        F.col(duration_col).cast("long").alias("duration"),
        F.col(cause_col).cast("long").alias("cause"),
    ).groupBy("group_key").transformWithStateInPandas(
        AjCifProcessor(causes, ttl_ms=ttl_ms),
        outputStructType=AJ_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def aj_cif_stream_batch(
    subjects: DataFrame,
    causes: list[int],
    group_col: str = "event_type",
    duration_col: str = "duration",
    cause_col: str = "cause",
) -> pd.DataFrame:
    """Batch reference for ``running_aj_cif``'s END STATE: fold each
    group's full history through the identical counter state and emit
    the identical lattice table (test-only single-process reference —
    and pinned cell-for-cell against the DISTRIBUTED
    ``operators.survival.cif_competing_risks`` in tests)."""
    pdf = subjects.select(
        F.col(group_col).cast("string").alias("group_key"),
        F.col(duration_col).cast("long").alias("duration"),
        F.col(cause_col).cast("long").alias("cause"),
    ).toPandas()
    proc = AjCifProcessor(causes)
    out = []
    for g, grp in pdf.groupby("group_key"):
        st = proc.fold(([], [], []), grp["duration"], grp["cause"])
        curve, n_total = proc.curve(st)
        for t, k, n_risk, d_k, surv, cif in curve:
            out.append((g, n_total, t, k, n_risk, d_k, surv, cif))
    return pd.DataFrame(
        out,
        columns=[
            "group_key", "n_total", "duration", "cause", "n_risk",
            "n_event", "survival_allcause", "cif",
        ],
    )


HLL_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_seen", LongType()),
        StructField("registers_set", LongType()),
        StructField("distinct_estimate", DoubleType()),
    ]
)


def _hll_state_schema(lg_k: int) -> StructType:
    return StructType(
        [
            StructField("n_seen", LongType()),
            StructField("registers", ArrayType(LongType())),
        ]
    )


class HllDistinctProcessor(StatefulProcessor):
    """Streaming HyperLogLog distinct counter per key (Flajolet 2007,
    the dense form) — the ONLINE twin of ``sketches.hll_rollup``'s
    "distinct users per dimension" table, for dashboards that cannot
    wait for the batch rollup. Pure-Python registers (the batch
    operator rides Spark's native Datasketches aggregate, which a
    pandas worker cannot call), so the streaming estimate is pinned
    against ITS OWN batch fold, not the JVM sketch — the honest-guard
    convention.

    Per value: a 64-bit md5-derived hash splits into a register index
    (low ``lg_k`` bits) and a suffix whose leading-zero count +1 is
    the rank; state keeps the per-register MAX rank. Because max is
    commutative/associative/idempotent, the fold is EXACTLY invariant
    to arrival order, batch slicing, AND duplicate delivery — a
    strictly stronger contract than the CUSUM/KLL processors'
    order-pinned folds (at-least-once sources cannot bias it).

    Estimate: alpha_m · m² / Σ 2^{−M_j} with Flajolet's small-range
    linear-counting correction (E ≤ 2.5m with empty registers →
    m·ln(m/V)); the 64-bit hash space makes the large-range
    correction unreachable. State per key is one fixed m = 2^lg_k
    long array (m·8 bytes; store grows with key cardinality only;
    ``ttl_ms`` bounds idle keys).
    """

    def __init__(
        self,
        lg_k: int = 10,
        value_col: str = "user_id",
        ttl_ms: int | None = None,
    ) -> None:
        if not 4 <= int(lg_k) <= 16:
            raise ValueError("HllDistinctProcessor: lg_k must be in 4..16")
        self._lg_k = int(lg_k)
        self._m = 1 << self._lg_k
        self._value_col = value_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "hll", _hll_state_schema(self._lg_k), ttlDurationMs=self._ttl_ms
        )

    def fold(self, st, values):
        import hashlib

        n_seen, regs = st
        regs = list(regs)
        width = 64 - self._lg_k
        for v in values:
            h = int(
                hashlib.md5(str(v).encode()).hexdigest()[:16], 16
            )
            idx = h & (self._m - 1)
            w = h >> self._lg_k
            rho = width - w.bit_length() + 1
            if rho > regs[idx]:
                regs[idx] = rho
            n_seen += 1
        return n_seen, regs

    def estimate(self, regs) -> float:
        import math

        m = self._m
        alpha = 0.7213 / (1.0 + 1.079 / m)
        raw = alpha * m * m / sum(2.0 ** (-r) for r in regs)
        zeros = sum(1 for r in regs if r == 0)
        if raw <= 2.5 * m and zeros > 0:
            return m * math.log(m / zeros)
        return raw

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        st = (
            self._state.get()
            if self._state.exists()
            else (0, [0] * self._m)
        )
        for pdf in rows:
            st = self.fold(st, pdf[self._value_col])
        self._state.update(st)
        n_seen, regs = st
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_seen": [n_seen],
                "registers_set": [sum(1 for r in regs if r > 0)],
                "distinct_estimate": [round(self.estimate(regs), 6)],
            }
        )

    def close(self) -> None:
        pass


def running_hll_distinct(
    events: DataFrame,
    lg_k: int = 10,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming per-event-type distinct-user counter over (event_type,
    user_id) via ``transformWithStateInPandas`` — update-mode
    emissions of the register-array estimate."""
    return events.select("event_type", "user_id").groupBy(
        "event_type"
    ).transformWithStateInPandas(
        HllDistinctProcessor(lg_k=lg_k, ttl_ms=ttl_ms),
        outputStructType=HLL_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def hll_distinct_batch(
    events: DataFrame, lg_k: int = 10
) -> pd.DataFrame:
    """Batch reference for ``running_hll_distinct``'s END STATE: fold
    each event_type's full history through the identical registers
    (test-only single-process reference)."""
    pdf = events.select("event_type", "user_id").toPandas()
    proc = HllDistinctProcessor(lg_k=lg_k)
    out = []
    for et, grp in pdf.groupby("event_type"):
        n_seen, regs = proc.fold((0, [0] * (1 << lg_k)), grp["user_id"])
        out.append(
            (
                et,
                n_seen,
                sum(1 for r in regs if r > 0),
                round(proc.estimate(regs), 6),
            )
        )
    return pd.DataFrame(
        out,
        columns=[
            "event_type", "n_seen", "registers_set", "distinct_estimate",
        ],
    )
