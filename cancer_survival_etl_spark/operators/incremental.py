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
