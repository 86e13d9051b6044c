"""General window analytics (beyond the reference's single RANK — the
rest of the standard analytic-function surface an engine user expects).

All are thin Window-spec builders; one shuffle on the partition key,
then sort-based evaluation within partitions — the same physical shape
at any scale, provided the partition key is well-distributed (for a hot
key, pre-aggregate or salt first; see operators/skew.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lag_delta(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alias: str = "delta",
) -> DataFrame:
    """Per-partition change vs the previous row (LAG): NULL for the first
    row of each partition. ``order_cols`` must be a total order (include
    a unique tie-breaker) or the result is nondeterministic."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.select(
        "*",
        (F.col(value_col) - F.lag(value_col).over(w)).alias(alias),
    )


def running_sum(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alias: str = "running_total",
) -> DataFrame:
    """Cumulative sum: rowsBetween(unboundedPreceding, currentRow).
    ``order_cols`` must be a total order for determinism."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select("*", F.sum(value_col).over(w).alias(alias))


def topk_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order: Column | Sequence[Column],
    k: int,
    rank_fn=F.dense_rank,
    alias: str = "rank_val",
) -> DataFrame:
    """Top-k rows per group (dense_rank keeps ties; row_number for exact
    k — then ``order`` must be a total order). This is the scalable
    'ORDER BY + LIMIT per group': one shuffle, no global sort."""
    order_cols = [order] if isinstance(order, Column) else list(order)
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn(alias, rank_fn().over(w))
        .filter(F.col(alias) <= k)
    )


def ntile_bucket(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    n: int,
    alias: str = "bucket",
) -> DataFrame:
    """NTILE(n) — the built-in sibling of the reference's hand-rolled
    rank/denominator quartile CASE (functions.keys.quartile_bucket).
    ``order_cols`` must be a total order (unique tie-breaker last) or
    bucket assignment at the tile edges is nondeterministic."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.select("*", F.ntile(n).over(w).alias(alias))
