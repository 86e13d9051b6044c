"""Data layout for multi-dimensional pruning: Z-order (Morton curve)
clustering.

A 100 TB lake is only fast if scans can SKIP data. Partitioning prunes
on one column hierarchy; Z-ordering interleaves the bits of several
columns into one sort key so that range-partitioning on it co-locates
rows that are close in EVERY dimension at once. Parquet row-group and
file min/max statistics then prune multi-column box predicates the way
Delta/Iceberg `OPTIMIZE ZORDER BY` does — but the operator is plain
DataFrame code: derive z, `repartitionByRange(z)`, write.

The z-value is a pure JVM-side expression (aggregate over a bit
sequence — no UDF), so the layout pass is one range shuffle over the
data, exactly the cost of any global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: Sequence[str | Column], bits: int = 16) -> Column:
    """Morton/Z-order interleave of the low ``bits`` bits of each column
    (columns must already be non-negative integers of bounded range —
    rank/bucketize first for arbitrary domains; the interleave itself
    must stay order-preserving per dimension).

    Bit i of column j lands at output bit ``i * n_cols + j``. ``bits``
    is a Python constant, so the interleave unrolls into a flat static
    sum of shift/mask terms — one whole-stage-codegen expression, no
    higher-order-function lambda interpretation per element (an
    ``F.aggregate`` fold over a sequence costs ~4× more per row).
    """
    ncols = len(cols)
    if bits * ncols > 63:
        raise ValueError(
            f"zvalue needs bits*ncols <= 63 (got {bits}*{ncols}); "
            "lower bits or bucketize coarser"
        )
    cs = [(F.col(c) if isinstance(c, str) else c).cast("long") for c in cols]
    terms = [
        F.shiftleft(F.shiftright(c, i) % 2, i * ncols + j)
        for i in range(bits)
        for j, c in enumerate(cs)
    ]
    return sum(terms[1:], start=terms[0])


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: int | None = None,
    z_col: str = "_z",
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional locality: add the z-value,
    range-partition on it, sort within partitions. Write the result
    with any parquet sink and every partition/file carries tight min/max
    ranges on ALL ``cols`` — multi-column box filters prune at file and
    row-group granularity.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    withz = df.withColumn(z_col, zvalue(cols, bits=bits))
    return withz.repartitionByRange(n, F.col(z_col)).sortWithinPartitions(
        z_col
    )


def layout_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-partition min/max of each layout column — the same statistics
    parquet would expose for pruning; used to *measure* clustering
    quality (how many partitions a box predicate must touch) instead of
    guessing it."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(*aggs)
    )


def quantile_bucketize(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    relative_error: float = 0.001,
    suffix: str = "_bkt",
) -> DataFrame:
    """Map arbitrary numeric columns onto the bounded integer domain
    ``[0, 2^bits)`` that ``zvalue`` needs, equi-DEPTH (quantile) rather
    than equi-width: skewed distributions still fill the Morton grid
    uniformly, which is what makes the z-curve's locality useful.

    One ``approxQuantile`` pass (Greenwald-Khanna, driver-collected
    split points — 2^bits numbers per column, bounded by the bit
    budget not the data) then a pure expression per row: bucket =
    #splits ≤ value. Monotone per column, so z-order on the buckets
    preserves each dimension's ordering.
    """
    n_buckets = 1 << bits
    out = df
    for c in cols:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        splits = df.stat.approxQuantile(c, probs, relative_error)
        # drop duplicate split points (heavy ties) — buckets then merge
        uniq = sorted(set(splits))
        arr = F.lit(uniq) if uniq else F.array().cast("array<double>")
        out = out.withColumn(
            f"{c}{suffix}",
            F.size(
                F.filter(arr, lambda s: s <= F.col(c).cast("double"))
            ).cast("long"),
        )
    return out
