"""Partition-shape utilities.

Expression-heavy per-row operators (md5 shingling, n-gram explode,
SimHash bit votes, pairwise vector math) inherit their parallelism from
the *input* partitioning. A small-but-dense input (one parquet file, a
collected dimension) arrives as 1-2 partitions and serializes the whole
computation on one core — the classic pre-explode trap. ``fan_out``
widens narrow inputs to the cluster's parallelism; on a real corpus the
input already has >= target partitions and it is a no-op (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the
    session's defaultParallelism) iff it currently has fewer partitions.

    The shuffle this inserts moves only the narrow pre-explosion rows —
    cheap relative to the per-row work it parallelizes. Never shrinks:
    a well-partitioned 100 TB input passes through untouched.
    """
    target = (
        min_partitions
        or df.sparkSession.sparkContext.defaultParallelism
    )
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
