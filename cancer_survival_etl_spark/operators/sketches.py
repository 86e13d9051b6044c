"""Sketch-based approximate aggregations.

At 100 TB, exact DISTINCT and exact quantiles are shuffle-bound: every
distinct value (or every row, for percentile_disc) crosses the wire.
Sketches cap the per-group shuffle payload at the sketch size —
constant, not data-proportional:

- HyperLogLog++ (``approx_count_distinct``): ~1.5 KB per group at 5%
  rsd, mergeable map-side.
- Greenwald-Khanna (``percentile_approx``): bounded-error quantiles,
  one pass.
- Count-min sketch (``count_min_sketch``): frequency estimates for
  heavy-hitter detection without a per-value groupBy.

All are Spark built-ins running in the JVM with partial aggregation;
results are approximate by contract, so driver checks are rows-only and
the pytest suite pins error bounds against exact answers instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    rsd: float = 0.05,
    alias: str = "approx_distinct",
) -> DataFrame:
    """HLL++ distinct count per group. ``rsd`` trades sketch size for
    relative error (0.05 → ±5% typical)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias(alias)
    )


def approx_quantiles_by(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10_000,
) -> DataFrame:
    """Greenwald-Khanna approximate quantiles per group; error ≤
    1/accuracy of rank. One pass, mergeable — unlike exact
    percentile_disc this never buffers a group's full value set."""
    aggs = [
        F.percentile_approx(value_col, p, accuracy).alias(
            f"p{int(p * 100):02d}"
        )
        for p in probabilities
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def frequent_items(
    df: DataFrame,
    value_col: str,
    candidates: list,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Heavy-hitter frequency estimates via a count-min sketch.

    Builds ONE fixed-size sketch over the whole column with the
    ``count_min_sketch`` aggregate (a single all-reduce — the only
    distributed work, with no per-value shuffle), then probes the
    KB-sized binary on the driver through Spark's own
    ``org.apache.spark.util.sketch.CountMinSketch`` reader for each
    candidate value. Estimates overcount by at most eps·N with the
    given confidence, never undercount.

    ``candidates`` is an explicit small value list (heavy-hitter
    suspects, e.g. from a sample) — probing is O(len(candidates)) on
    the driver, independent of data size.
    """
    spark = df.sparkSession
    row = df.select(
        F.expr(
            f"count_min_sketch({value_col}, {eps}d, {confidence}d, {seed})"
        ).alias("_sk")
    ).first()
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(row["_sk"]))
    )

    def probe(v):
        if isinstance(v, int):
            return cms.estimateCount(jvm.java.lang.Long(v))
        return cms.estimateCount(v)

    return spark.createDataFrame(
        [(v, int(probe(v))) for v in candidates],
        schema=f"value {'bigint' if isinstance(candidates[0], int) else 'string'}, est_count bigint",
    )
