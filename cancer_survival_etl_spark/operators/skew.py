"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled — on in session.py); these explicit
helpers cover the cases AQE can't: skewed groupBy keys (a single hot
group overwhelming one reducer) and broadcast-ineligible skewed joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    ``aggs`` maps output name → (input col, fn) with fn ∈ {sum, count,
    min, max} (the re-aggregable family). Stage 1 groups by
    (key, random-ish salt) so a hot key spreads over ``salt_buckets``
    reducers; stage 2 merges the partials. Same result as a direct
    groupBy — pinned by test — at the cost of a second (tiny) shuffle.

    The salt is derived from a hash of the whole row's monotonically
    increasing id surrogate — deterministic inputs give deterministic
    partials, and the merge is order-insensitive either way.
    """
    salt = (F.monotonically_increasing_id() % salt_buckets).alias("_salt")
    stage1_aggs = []
    stage2_aggs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            stage1_aggs.append(F.count(col).alias(f"_p_{out}"))
            stage2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn in ("sum", "min", "max"):
            stage1_aggs.append(getattr(F, fn)(col).alias(f"_p_{out}"))
            stage2_aggs.append(getattr(F, fn)(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"{fn} is not re-aggregable through salting")
    partial = (
        df.select("*", salt)
        .groupBy(*group_cols, "_salt")
        .agg(*stage1_aggs)
    )
    return partial.groupBy(*group_cols).agg(*stage2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join a skew-keyed big side against a small side too large to
    broadcast: salt the big side's key, explode the small side across all
    salt values, join on (key, salt). Row multiplicity is unchanged.
    """
    big_salted = big.withColumn(
        "_salt", (F.monotonically_increasing_id() % salt_buckets).cast("int")
    )
    small_exploded = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_salted.join(small_exploded, [key, "_salt"]).drop("_salt")
