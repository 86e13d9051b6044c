"""Rank → denominator → quartile composite (SURVEY §2.11 #7).

The reference's most engine-like artifact (docs/reporting_rank.sql):
rank every entity within its group by a measure (descending), count the
group's non-null entities, left-join one focus entity's rank back onto
the group, and bucket it into quartiles.

Spark shape: one scan feeds both the window rank and the groupBy count —
Catalyst reuses the exchange on the shared partitioning key, so the
"two CTEs scanning the same table" in the reference become one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.keys import quartile_bucket


def rank_quartile(
    df: DataFrame,
    key_col: str,
    measure_col: str,
    entity_col: str,
    focus: Column,
) -> DataFrame:
    """Per ``key_col`` group: RANK() entities by ``measure_col`` DESC,
    COUNT(1) the group, left-join the ``focus`` entity's rank, bucket.

    Matches docs/reporting_rank.sql:5-51 semantics:
    - rows with NULL measure are excluded before both rank and count;
    - RANK (gaps on ties), descending;
    - the focus predicate lives in the JOIN ON clause → filter the right
      side *before* the left join (groups without the focus entity keep a
      NULL rank → NULL quartile);
    - quartile CASE per functions.keys.quartile_bucket.

    Returns columns: ``<key_col>``, ``measure``, ``rank_val``,
    ``rank_base``, ``quartile``.
    """
    nonnull = df.filter(F.col(measure_col).isNotNull())

    # Everything derives from ONE windowed pass over one shuffle on the
    # key: rank, denominator (COUNT over the partition), and a
    # row_number picking a single spine row per group. The reference's
    # separate COUNT CTE (docs/reporting_rank.sql:20-30) would be a
    # second scan subtree; here the spine and focus branches share the
    # same exchange (Catalyst reuse).
    w = Window.partitionBy(key_col).orderBy(F.col(measure_col).desc())
    w_total = Window.partitionBy(key_col)
    w_one = Window.partitionBy(key_col).orderBy(
        F.col(measure_col).desc(), F.col(entity_col)
    )
    ranked = nonnull.select(
        F.col(key_col),
        F.col(entity_col),
        F.col(measure_col).alias("measure"),
        F.rank().over(w).alias("rank_val"),
        F.count(F.lit(1)).over(w_total).alias("rank_base"),
        F.row_number().over(w_one).alias("_rn"),
    )

    spine = ranked.filter(F.col("_rn") == 1).select(key_col, "rank_base")
    focus_rank = ranked.filter(focus).select(key_col, "measure", "rank_val")
    joined = spine.join(focus_rank, key_col, "left")

    return joined.select(
        key_col,
        "measure",
        "rank_val",
        "rank_base",
        quartile_bucket("rank_val", "rank_base").alias("quartile"),
    )
