"""Exact discrete percentiles per group (SURVEY §2.4 A4).

Reference: docs/reporting_benchmarking_standard.sql:64-92 —
``PERCENTILE_DISC(p) WITHIN GROUP (ORDER BY x)`` at p ∈ {.25, .5, .75}.

PERCENTILE_DISC returns an actual data value (the smallest value whose
cumulative distribution ≥ p) — NOT interpolated, NOT approximate. Spark
≥3.4 ships ``percentile_disc`` as a SQL aggregate; we use it via
``F.expr`` so the DataFrame API composes. ``percentile_approx`` is
deliberately avoided: oracle comparison requires exact discrete values.

Scale note: exact percentiles sort within each group post-shuffle. At
100 TB, prefer t-digest/approx for dashboards and reserve exact disc for
grouped cardinalities like these (thousands of groups × hundreds of rows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def percentile_disc_by(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    percentiles: Sequence[float] = (0.25, 0.5, 0.75),
    prefix: str = "p",
) -> DataFrame:
    """One row per group with a ``<prefix><pct>`` column per percentile."""
    aggs = [
        F.expr(
            f"percentile_disc({p}) WITHIN GROUP (ORDER BY {value_col})"
        ).alias(f"{prefix}{int(p * 100)}")
        for p in percentiles
    ]
    return df.groupBy(*group_cols).agg(*aggs)
