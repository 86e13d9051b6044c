"""Reshaping operators: unpivot/melt and pivot (SURVEY §2.9)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str,
    value_name: str,
) -> DataFrame:
    """Wide→long unpivot.

    Reference: src/main.py:298-327 (pandas ``melt`` of the two survival
    metrics keeping 13 id columns). Spark ≥3.4 has native ``unpivot`` —
    a narrow (no-shuffle) operator.
    """
    return df.unpivot(list(id_cols), list(value_cols), var_name, value_name)


def pivot_fixed(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    agg_col: str,
    agg: str = "sum",
) -> DataFrame:
    """Long→wide pivot with an EXPLICIT value list.

    Reference: docs/reporting_benchmarking_standard.sql:94-97
    (``PIVOT (SUM(SURVIVAL_PERCENT) FOR STANDARD IN (...))``).

    The explicit value list matters twice over: determinism (no surprise
    columns) and scale (without it Spark runs an extra distinct job over
    the pivot column before planning).
    """
    from pyspark.sql import functions as F

    aggfn = getattr(F, agg)
    return (
        df.groupBy(*group_cols)
        .pivot(pivot_col, list(pivot_values))
        .agg(aggfn(agg_col))
    )
