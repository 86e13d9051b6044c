"""Composite keys, CASE sort keys and quartile bucketing (SURVEY §2.8 F8-F9).

All pure Column expressions — constant-folded and codegen'd by Catalyst.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def concat_key(*cols: Column | str) -> Column:
    """Synthetic concat join key, e.g. CONCAT(site, gender, years, window).

    Reference: docs/reporting_rank.sql:8 (and the three sibling views).
    Semantics to preserve:
    - NULL propagation: Snowflake CONCAT returns NULL on any NULL input —
      Spark ``concat`` matches.
    - Integer rendering: cast integral columns from their integer type
      (``5`` not ``5.0``); callers must NOT pre-cast to double.
    """
    parts = [
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in cols
    ]
    return F.concat(*parts)


def sort_key(col: Column | str, ordering: Mapping[str, int], default: int) -> Column:
    """CASE-derived sort key column, e.g. GENDER: Persons→1 else 2.

    Reference: docs/reporting_index.sql:26-39, docs/reporting_adult4.sql:9-12.
    """
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for value, rank_value in ordering.items():
        cond = c == value
        expr = F.when(cond, rank_value) if expr is None else expr.when(cond, rank_value)
    assert expr is not None, "ordering must be non-empty"
    return expr.otherwise(default)


def quartile_bucket(rank_col: Column | str, base_col: Column | str) -> Column:
    """Quartile label from a rank and its denominator.

    Reference: docs/reporting_rank.sql:38-45 —
      NULL rank → NULL; base < 4 → '-';
      rank/base < .25 → '1st'; < .5 → '2nd'; < .75 → '3rd'; else '4th'.

    Snowflake divides NUMBER/NUMBER as decimal; Spark integer division
    truncates, so we cast to double explicitly (the F8 semantic edge).
    """
    r = F.col(rank_col) if isinstance(rank_col, str) else rank_col
    b = F.col(base_col) if isinstance(base_col, str) else base_col
    ratio = r.cast("double") / b.cast("double")
    return (
        F.when(r.isNull(), F.lit(None).cast("string"))
        .when(b < 4, "-")
        .when(ratio < 0.25, "1st")
        .when(ratio < 0.5, "2nd")
        .when(ratio < 0.75, "3rd")
        .otherwise("4th")
    )


def typed_null_literals(fields: Sequence[tuple[str, str]]) -> list[Column]:
    """Typed NULL literal columns for non-aggregable scaffolding.

    Reference: docs/reporting_index_best_ca.sql:32-38 (NULL AS PATIENT_NUMBERS
    etc. — Snowflake infers types from the view column list; Spark needs
    explicit casts).
    """
    return [F.lit(None).cast(dtype).alias(name) for name, dtype in fields]
