"""Filter/flag operators (SURVEY §2.2).

Thin, declarative builders — each returns a lazy DataFrame so Catalyst
pushes the predicates into the parquet scan (verify via
``.explain("formatted")`` → PushedFilters).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def disjunctive_filter(
    df: DataFrame, eq_col: str, eq_value, isin_col: str, values: Sequence
) -> DataFrame:
    """Keep rows where ``eq_col == eq_value`` OR ``isin_col ∈ values``.

    Reference: src/main.py:121-124 (keep 'Cancer Alliance' rows or target
    geography codes); mirrored at src/main.py:239-242.
    """
    return df.filter((F.col(eq_col) == eq_value) | F.col(isin_col).isin(list(values)))


def membership_flag(col: str, values: Sequence) -> Column:
    """Boolean set-membership column (IS_AREA_CORE).

    Reference: src/main.py:127, 235-236.
    """
    return F.col(col).isin(list(values))


def null_flag(col: str) -> Column:
    """True iff ``col`` is non-null (IS_DATA_SUBTITUTED [sic]).

    Reference: src/main.py:130-131 (``where(isnull, False, True)``).
    """
    return F.col(col).isNotNull()


def not_all_of(df: DataFrame, *conds: Column) -> DataFrame:
    """Drop rows matching the conjunction of ``conds`` (row removal).

    Reference: src/main.py:144-146 (drop Breast & Female & All-ages after
    generalizing them to Persons).

    Null caveat: Spark's ``~(a & b)`` with NULL conjuncts yields NULL →
    row dropped. The reference's pandas mask treats NaN comparisons as
    False → ``~False`` keeps the row; we coalesce to preserve that.
    """
    conj = conds[0]
    for c in conds[1:]:
        conj = conj & c
    return df.filter(~F.coalesce(conj, F.lit(False)))
