"""Union / row-duplication operators (SURVEY §2.7).

The reference's "filtered-copy + overwrite-a-column + append" pattern
(pandas concat) becomes ``unionByName`` of a derived branch — one lazy
plan, no materialized copies.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def duplicate_rows_as(
    df: DataFrame, cond: Column, overrides: Mapping[str, Column | str]
) -> DataFrame:
    """Append a copy of rows matching ``cond`` with columns overwritten.

    Reference: src/main.py:98-105 (generic ``duplicate_rows`` helper) used
    for breast-Persons generalization at src/main.py:137-141 and 281-287.
    """
    branch = df.filter(cond)
    for name, value in overrides.items():
        branch = branch.withColumn(
            name, F.lit(value) if isinstance(value, str) else value
        )
    return df.unionByName(branch)


# Gender-exclusive cancer sites generalized to 'Persons' —
# reference: src/main.py:289-296.
GENDER_EXCLUSIVE_SITES = {
    "Larynx": "Male",
    "Prostate": "Male",
    "Cervix": "Female",
    "Ovary": "Female",
}


def generalise_gender(
    df: DataFrame,
    site_col: str = "cancer_site",
    gender_col: str = "gender",
    sites: Mapping[str, str] = GENDER_EXCLUSIVE_SITES,
) -> DataFrame:
    """Duplicate single-gender-site rows as Gender='Persons'.

    One union of one filtered branch covering all sites at once — the
    reference loops site-by-site (4 sequential concats) but the result set
    is identical and a single branch shuffles/scans less.
    """
    cond = None
    for site, gender in sites.items():
        c = (F.col(site_col) == site) & (F.col(gender_col) == gender)
        cond = c if cond is None else (cond | c)
    return duplicate_rows_as(df, cond, {gender_col: F.lit("Persons")})


def union_stack(branches: Iterable[DataFrame]) -> DataFrame:
    """N-way UNION ALL by column name.

    Reference: docs/reporting_benchmarking_standard.sql:25-93 (7-way
    UNION ALL of benchmark standards), docs/reporting_index.sql:41-48.
    """
    it = iter(branches)
    out = next(it)
    for b in it:
        out = out.unionByName(b)
    return out
