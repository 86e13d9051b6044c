"""The five reporting view stacks as lazy Spark plans (SURVEY §2.11 #3-8).

Each function takes the modelled table(s) (INDEX / ADULT_4 shaped
DataFrames) and returns the reporting-layer DataFrame; ``published=True``
adds the display-name projection layer where the reference has one.

The reference executes these inside Snowflake (docs/reporting_*.sql);
here they are single Catalyst plans — the repeated identical-WHERE scans
in the reference's CTEs become shared subplans (exchange reuse).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.keys import concat_key, sort_key, typed_null_literals
from ..operators.rank import rank_quartile
from ..operators.reshape import pivot_fixed
from ..operators.union import union_stack
from ..schemas import ENGLAND_CODE, LONDON_CODE, NCL_CA_CODE


def _join_key() -> Column:
    # CONCAT(CANCER_SITE, GENDER, YEARS_SINCE_DIAGNOSIS, DATE_DIAGNOSIS_WINDOW)
    # — docs/reporting_rank.sql:8 and siblings. Integer column cast from
    # its integer type so the rendering has no ".0".
    return concat_key(
        "CANCER_SITE", "GENDER", "YEARS_SINCE_DIAGNOSIS", "DATE_DIAGNOSIS_WINDOW"
    ).alias("JOIN_KEY")


def _sort_gender() -> Column:
    return sort_key("GENDER", {"Persons": 1}, 2).alias("SORT_GENDER")


def index_best_ca(index: DataFrame) -> DataFrame:
    """Synthetic 'Best Non-NCL Cancer Alliance' rows.

    Reference: docs/reporting_index_best_ca.sql — filter non-core, MAX
    survival with GROUP BY ALL (every non-aggregated column a key),
    literal scaffolding + typed NULLs.
    """
    group_cols = [
        "IS_AREA_CORE",
        "CANCER_SITE",
        "GENDER",
        "AGE_AT_DIAGNOSIS",
        "STANDARDISATION_TYPE",
        "YEAR_OF_DIAGNOSIS",
        "YEARS_SINCE_DIAGNOSIS",
    ]
    return (
        index.filter(~F.col("IS_AREA_CORE"))
        .groupBy(*group_cols)
        .agg(F.max("SURVIVAL_PERCENT").alias("SURVIVAL_PERCENT"))
        .select(
            F.lit("X").alias("AREA_CODE"),
            F.lit("Best Non-NCL Cancer Alliance").alias("AREA_NAME"),
            "IS_AREA_CORE",
            "CANCER_SITE",
            "GENDER",
            "AGE_AT_DIAGNOSIS",
            "STANDARDISATION_TYPE",
            "YEAR_OF_DIAGNOSIS",
            "YEARS_SINCE_DIAGNOSIS",
            *typed_null_literals([("PATIENT_NUMBERS", "long")]),
            "SURVIVAL_PERCENT",
            *typed_null_literals(
                [
                    ("LOWER_CI", "double"),
                    ("UPPER_CI", "double"),
                    ("PRECISION", "double"),
                    ("STANDARD_ERROR", "double"),
                    ("IS_DATA_SUBTITUTED", "boolean"),
                ]
            ),
        )
    )


def index_report(index: DataFrame) -> DataFrame:
    """Core rows ∪ best-CA rows, + the three CASE sort keys.

    Reference: docs/reporting_index.sql.
    """
    core = index.filter(F.col("IS_AREA_CORE")).drop("_TIMESTAMP")
    unioned = union_stack([core, index_best_ca(index)])
    return unioned.select(
        "*",
        sort_key("CANCER_SITE", {"Overall": 1}, 2).alias("SORT_SITE"),
        _sort_gender(),
        sort_key("AGE_AT_DIAGNOSIS", {"All ages": 1}, 2).alias("SORT_AGE"),
    )


_ADULT4_PUBLISHED = {
    "AREA_TYPE": "Area_Type",
    "AREA_CODE": "Area_Code",
    "AREA_NAME": "Area_Name",
    "IS_AREA_CORE": "Area_Core",
    "CANCER_SITE": "Cancer_Site",
    "GENDER": "Gender",
    "STANDARDISATION_TYPE": "Standardisation_Type",
    "STANDARDISATION_TYPE_SUBCATEGORY": "Standardisation_Subcategory",
    "YEARS_SINCE_DIAGNOSIS": "Years_Since_Diagnosis",
    "PATIENT_NUMBERS": "Patient_Numbers",
    "SURVIVAL_METRIC": "Survival_Metric",
    "SURVIVAL_PERCENT": "Survival_Per",
    "DATE_DIAGNOSIS_WINDOW": "Date_Diagnosis_Window",
    "DATE_SNAPSHOT": "Date_Snapshot",
    "JOIN_KEY": "JOIN_KEY",
    "SORT_GENDER": "Sort_Gender",
}


def _publish(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    return df.select([F.col(k).alias(v) for k, v in mapping.items()])


def processed_adult4(adult4: DataFrame, published: bool = False) -> DataFrame:
    """Core-area adult4 rows + JOIN_KEY + SORT_GENDER.

    Reference: docs/reporting_adult4.sql — IS_AREA_CORE AND
    ((age-std AND net-survival) OR NCL).
    """
    df = adult4.filter(
        F.col("IS_AREA_CORE")
        & (
            (
                (F.col("STANDARDISATION_TYPE") == "Age-standardised")
                & (F.col("SURVIVAL_METRIC") == "Net Survival")
            )
            | (F.col("AREA_CODE") == NCL_CA_CODE)
        )
    ).drop("_TIMESTAMP")
    df = df.select("*", _join_key(), _sort_gender())
    return _publish(df, _ADULT4_PUBLISHED) if published else df


def ca_comparison(adult4: DataFrame, published: bool = False) -> DataFrame:
    """All Cancer-Alliance rows at age-std/net-survival.

    Reference: docs/reporting_cancer_alliance_reporting.sql.
    """
    df = adult4.filter(
        (F.col("AREA_TYPE") == "Cancer Alliance")
        & (F.col("STANDARDISATION_TYPE") == "Age-standardised")
        & (F.col("SURVIVAL_METRIC") == "Net Survival")
    ).drop("_TIMESTAMP")
    df = df.select("*", _join_key(), _sort_gender())
    return _publish(df, _ADULT4_PUBLISHED) if published else df


def benchmarking_rank(adult4: DataFrame, published: bool = False) -> DataFrame:
    """CA league table per metric cell with NCL's quartile.

    Reference: docs/reporting_rank.sql. Composition of the generic
    operators.rank.rank_quartile with the adult4-specific filter — the
    left-join keeps a CANCER_SITE column on the base side, so we carry it
    through the group key.
    """
    ca = adult4.filter(
        (F.col("STANDARDISATION_TYPE") == "Age-standardised")
        & (F.col("SURVIVAL_METRIC") == "Net Survival")
        & (F.col("AREA_TYPE") == "Cancer Alliance")
    ).select(
        "AREA_CODE",
        "CANCER_SITE",
        _join_key(),
        "SURVIVAL_PERCENT",
    )
    # rank_quartile groups by JOIN_KEY; CANCER_SITE is functionally
    # dependent on it (the key's first component) — reattach via the
    # distinct key→site pairs, exactly what the reference's CA_BASE carries.
    rq = rank_quartile(
        ca.select("JOIN_KEY", "AREA_CODE", "SURVIVAL_PERCENT"),
        key_col="JOIN_KEY",
        measure_col="SURVIVAL_PERCENT",
        entity_col="AREA_CODE",
        focus=F.col("AREA_CODE") == NCL_CA_CODE,
    )
    sites = (
        ca.filter(F.col("SURVIVAL_PERCENT").isNotNull())
        .select("JOIN_KEY", "CANCER_SITE")
        .distinct()
    )
    df = rq.join(sites, "JOIN_KEY").select(
        "JOIN_KEY",
        "CANCER_SITE",
        F.col("measure").alias("SURVIVAL_PERCENT"),
        F.col("rank_val").alias("RANK_CA"),
        F.col("rank_base").alias("RANK_BASE"),
        F.col("quartile").alias("NCL_QUARTILE"),
    )
    if not published:
        return df
    return _publish(
        df,
        {
            "JOIN_KEY": "JOIN_KEY",
            "CANCER_SITE": "Cancer_Site",
            "SURVIVAL_PERCENT": "Survival_Per",
            "RANK_CA": "Rank_CA",
            "RANK_BASE": "Rank_Denominator",
            "NCL_QUARTILE": "Quartile",
        },
    )


def benchmarking_standards(adult4: DataFrame, published: bool = False) -> DataFrame:
    """7 benchmark standards per metric cell, pivoted wide.

    Reference: docs/reporting_benchmarking_standard.sql — base CTE →
    England ∪ London ∪ Best ∪ Worst ∪ Q1 ∪ Q2 ∪ Q3 (long) → PIVOT(SUM).
    The SUM is degenerate (≤1 row per cell per standard).
    """
    base = adult4.filter(
        (F.col("STANDARDISATION_TYPE") == "Age-standardised")
        & (F.col("SURVIVAL_METRIC") == "Net Survival")
    ).select(
        "AREA_CODE", "AREA_NAME", "AREA_TYPE", _join_key(), "SURVIVAL_PERCENT"
    )
    ca = base.filter(F.col("AREA_TYPE") == "Cancer Alliance")

    def named(df: DataFrame, standard: Column) -> DataFrame:
        return df.select(
            "JOIN_KEY", standard.alias("STANDARD"), "SURVIVAL_PERCENT"
        )

    england = named(
        base.filter(F.col("AREA_CODE") == ENGLAND_CODE), F.col("AREA_NAME")
    )
    london = named(
        base.filter(F.col("AREA_CODE") == LONDON_CODE), F.col("AREA_NAME")
    )
    best = ca.groupBy("JOIN_KEY").agg(
        F.max("SURVIVAL_PERCENT").alias("SURVIVAL_PERCENT")
    ).select("JOIN_KEY", F.lit("Best").alias("STANDARD"), "SURVIVAL_PERCENT")
    worst = ca.groupBy("JOIN_KEY").agg(
        F.min("SURVIVAL_PERCENT").alias("SURVIVAL_PERCENT")
    ).select("JOIN_KEY", F.lit("Worst").alias("STANDARD"), "SURVIVAL_PERCENT")

    def quantile(p: float, name: str) -> DataFrame:
        return ca.groupBy("JOIN_KEY").agg(
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY SURVIVAL_PERCENT)"
            ).alias("SURVIVAL_PERCENT")
        ).select("JOIN_KEY", F.lit(name).alias("STANDARD"), "SURVIVAL_PERCENT")

    long = union_stack(
        [england, london, best, worst,
         quantile(0.25, "Q1"), quantile(0.5, "Q2"), quantile(0.75, "Q3")]
    )
    wide = pivot_fixed(
        long,
        ["JOIN_KEY"],
        "STANDARD",
        ["England", "London", "Best", "Worst", "Q1", "Q2", "Q3"],
        "SURVIVAL_PERCENT",
        agg="sum",
    )
    renames = {
        "England": "ENGLAND",
        "London": "LONDON",
        "Best": "BEST",
        "Worst": "WORST",
        "Q1": "Q1",
        "Q2": "Q2",
        "Q3": "Q3",
    }
    df = wide.select(
        "JOIN_KEY", *[F.col(k).alias(v) for k, v in renames.items()]
    )
    if not published:
        return df
    return _publish(
        df,
        {
            "JOIN_KEY": "JOIN_KEY",
            "ENGLAND": "England",
            "LONDON": "London",
            "BEST": "Best",
            "WORST": "Worst",
            "Q1": "Q1",
            "Q2": "Q2",
            "Q3": "Q3",
        },
    )
