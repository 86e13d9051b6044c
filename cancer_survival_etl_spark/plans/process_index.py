"""process_index — the INDEX ETL pipeline (SURVEY §2.11 #1).

Reference: src/main.py:108-219. One lazy Spark plan replaces the
reference's eager pandas step-chain: filter ∘ derive-flags ∘ timestamp ∘
breast→Persons duplication ∘ drop-generalized ∘ rename-site ∘
drop-Other ∘ project ∘ rename. Catalyst folds the projections into the
scan and pushes the filters down.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import literal_replace, null_keeping_neq
from ..operators.filters import (
    disjunctive_filter,
    membership_flag,
    not_all_of,
    null_flag,
)
from ..operators.union import duplicate_rows_as
from ..schemas import normalize_columns, rename_project

# Final projection + rename to destination names — reference: src/main.py:193-212.
RENAME_INDEX = {
    "area_code": "AREA_CODE",
    "area_name": "AREA_NAME",
    "area_core": "IS_AREA_CORE",
    "cancer_site": "CANCER_SITE",
    "gender": "GENDER",
    "age_at_diagnosis": "AGE_AT_DIAGNOSIS",
    "standardisation_type": "STANDARDISATION_TYPE",
    "diagnosis_year": "YEAR_OF_DIAGNOSIS",
    "years_since_diagnosis": "YEARS_SINCE_DIAGNOSIS",
    "patient_numbers": "PATIENT_NUMBERS",
    "survival_per": "SURVIVAL_PERCENT",
    "lower_ci": "LOWER_CI",
    "upper_ci": "UPPER_CI",
    "precision": "PRECISION",
    "standard_error": "STANDARD_ERROR",
    "data_substituted": "IS_DATA_SUBTITUTED",
}


def process_index(
    raw: DataFrame, target_geographies: Sequence[str]
) -> DataFrame:
    """Raw 'Table 5' sheet → INDEX destination shape (without _TIMESTAMP;
    the sink stamps it, mirroring the DDL default at docs/create_index.sql:19).

    ``raw`` columns are the sheet's headers (FIXTURES.md §1).
    """
    # Keep Cancer Alliances + target geographies — src/main.py:121-124.
    df = disjunctive_filter(
        raw, "Geography type", "Cancer Alliance", "Geography code", target_geographies
    )
    # Derived flags — src/main.py:127-131.
    df = df.withColumn(
        "area_core", membership_flag("Geography code", target_geographies)
    ).withColumn("data_substituted", null_flag("Substituted by Other Geography"))

    # Breast/Female/All-ages → Persons, then drop the originals —
    # src/main.py:137-146. Done as one filter + one union branch.
    breast_female_allages = (
        (F.col("Cancer site") == "Breast")
        & (F.col("Gender") == "Female")
        & (F.col("Age at diagnosis") == "All ages")
    )
    df = duplicate_rows_as(df, breast_female_allages, {"Gender": F.lit("Persons")})
    df = not_all_of(
        df,
        F.col("Cancer site") == "Breast",
        F.col("Gender") == "Female",
        F.col("Age at diagnosis") == "All ages",
    )

    # 'Index' → 'Overall'; drop 'Other' (null-keeping ≠) — src/main.py:149-153.
    df = df.withColumn(
        "Cancer site", literal_replace("Cancer site", "Index", "Overall")
    )
    df = df.filter(null_keeping_neq("Cancer site", "Other"))

    # Column keep-list, display renames, name normalization, final map —
    # src/main.py:156-212.
    df = (
        df.withColumnRenamed("Geography name", "Area name")
        .withColumnRenamed("Geography code", "Area code")
        .withColumnRenamed("Survival (%)", "survival_per")
    )
    df = normalize_columns(df)
    return rename_project(df, RENAME_INDEX)
