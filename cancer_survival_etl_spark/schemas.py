"""Explicit schemas for the engine's destination tables + name utilities.

Mirrors the reference DDL (reference: docs/create_index.sql:2-20 and
docs/create_adult4.sql:2-18): Snowflake VARCHAR→StringType,
BOOLEAN→BooleanType, NUMBER→LongType, FLOAT→DoubleType,
TIMESTAMP→TimestampType. The two "strings-as-dates" columns
(DATE_DIAGNOSIS_WINDOW like "2016-2020", DATE_SNAPSHOT like
"March 2023") stay StringType deliberately — downstream join keys
concatenate them (reference: docs/reporting_rank.sql:8).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Destination table INDEX — reference: docs/create_index.sql:2-20.
INDEX_SCHEMA = T.StructType(
    [
        T.StructField("AREA_CODE", T.StringType()),
        T.StructField("AREA_NAME", T.StringType()),
        T.StructField("IS_AREA_CORE", T.BooleanType()),
        T.StructField("CANCER_SITE", T.StringType()),
        T.StructField("GENDER", T.StringType()),
        T.StructField("AGE_AT_DIAGNOSIS", T.StringType()),
        T.StructField("STANDARDISATION_TYPE", T.StringType()),
        T.StructField("YEAR_OF_DIAGNOSIS", T.LongType()),
        T.StructField("YEARS_SINCE_DIAGNOSIS", T.LongType()),
        T.StructField("PATIENT_NUMBERS", T.LongType()),
        T.StructField("SURVIVAL_PERCENT", T.DoubleType()),
        T.StructField("LOWER_CI", T.DoubleType()),
        T.StructField("UPPER_CI", T.DoubleType()),
        T.StructField("PRECISION", T.DoubleType()),
        T.StructField("STANDARD_ERROR", T.DoubleType()),
        # [sic] — the reference misspells SUBSTITUTED in the DDL; parity
        # requires keeping the misspelling. Reference: docs/create_index.sql:18.
        T.StructField("IS_DATA_SUBTITUTED", T.BooleanType()),
        T.StructField("_TIMESTAMP", T.TimestampType()),
    ]
)

# Destination table ADULT_4 — reference: docs/create_adult4.sql:2-18.
ADULT4_SCHEMA = T.StructType(
    [
        T.StructField("AREA_TYPE", T.StringType()),
        T.StructField("AREA_CODE", T.StringType()),
        T.StructField("AREA_NAME", T.StringType()),
        T.StructField("IS_AREA_CORE", T.BooleanType()),
        T.StructField("CANCER_SITE", T.StringType()),
        T.StructField("GENDER", T.StringType()),
        T.StructField("STANDARDISATION_TYPE", T.StringType()),
        T.StructField("STANDARDISATION_TYPE_SUBCATEGORY", T.StringType()),
        T.StructField("YEARS_SINCE_DIAGNOSIS", T.LongType()),
        T.StructField("PATIENT_NUMBERS", T.LongType()),
        T.StructField("SURVIVAL_METRIC", T.StringType()),
        T.StructField("SURVIVAL_PERCENT", T.DoubleType()),
        T.StructField("DATE_DIAGNOSIS_WINDOW", T.StringType()),
        T.StructField("DATE_SNAPSHOT", T.StringType()),
        T.StructField("_TIMESTAMP", T.TimestampType()),
    ]
)

# Grain (uniqueness contracts) from the archive PKs —
# reference: docs/archive/create_index.sql:20-21, create_adult4.sql:19-21.
INDEX_GRAIN = [
    "AREA_CODE",
    "CANCER_SITE",
    "GENDER",
    "AGE_AT_DIAGNOSIS",
    "YEAR_OF_DIAGNOSIS",
    "YEARS_SINCE_DIAGNOSIS",
]
ADULT4_GRAIN = [
    "AREA_CODE",
    "CANCER_SITE",
    "GENDER",
    "STANDARDISATION_TYPE",
    "YEARS_SINCE_DIAGNOSIS",
    "SURVIVAL_METRIC",
    "DATE_DIAGNOSIS_WINDOW",
]

# Core geographies the pipelines pin — reference: src/main.py:396-397.
NCL_CA_CODE = "E56000027"
LONDON_CODE = "E40000003"
ENGLAND_CODE = "E92000001"
TARGET_GEOGRAPHIES = [NCL_CA_CODE, LONDON_CODE, ENGLAND_CODE]


def normalize_name(name: str) -> str:
    """Column-name normalization: newline→space, strip, spaces→_, lower.

    Reference: src/main.py:187-189 (and 346-348).
    """
    cleaned = re.sub(r"\s+", " ", name.replace("\n", " ")).strip()
    return cleaned.replace(" ", "_").lower()


def normalize_columns(df: DataFrame) -> DataFrame:
    """Apply :func:`normalize_name` to every column (metadata-only op)."""
    return df.toDF(*[normalize_name(c) for c in df.columns])


def rename_project(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename-dict-as-projection: keep exactly ``mapping``'s keys, in order,
    renamed to its values. Reference: src/main.py:193-212 (the
    ``df[rename.keys()].rename(...)`` idiom).
    """
    from pyspark.sql import functions as F

    return df.select([F.col(k).alias(v) for k, v in mapping.items()])


def assert_grain(df: DataFrame, keys: list[str]) -> None:
    """Raise if ``df`` is not unique on ``keys`` (the table's grain).

    Spark has no PK enforcement; this is the machine-checkable stand-in for
    the archive DDL's composite PRIMARY KEYs.
    """
    from pyspark.sql import functions as F

    dupes = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).filter("n > 1")
    sample = dupes.limit(5).collect()
    if sample:
        raise AssertionError(f"grain violation on {keys}: e.g. {sample}")
