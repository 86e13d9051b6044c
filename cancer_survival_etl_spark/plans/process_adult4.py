"""process_adult4 — the ADULT_4 ETL pipeline (SURVEY §2.11 #2).

Reference: src/main.py:222-376. Flags → bracket-extraction string surgery
→ window/snapshot stamps → breast-Persons + gender-exclusive-site
generalization → unpivot (melt) of the two survival metrics → metric-name
cleanup → rename-projection. One lazy plan; the unpivot is a narrow op
(no shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import bracket_extract, split_prefix, strip_suffix_titlecase
from ..operators.filters import membership_flag
from ..operators.reshape import melt
from ..operators.union import duplicate_rows_as, generalise_gender
from ..schemas import normalize_columns, rename_project

RENAME_ADULT4 = {
    "area_type": "AREA_TYPE",
    "area_code": "AREA_CODE",
    "area_name": "AREA_NAME",
    "area_core": "IS_AREA_CORE",
    "cancer_site": "CANCER_SITE",
    "gender": "GENDER",
    "standardisation_type": "STANDARDISATION_TYPE",
    "standardisation_type_subcategory": "STANDARDISATION_TYPE_SUBCATEGORY",
    "years_since_diagnosis": "YEARS_SINCE_DIAGNOSIS",
    "patient_numbers": "PATIENT_NUMBERS",
    "survival_metric": "SURVIVAL_METRIC",
    "survival_per": "SURVIVAL_PERCENT",
    "date_diagnosis_window": "DATE_DIAGNOSIS_WINDOW",
    "date_snapshot": "DATE_SNAPSHOT",
}

ID_COLS = [
    "Geography type",
    "Geography name",
    "Geography code",
    "Cancer site",
    "Gender",
    "Standardisation type",
    "standardisation_type_subcategory",
    "Years since diagnosis",
    "Patients",
    "area_core",
    "date_diagnosis_window",
    "date_snapshot",
]
VALUE_COLS = ["Net survival (%)", "Overall survival (%)"]


def process_adult4(
    raw: DataFrame,
    target_geographies: Sequence[str],
    diagnosis_window: str,
    snapshot_date: str | None,
) -> DataFrame:
    """Raw 'Table 4' sheet → ADULT_4 destination shape (without _TIMESTAMP).

    ``diagnosis_window`` / ``snapshot_date`` are driver-side scalars
    (filename parse src/main.py:266-267; Notes-sheet parse src/main.py:78-95
    — see functions.text.diagnosis_window_from_filename / snapshot_date_parse).
    """
    # Core flag + keep (core OR Cancer Alliance) — src/main.py:235-242.
    df = raw.withColumn(
        "area_core", membership_flag("Geography code", target_geographies)
    )
    df = df.filter(
        (F.col("area_core")) | (F.col("Geography type") == "Cancer Alliance")
    )

    # Standardisation subcategory: text inside brackets, NULL for
    # 'Non-standardised'; strip the bracket part from the type —
    # src/main.py:244-260.
    df = df.withColumn(
        "standardisation_type_subcategory",
        bracket_extract("Standardisation type", guard_value="Non-standardised"),
    ).withColumn("Standardisation type", split_prefix("Standardisation type"))

    # Stamps — src/main.py:263-277 (date_upload becomes the sink's
    # _TIMESTAMP; window/snapshot are constants).
    df = df.withColumn("date_diagnosis_window", F.lit(diagnosis_window)).withColumn(
        "date_snapshot", F.lit(snapshot_date).cast("string")
    )

    # National breast → Persons — src/main.py:281-287.
    df = duplicate_rows_as(
        df,
        (F.col("Cancer site") == "Breast")
        & (F.col("Gender") == "Female")
        & (F.col("Geography code") == "E92000001"),
        {"Gender": F.lit("Persons")},
    )
    # Gender-exclusive sites → Persons — src/main.py:289-296.
    df = generalise_gender(df, site_col="Cancer site", gender_col="Gender")

    # Keep id+value cols, melt the two metrics — src/main.py:298-327.
    df = df.select(*(ID_COLS + VALUE_COLS))
    df = melt(df, ID_COLS, VALUE_COLS, "survival_metric", "survival_per")

    # "Net survival (%)" → "Net Survival" — src/main.py:329-333.
    df = df.withColumn("survival_metric", strip_suffix_titlecase("survival_metric"))

    # Display renames + normalization + final projection — src/main.py:336-369.
    df = (
        df.withColumnRenamed("Geography type", "Area type")
        .withColumnRenamed("Geography name", "Area name")
        .withColumnRenamed("Geography code", "Area code")
        .withColumnRenamed("Patients", "patient_numbers")
    )
    df = normalize_columns(df)
    return rename_project(df, RENAME_ADULT4)
