"""Excel ingestion shim (SURVEY §2.1 S1).

Spark has no core Excel reader; the reference reads workbook sheets with
``pd.read_excel(path, sheet_name=..., skiprows=N)`` (reference:
src/main.py:113, 227, 81-82). We isolate that non-Spark edge here: pandas
(if the workbook engine is available) → Arrow → ``spark.createDataFrame``.
The engine core never touches Excel — callers hand it DataFrames.

Workbooks are driver-side small files (O(10^4) rows in the reference);
for anything large the lake format is parquet/csv via ``spark.read``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def excel_sheet_to_df(
    spark: SparkSession,
    path: str,
    sheet_name: str,
    skiprows: int = 0,
    schema=None,
) -> DataFrame:
    """Read one sheet of a workbook into a Spark DataFrame.

    Prefers ``pd.read_excel`` (full-fidelity, when an engine such as
    openpyxl is installed); otherwise falls back to the vendored
    stdlib reader (:mod:`.xlsx` — zipfile + SpreadsheetML XML), which
    covers the grid-of-strings/numbers/blanks subset the reference's
    workbooks use.
    """
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet_name, skiprows=skiprows)
    except ImportError:  # no openpyxl in this environment
        from .xlsx import read_xlsx_sheet

        pdf = read_xlsx_sheet(path, sheet_name, skiprows=skiprows)
    return pandas_to_df(spark, pdf, schema=schema)


def pandas_to_df(spark: SparkSession, pdf, schema=None) -> DataFrame:
    """pandas → Spark with real NULLs.

    Replicates the reference's NaN→None normalization before load
    (reference: src/utils/database_util.py:30) — Arrow conversion maps
    NaN/NaT to Spark NULL, so suppressed cells arrive as NULL, never the
    string "null".
    """
    return spark.createDataFrame(pdf, schema=schema)
