"""End-to-end batch pipeline — the reference's ``main()`` re-expressed.

Reference flow (src/main.py:378-422): enumerate ``data/*.xlsx`` →
route by filename prefix → per-file pandas transform chain → truncate-
and-replace warehouse load. Here: the same driver-side enumeration and
routing feed the lazy Spark recipes, and the sink is one atomic
overwrite per destination.

I/O is injectable (``load_sheet``, ``sink``) so the pipeline runs
against live workbooks when an Excel engine exists, and against
DataFrame fixtures in tests or backfills — the routing/recipe/sink
logic is identical either way.
"""

from __future__ import annotations

import os
import warnings
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from .functions.text import diagnosis_window_from_filename
from .plans.process_adult4 import process_adult4
from .plans.process_index import process_index
from .sources.excel import excel_sheet_to_df
from .sources.files import list_data_files, route_by_prefix

# Sheet geometry per file family — reference: src/main.py:113 (Table 5,
# skip 10), :227 (Table 4, skip 9), :81-82 (Notes, skip 10).
INDEX_SHEET = ("Table 5", 10)
ADULT_SHEET = ("Table 4", 9)
NOTES_SHEET = ("Notes and definitions", 10)


def run_pipeline(
    spark: SparkSession,
    data_dir: str,
    target_geographies: Sequence[str],
    sink: Callable[[DataFrame, str], None],
    load_sheet: Callable[..., DataFrame] | None = None,
    snapshot_date: str | None = None,
) -> dict[str, DataFrame]:
    """Process every workbook in ``data_dir`` into its destination table.

    ``sink(df, table)`` receives the finished DataFrame per destination
    ("INDEX" / "ADULT_4"); ``load_sheet(spark, path, sheet, skiprows)``
    defaults to the Excel shim. Returns the final DataFrame per
    destination (last file wins per family, as in the reference's
    sequential truncate-and-replace).
    """
    load = load_sheet or excel_sheet_to_df
    out: dict[str, DataFrame] = {}

    def handle_index(path: str) -> DataFrame:
        raw = load(spark, path, *INDEX_SHEET)
        df = process_index(raw, target_geographies)
        out["INDEX"] = df
        sink(df, "INDEX")
        return df

    def handle_adult(path: str) -> DataFrame:
        raw = load(spark, path, *ADULT_SHEET)
        window = diagnosis_window_from_filename(os.path.basename(path))
        df = process_adult4(
            raw,
            target_geographies,
            diagnosis_window=window,
            snapshot_date=snapshot_date,
        )
        out["ADULT_4"] = df
        sink(df, "ADULT_4")
        return df

    files = list_data_files(data_dir)
    route_by_prefix(
        files,
        {"Index": handle_index, "adult": handle_adult},
        on_unmatched=lambda p: warnings.warn(f"no route for {p}", stacklevel=2),
    )
    return out
