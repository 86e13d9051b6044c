"""Ingestion shims (SURVEY §2.1)."""

from .catalog import TPCH_TABLES, load_table, load_tables, register_views
from .excel import excel_sheet_to_df

__all__ = [
    "TPCH_TABLES",
    "excel_sheet_to_df",
    "load_table",
    "load_tables",
    "register_views",
]
