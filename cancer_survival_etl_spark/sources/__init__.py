"""Ingestion shims and sinks (SURVEY §2.1)."""

from .catalog import TPCH_TABLES, load_table, load_tables, register_views
from .excel import excel_sheet_to_df, pandas_to_df
from .files import list_data_files, route_by_prefix
from .sinks import overwrite_as_table, overwrite_table, stamp_audit

__all__ = [
    "TPCH_TABLES",
    "excel_sheet_to_df",
    "list_data_files",
    "load_table",
    "load_tables",
    "overwrite_as_table",
    "overwrite_table",
    "pandas_to_df",
    "register_views",
    "route_by_prefix",
    "stamp_audit",
]
