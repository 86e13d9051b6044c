"""Composable DataFrame→DataFrame operators (SURVEY §2.2-2.9)."""

from .filters import disjunctive_filter, membership_flag, not_all_of, null_flag
from .rank import rank_quartile
from .reshape import melt, pivot_fixed
from .union import duplicate_rows_as, generalise_gender, union_stack

__all__ = [
    "disjunctive_filter",
    "duplicate_rows_as",
    "generalise_gender",
    "melt",
    "membership_flag",
    "not_all_of",
    "null_flag",
    "pivot_fixed",
    "rank_quartile",
    "union_stack",
]
