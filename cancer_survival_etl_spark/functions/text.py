"""String-surgery expressions (SURVEY §2.8 F1-F7).

Each function documents the pandas↔Spark semantic edge it resolves; these
edges are property-tested in tests/test_functions.py.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def literal_replace(col: Column | str, find: str, repl: str) -> Column:
    """Literal (non-regex) substring replace.

    pandas ``str.replace(..., regex=False)`` — reference: src/main.py:149-150.
    Spark's ``F.replace`` (≥3.5) is the literal-match analog; for clarity and
    back-compat we escape into ``regexp_replace``.
    """
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col,
                            re.escape(find), repl.replace("\\", "\\\\"))


def bracket_extract(col: Column | str, guard_value: str | None = None) -> Column:
    """Extract the text inside the first ``(...)`` — NULL when absent.

    Reference: src/main.py:244-255 — split on '(' take [1], split on ')'
    take [0], NaN-guarded via ``.where(std != "Non-standardised")``.

    Edge: Spark ``regexp_extract`` yields ``''`` (not NULL) on no-match;
    pandas produces NaN. We wrap in ``nullif`` to restore NULL semantics.
    """
    c = F.col(col) if isinstance(col, str) else col
    extracted = F.nullif(F.regexp_extract(c, r"\(([^)]*)\)", 1), F.lit(""))
    if guard_value is not None:
        return F.when(c != guard_value, extracted)
    return extracted


def split_prefix(col: Column | str, sep: str = "(") -> Column:
    """Keep trimmed text before the first ``sep``.

    Reference: src/main.py:257-260 (standardisation type keeps text
    before '(' then strip).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.split(c, re.escape(sep)).getItem(0))


def strip_suffix_titlecase(col: Column | str, suffix: str = " (%)") -> Column:
    """Drop a literal suffix then title-case.

    Reference: src/main.py:329-333 (``removesuffix(" (%)")`` + ``str.title``).
    ``initcap`` and ``str.title`` agree on the reference's domain
    ("Net survival (%)" → "Net Survival", "Overall survival (%)" →
    "Overall Survival"); equivalence-on-domain is pinned by test.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.initcap(F.regexp_replace(c, re.escape(suffix) + "$", ""))


def null_keeping_neq(col: Column | str, value) -> Column:
    """``col != value`` that KEEPS null rows (pandas ``~(s == v)`` semantics).

    Reference: src/main.py:153 drops ``Cancer site == "Other"`` with pandas
    ``~(x == v)``, which keeps NaN rows; Spark's ``!=`` drops nulls. This is
    SQL ``col IS DISTINCT FROM value`` for a non-null literal.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c != F.lit(value)) | c.isNull()


def snapshot_date_parse(first_cell_text: str | None) -> str | None:
    """Driver-side parse of the Notes-sheet snapshot date.

    Reference: src/main.py:78-95 — tokens [-3:-1] of the first cell form
    "<Month> <YYYY>"; year must be in (2000, 2100) exclusive; any failure
    → None (with a warning in the reference). The reference's month check
    (src/main.py:88) is vacuous — it compares ``month_name[0]``, i.e. the
    empty string at calendar index 0, so every month token passes; we
    replicate the *observable* behavior (no month validation).
    """
    if not first_cell_text:
        return None
    try:
        tokens = str(first_cell_text).split()
        month, year = tokens[-3:-1]
        if not (2000 < int(year) < 2100):
            return None
        return f"{month} {year}"
    except (ValueError, IndexError):
        return None


def diagnosis_window_from_filename(file_name: str) -> str:
    """``adult_2016_2020.xlsx`` → ``"2016-2020"``.

    Reference: src/main.py:266-267 — split on '.', take segment [-2] (the
    stem even for dotted paths), split on '_', join the last two tokens
    with '-'.
    """
    stem = file_name.split(".")[-2]
    tokens = stem.split("_")
    return "-".join(tokens[-2:])
