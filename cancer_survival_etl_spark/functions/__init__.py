"""Scalar expression library (SURVEY §2.8).

Pure Column→Column builders — every one stays JVM-side (no Python UDFs),
so each participates in whole-stage codegen and constant folding.
"""

from .keys import concat_key, quartile_bucket, sort_key
from .text import (
    bracket_extract,
    null_keeping_neq,
    split_prefix,
    strip_suffix_titlecase,
)

__all__ = [
    "bracket_extract",
    "concat_key",
    "null_keeping_neq",
    "quartile_bucket",
    "sort_key",
    "split_prefix",
    "strip_suffix_titlecase",
]
