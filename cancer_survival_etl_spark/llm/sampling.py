"""Dataset splitting and sampling for training pipelines.

Splits must be REPRODUCIBLE and ROW-STABLE at any scale: adding or
re-partitioning data must never move an existing row between train and
validation. ``randomSplit`` violates both (partition-order dependent);
the correct primitive is a content-hash threshold — a pure per-row
expression, no shuffle, identical on any engine that can md5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(fraction: float, digits: int = 4) -> str:
    """Lowercase hex string h such that P(md5-prefix < h) = fraction."""
    space = 16**digits
    return format(min(int(fraction * space), space - 1), f"0{digits}x")


def hash_split(
    df: DataFrame,
    id_col: str,
    train: float = 0.8,
    val: float = 0.1,
    salt: str = "",
    alias: str = "split",
) -> DataFrame:
    """Assign each row to train/val/test by the md5 of its id.

    The first 4 hex chars of md5(salt ∥ id) are uniform over [0, 16⁴);
    lexicographic comparison of lowercase hex IS numeric comparison, so
    the thresholds are plain string literals and the whole assignment is
    one codegen'd expression — deterministic, shuffle-free, and
    identical across engines/runs/partitionings. ``salt`` re-rolls the
    assignment (e.g. per experiment) without touching the data.
    """
    prefix = F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 4)
    t_train = _hex_threshold(train)
    t_val = _hex_threshold(train + val)
    split = (
        F.when(prefix < t_train, F.lit("train"))
        .when(prefix < t_val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(alias, split)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum sampling (``sampleBy``): e.g. downsample an
    over-represented language while keeping rare ones intact — the
    class-rebalancing primitive for corpus curation. Per-row Bernoulli
    draw, no shuffle; exact fractions are approximate by contract."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)
