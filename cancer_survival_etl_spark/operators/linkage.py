"""Entity resolution / record linkage: blocked fuzzy-matching of
records by edit distance.

Beyond-reference extension (the reference — see SURVEY.md — dedups on
exact grain only, `src/utils/processing_util.py` drop_duplicates; this
is the fuzzy sibling a registry-scale master-data pipeline needs).

Scale notes
-----------
The naive formulation is an all-pairs O(n²) cross join — the classic
entity-resolution trap. The operator REQUIRES a blocking key and only
compares pairs inside a block (standard blocking design, Fellegi-Sunter
lineage): one shuffle on the block key, quadratic work bounded by the
largest block. Pick blocks the way the literature does — phonetic
codes, sorted-neighbourhood windows, attribute buckets; the
``block_cols`` default (exact length bucket per nation-style attribute)
keeps blocks tens-of-rows wide on id-like names. Block-size skew is
observable via ``block_profile`` before running the quadratic step.

Levenshtein is computed JVM-side (built-in expression, codegen'd), and
only on in-block pairs that survive the cheap length-difference
pre-filter |len(a)−len(b)| ≤ max_distance (a lower bound on edit
distance — cuts most of the block's quadratic surface before the DP).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str],
    max_distance: int = 2,
) -> DataFrame:
    """Candidate duplicate pairs: records sharing a block whose
    ``name_col`` edit distance is ≤ ``max_distance``. Returns
    (id_a, id_b, name_a, name_b, distance, similarity) with
    id_a < id_b (each unordered pair once) and similarity =
    1 − distance/greatest(len_a, len_b) rounded to 6 dp.
    """
    left = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
    )
    right = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
    )
    pairs = left.join(right, list(block_cols)).filter(
        (F.col("id_a") < F.col("id_b"))
        & (
            F.abs(F.length("name_a") - F.length("name_b"))
            <= F.lit(max_distance)
        )
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        pairs.withColumn("distance", dist)
        .filter(F.col("distance") <= F.lit(max_distance))
        .select(
            "id_a",
            "id_b",
            "name_a",
            "name_b",
            "distance",
            F.round(
                F.lit(1.0)
                - F.col("distance")
                / F.greatest(F.length("name_a"), F.length("name_b")),
                6,
            ).alias("similarity"),
        )
    )


def block_profile(
    df: DataFrame, block_cols: Sequence[str]
) -> DataFrame:
    """Pre-flight skew check for blocking keys: per-block record count
    and the quadratic pair surface it implies (n·(n−1)/2). Run this
    before ``blocked_fuzzy_pairs`` at a new scale — a single mega-block
    is the difference between seconds and never-finishes."""
    return (
        df.groupBy(*block_cols)
        .agg(F.count(F.lit(1)).alias("n_records"))
        .select(
            *block_cols,
            "n_records",
            (
                F.col("n_records") * (F.col("n_records") - 1) / F.lit(2)
            ).cast("long").alias("n_pairs"),
        )
    )
