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
    # threshold form runs the banded O(len·k) DP with early abandon and
    # returns -1 past the cutoff — the in-block quadratic step costs
    # O(k) per char instead of O(len), the difference between hours and
    # minutes on wide blocks at corpus scale.
    dist = F.levenshtein("name_a", "name_b", max_distance)
    return (
        pairs.withColumn("distance", dist)
        .filter(
            (F.col("distance") >= F.lit(0))
            & (F.col("distance") <= F.lit(max_distance))
        )
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


def segment_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str] = (),
    max_distance: int = 1,
) -> DataFrame:
    """All pairs with edit distance ≤ ``max_distance`` WITHOUT the
    in-block quadratic pair surface — the PassJoin segment-index design
    (Li, Deng, Feng: EDBT 2011 / VLDB-J, public algorithm).

    Pigeonhole: partition every string into k+1 contiguous segments
    (k = max_distance). If lev(s, t) ≤ k, at least one segment of s
    survives un-edited, and it appears in t as an EXACT substring whose
    start position is shifted by at most k. So each row emits (a) its
    k+1 segment keys — the index role — and (b) the substrings of every
    compatible partner-length partition at start positions within ±k —
    the probe role. Candidates come from an EQUI-join on
    (segment_idx, partner_len, content): work scales with key
    collisions (true near-pairs + hash-bucket accidents), not with
    block size². Survivors are verified with banded threshold
    Levenshtein. Output contract matches ``blocked_fuzzy_pairs``
    exactly (same columns, same pairs, given no blocking loss).

    ``block_cols`` further scopes candidates (policy blocking, e.g.
    nation) — optional here, since the segment index already bounds the
    join; at corpus scale keep a coarse block to bound hot segment
    buckets (the ``block_profile`` of segment keys is the skew check).
    """
    k = int(max_distance)
    n_seg = k + 1
    L = F.length(F.col(name_col))

    def seg_len(length: Column, i: Column) -> Column:
        # canonical even partition of `length` into n_seg parts: the
        # last (length % n_seg) segments are one longer.
        base = (length / n_seg).cast("int")
        rem = length % n_seg
        return base + F.when(i > (F.lit(n_seg) - rem), 1).otherwise(0)

    def seg_start(length: Column, i: Column) -> Column:
        # 1-based start of segment i = 1 + Σ_{j<i} len_j; closed form:
        # (i-1)*base + max(0, (i-1) - (n_seg - rem))
        base = (length / n_seg).cast("int")
        rem = length % n_seg
        over = (i - 1) - (F.lit(n_seg) - rem)
        return (i - 1) * base + F.greatest(over, F.lit(0)) + 1

    idx = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.lit(n_seg)),
            lambda i: F.struct(
                i.alias("seg_i"),
                L.alias("part_len"),
                F.substring(
                    F.col(name_col), seg_start(L, i), seg_len(L, i)
                ).alias("content"),
            ),
        )
    )
    index_side = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        idx.alias("_k"),
    ).select(
        *block_cols, "id_a", "name_a",
        F.col("_k.seg_i").alias("_seg_i"),
        F.col("_k.part_len").alias("_part_len"),
        F.col("_k.content").alias("_content"),
    ).filter(F.length("_content") > 0)

    # probe role: for each partner length Lp in [L-k, L+k], each segment
    # of THAT partition, each start within ±k of its nominal position.
    probes = F.explode(
        F.flatten(
            F.transform(
                F.sequence(L - k, L + k),
                lambda lp: F.filter(
                    F.flatten(
                        F.transform(
                            F.sequence(F.lit(1), F.lit(n_seg)),
                            lambda i: F.transform(
                                F.sequence(
                                    seg_start(lp, i) - k,
                                    seg_start(lp, i) + k,
                                ),
                                lambda p: F.struct(
                                    i.alias("seg_i"),
                                    lp.alias("part_len"),
                                    F.when(
                                        (p >= 1)
                                        & (p + seg_len(lp, i) - 1 <= L)
                                        & (seg_len(lp, i) > 0)
                                        & (lp >= 1),
                                        F.substring(
                                            F.col(name_col),
                                            p,
                                            seg_len(lp, i),
                                        ),
                                    ).alias("content"),
                                ),
                            ),
                        )
                    ),
                    lambda s: s["content"].isNotNull(),
                ),
            )
        )
    )
    probe_side = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        probes.alias("_k"),
    ).select(
        *block_cols, "id_b", "name_b",
        F.col("_k.seg_i").alias("_seg_i"),
        F.col("_k.part_len").alias("_part_len"),
        F.col("_k.content").alias("_content"),
    )

    join_keys = [*block_cols, "_seg_i", "_part_len", "_content"]
    cand = (
        index_side.join(probe_side, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b", k)
    return (
        cand.withColumn("distance", dist)
        .filter((F.col("distance") >= 0) & (F.col("distance") <= k))
        .select(
            "id_a", "id_b", "name_a", "name_b", "distance",
            F.round(
                F.lit(1.0)
                - F.col("distance")
                / F.greatest(F.length("name_a"), F.length("name_b")),
                6,
            ).alias("similarity"),
        )
    )


def symdelete_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str] = (),
    max_distance: int = 1,
) -> DataFrame:
    """All pairs with edit distance ≤ ``max_distance`` (k ∈ {1, 2}) via
    the symmetric-delete scheme (SymSpell, Garbe — public algorithm):
    every string emits all variants reachable by deleting ≤ k
    characters; lev(s, t) ≤ k implies s and t share at least one
    variant, so an EQUI-join on (block, variant) generates candidates
    and banded Levenshtein verifies. Bucket size tracks true
    near-duplicate density (plus identical strings), NOT block size —
    on id-like keys with long shared prefixes this beats both the
    quadratic block join and the segment index, whose fixed-position
    segments degenerate into one mega-bucket on a constant prefix.

    Variant fan-out is 1 + L for k=1 and O(L²) for k=2 — one narrow
    shuffle of ~L× (k=1) the input's name bytes. k > 2 is rejected:
    the C(L, k) fan-out is the wrong tool there; use
    ``segment_fuzzy_pairs``.
    """
    k = int(max_distance)
    if k not in (1, 2):
        raise ValueError(
            f"symdelete_fuzzy_pairs supports max_distance 1 or 2, got {k}"
        )
    name = F.col(name_col)
    L = F.length(name)
    del1 = F.transform(
        F.sequence(F.lit(1), L),
        lambda i: F.concat(
            F.substring(name, 1, i - 1), name.substr(i + 1, L)
        ),
    )
    variants = F.array_union(F.array(name), del1)
    if k == 2:
        # delete-2 = delete one char from each delete-1 variant
        del2 = F.flatten(
            F.transform(
                del1,
                lambda v: F.transform(
                    F.sequence(F.lit(1), F.length(v)),
                    lambda i: F.concat(
                        F.substring(v, 1, i - 1),
                        v.substr(i + 1, F.length(v)),
                    ),
                ),
            )
        )
        variants = F.array_union(variants, F.array_distinct(del2))

    keyed = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("_id"),
        name.alias("_name"),
        F.explode(variants).alias("_variant"),
    )
    a = keyed.select(
        *block_cols,
        F.col("_id").alias("id_a"),
        F.col("_name").alias("name_a"),
        "_variant",
    )
    b = keyed.select(
        *block_cols,
        F.col("_id").alias("id_b"),
        F.col("_name").alias("name_b"),
        "_variant",
    )
    cand = (
        a.join(b, [*block_cols, "_variant"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b", k)
    return (
        cand.withColumn("distance", dist)
        .filter((F.col("distance") >= 0) & (F.col("distance") <= k))
        .select(
            "id_a", "id_b", "name_a", "name_b", "distance",
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


def golden_record(
    df: DataFrame,
    cluster_col: str,
    mode_cols: Sequence[str] = (),
    latest_cols: Sequence[str] = (),
    ts_col: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Survivorship after entity resolution: collapse each linkage
    cluster to ONE golden record — ``mode_cols`` survive by the most
    frequent non-null value (ties broken by the value itself, so the
    pick is deterministic on any engine), ``latest_cols`` by the value
    on the cluster's most recent row (by ``ts_col``, ties by
    ``tiebreak_col`` — a total order).

    One aggregate per rule family over one (cluster) clustering:
    mode = max_by over (count, value) pairs computed in a pre-group;
    latest = max_by over the (ts, tiebreak) struct. No window over the
    raw rows, no collect; output is #clusters rows. Returns (cluster,
    n_members, <mode cols>, <latest cols>).
    """
    mode_cols = list(mode_cols)
    latest_cols = list(latest_cols)
    base = df.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("n_members"),
        *[
            F.max_by(
                F.col(c),
                F.struct(F.col(ts_col), F.col(tiebreak_col)),
            ).alias(c)
            for c in latest_cols
        ],
    )
    out = base
    for c in mode_cols:
        mode_df = (
            df.filter(F.col(c).isNotNull())
            .groupBy(cluster_col, c)
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .groupBy(cluster_col)
            .agg(
                F.max_by(
                    F.col(c), F.struct(F.col("_cnt"), F.col(c))
                ).alias(c)
            )
        )
        out = out.join(mode_df, cluster_col, "left")
    return out.select(
        cluster_col, "n_members", *mode_cols, *latest_cols
    )
