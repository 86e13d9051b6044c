"""As-of (most-recent-match) join — an operator Spark lacks natively.

For each left row, attach the right row with the greatest timestamp
≤ the left row's timestamp within the same key group (the time-series
enrichment join: trades→quotes, events→latest state).

Implementation is the scalable union-tag-carry shape, NOT a range join:
union both sides tagged, one shuffle on the key, sort by (ts, side)
within partitions, and carry the last non-null right payload forward
with ``last(..., ignorenulls=True)`` over an unbounded-preceding frame.
Cost = one shuffle + one sort of |L|+|R| rows — same asymptotics as any
windowed aggregation, with no quadratic candidate generation and no
per-row probe. (A broadcast-range-join alternative only wins when the
right side is tiny; this form is the 100 TB default.)

Right rows sharing (key, ts) would make "the" match ambiguous — callers
should pre-aggregate the right side to one row per (key, ts); the
driver query and oracle both do (DuckDB's native ASOF JOIN is the
oracle, so tie semantics must be deterministic on both engines).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    matched_ts_alias: str = "matched_ts",
) -> DataFrame:
    """LEFT as-of join: every left row, plus ``value_cols`` (and the
    matching timestamp as ``matched_ts_alias``) from the latest right
    row with ``right.ts_col <= left.ts_col`` per ``on`` group; NULLs
    where no right row precedes.

    A right row at exactly the left timestamp DOES match (<=), which is
    why the right side sorts before the left side on timestamp ties.
    """
    on = list(on)
    left_cols = [c for c in left.columns if c not in on]
    l_tagged = left.select(
        *on,
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        *on,
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(ts_col).alias("_r_ts"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right (side 0) sorts before left (side 1) at equal timestamps so an
    # exactly-simultaneous right row is visible to the left row (<=).
    order_ts = F.coalesce(F.col(ts_col), F.col("_r_ts"))
    w = (
        Window.partitionBy(*on)
        .orderBy(order_ts, F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_carried_{c}")
            for c in value_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_carried_ts"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *on,
        *left_cols,
        *[F.col(f"_carried_{c}").alias(c) for c in value_cols],
        F.col("_carried_ts").alias(matched_ts_alias),
    )


def range_join_preceding(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    window_seconds: int,
    right_prefix: str = "r_",
) -> DataFrame:
    """Interval join: all right rows with ``left.ts - window < right.ts
    <= left.ts`` per key group (e.g. "purchases in the hour before each
    click").

    Naively this is an inequality join — Spark would pick a
    broadcast-nested-loop and die at scale. Bucketization makes it an
    equi-join: both sides bucket timestamps by the window width; a left
    row's matches can only live in its own or the previous bucket, so
    the left side explodes to exactly 2 (key, bucket) probes and the
    range predicate is applied AFTER the equi-join as a cheap filter.
    Shuffle is O(|L|·2 + |R|) rows on constant-width keys.

    Right columns (except the keys) come back prefixed with
    ``right_prefix``.
    """
    on = list(on)
    bucket_of = lambda col: F.floor(
        F.unix_timestamp(F.col(col)) / F.lit(window_seconds)
    )
    l = left.select(
        *on,
        *[c for c in left.columns if c not in on],
        F.explode(
            F.array(bucket_of(ts_col), bucket_of(ts_col) - 1)
        ).alias("_bucket"),
    )
    r = right.select(
        *on,
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in on
        ],
        bucket_of(ts_col).alias("_bucket"),
    )
    # NB bucket_of(ts_col) on the right resolves against right's columns
    # because it is built inside this select.
    joined = l.join(r, [*on, "_bucket"])
    rt = F.col(f"{right_prefix}{ts_col}")
    lo = F.col(ts_col) - F.expr(f"INTERVAL {window_seconds} SECOND")
    return joined.filter((rt > lo) & (rt <= F.col(ts_col))).drop("_bucket")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    tolerance: float | None = None,
    matched_ts_alias: str = "matched_ts",
    distance_alias: str = "match_distance",
) -> DataFrame:
    """NEAREST as-of join: every left row, plus ``value_cols`` from
    the right row whose ``ts_col`` is CLOSEST in either direction per
    ``on`` group — the sensor-alignment / lab-value-at-diagnosis
    variant ``asof_join`` (backward-only) cannot express. Ties at
    equal distance resolve toward the PRECEDING right row (the
    ``asof_join`` <= convention); an exactly-simultaneous right row
    matches at distance 0. ``tolerance`` (same units as ``ts_col``)
    nulls out matches farther than the cap.

    Same union construction as ``asof_join``, with TWO keyed window
    carries over one sorted frame — a backward ``last(ignorenulls)``
    and a forward ``first(ignorenulls)`` — so the cost is one shuffle
    on ``on`` plus two window passes over each group's span (the
    keyed-window scale contract shared with ``asof_join``: hot keys
    serialize their own span, never the corpus).

    Returns left columns + ``value_cols`` + ``matched_ts_alias`` +
    ``distance_alias`` (NULLs where unmatched or beyond tolerance).
    """
    on = list(on)
    if tolerance is not None and tolerance <= 0:
        raise ValueError("asof_join_nearest: tolerance must be > 0")
    left_cols = [c for c in left.columns if c not in on]
    vcols = list(value_cols)
    l_tagged = left.select(
        *on,
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in vcols
        ],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        *on,
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        *[F.col(c).alias(f"_r_{c}") for c in vcols],
        F.col(ts_col).alias("_r_ts"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    order_ts = F.coalesce(F.col(ts_col), F.col("_r_ts"))
    w_back = (
        Window.partitionBy(*on)
        .orderBy(order_ts, F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(order_ts, F.col("_side"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True)
            .over(w_back)
            .alias(f"_b_{c}")
            for c in vcols
        ],
        F.last("_r_ts", ignorenulls=True).over(w_back).alias("_b_ts"),
        *[
            F.first(f"_r_{c}", ignorenulls=True)
            .over(w_fwd)
            .alias(f"_f_{c}")
            for c in vcols
        ],
        F.first("_r_ts", ignorenulls=True).over(w_fwd).alias("_f_ts"),
    ).filter(F.col("_side") == 1)
    lts = F.col(ts_col).cast("double")
    d_back = lts - F.col("_b_ts").cast("double")
    d_fwd = F.col("_f_ts").cast("double") - lts
    use_back = F.col("_b_ts").isNotNull() & (
        F.col("_f_ts").isNull() | (d_back <= d_fwd)
    )
    dist = F.when(use_back, d_back).otherwise(d_fwd)
    matched = F.col("_b_ts").isNotNull() | F.col("_f_ts").isNotNull()
    if tolerance is not None:
        matched = matched & (dist <= F.lit(float(tolerance)))
    return carried.select(
        *on,
        *left_cols,
        *[
            F.when(
                matched,
                F.when(use_back, F.col(f"_b_{c}")).otherwise(
                    F.col(f"_f_{c}")
                ),
            ).alias(c)
            for c in vcols
        ],
        F.when(
            matched,
            F.when(use_back, F.col("_b_ts")).otherwise(F.col("_f_ts")),
        ).alias(matched_ts_alias),
        F.when(matched, dist).alias(distance_alias),
    )
