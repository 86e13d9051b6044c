"""Hypertable-style cascading rollups: multi-resolution time-series
aggregates where each coarser level re-aggregates the next finer
level's PARTIALS instead of rescanning raw events — the TimescaleDB
continuous-aggregate / OLAP-cube-cascade shape, expressed as plain
DataFrame plans.

Why it matters at 100 TB: the raw table is touched ONCE (for the
finest level); every coarser resolution aggregates a table that is
orders of magnitude smaller (minute partials ≈ #minutes × #groups
rows). Day-level dashboards never pay the raw-scan cost, and all
partials are themselves persistable as materialized rollup tables.

Only decomposable aggregates cascade losslessly: count and sum re-sum,
min/max re-min/re-max. Averages are derived (sum/count) at read time;
never cascade an avg of avgs. Currency-like doubles are carried as
integer cents through every level (order-independent exact sums — see
__spark_entry__._money_sum) and divided once at the end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cascading_rollup(
    events: DataFrame,
    levels: Sequence[str] = ("1 minute", "1 hour", "1 day"),
    ts_col: str = "ts",
    value_col: str = "value",
    group_cols: Sequence[str] = ("event_type",),
) -> list[DataFrame]:
    """Build the rollup cascade; returns one DataFrame per level, finest
    first, each with columns (window_start, *group_cols, n_events,
    sum_cents, min_value, max_value).

    ``levels`` must nest (each duration an integer multiple of the
    previous) — window starts then align exactly, so re-windowing a
    partial's ``window_start`` is lossless. ``sum_cents`` stays a long
    throughout; render as money via ``finish_rollup``.
    """
    gcols = list(group_cols)
    finest = (
        events.groupBy(F.window(ts_col, levels[0]).alias("w"), *gcols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias(
                "sum_cents"
            ),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(F.col("w.start").alias("window_start"), "*")
        .drop("w")
    )
    out = [finest]
    for duration in levels[1:]:
        prev = out[-1]
        out.append(
            prev.groupBy(
                F.window("window_start", duration).alias("w"), *gcols
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_cents").alias("sum_cents"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
            .select(F.col("w.start").alias("window_start"), "*")
            .drop("w")
        )
    return out


def finish_rollup(level: DataFrame) -> DataFrame:
    """Read-time projection of a rollup level: cents → money sum, plus
    the derived average (sum/count — the only safe way to average
    across partials)."""
    return level.select(
        "*",
        (F.col("sum_cents") / F.lit(100.0)).alias("sum_value"),
        F.round(
            F.col("sum_cents") / F.lit(100.0) / F.col("n_events"), 6
        ).alias("avg_value"),
    ).drop("sum_cents")
