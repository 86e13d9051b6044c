"""Tumbling / sliding / session windows over event streams.

Batch-streaming unified: each function takes any events-shaped DataFrame
(``ts`` timestamp, ``event_type`` string, ``value`` double, ``user_id``
long). On a streaming input add ``.withWatermark("ts", ...)`` upstream
and these plans run incrementally with state cleanup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    duration: str = "1 day",
    watermark: str | None = None,
) -> DataFrame:
    """Per (tumbling window, event_type): count + sum(value).

    ``F.window`` assigns each row to exactly one bucket — the shuffle key
    is (window, event_type), so partial aggregation happens map-side and
    the shuffle moves only one row per (bucket × type) per task: this is
    the shape that survives 100 TB.
    """
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    duration: str = "2 days",
    slide: str = "1 day",
    watermark: str | None = None,
) -> DataFrame:
    """Per (sliding window, event_type) event counts — each row lands in
    duration/slide buckets."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", duration, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-user session windows (gap-based), via ``F.session_window``.

    Batch: complete sessions. Streaming: with a watermark this becomes
    stateful session aggregation with automatic state eviction — the
    built-in replacement for hand-rolled applyInPandasWithState.
    """
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def stream_from_events_dir(
    spark, path: str, schema=None, glob: str = "events.parquet"
) -> DataFrame:
    """readStream over a parquet events directory — the real lake entry
    for the streaming plans (tests run it with an availableNow trigger).

    Streaming sources need an explicit schema; by default it is derived
    from one batch read of the same files. Handles the testdata quirk of
    TIMESTAMP(NANOS) columns (illegal for Spark) the same way the batch
    catalog does: read as long nanos, truncate to microsecond timestamps.
    """
    import os

    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        schema = spark.read.parquet(os.path.join(path, glob)).schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .parquet(path)
    )
    ts_type = dict(src.dtypes).get("ts")
    if ts_type == "bigint":
        src = src.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # Watermarks demand TIMESTAMP (with local tz); testdata stores NTZ.
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    return src


def tumbling_distinct_users(
    events: DataFrame,
    duration: str = "1 day",
    watermark: str | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Per (tumbling window, event_type): HLL-estimated distinct users
    — the streaming form of the mergeable distinct rollup
    (``operators/sketches.py::hll_rollup``). Exact streaming
    COUNT(DISTINCT) needs per-key state proportional to the user set;
    the sketch caps state at 2^lg_k registers per group, and the SAME
    aggregate works identically in batch (pinned in tests) because
    ``hll_sketch_agg`` is just another partial-aggregable function to
    Catalyst — batch ≡ streaming, the module's standing claim."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(lg_k))
            ).alias("distinct_users_est"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "distinct_users_est",
            "n_events",
        )
    )
