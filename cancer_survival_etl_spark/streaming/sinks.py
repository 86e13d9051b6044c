"""Streaming sinks.

The file sink covers plain append; ``foreachBatch`` is the general
adapter — it hands each micro-batch to ordinary batch-write code (any
format, upserts, multi-table fan-out) with an epoch id for idempotence.
Exactly-once = checkpointing (offsets) + an idempotent batch writer.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def stream_append_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
):
    """writeStream → parquet file sink (append, exactly-once via the
    sink's transaction log + checkpointed offsets). Returns the unstarted
    writer so callers pick the trigger."""
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w


def foreach_batch_sink(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    output_mode: str = "update",
):
    """writeStream → foreachBatch adapter: ``batch_fn(batch_df, epoch_id)``
    runs the engine's ordinary batch sinks (sources.sinks.overwrite_table,
    saveAsTable upserts, multi-destination writes) per micro-batch.
    ``epoch_id`` is stable across retries of the same batch — dedupe on
    it for idempotent destinations. Returns the unstarted writer."""
    return (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
