"""Streaming ingest hygiene: watermarked exact dedup, stream-static
enrichment, stream-stream interval joins.

The streaming half of the corpus-curation surface (llm/dedup.py is the
batch half): a training-data pipeline ingesting a document/event feed
needs at-least-once sources collapsed to effectively-once rows *on the
way in*, dimension enrichment without restarting the stream, and
bounded-state correlation of two feeds.

Scale/state notes:
- ``dropDuplicatesWithinWatermark`` keys the state store by the dedup
  columns and evicts entries once the watermark passes — state is
  bounded by (key arrival rate × watermark delay), not by stream
  lifetime. That is the only safe exact-dedup shape on an unbounded
  stream; plain ``dropDuplicates`` on a stream grows state forever.
- Stream-static joins re-read the static side per micro-batch and
  broadcast it when small — dimension updates are picked up without
  restarting the query, and the stream side never shuffles.
- Stream-stream joins buffer BOTH sides in the state store; the
  watermarks plus the time-range predicate are what let Spark discard
  buffered rows. Omitting either side's watermark is an unbounded-state
  bug, so this wrapper makes them required arguments.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Effectively-once rows from an at-least-once feed: drop any row
    whose ``key_cols`` were already seen within the watermark horizon.

    Duplicates separated by more than the watermark delay are NOT
    caught (their state was evicted) — that is the contract of bounded
    state; pick the delay to cover the source's redelivery window and
    let the batch-side exact_dedup sweep the long tail.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a stream with a static dimension (stream-static join).

    The static side is re-evaluated each micro-batch — a dim table
    updated in place is picked up live. ``broadcast_dim`` pins the
    map-side hash join so the stream never shuffles; leave it True
    unless the dimension is genuinely executor-memory-large.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    keys = [on] if isinstance(on, str) else list(on)
    return stream.join(d, keys, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_watermark: str = "10 minutes",
    right_watermark: str = "10 minutes",
    lower: str = "0 seconds",
    upper: str = "5 minutes",
) -> DataFrame:
    """Correlate two streams on a key within a time interval:
    right.ts ∈ [left.ts - lower, left.ts + upper].

    Both watermarks are mandatory (they bound the join state); the
    interval predicate is what lets the state store evict buffered rows
    from either side once the other side's watermark passes the window.
    """
    l = left.withWatermark(left_ts, left_watermark).alias("l")
    r = right.withWatermark(right_ts, right_watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}")
        )
    )
    return l.join(r, cond)


def streaming_near_dup_probe(
    stream: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint_path: str,
    threshold: float,
    num_tables: int = 2,
    num_planes: int = 6,
    m: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """The incremental embedding-dedup ingest loop as a STREAM: each
    micro-batch of vectors is probed against the persisted LSH+PQ
    entries lake (`llm/similarity.py::probe_lsh_pq_index` — ADC on
    index rows, no corpus vector reads), matched pairs land under
    ``pairs_path/epoch=<id>/``, and the batch's own entries are
    appended so the NEXT micro-batch sees them. Returns the
    ``writeStream`` builder (caller picks the trigger and starts it).

    Exactly-once notes (the replay contract):
    - pair output is written per-epoch with ``overwrite`` into the
      epoch's own directory — a replayed micro-batch overwrites its
      previous attempt instead of duplicating pairs (idempotent);
    - the index append is NOT idempotent, but duplicate entry rows are
      HARMLESS by construction: `probe_lsh_pq_index` distincts its
      candidate pairs, so a replayed append only re-creates the same
      candidates. State lives in the lake, not the state store — the
      stream itself is stateless (foreachBatch only).
    - REPLAY content idempotency: a batch replayed after a failure
      between the index append and the checkpoint commit re-probes an
      index that already contains the batch's OWN vectors, which would
      surface extra intra-batch pairs the first attempt never saw. The
      probe result is therefore anti-joined against the batch's own id
      set (broadcast, one micro-batch of ids), so first-attempt and
      replay attempts write the SAME pair set (ADVICE r3).
    - codebooks must exist before the stream starts (an ``overwrite``
      build on a seed corpus) — append mode never retrains, so every
      epoch's codes share the code space.
    """
    from cancer_survival_etl_spark.llm.similarity import (
        build_lsh_pq_index,
        probe_lsh_pq_index,
    )

    def per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.localCheckpoint(eager=True)
        pairs = probe_lsh_pq_index(
            batch_df.sparkSession,
            index_path,
            batch_df,
            threshold,
            num_tables,
            num_planes,
            m,
            sub_dim,
            id_col,
            vec_col,
        )
        # drop corpus-side hits that are this batch's own (replayed)
        # entries — keeps the pair set identical across replay attempts
        own = batch_df.select(F.col(id_col).alias("corpus_id")).distinct()
        pairs = pairs.join(F.broadcast(own), "corpus_id", "left_anti")
        pairs.write.mode("overwrite").parquet(
            f"{pairs_path}/epoch={epoch_id}"
        )
        build_lsh_pq_index(
            batch_df,
            index_path,
            num_tables,
            num_planes,
            m,
            sub_dim,
            id_col=id_col,
            vec_col=vec_col,
            mode="append",
        )

    return (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
