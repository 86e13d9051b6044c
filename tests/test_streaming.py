"""Batch-shape tests for the streaming window operators, plus a real
Structured Streaming run of the same plan."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from cancer_survival_etl_spark.sources.catalog import load_table
from cancer_survival_etl_spark.streaming.windows import (
    sessionize,
    sliding_counts,
    tumbling_agg,
)


def test_tumbling_agg(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    out = tumbling_agg(e, "1 day").toPandas()
    total = out["n_events"].sum()
    assert total == e.count()
    # every window start is midnight UTC
    assert (pd.to_datetime(out["window_start"]).dt.hour == 0).all()


def test_sliding_counts_double_count(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    tumb = tumbling_agg(e, "1 day").toPandas()["n_events"].sum()
    slid = sliding_counts(e, "2 days", "1 day").toPandas()["n_events"].sum()
    assert slid == 2 * tumb  # each event lands in exactly 2 sliding buckets


def test_sessionize(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    s = sessionize(e, gap="30 minutes").toPandas()
    assert s["n_events"].sum() == e.count()
    assert (s["session_end"] > s["session_start"]).all()


def test_streaming_plan_runs(spark, sf_dir, tmp_path):
    """The SAME tumbling_agg body on a readStream source — proves the
    batch/streaming unification claim."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "10").load()
    )
    # rate source: map to events shape, run one micro-batch to memory sink
    shaped = stream.select(
        F.col("timestamp").alias("ts"),
        (F.col("value") % 5).cast("string").alias("event_type"),
        (F.col("value") % 100).cast("double").alias("value"),
    )
    agg = tumbling_agg(shaped, "1 minute", watermark="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumb_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    # append mode emits only closed windows; the run completing without
    # error is the contract under test
    assert spark.sql("SELECT * FROM tumb_test").columns == [
        "window_start",
        "event_type",
        "n_events",
        "sum_value",
    ]


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState over a real micro-batch run: final per-user
    totals must equal the batch groupBy on the same rows."""
    from cancer_survival_etl_spark.streaming.stateful import (
        running_user_totals,
        running_user_totals_batch,
    )

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
    )
    shaped = stream.select(
        (F.col("value") % 3).alias("user_id"),
        (F.col("value") % 100).cast("double").alias("value"),
    )
    q = (
        running_user_totals(shaped)
        .writeStream.format("memory")
        .queryName("stateful_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        """SELECT user_id, max_by(n_events, n_events) AS n_events,
                  max_by(sum_value, n_events) AS sum_value,
                  max_by(max_value, n_events) AS max_value
           FROM stateful_test GROUP BY user_id"""
    ).toPandas()
    assert set(out.columns) == {"user_id", "n_events", "sum_value", "max_value"}
    if len(out):  # rate source produced rows (it always does w/ availableNow>=1s)
        # rebuild the same input as a batch frame for the analog check
        total_rows = int(out["n_events"].sum())
        batch = spark.range(total_rows).select(
            (F.col("id") % 3).alias("user_id"),
            (F.col("id") % 100).cast("double").alias("value"),
        )
        expect = {
            r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"])
            for r in running_user_totals_batch(batch).collect()
        }
        got = {
            int(r.user_id): (int(r.n_events), float(r.sum_value), float(r.max_value))
            for r in out.itertuples()
        }
        assert got == expect


def test_file_stream_matches_batch(spark, sf_dir):
    """readStream over the real events parquet, one availableNow pass,
    complete-mode tumbling agg — must equal the batch plan exactly."""
    from cancer_survival_etl_spark.streaming.windows import (
        stream_from_events_dir,
    )

    src = stream_from_events_dir(spark, sf_dir)
    q = (
        tumbling_agg(src, "1 day")
        .writeStream.format("memory")
        .queryName("file_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM file_stream_test").collect()
    }
    batch = load_table(spark, sf_dir, "events")
    expect = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_agg(batch, "1 day").collect()
    }
    assert got == expect and len(got) > 0


def test_foreach_batch_sink_and_file_sink(spark, sf_dir, tmp_path):
    """Stream the real events table through (a) the parquet file sink and
    (b) a foreachBatch writer appending through batch code; both must
    land every input row."""
    from cancer_survival_etl_spark.streaming.sinks import (
        foreach_batch_sink,
        stream_append_parquet,
    )
    from cancer_survival_etl_spark.streaming.windows import (
        stream_from_events_dir,
    )

    n_events = load_table(spark, sf_dir, "events").count()
    src = stream_from_events_dir(spark, sf_dir)

    q1 = stream_append_parquet(
        src.select("event_id", "user_id", "value"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt1"),
    ).trigger(availableNow=True).start()
    q1.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).count() == n_events

    seen = []

    def write_batch(batch_df, epoch_id):
        seen.append((epoch_id, batch_df.count()))
        batch_df.write.mode("append").parquet(str(tmp_path / "fb_out"))

    q2 = foreach_batch_sink(
        src.select("event_id", "value"),
        write_batch,
        str(tmp_path / "ckpt2"),
        output_mode="append",
    ).trigger(availableNow=True).start()
    q2.awaitTermination(120)
    assert sum(n for _, n in seen) == n_events
    assert spark.read.parquet(str(tmp_path / "fb_out")).count() == n_events


def test_streaming_exact_dedup(spark, sf_dir, tmp_path):
    """An at-least-once feed (the events stream unioned with itself =
    every row delivered twice) collapses back to exactly the distinct
    event_ids under dropDuplicatesWithinWatermark."""
    from cancer_survival_etl_spark.streaming.dedup import streaming_exact_dedup
    from cancer_survival_etl_spark.streaming.windows import (
        stream_from_events_dir,
    )

    src = stream_from_events_dir(spark, sf_dir)
    doubled = src.unionByName(stream_from_events_dir(spark, sf_dir))
    q = (
        streaming_exact_dedup(doubled, ["event_id"], watermark="1 day")
        .writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS d "
        "FROM dedup_stream_test"
    ).collect()[0]
    want = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert (got["n"], got["d"]) == (want, want)


def test_stream_static_enrich(spark, sf_dir):
    """Stream-static left join against a broadcast dimension: every
    event lands exactly once, every event is enriched."""
    from cancer_survival_etl_spark.streaming.dedup import stream_static_enrich
    from cancer_survival_etl_spark.streaming.windows import (
        stream_from_events_dir,
    )

    events = load_table(spark, sf_dir, "events")
    dim = (
        events.select("user_id")
        .distinct()
        .withColumn("segment", F.concat(F.lit("seg_"), F.col("user_id") % 3))
    )
    src = stream_from_events_dir(spark, sf_dir)
    q = (
        stream_static_enrich(src, dim, "user_id")
        .writeStream.format("memory")
        .queryName("enrich_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT count(*) AS n, count(segment) AS enriched "
        "FROM enrich_stream_test"
    ).collect()[0]
    n = events.count()
    assert (got["n"], got["enriched"]) == (n, n)


def test_stream_stream_interval_join(spark, sf_dir):
    """Two copies of the events feed joined on user_id within
    [ts, ts+5min): the streaming result must equal the batch interval
    join of the same tables."""
    from cancer_survival_etl_spark.streaming.dedup import (
        stream_stream_interval_join,
    )
    from cancer_survival_etl_spark.streaming.windows import (
        stream_from_events_dir,
    )

    keep = F.col("user_id") < 3  # bound the pair count
    left = stream_from_events_dir(spark, sf_dir).filter(keep)
    right = (
        stream_from_events_dir(spark, sf_dir)
        .filter(keep)
        .select(
            F.col("event_id").alias("r_event_id"),
            F.col("user_id").alias("user_id_r"),
            "ts",
        )
        .withColumnRenamed("user_id_r", "user_id")
    )
    joined = stream_stream_interval_join(
        left.select("event_id", "user_id", "ts"),
        right,
        key="user_id",
        lower="0 seconds",
        upper="5 minutes",
    ).select("event_id", "r_event_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT count(*) AS n FROM ss_join_test").collect()[0]["n"]

    e = load_table(spark, sf_dir, "events").filter(keep)
    a, b = e.alias("a"), e.alias("b")
    want = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") >= F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 minutes")),
        )
        .count()
    )
    assert got == want and got > 0


def test_streaming_rollup_maintenance(spark, sf_dir, tmp_path):
    """Continuous-aggregate maintenance: each micro-batch's partial
    day-level rollup is merge-upserted into a parquet rollup table
    keyed on (window_start, event_type). After the run, the maintained
    table must equal the batch rollup of the full feed — the streaming
    analog of operators/timeseries.cascading_rollup."""
    from cancer_survival_etl_spark.operators.timeseries import cascading_rollup
    from cancer_survival_etl_spark.sources.catalog import load_table
    from cancer_survival_etl_spark.sources.sinks import merge_upsert
    from cancer_survival_etl_spark.streaming.sinks import foreach_batch_sink
    from cancer_survival_etl_spark.streaming.windows import (
        stream_from_events_dir,
    )

    path = str(tmp_path / "rollup_table")

    def maintain(batch_df, epoch_id):
        partial = cascading_rollup(batch_df, levels=("1 day",))[0]
        # re-aggregate against what's already in the table: merge by
        # summing decomposable partials, expressed as union + groupBy
        # inside the upsert's version semantics (epoch as version).
        try:
            existing = batch_df.sparkSession.read.parquet(path)
            merged = (
                existing.drop("_version")
                .unionByName(partial)
                .groupBy("window_start", "event_type")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_cents").alias("sum_cents"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                )
            )
        except Exception:
            merged = partial
        merge_upsert(
            batch_df.sparkSession,
            merged.withColumn("_version", F.lit(epoch_id).cast("long")),
            path,
            key_cols=["window_start", "event_type"],
            version_col="_version",
        )

    src = stream_from_events_dir(spark, sf_dir)
    q = foreach_batch_sink(
        src, maintain, str(tmp_path / "ckpt"), output_mode="append"
    ).trigger(availableNow=True).start()
    q.awaitTermination(180)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_cents"])
        for r in spark.read.parquet(path).collect()
    }
    full = cascading_rollup(
        load_table(spark, sf_dir, "events"), levels=("1 day",)
    )[0]
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_cents"])
        for r in full.collect()
    }
    assert got == want and len(got) > 0


def test_custom_datasource_streams_deterministically(spark, tmp_path):
    """The registered Python DataSource also serves readStream: an
    availableNow run drains whole micro-batches with contiguous,
    duplicate-free event ids."""
    from cancer_survival_etl_spark.sources.custom_datasource import (
        SyntheticEventsDataSource,
    )

    spark.dataSource.register(SyntheticEventsDataSource)
    src = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 50)
        .load()
    )
    q = (
        src.writeStream.format("memory")
        .queryName("custom_stream_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS d, "
        "min(event_id) AS lo, max(event_id) AS hi FROM custom_stream_test"
    ).collect()[0]
    assert got["n"] > 0 and got["n"] == got["d"]          # no duplicates
    assert (got["lo"], got["hi"]) == (0, got["n"] - 1)    # contiguous


def test_streaming_restart_resumes_from_checkpoint(spark, tmp_path):
    """Exactly-once across restarts: run an availableNow pass, stop,
    add more input files (overlapping half the old ids), restart with
    the SAME checkpoint — the file source must skip already-processed
    files and the dedup state store must suppress cross-restart
    duplicates, so the sink ends with exactly the distinct ids."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()

    def add_input(lo, hi):
        spark.range(lo, hi).select(
            F.col("id").alias("event_id"), F.lit(1.0).alias("value")
        ).coalesce(1).write.mode("append").parquet(str(src))

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .parquet(str(src))
            .dropDuplicates(["event_id"])
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    add_input(0, 1000)
    run_once()
    assert spark.read.parquet(str(out)).count() == 1000

    add_input(500, 1500)  # 500 duplicates + 500 genuinely new
    run_once()
    got = spark.read.parquet(str(out))
    assert got.count() == 1500  # dups suppressed by restored state
    assert got.select("event_id").distinct().count() == 1500


def test_transform_with_state_ema_spikes(spark, sf_dir, tmp_path):
    """Spark 4 transformWithStateInPandas over a real micro-batch run:
    the final per-user emission (EMA, spike count) must equal the
    batch fold of the full history in (ts, event_id) order —
    batching-independence is the contract the processor documents."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf",
    )
    from cancer_survival_etl_spark.streaming.tws import (
        running_ema_batch,
        running_ema_spikes,
    )
    from cancer_survival_etl_spark.streaming.windows import (
        stream_from_events_dir,
    )

    # transformWithState requires the RocksDB state store provider
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = stream_from_events_dir(spark, sf_dir)
        q = (
            running_ema_spikes(src, alpha=0.2, spike_ratio=2.0)
            .writeStream.format("memory")
            .queryName("tws_ema_test")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    out = spark.sql(
        """SELECT user_id, max_by(n_events, n_events) AS n_events,
                  max_by(ema, n_events) AS ema,
                  max_by(last_value, n_events) AS last_value,
                  max_by(n_spikes, n_events) AS n_spikes
           FROM tws_ema_test GROUP BY user_id"""
    ).toPandas()
    assert len(out) > 0
    batch_events = load_table(spark, sf_dir, "events")
    expect = running_ema_batch(batch_events, alpha=0.2, spike_ratio=2.0)
    got = {
        int(r.user_id): (int(r.n_events), r.ema, r.last_value, int(r.n_spikes))
        for r in out.itertuples()
    }
    want = {
        int(r.user_id): (int(r.n_events), r.ema, r.last_value, int(r.n_spikes))
        for r in expect.itertuples()
    }
    assert set(got) == set(want)
    for uid in want:
        gn, ge, gl, gs = got[uid]
        wn, we, wl, ws = want[uid]
        assert (gn, gs) == (wn, ws), uid
        assert abs(ge - we) < 1e-9 and abs(gl - wl) < 1e-9, uid


def test_ema_processor_logic_matches_batch_reference(spark, sf_dir):
    """Pin EmaSpikeProcessor's fold directly (fake state handle, no
    streaming runtime — the sandbox lacks protobuf for the state-server
    protocol): feeding the per-user history in two arbitrary slices
    must reproduce the batch reference exactly, including the
    cumulative spike count — the batching-independence contract."""
    import pandas as pd

    from cancer_survival_etl_spark.streaming.tws import (
        EmaSpikeProcessor,
        running_ema_batch,
    )

    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    events = load_table(spark, sf_dir, "events")
    expect = running_ema_batch(events, alpha=0.2, spike_ratio=2.0)
    pdf = (
        events.select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for uid, grp in list(pdf.groupby("user_id"))[:10]:
        proc = EmaSpikeProcessor(alpha=0.2, spike_ratio=2.0)
        proc._state = FakeState()
        cut = max(1, len(grp) // 3)
        out = None
        # shuffle each slice's row order: the processor must re-sort
        for chunk in (grp.iloc[:cut], grp.iloc[cut:]):
            if len(chunk) == 0:
                continue
            shuffled = chunk.sample(frac=1.0, random_state=42)
            out = list(
                proc.handleInputRows((uid,), iter([shuffled]), None)
            )[-1]
        want = expect[expect.user_id == uid].iloc[0]
        assert int(out["n_events"].iloc[0]) == int(want.n_events)
        assert abs(float(out["ema"].iloc[0]) - want.ema) < 1e-12
        assert int(out["n_spikes"].iloc[0]) == int(want.n_spikes)
        assert abs(float(out["last_value"].iloc[0]) - want.last_value) < 1e-12


def test_space_saving_processor_matches_batch_reference(spark, sf_dir):
    """Pin SpaceSavingProcessor's fold (fake state handle): feeding a
    type's history in consecutive slices — each slice's rows shuffled —
    must reproduce the batch single-pass summary exactly."""
    from cancer_survival_etl_spark.streaming.tws import (
        SpaceSavingProcessor,
        space_saving_batch,
    )

    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    events = load_table(spark, sf_dir, "events")
    expect = space_saving_batch(events, capacity=8)
    pdf = (
        events.select("event_type", "ts", "event_id", "user_id")
        .toPandas()
        .sort_values(["event_type", "ts", "event_id"])
    )
    for et, grp in list(pdf.groupby("event_type")):
        proc = SpaceSavingProcessor(capacity=8)
        proc._state = FakeState()
        cut = max(1, len(grp) // 3)
        out = None
        for chunk in (grp.iloc[:cut], grp.iloc[cut:]):
            if len(chunk) == 0:
                continue
            shuffled = chunk.sample(frac=1.0, random_state=7)
            out = list(
                proc.handleInputRows((et,), iter([shuffled]), None)
            )[-1]
        want = expect[expect.event_type == et].reset_index(drop=True)
        got = out.reset_index(drop=True)
        assert list(got["item"]) == list(want["item"]), et
        assert list(got["count_est"]) == list(want["count_est"]), et
        assert list(got["err_bound"]) == list(want["err_bound"]), et
        assert (got["n_total"] == want["n_total"]).all(), et


def test_space_saving_guarantees_vs_exact_counts(spark, sf_dir):
    """The sketch's published guarantees against the exact per-type
    user counts: est ≥ true ≥ est − err for every tracked item, and
    every item with true count > n_total/capacity is tracked."""
    from cancer_survival_etl_spark.streaming.tws import space_saving_batch

    events = load_table(spark, sf_dir, "events")
    cap = 8
    summary = space_saving_batch(events, capacity=cap)
    exact = (
        events.groupBy("event_type", "user_id")
        .count()
        .toPandas()
        .set_index(["event_type", "user_id"])["count"]
    )
    for r in summary.itertuples():
        true = int(exact.get((r.event_type, r.item), 0))
        assert r.count_est >= true >= r.count_est - r.err_bound, r
    for (et, uid), true in exact.items():
        n_total = int(
            summary[summary.event_type == et]["n_total"].iloc[0]
        )
        if true > n_total / cap:
            assert (
                (summary.event_type == et) & (summary.item == uid)
            ).any(), (et, uid, true)


def test_transform_with_state_space_saving(spark, sf_dir, tmp_path):
    """End-to-end transformWithStateInPandas run of the Space-Saving
    processor: the last emission per event type equals the batch fold
    of the full ordered history (protobuf-gated like the EMA test)."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf",
    )
    from cancer_survival_etl_spark.streaming.tws import (
        running_heavy_hitters,
        space_saving_batch,
    )
    from cancer_survival_etl_spark.streaming.windows import (
        stream_from_events_dir,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = stream_from_events_dir(spark, sf_dir)
        q = (
            running_heavy_hitters(src, capacity=8)
            .writeStream.format("memory")
            .queryName("tws_ss_test")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    out = spark.sql(
        """SELECT event_type, item,
                  max_by(count_est, n_total) AS count_est,
                  max_by(err_bound, n_total) AS err_bound,
                  max(n_total) AS n_total
           FROM tws_ss_test GROUP BY event_type, item"""
    ).toPandas()
    events = load_table(spark, sf_dir, "events")
    expect = space_saving_batch(events, capacity=8)
    # compare final summaries per type: the last emission holds the
    # full summary, so restrict to rows present at the final n_total
    for et, want in expect.groupby("event_type"):
        got = out[out.event_type == et]
        final_n = int(want["n_total"].iloc[0])
        got = got[got.n_total == final_n]
        gmap = {int(r.item): (int(r.count_est), int(r.err_bound))
                for r in got.itertuples()}
        wmap = {int(r.item): (int(r.count_est), int(r.err_bound))
                for r in want.itertuples()}
        assert gmap == wmap, et


def test_count_min_processor_matches_batch_and_guarantees(spark, sf_dir):
    """CountMinProcessor fold (fake state, arbitrary slicing/order —
    the sketch is fully order-independent) equals the batch-built
    sketch, and the classical guarantees hold vs exact counts:
    est ≥ true and est ≤ true + ceil(e/width · n)."""
    import math

    from cancer_survival_etl_spark.streaming.tws import (
        CountMinProcessor,
        count_min_batch,
    )

    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    events = load_table(spark, sf_dir, "events")
    expect = count_min_batch(events, depth=4, width=64)
    pdf = events.select("event_type", "ts", "event_id", "user_id").toPandas()
    exact = (
        events.groupBy("event_type", "user_id")
        .count()
        .toPandas()
        .set_index(["event_type", "user_id"])["count"]
    )
    for et, grp in pdf.groupby("event_type"):
        proc = CountMinProcessor(depth=4, width=64)
        proc._state = FakeState()
        cut = len(grp) // 2
        out = {}
        for chunk in (grp.iloc[:cut], grp.iloc[cut:]):
            if len(chunk) == 0:
                continue
            shuffled = chunk.sample(frac=1.0, random_state=3)
            res = list(
                proc.handleInputRows((et,), iter([shuffled]), None)
            )[-1]
            for r in res.itertuples():
                out[int(r.item)] = (int(r.count_est), int(r.n_total))
        want = expect[expect.event_type == et]
        n_total = int(want["n_total"].iloc[0])
        eps_bound = math.ceil(math.e / 64 * n_total)
        for r in want.itertuples():
            est, _ = out[int(r.item)]
            assert est == int(r.count_est), (et, r.item)
            true = int(exact.loc[(et, r.item)])
            assert est >= true, (et, r.item)
            assert est <= true + eps_bound, (et, r.item, est, true)


def test_transform_with_state_count_min(spark, sf_dir, tmp_path):
    """End-to-end transformWithStateInPandas run of the count-min
    processor (protobuf-gated): the latest emission per (type, item)
    equals the batch-built sketch estimate."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf",
    )
    from cancer_survival_etl_spark.streaming.tws import (
        count_min_batch,
        running_count_min,
    )
    from cancer_survival_etl_spark.streaming.windows import (
        stream_from_events_dir,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = stream_from_events_dir(spark, sf_dir)
        q = (
            running_count_min(src, depth=4, width=64)
            .writeStream.format("memory")
            .queryName("tws_cm_test")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_cm"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    out = spark.sql(
        """SELECT event_type, item,
                  max_by(count_est, n_total) AS count_est
           FROM tws_cm_test GROUP BY event_type, item"""
    ).toPandas()
    events = load_table(spark, sf_dir, "events")
    expect = count_min_batch(events, depth=4, width=64)
    got = {(r.event_type, int(r.item)): int(r.count_est)
           for r in out.itertuples()}
    want = {(r.event_type, int(r.item)): int(r.count_est)
            for r in expect.itertuples()}
    assert got == want


def test_tumbling_distinct_users_stream_equals_batch(spark, sf_dir, tmp_path):
    """Windowed HLL distinct: one availableNow streaming pass over the
    real events parquet equals the batch plan exactly (sketch register
    maxima are order-independent), and estimates sit within 5% of
    exact windowed COUNT(DISTINCT)."""
    from cancer_survival_etl_spark.streaming.windows import (
        stream_from_events_dir,
        tumbling_distinct_users,
    )

    src = stream_from_events_dir(spark, sf_dir)
    q = (
        tumbling_distinct_users(src, "1 day")
        .writeStream.format("memory")
        .queryName("tumb_hll_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (
            r["distinct_users_est"], r["n_events"]
        )
        for r in spark.sql("SELECT * FROM tumb_hll_test").collect()
    }
    batch = load_table(spark, sf_dir, "events")
    expect = {
        (r["window_start"], r["event_type"]): (
            r["distinct_users_est"], r["n_events"]
        )
        for r in tumbling_distinct_users(batch, "1 day").collect()
    }
    assert got == expect and len(got) > 0
    exact = {
        (r["ws"], r["event_type"]): r["x"]
        for r in batch.groupBy(
            F.window("ts", "1 day").alias("w"), "event_type"
        )
        .agg(F.countDistinct("user_id").alias("x"))
        .select(F.col("w.start").alias("ws"), "event_type", "x")
        .collect()
    }
    for k, (est, _) in got.items():
        assert abs(est - exact[k]) <= max(1, 0.05 * exact[k]), k


def test_streaming_near_dup_probe_ingest_loop(spark, tmp_path):
    """Two micro-batches through the LSH+PQ ingest loop: batch 1's
    near-copy of a seed vector is caught against the seed index; batch
    2's near-copy of a BATCH-1 vector is caught because batch 1's
    entries were appended — the stream sees its own past."""
    import random

    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.llm.similarity import build_lsh_pq_index
    from cancer_survival_etl_spark.streaming.dedup import (
        streaming_near_dup_probe,
    )

    random.seed(33)
    dim, m, sub_dim = 16, 4, 4

    def vec():
        return [round(random.uniform(-1, 1), 3) for _ in range(dim)]

    seed = [(i, vec()) for i in range(20)]
    corpus = spark.createDataFrame(
        seed, "vec_id long, embedding array<double>"
    )
    index_path = str(tmp_path / "idx")
    build_lsh_pq_index(corpus, index_path, m=m, sub_dim=sub_dim, n_codes=8)

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # 101 sits near a codebook centroid (seed[2] is in the n_codes=8
    # deterministic-init training prefix) so its stored codes
    # reconstruct it tightly — the batch-2 ADC must clear the
    # threshold on quantized distance, not luck
    b1 = [(100, [v + 0.001 for v in seed[5][1]]),
          (101, [v + 0.002 for v in seed[2][1]])]
    spark.createDataFrame(
        b1, "vec_id long, embedding array<double>"
    ).write.parquet(str(in_dir / "b1"))

    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).option("maxFilesPerTrigger", 1).parquet(str(in_dir / "*"))
    q = streaming_near_dup_probe(
        stream,
        index_path,
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
        threshold=0.5,
        m=m,
        sub_dim=sub_dim,
    ).trigger(availableNow=True).start()
    q.awaitTermination(180)

    got1 = {
        (r.new_id, r.corpus_id)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    assert (100, 5) in got1, got1

    # batch 2 duplicates a batch-1 vector (101) — only catchable if the
    # loop appended batch 1's entries
    b2 = [(200, [v - 0.001 for v in b1[1][1]])]
    spark.createDataFrame(
        b2, "vec_id long, embedding array<double>"
    ).write.parquet(str(in_dir / "b2"))
    q = streaming_near_dup_probe(
        stream,
        index_path,
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
        threshold=0.5,
        m=m,
        sub_dim=sub_dim,
    ).trigger(availableNow=True).start()
    q.awaitTermination(180)
    got2 = {
        (r.new_id, r.corpus_id)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    assert (200, 101) in got2, got2


def test_streaming_near_dup_probe_replay_idempotent(spark, tmp_path):
    """Replay contract (ADVICE r3): a micro-batch re-run AFTER its
    index append landed (failure between append and checkpoint commit)
    must write the SAME pair set — the probe anti-joins the batch's
    own ids, so self-hits against its replayed entries never appear."""
    import random

    from cancer_survival_etl_spark.llm.similarity import build_lsh_pq_index
    from cancer_survival_etl_spark.streaming.dedup import (
        streaming_near_dup_probe,
    )

    random.seed(44)
    dim, m, sub_dim = 16, 4, 4

    def vec():
        return [round(random.uniform(-1, 1), 3) for _ in range(dim)]

    seed = [(i, vec()) for i in range(20)]
    corpus = spark.createDataFrame(
        seed, "vec_id long, embedding array<double>"
    )
    index_path = str(tmp_path / "idx")
    build_lsh_pq_index(corpus, index_path, m=m, sub_dim=sub_dim, n_codes=8)

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # the batch contains an internal near-pair (100 ≈ 101): on a
    # replayed attempt the index already holds both, and without the
    # anti-join the probe would emit (100, 101)/(101, 100) self-hits
    base = [v + 0.001 for v in seed[2][1]]
    b1 = [(100, base), (101, [v + 0.001 for v in base])]
    spark.createDataFrame(
        b1, "vec_id long, embedding array<double>"
    ).write.parquet(str(in_dir / "b1"))

    def run(ckpt):
        stream = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(str(in_dir / "*"))
        q = streaming_near_dup_probe(
            stream,
            index_path,
            str(tmp_path / "pairs"),
            ckpt,
            threshold=0.5,
            m=m,
            sub_dim=sub_dim,
        ).trigger(availableNow=True).start()
        q.awaitTermination(180)
        return {
            (r.new_id, r.corpus_id)
            for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
        }

    first = run(str(tmp_path / "ckpt1"))
    # simulate the replay: a FRESH checkpoint reprocesses the same
    # files as epoch 0 while the index already holds batch entries
    replay = run(str(tmp_path / "ckpt2"))
    assert first == replay, (first, replay)
    assert all(c < 100 for _, c in replay), replay


def test_gk_quantile_processor_matches_batch_and_guarantee(spark, sf_dir):
    """GkQuantileProcessor fold (fake state, batch-sliced) equals the
    batch-built summary, state stays logarithmic, and every reported
    quantile is within rank εn of exact."""
    import math

    from cancer_survival_etl_spark.streaming.tws import (
        GkQuantileProcessor,
        gk_quantile_batch,
    )

    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    eps = 0.01
    events = load_table(spark, sf_dir, "events")
    expect = gk_quantile_batch(events, eps=eps).set_index("event_type")
    pdf = (
        events.select("event_type", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["event_type", "ts", "event_id"])
    )
    for et, grp in pdf.groupby("event_type"):
        proc = GkQuantileProcessor(eps=eps)
        proc._state = FakeState()
        cut = len(grp) // 3
        last = None
        for chunk in (grp.iloc[:cut], grp.iloc[cut:2 * cut],
                      grp.iloc[2 * cut:]):
            if len(chunk) == 0:
                continue
            last = list(
                proc.handleInputRows((et,), iter([chunk]), None)
            )[-1].iloc[0]
        want = expect.loc[et]
        assert int(last["n_total"]) == int(want["n_total"])
        assert float(last["p50"]) == float(want["p50"])
        assert float(last["p95"]) == float(want["p95"])
        assert float(last["p99"]) == float(want["p99"])
        # state bound ~ (1/2ε)·log₂(2εn): logarithmic in stream length
        # (at small n the summary necessarily holds a big fraction)
        n = int(last["n_total"])
        bound = (1 / (2 * eps)) * (math.log2(max(2.0, 2 * eps * n)) + 1)
        assert int(last["n_tuples"]) <= bound, (n, int(last["n_tuples"]))
        # guarantee: reported quantile within rank eps*n of exact
        exact_sorted = sorted(grp["value"])
        for phi in (0.5, 0.95, 0.99):
            v = float(last[f"p{int(phi * 100)}"])
            rank = sum(1 for x in exact_sorted if x <= v)
            target = max(1, math.ceil(phi * n))
            assert abs(rank - target) <= eps * n + 1, (et, phi)


def test_transform_with_state_gk_quantiles(spark, sf_dir, tmp_path):
    """End-to-end transformWithStateInPandas run of the GK quantile
    processor (protobuf-gated): final per-type emission carries the
    full count and every quantile satisfies the ε-rank guarantee vs
    exact — which holds for ANY arrival order, so the pin does not
    depend on the stream's delivery order."""
    import math

    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf",
    )
    from cancer_survival_etl_spark.streaming.tws import (
        running_gk_quantiles,
    )
    from cancer_survival_etl_spark.streaming.windows import (
        stream_from_events_dir,
    )

    eps = 0.02
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = stream_from_events_dir(spark, sf_dir)
        q = (
            running_gk_quantiles(src, eps=eps)
            .writeStream.format("memory")
            .queryName("tws_gk_test")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_gk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    out = spark.sql(
        """SELECT event_type, max_by(p50, n_total) AS p50,
                  max_by(p95, n_total) AS p95,
                  max_by(p99, n_total) AS p99,
                  max(n_total) AS n_total
           FROM tws_gk_test GROUP BY event_type"""
    ).toPandas()
    events = load_table(spark, sf_dir, "events").toPandas()
    for r in out.itertuples():
        vals = sorted(
            events[events.event_type == r.event_type]["value"]
        )
        n = len(vals)
        assert int(r.n_total) == n
        for phi, v in ((0.5, r.p50), (0.95, r.p95), (0.99, r.p99)):
            rank = sum(1 for x in vals if x <= v)
            target = max(1, math.ceil(phi * n))
            assert abs(rank - target) <= eps * n + 1, (r.event_type, phi)


def test_kll_quantile_processor_matches_batch_and_bounds(spark, sf_dir):
    """KllQuantileProcessor fold (fake state, batch-sliced) equals
    the batch-built ladder END STATE exactly (deterministic
    alternating-parity compaction), total ladder weight always equals
    n, state stays O(k·log(n/k)), every reported quantile is within
    the deterministic-KLL rank tolerance of exact, and the streaming
    estimates agree with the BATCH INCREMENTAL PATH (JVM datasketches
    KLL via agg_state_sketched/state_quantile) within the two
    sketches' combined rank error — the batch/streaming symmetry pin
    (VERDICT r06 item 8)."""
    import math

    from cancer_survival_etl_spark.operators.incremental import (
        agg_state_sketched,
        state_quantile,
    )
    from cancer_survival_etl_spark.streaming.tws import (
        KllQuantileProcessor,
        kll_quantile_batch,
    )

    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    k = 200
    events = load_table(spark, sf_dir, "events")
    expect = kll_quantile_batch(events, k=k).set_index("event_type")
    pdf = (
        events.select("event_type", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["event_type", "ts", "event_id"])
    )
    # JVM incremental path: value cast to bigint (the sketched state
    # is over longs); quantiles land within its own ~1.7% rank error
    jvm_state = agg_state_sketched(
        events.select(
            "event_type", F.col("value").cast("bigint").alias("v")
        ),
        ["event_type"],
        "v",
        k=k,
    )
    jvm_q = {
        r.event_type: (r.q50, r.q95)
        for r in state_quantile(
            state_quantile(jvm_state, 0.5, "q50"), 0.95, "q95"
        ).collect()
    }
    for et, grp in pdf.groupby("event_type"):
        proc = KllQuantileProcessor(k=k)
        proc._state = FakeState()
        cut = len(grp) // 3
        last = None
        for chunk in (grp.iloc[:cut], grp.iloc[cut:2 * cut],
                      grp.iloc[2 * cut:]):
            if len(chunk) == 0:
                continue
            last = list(
                proc.handleInputRows((et,), iter([chunk]), None)
            )[-1].iloc[0]
        want = expect.loc[et]
        # end-state pin: sliced streaming fold == one-shot batch fold
        assert int(last["n_total"]) == int(want["n_total"])
        assert int(last["n_items"]) == int(want["n_items"])
        for c in ("p50", "p95", "p99"):
            assert float(last[c]) == float(want[c]), (et, c)
        n = int(last["n_total"])
        # ladder footprint: O(k log(n/k)) items
        bound = k * (math.log2(max(2.0, n / k)) + 2)
        assert int(last["n_items"]) <= bound, (n, int(last["n_items"]))
        exact_sorted = sorted(grp["value"])
        tol = max(2.0, 0.05 * n)
        for phi in (0.5, 0.95, 0.99):
            v = float(last[f"p{int(phi * 100)}"])
            rank = sum(1 for x in exact_sorted if x <= v)
            target = max(1, math.ceil(phi * n))
            assert abs(rank - target) <= tol, (et, phi, rank, target)
        # symmetry pin vs the JVM incremental path (long-cast values):
        # both estimates must sit within the combined rank tolerance
        exact_long = sorted(int(x) for x in grp["value"])
        for phi, jv in ((0.5, jvm_q[et][0]), (0.95, jvm_q[et][1])):
            v = float(last[f"p{int(phi * 100)}"])
            r_py = sum(1 for x in exact_long if x <= v)
            r_jvm = sum(1 for x in exact_long if x <= jv)
            assert abs(r_py - r_jvm) <= 2 * tol, (et, phi, r_py, r_jvm)


def test_kll_fold_total_weight_invariant():
    """Total ladder weight Σ len(level)·2^lv equals n exactly for
    n >> k — the invariant the round-7 aliasing bug violated (fold
    appended to a stale alias of levels[0] after compaction rebound
    it, silently dropping every post-compaction insert; ADVICE r07).
    Also pins that query() raises loudly on a weight-deficient
    ladder instead of returning the ladder max."""
    import math

    import pytest

    from cancer_survival_etl_spark.streaming.tws import (
        KllQuantileProcessor,
    )

    n, k = 5000, 50
    vals = [float((i * 2654435761) % 100003) for i in range(n)]
    levels: list = []
    parity: list = []
    KllQuantileProcessor.fold(levels, parity, vals, k)
    weight = sum(len(items) * (1 << lv) for lv, items in enumerate(levels))
    assert weight == n, (weight, n)
    # rank accuracy actually holds at n >> k (the aliasing bug made
    # p50/p95/p99 reflect only a ~k-sized prefix of the stream)
    exact = sorted(vals)
    for phi in (0.5, 0.95, 0.99):
        v = KllQuantileProcessor.query(levels, phi, n)
        rank = sum(1 for x in exact if x <= v)
        assert abs(rank - math.ceil(phi * n)) <= 0.05 * n, (phi, rank)
    # incremental fold (one value at a time) reaches the same weight
    levels2: list = []
    parity2: list = []
    for v in vals:
        KllQuantileProcessor.fold(levels2, parity2, [v], k)
    w2 = sum(len(items) * (1 << lv) for lv, items in enumerate(levels2))
    assert w2 == n, (w2, n)
    # deficient ladder → named failure, not a silent max
    with pytest.raises(AssertionError, match="weight deficit"):
        KllQuantileProcessor.query([[1.0]], 0.99, 50)


def test_transform_with_state_kll_quantiles(spark, sf_dir, tmp_path):
    """End-to-end transformWithStateInPandas run of the KLL quantile
    processor (protobuf-gated): final per-type emission carries the
    full count and every quantile satisfies the deterministic-KLL
    rank tolerance vs exact — order-independent, so the pin does not
    depend on stream delivery order."""
    import math

    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf",
    )
    from cancer_survival_etl_spark.streaming.tws import (
        running_kll_quantiles,
    )
    from cancer_survival_etl_spark.streaming.windows import (
        stream_from_events_dir,
    )

    k = 200
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = stream_from_events_dir(spark, sf_dir)
        q = (
            running_kll_quantiles(src, k=k)
            .writeStream.format("memory")
            .queryName("tws_kll_test")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_kll"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    out = spark.sql(
        """SELECT event_type, max_by(p50, n_total) AS p50,
                  max_by(p95, n_total) AS p95,
                  max_by(p99, n_total) AS p99,
                  max(n_total) AS n_total
           FROM tws_kll_test GROUP BY event_type"""
    ).toPandas()
    events = load_table(spark, sf_dir, "events").toPandas()
    for r in out.itertuples():
        vals = sorted(
            events[events.event_type == r.event_type]["value"]
        )
        n = len(vals)
        assert int(r.n_total) == n
        tol = max(2.0, 0.05 * n)
        for phi, v in ((0.5, r.p50), (0.95, r.p95), (0.99, r.p99)):
            rank = sum(1 for x in vals if x <= v)
            target = max(1, math.ceil(phi * n))
            assert abs(rank - target) <= tol, (r.event_type, phi)


def test_cusum_processor_logic_matches_batch_and_detects_shift(spark):
    """CusumProcessor: slicing-independence is EXACT (integer state —
    fold in slices of 1, 7, and all-at-once equals the batch fold
    bit-for-bit); a planted mean shift fires the positive side only,
    a stable series fires nothing, and Page's restart zeroes the
    statistic after each alarm."""
    from cancer_survival_etl_spark.streaming.tws import (
        CusumProcessor,
        cusum_batch,
    )

    # planted series: user 1 stable around 10.00, user 2 shifts +4
    # halfway, user 3 shifts down
    rows = []
    for i in range(200):
        ts = i
        rows.append((1, ts, i, 10.0 + ((i * 7) % 5 - 2) * 0.01))
        shift = 4.0 if i >= 100 else 0.0
        rows.append((2, ts, i, 10.0 + shift + ((i * 11) % 5 - 2) * 0.01))
        rows.append((3, ts, i, 10.0 - (3.0 if i >= 100 else 0.0)))
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, value double"
    )
    ref = 1000  # 10.00 in cents
    b = cusum_batch(df, ref_cents=ref, k_slack_cents=50,
                    h_cents=2000).set_index("user_id")
    assert b.loc[1, "n_alarm_pos"] == 0 and b.loc[1, "n_alarm_neg"] == 0
    assert b.loc[2, "n_alarm_pos"] > 0 and b.loc[2, "n_alarm_neg"] == 0
    assert b.loc[3, "n_alarm_neg"] > 0 and b.loc[3, "n_alarm_pos"] == 0

    proc = CusumProcessor(ref_cents=ref, k_slack_cents=50,
                          h_cents=2000)
    pdf = df.toPandas().sort_values(["user_id", "ts", "event_id"])
    for uid, grp in pdf.groupby("user_id"):
        vals = list(grp["value"])
        whole = proc.fold((0, 0, 0, 0, 0), vals)
        st1 = (0, 0, 0, 0, 0)
        for v in vals:
            st1 = proc.fold(st1, [v])
        st7 = (0, 0, 0, 0, 0)
        for j in range(0, len(vals), 7):
            st7 = proc.fold(st7, vals[j:j + 7])
        assert whole == st1 == st7
        brow = b.loc[uid]
        assert whole == (
            brow.n_events, brow.cusum_pos, brow.cusum_neg,
            brow.n_alarm_pos, brow.n_alarm_neg,
        )

    # restart convention: one huge point alarms once and resets to 0
    st = proc.fold((0, 0, 0, 0, 0), [99.0])
    assert st == (1, 0, 0, 1, 0)


def test_transform_with_state_cusum(spark, sf_dir, tmp_path):
    """running_cusum end-to-end over a real micro-batch run: the
    final per-user emission equals cusum_batch of the full history
    EXACTLY (integer state, so even the chart values pin
    bit-for-bit)."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf",
    )
    from cancer_survival_etl_spark.streaming.tws import (
        cusum_batch,
        running_cusum,
    )
    from cancer_survival_etl_spark.streaming.windows import (
        stream_from_events_dir,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = stream_from_events_dir(spark, sf_dir)
        q = (
            running_cusum(src, ref_cents=5000, k_slack_cents=100,
                          h_cents=3000)
            .writeStream.format("memory")
            .queryName("tws_cusum_test")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_cusum"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
    out = spark.sql(
        """SELECT user_id,
                  max_by(n_events, n_events) AS n_events,
                  max_by(cusum_pos, n_events) AS cusum_pos,
                  max_by(cusum_neg, n_events) AS cusum_neg,
                  max_by(n_alarm_pos, n_events) AS n_alarm_pos,
                  max_by(n_alarm_neg, n_events) AS n_alarm_neg
           FROM tws_cusum_test GROUP BY user_id"""
    ).toPandas()
    assert len(out) > 0
    expect = cusum_batch(
        load_table(spark, sf_dir, "events"), ref_cents=5000,
        k_slack_cents=100, h_cents=3000,
    )
    got = {
        int(r.user_id): (
            int(r.n_events), int(r.cusum_pos), int(r.cusum_neg),
            int(r.n_alarm_pos), int(r.n_alarm_neg),
        )
        for r in out.itertuples()
    }
    want = {
        int(r.user_id): (
            int(r.n_events), int(r.cusum_pos), int(r.cusum_neg),
            int(r.n_alarm_pos), int(r.n_alarm_neg),
        )
        for r in expect.itertuples()
    }
    assert got == want


def test_bottom_k_sample_processor_order_free_and_uniform(spark, sf_dir):
    """BottomKSampleProcessor: the retained sample is EXACTLY
    order/slicing-independent (priorities are pure functions of the
    ids) and equals the batch bottom-k of the full history; each
    emitted sample is a uniform draw in the sense that its ids'
    md5-rank matches the global bottom-k; duplicate ids are kept
    once."""
    from cancer_survival_etl_spark.streaming.tws import (
        BottomKSampleProcessor,
        bottom_k_sample_batch,
    )

    events = load_table(spark, sf_dir, "events")
    expect = bottom_k_sample_batch(events, k=16).set_index(
        "event_type"
    )
    pdf = events.select("event_type", "event_id").toPandas()
    proc = BottomKSampleProcessor(k=16)
    for et, grp in pdf.groupby("event_type"):
        ids = [int(i) for i in grp["event_id"]]
        whole = proc.fold((0, [], []), ids)
        rev = proc.fold((0, [], []), list(reversed(ids)))
        sliced = (0, [], [])
        for j in range(0, len(ids), 97):
            sliced = proc.fold(sliced, ids[j:j + 97])
        assert whole[2] == rev[2] == sliced[2]
        assert whole[0] == len(ids)
        assert whole[2] == list(expect.loc[et, "sample_ids"])
    # duplicates kept once
    st = proc.fold((0, [], []), [5, 5, 5, 7])
    assert sorted(st[2]) == [5, 7] and st[0] == 4


def test_km_processor_order_free_and_pins_km_curve(spark, sf_dir):
    """KmCurveProcessor: the counter state makes slicing AND arrival
    order independence EXACT (whole == reversed == sliced-by-97,
    bit-for-bit); the end-state curve pins CELL-FOR-CELL against the
    distributed operators.survival.km_curve — counts exactly,
    survival to float exp parity (same micro HALF_UP lattice)."""
    import pytest

    from cancer_survival_etl_spark.operators.survival import km_curve
    from cancer_survival_etl_spark.streaming.tws import (
        KmCurveProcessor,
        km_stream_batch,
    )

    events = load_table(spark, sf_dir, "events")
    subjects = events.select(
        "event_type",
        (F.col("event_id") % 20 + 1).cast("long").alias("duration"),
        (F.col("value") > 50).cast("int").alias("event"),
    )
    proc = KmCurveProcessor()
    pdf = subjects.toPandas()
    for et, grp in pdf.groupby("event_type"):
        durs = [int(t) for t in grp["duration"]]
        evs = [int(e) for e in grp["event"]]
        whole = proc.fold(([], [], []), durs, evs)
        rev = proc.fold(
            ([], [], []), list(reversed(durs)), list(reversed(evs))
        )
        sliced = ([], [], [])
        for j in range(0, len(durs), 97):
            sliced = proc.fold(
                sliced, durs[j:j + 97], evs[j:j + 97]
            )
        assert whole == rev == sliced

    # end state == the distributed km_curve, cell-for-cell
    got = km_stream_batch(subjects).set_index(["group_key", "duration"])
    want = (
        km_curve(subjects, ["event_type"])
        .select(
            F.col("event_type").alias("group_key"), "duration",
            "n_risk", "n_event", "n_censored", "survival",
        )
        .toPandas()
        .set_index(["group_key", "duration"])
    )
    assert len(got) == len(want) and len(got) > 0
    for idx, w in want.iterrows():
        g = got.loc[idx]
        assert (
            int(g.n_risk), int(g.n_event), int(g.n_censored)
        ) == (int(w.n_risk), int(w.n_event), int(w.n_censored)), idx
        assert g.survival == pytest.approx(w.survival, abs=1e-12), idx
    # survival is a proper non-increasing product-limit curve
    for gkey, grp in got.reset_index().groupby("group_key"):
        s = list(grp.sort_values("duration")["survival"])
        assert all(a >= b - 1e-15 for a, b in zip(s, s[1:]))


def test_transform_with_state_km_curve(spark, sf_dir, tmp_path):
    """running_km_curve end-to-end over a real micro-batch run: the
    final per-(group, duration) emission (selected by max_by on the
    monotone n_total) equals km_stream_batch of the full history."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf",
    )
    from cancer_survival_etl_spark.streaming.tws import (
        km_stream_batch,
        running_km_curve,
    )
    from cancer_survival_etl_spark.streaming.windows import (
        stream_from_events_dir,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    def to_subjects(df):
        return df.select(
            "event_type",
            (F.col("event_id") % 20 + 1).cast("long").alias("duration"),
            (F.col("value") > 50).cast("int").alias("event"),
        )

    try:
        src = stream_from_events_dir(spark, sf_dir)
        q = (
            running_km_curve(to_subjects(src))
            .writeStream.format("memory")
            .queryName("tws_km_test")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_km"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
    out = spark.sql(
        """SELECT group_key, duration,
                  max_by(n_risk, n_total) AS n_risk,
                  max_by(n_event, n_total) AS n_event,
                  max_by(n_censored, n_total) AS n_censored,
                  max_by(survival, n_total) AS survival
           FROM tws_km_test GROUP BY group_key, duration"""
    ).toPandas().set_index(["group_key", "duration"])
    assert len(out) > 0
    expect = km_stream_batch(
        to_subjects(load_table(spark, sf_dir, "events"))
    ).set_index(["group_key", "duration"])
    assert len(out) == len(expect)
    for idx, w in expect.iterrows():
        g = out.loc[idx]
        assert (
            int(g.n_risk), int(g.n_event), int(g.n_censored)
        ) == (int(w.n_risk), int(w.n_event), int(w.n_censored)), idx
        assert g.survival == pytest.approx(w.survival, abs=1e-12), idx


def test_hll_processor_order_slice_dup_invariance_and_accuracy(spark):
    """HllDistinctProcessor: the register fold is EXACTLY invariant to
    arrival order, batch slicing, and duplicate delivery (max-merge);
    the estimate lands within HLL error of the true distinct count at
    lg_k=10 (~3.3% relative error; assert 10%); the batch reference
    emits the identical rows; lg_k guard raises."""
    import pytest

    from cancer_survival_etl_spark.streaming.tws import (
        HllDistinctProcessor,
        hll_distinct_batch,
    )

    proc = HllDistinctProcessor(lg_k=10)
    m = 1 << 10
    vals = [f"u{i}" for i in range(5000)]

    whole = proc.fold((0, [0] * m), vals)
    rev = proc.fold((0, [0] * m), list(reversed(vals)))
    st7 = (0, [0] * m)
    for j in range(0, len(vals), 7):
        st7 = proc.fold(st7, vals[j:j + 7])
    dup = proc.fold((0, [0] * m), vals + vals[:1000])
    assert whole[1] == rev[1] == st7[1] == dup[1]
    assert whole[0] == 5000 and dup[0] == 6000

    est = proc.estimate(whole[1])
    assert abs(est - 5000) / 5000 < 0.10

    # small-range linear counting: 30 distinct -> near-exact
    small = proc.fold((0, [0] * m), [f"s{i}" for i in range(30)])
    assert abs(proc.estimate(small[1]) - 30) < 2

    rows = [
        ("error", i % 350) for i in range(3000)
    ] + [("click", i % 4000) for i in range(9000)]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    b = hll_distinct_batch(df).set_index("event_type")
    assert b.loc["error", "n_seen"] == 3000
    assert abs(b.loc["error", "distinct_estimate"] - 350) / 350 < 0.10
    assert abs(b.loc["click", "distinct_estimate"] - 4000) / 4000 < 0.10

    # batch reference == direct fold of the same values
    evals = [r[1] for r in rows if r[0] == "error"]
    n_seen, regs = proc.fold((0, [0] * m), evals)
    assert b.loc["error", "registers_set"] == sum(
        1 for r in regs if r > 0
    )
    assert b.loc["error", "distinct_estimate"] == round(
        proc.estimate(regs), 6
    )

    with pytest.raises(ValueError, match="lg_k"):
        HllDistinctProcessor(lg_k=2)


def test_transform_with_state_hll(spark, sf_dir, tmp_path):
    """running_hll_distinct end-to-end over a real micro-batch run:
    the final per-type emission equals hll_distinct_batch of the full
    history EXACTLY (max-merge registers, so even under re-slicing
    the estimate pins bit-for-bit)."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf",
    )
    from cancer_survival_etl_spark.streaming.tws import (
        hll_distinct_batch,
        running_hll_distinct,
    )
    from cancer_survival_etl_spark.streaming.windows import (
        stream_from_events_dir,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = stream_from_events_dir(spark, sf_dir)
        q = (
            running_hll_distinct(src)
            .writeStream.format("memory")
            .queryName("tws_hll_test")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
    out = spark.sql(
        """SELECT event_type,
                  max_by(n_seen, n_seen) AS n_seen,
                  max_by(registers_set, n_seen) AS registers_set,
                  max_by(distinct_estimate, n_seen) AS distinct_estimate
           FROM tws_hll_test GROUP BY event_type"""
    ).toPandas().set_index("event_type")
    from cancer_survival_etl_spark.sources.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    b = hll_distinct_batch(events).set_index("event_type")
    assert set(out.index) == set(b.index)
    for et in b.index:
        assert out.loc[et, "n_seen"] == b.loc[et, "n_seen"]
        assert (
            out.loc[et, "distinct_estimate"]
            == b.loc[et, "distinct_estimate"]
        )


def test_aj_cif_processor_order_free_and_pins_batch_operator(spark, sf_dir):
    """AjCifProcessor: counter state makes slicing AND arrival order
    independence EXACT (whole == reversed == sliced-by-97,
    bit-for-bit); the end-state table pins CELL-FOR-CELL against the
    distributed operators.survival.cif_competing_risks — counts
    exactly, survival_allcause/cif to float parity (same micro
    HALF_UP lattice); Σ_k CIF_k(t) + S(t) = 1 at the last duration
    of an uncensored group; undeclared cause codes raise."""
    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        cif_competing_risks,
    )
    from cancer_survival_etl_spark.streaming.tws import (
        AjCifProcessor,
        aj_cif_stream_batch,
    )

    events = load_table(spark, sf_dir, "events")
    # cause ∈ {0 censored, 1, 2}: competing risks planted from value
    subjects = events.select(
        "event_type",
        (F.col("event_id") % 20 + 1).cast("long").alias("duration"),
        F.when(F.col("value") > 66, F.lit(2))
        .when(F.col("value") > 33, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("cause"),
    )
    proc = AjCifProcessor([1, 2])
    pdf = subjects.toPandas()
    for et, grp in pdf.groupby("event_type"):
        durs = [int(t) for t in grp["duration"]]
        cks = [int(k) for k in grp["cause"]]
        whole = proc.fold(([], [], []), durs, cks)
        rev = proc.fold(
            ([], [], []), list(reversed(durs)), list(reversed(cks))
        )
        sliced = ([], [], [])
        for j in range(0, len(durs), 97):
            sliced = proc.fold(sliced, durs[j:j + 97], cks[j:j + 97])
        assert whole == rev == sliced

    got = aj_cif_stream_batch(subjects, [1, 2]).set_index(
        ["group_key", "duration", "cause"]
    )
    want = (
        cif_competing_risks(subjects, ["event_type"], [1, 2])
        .select(
            F.col("event_type").alias("group_key"), "duration",
            "cause", "n_risk", "n_event", "survival_allcause", "cif",
        )
        .toPandas()
        .set_index(["group_key", "duration", "cause"])
    )
    assert len(got) == len(want) and len(got) > 0
    for idx, w in want.iterrows():
        g = got.loc[idx]
        assert (int(g.n_risk), int(g.n_event)) == (
            int(w.n_risk), int(w.n_event)
        ), idx
        assert g.survival_allcause == pytest.approx(
            w.survival_allcause, abs=1e-12
        ), idx
        assert g.cif == pytest.approx(w.cif, abs=1e-12), idx
    # each CIF is non-decreasing in t
    for (gkey, k), grp in got.reset_index().groupby(
        ["group_key", "cause"]
    ):
        c = list(grp.sort_values("duration")["cif"])
        assert all(a <= b + 1e-15 for a, b in zip(c, c[1:]))

    # no-censoring identity: Σ_k CIF_k(T) + S(T) = 1 at the last t
    nocens = subjects.withColumn(
        "cause",
        F.when(F.col("cause") == 0, F.lit(1)).otherwise(F.col("cause")),
    )
    tbl = aj_cif_stream_batch(nocens, [1, 2])
    for gkey, grp in tbl.groupby("group_key"):
        last = grp[grp["duration"] == grp["duration"].max()]
        total = last["cif"].sum() + last["survival_allcause"].iloc[0]
        # tolerance: ~20 cells × 0.5e-6 HALF_UP error per micro term
        assert total == pytest.approx(1.0, abs=2e-5), gkey

    with pytest.raises(ValueError, match="undeclared cause code"):
        proc.fold(([], [], []), [1], [9])
    with pytest.raises(ValueError, match="distinct positive"):
        AjCifProcessor([0, 1])


def test_transform_with_state_aj_cif(spark, sf_dir, tmp_path):
    """running_aj_cif end-to-end over a real micro-batch run: the
    final per-(group, duration, cause) emission (selected by max_by
    on the monotone n_total) equals aj_cif_stream_batch of the full
    history."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf",
    )
    from cancer_survival_etl_spark.streaming.tws import (
        aj_cif_stream_batch,
        running_aj_cif,
    )
    from cancer_survival_etl_spark.streaming.windows import (
        stream_from_events_dir,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    def to_subjects(df):
        return df.select(
            "event_type",
            (F.col("event_id") % 20 + 1).cast("long").alias("duration"),
            F.when(F.col("value") > 66, F.lit(2))
            .when(F.col("value") > 33, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("cause"),
        )

    try:
        src = stream_from_events_dir(spark, sf_dir)
        q = (
            running_aj_cif(to_subjects(src), [1, 2])
            .writeStream.format("memory")
            .queryName("tws_aj_test")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_aj"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
    out = spark.sql(
        """SELECT group_key, duration, cause,
                  max_by(n_risk, n_total) AS n_risk,
                  max_by(n_event, n_total) AS n_event,
                  max_by(survival_allcause, n_total) AS survival_allcause,
                  max_by(cif, n_total) AS cif
           FROM tws_aj_test GROUP BY group_key, duration, cause"""
    ).toPandas().set_index(["group_key", "duration", "cause"])
    assert len(out) > 0
    expect = aj_cif_stream_batch(
        to_subjects(load_table(spark, sf_dir, "events")), [1, 2]
    ).set_index(["group_key", "duration", "cause"])
    assert len(out) == len(expect)
