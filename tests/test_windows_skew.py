"""Window analytics (operators.windows) and skew mitigation
(operators.skew): semantic pins against hand-computed expectations and
direct-plan equivalence (salted == unsalted)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cancer_survival_etl_spark.llm.dedup import embedding_cosine_pairs
from cancer_survival_etl_spark.operators.skew import salted_agg, salted_join
from cancer_survival_etl_spark.operators.windows import (
    lag_delta,
    ntile_bucket,
    running_sum,
    topk_per_group,
)


def _seq_df(spark):
    rows = [
        ("a", 1, 10.0),
        ("a", 2, 13.0),
        ("a", 3, 12.0),
        ("b", 1, 5.0),
        ("b", 2, 5.0),
    ]
    return spark.createDataFrame(rows, ["grp", "seq", "val"])


def test_lag_delta_first_row_null(spark):
    out = {
        (r["grp"], r["seq"]): r["delta"]
        for r in lag_delta(_seq_df(spark), ["grp"], ["seq"], "val").collect()
    }
    assert out[("a", 1)] is None
    assert out[("a", 2)] == 3.0
    assert out[("a", 3)] == -1.0
    assert out[("b", 2)] == 0.0


def test_running_sum_is_prefix_sum(spark):
    out = {
        (r["grp"], r["seq"]): r["running_total"]
        for r in running_sum(_seq_df(spark), ["grp"], ["seq"], "val").collect()
    }
    assert out[("a", 1)] == 10.0
    assert out[("a", 3)] == 35.0
    assert out[("b", 2)] == 10.0


def test_topk_dense_rank_keeps_ties(spark):
    rows = [("g", i, v) for i, v in enumerate([9.0, 9.0, 7.0, 5.0, 1.0])]
    df = spark.createDataFrame(rows, ["grp", "id", "score"])
    top = topk_per_group(df, ["grp"], F.col("score").desc(), k=2).collect()
    # both 9.0s are rank 1, the 7.0 is rank 2 → 3 rows for k=2
    assert sorted(r["score"] for r in top) == [7.0, 9.0, 9.0]

    exact = topk_per_group(
        df, ["grp"], [F.col("score").desc(), F.col("id")], k=2,
        rank_fn=F.row_number,
    ).collect()
    assert sorted((r["score"], r["id"]) for r in exact) == [(9.0, 0), (9.0, 1)]


def test_ntile_bucket_sizes(spark):
    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(10)], ["grp", "id", "v"]
    )
    out = ntile_bucket(df, ["grp"], ["v", "id"], 4).collect()
    sizes = {}
    for r in out:
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    # 10 rows into 4 tiles → 3,3,2,2 with the larger tiles first
    assert sizes == {1: 3, 2: 3, 3: 2, 4: 2}
    # ordering respected: bucket 1 holds the smallest values
    b1 = sorted(r["v"] for r in out if r["bucket"] == 1)
    assert b1 == [0.0, 1.0, 2.0]


def test_global_ntile_matches_window_ntile(spark):
    from pyspark.sql import Window

    from cancer_survival_etl_spark.operators.windows import global_ntile

    # cover n % k == 0, n % k != 0, and n < k
    for n_rows, k in [(12, 3), (10, 4), (2, 5)]:
        df = spark.createDataFrame(
            [(i, float((i * 7) % n_rows)) for i in range(n_rows)],
            ["id", "v"],
        )
        want = {
            (r["id"], r["t"])
            for r in df.select(
                "id",
                F.ntile(k)
                .over(Window.orderBy("v", "id"))
                .alias("t"),
            ).collect()
        }
        got = {
            (r["id"], r["tile"])
            for r in global_ntile(df, ["v", "id"], k).collect()
        }
        assert got == want, (n_rows, k)


def test_salted_agg_equals_direct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salted = salted_agg(
        li,
        ["l_returnflag"],
        {
            "total": ("l_quantity", "sum"),
            "n": ("l_quantity", "count"),
            "lo": ("l_quantity", "min"),
            "hi": ("l_quantity", "max"),
        },
        salt_buckets=4,
    )
    direct = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("total"),
        F.count("l_quantity").alias("n"),
        F.min("l_quantity").alias("lo"),
        F.max("l_quantity").alias("hi"),
    )
    s = {r["l_returnflag"]: r for r in salted.collect()}
    d = {r["l_returnflag"]: r for r in direct.collect()}
    assert s.keys() == d.keys()
    for k in d:
        assert s[k]["n"] == d[k]["n"]
        assert s[k]["lo"] == d[k]["lo"]
        assert s[k]["hi"] == d[k]["hi"]
        assert abs(s[k]["total"] - d[k]["total"]) < 1e-6


def test_salted_join_equals_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    salted = (
        salted_join(li, sup, "suppkey", salt_buckets=4)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        li.join(sup, "suppkey")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r["s_nationkey"], r["n"]) for r in salted.collect()} == {
        (r["s_nationkey"], r["n"]) for r in plain.collect()
    }


def test_embedding_cosine_pairs_semantics(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),      # identical to 0 → cosine 1.0
        (2, [0.0, 1.0]),      # orthogonal to 0/1 → cosine 0.0
        (3, [1.0, 1.0]),      # cos 0.707107 vs 0/1/2
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_pairs(df, threshold=0.5).collect()
    }
    assert got[(0, 1)] == 1.0
    assert got[(0, 3)] == got[(1, 3)] == got[(2, 3)] == 0.707107
    assert (0, 2) not in got and (1, 2) not in got


def test_embedding_matmul_strategy_equals_expression(spark, sf_dir):
    from cancer_survival_etl_spark.llm.dedup import embedding_cosine_pairs_matmul
    from cancer_survival_etl_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    expr = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_cosine_pairs(e, threshold=0.3).collect()
    }
    mm = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_cosine_pairs_matmul(e, threshold=0.3, n_blocks=4).collect()
    }
    assert expr == mm and len(expr) > 0


def test_embedding_cosine_pairs_blocked_only_within_block(spark):
    rows = [
        (0, [1.0, 0.0], "x"),
        (1, [1.0, 0.0], "x"),
        (2, [1.0, 0.0], "y"),  # identical but different block → never paired
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "blk"])
    got = embedding_cosine_pairs(df, threshold=0.5, block_col="blk").collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(0, 1)]


def test_asof_join_semantics(spark):
    """Hand-built cases: picks the LATEST preceding right row, matches at
    equal timestamps (<=), NULLs when nothing precedes, left rows never
    dropped or duplicated."""
    from datetime import datetime

    from cancer_survival_etl_spark.operators.asof import asof_join

    ts = lambda s: datetime.fromisoformat(f"2024-01-0{s}")
    left = spark.createDataFrame(
        [(1, 100, ts("5")), (1, 101, ts("2")), (2, 200, ts("3"))],
        ["user_id", "event_id", "ts"],
    )
    right = spark.createDataFrame(
        [(1, ts("1"), 10.0), (1, ts("3"), 30.0), (1, ts("5"), 50.0),
         (2, ts("4"), 99.0)],
        ["user_id", "ts", "val"],
    )
    out = {
        r["event_id"]: (r["val"], r["matched_ts"])
        for r in asof_join(
            left, right, on=["user_id"], ts_col="ts", value_cols=["val"]
        ).collect()
    }
    assert len(out) == 3
    assert out[100] == (50.0, ts("5"))   # equal-ts right row matches
    assert out[101] == (10.0, ts("1"))   # latest preceding, not later ones
    assert out[200] == (None, None)      # right row is in the future


def test_range_join_preceding_semantics(spark):
    """Bucket-boundary cases: matches strictly inside (lt - w, lt],
    including a right row in the PREVIOUS bucket; excludes future rows
    and rows exactly w old."""
    from datetime import datetime, timedelta

    from cancer_survival_etl_spark.operators.asof import range_join_preceding

    t0 = datetime.fromisoformat("2024-01-01 10:00:00")
    s = lambda sec: t0 + timedelta(seconds=sec)
    left = spark.createDataFrame([(1, 100, s(0))], ["k", "eid", "ts"])
    right = spark.createDataFrame(
        [
            (1, s(0), "same-instant"),        # included (<=)
            (1, s(-30), "in-window"),         # included
            (1, s(-60), "exactly-w-old"),     # excluded (strict >)
            (1, s(-59), "prev-bucket-edge"),  # included, lives in bucket-1
            (1, s(10), "future"),             # excluded
        ],
        ["k", "ts", "tag"],
    )
    got = {
        r["r_tag"]
        for r in range_join_preceding(
            left, right, ["k"], "ts", window_seconds=60
        ).collect()
    }
    assert got == {"same-instant", "in-window", "prev-bucket-edge"}


def test_cascading_rollup_lossless_at_every_level(spark, sf_dir):
    """Each cascade level must equal aggregating raw events directly at
    that resolution — the decomposable-aggregate property."""
    from cancer_survival_etl_spark.operators.timeseries import (
        cascading_rollup,
        finish_rollup,
    )
    from cancer_survival_etl_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    levels = ("1 minute", "1 hour", "1 day")
    cascade = cascading_rollup(e, levels=levels)
    for duration, lvl in zip(levels, cascade):
        direct = (
            e.groupBy(F.window("ts", duration).alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                    "sum_cents"
                ),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
            .select(F.col("w.start").alias("window_start"), "*")
            .drop("w")
        )
        key = lambda r: (r["window_start"], r["event_type"])
        got = {key(r): (r["n_events"], r["sum_cents"], r["min_value"], r["max_value"]) for r in lvl.collect()}
        want = {key(r): (r["n_events"], r["sum_cents"], r["min_value"], r["max_value"]) for r in direct.collect()}
        assert got == want and len(got) > 0

    day = finish_rollup(cascade[-1])
    row = day.limit(1).collect()[0]
    assert abs(row["avg_value"] - round(row["sum_value"] / row["n_events"], 6)) < 1e-9


def test_zscore_by_matches_python_reference(spark):
    import statistics

    from cancer_survival_etl_spark.operators.stats import zscore_by

    vals = [10.25, 12.50, 9.75, 11.00, 13.25, 8.50]
    df = spark.createDataFrame(
        [(i, "a", v) for i, v in enumerate(vals)] + [(99, "solo", 5.0)],
        "id long, grp string, v double",
    )
    got = {r["id"]: r["zscore"] for r in zscore_by(df, ["grp"], "v").collect()}
    mean, sd = statistics.mean(vals), statistics.stdev(vals)
    for i, v in enumerate(vals):
        assert abs(got[i] - round((v - mean) / sd, 6)) <= 1e-6
    assert got[99] is None  # n < 2 → no z


def test_corr_exact_matches_python_reference(spark):
    import statistics

    from cancer_survival_etl_spark.operators.stats import corr_exact

    xs = [1, 2, 3, 4, 5, 6]
    ys = [2.0, 4.1, 5.9, 8.2, 9.9, 12.1]
    df = spark.createDataFrame(
        [( "g", float(x), y) for x, y in zip(xs, ys)],
        "grp string, x double, y double",
    )
    [row] = corr_exact(df, ["grp"], "x", "y").collect()
    want = statistics.correlation([float(x) for x in xs], ys)
    assert abs(row["pearson_r"] - want) < 1e-4
    assert row["n_rows"] == 6


def test_aqe_skew_join_splits_hot_partition(spark):
    """With one hot key and broadcast disabled, AQE must mark the
    sort-merge join skew-handled (OptimizeSkewedJoin) under the same
    session confs the engine ships — the runtime half of the skew
    story (operators/skew.py salting is the planned half)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 == 0, 0)
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("payload"),
        )
        small = spark.range(0, 1000).select(F.col("id").alias("k"))
        joined = big.join(small, "k")
        joined.collect()  # same execution AQE finalizes
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isSkew=true" in plan or "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_gap_fill_ffill_grid_and_carry(spark):
    from datetime import datetime

    from cancer_survival_etl_spark.operators.timeseries import gap_fill_ffill

    rows = [
        # user 1: observations at hours 0 and 3 -> grid 0..3, carry 10.0
        (1, datetime(2024, 1, 1, 0, 15), 1, 10.0),
        (1, datetime(2024, 1, 1, 3, 5), 2, 40.0),
        # same bucket twice: later ts wins
        (1, datetime(2024, 1, 1, 3, 50), 3, 41.0),
        # user 2: single observation -> one grid row
        (2, datetime(2024, 1, 1, 7, 1), 4, 7.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {
        (r.user_id, r.bucket_ts.hour): (r.value, r.is_observed)
        for r in gap_fill_ffill(df).collect()
    }
    assert out[(1, 0)] == (10.0, True)
    assert out[(1, 1)] == (10.0, False)  # hole carried forward
    assert out[(1, 2)] == (10.0, False)
    assert out[(1, 3)] == (41.0, True)  # in-bucket last by ts
    assert out[(2, 7)] == (7.0, True)
    assert len(out) == 5


def test_scd2_history_runs_and_intervals(spark):
    from datetime import datetime

    from cancer_survival_etl_spark.operators.timeseries import scd2_history

    t = lambda h: datetime(2024, 1, 1, h)
    rows = [
        (1, t(0), 1, "a"),
        (1, t(1), 2, "a"),  # same run
        (1, t(2), 3, "b"),  # change
        (1, t(3), 4, "a"),  # a again = NEW run, not merged with the first
        (2, t(0), 5, "x"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    hist = sorted(
        scd2_history(df).collect(),
        key=lambda r: (r.user_id, r.valid_from),
    )
    assert [(r.user_id, r.event_type, r.n_events) for r in hist] == [
        (1, "a", 2), (1, "b", 1), (1, "a", 1), (2, "x", 1),
    ]
    # valid_to chains to the next run's valid_from; open row is NULL
    assert hist[0].valid_to == hist[1].valid_from
    assert hist[1].valid_to == hist[2].valid_from
    assert hist[2].valid_to is None and hist[3].valid_to is None


def test_stratified_hash_sample_deterministic_and_bounded(spark, sf_dir):
    from cancer_survival_etl_spark.llm.sampling import stratified_hash_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fr = {"en": 0.25, "de": 1.0}
    a = stratified_hash_sample(d, "lang", fr, "doc_id", default_fraction=0.5)
    b = stratified_hash_sample(
        d.repartition(17), "lang", fr, "doc_id", default_fraction=0.5
    )
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert ids_a == ids_b  # row-stable under repartitioning
    counts = {r.lang: r.n for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["de"] == base["de"]  # fraction 1.0 keeps everything
    assert 0.1 < counts["en"] / base["en"] < 0.4  # ~0.25
    for lang in set(base) - {"en", "de"}:  # default 0.5
        assert 0.3 < counts.get(lang, 0) / base[lang] < 0.7


def test_gap_fill_rejects_fractional_step(spark):
    import pytest

    from cancer_survival_etl_spark.operators.timeseries import gap_fill_ffill

    df = spark.createDataFrame(
        [(1, __import__("datetime").datetime(2024, 1, 1), 1, 1.0)],
        ["user_id", "ts", "event_id", "value"],
    )
    with pytest.raises(ValueError, match="15 minutes"):
        gap_fill_ffill(df, step="15 minutes")
    # supported single-unit steps pass validation
    gap_fill_ffill(df, step="1 day").collect()


def test_scd2_same_timestamp_change_deterministic(spark):
    """Two runs sharing valid_from (attr change at an identical ts):
    the close-out lead orders by (valid_from, _run), so the earlier
    run (by event order) closes at the shared timestamp and the later
    one stays open — deterministically, matching the oracle."""
    from datetime import datetime

    from cancer_survival_etl_spark.operators.timeseries import scd2_history

    t0 = datetime(2024, 1, 1)
    rows = [(1, t0, 1, "a"), (1, t0, 2, "b")]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    for _ in range(3):  # stable across repeated runs
        hist = sorted(scd2_history(df).collect(), key=lambda r: r.event_type)
        assert [(r.event_type, r.valid_to) for r in hist] == [
            ("a", t0),
            ("b", None),
        ]


def test_funnel_stages_strict_order(spark):
    from datetime import datetime

    from cancer_survival_etl_spark.operators.timeseries import funnel_stages

    t = lambda h: datetime(2024, 1, 1, h)
    rows = [
        # user 1: full funnel in order
        (1, t(0), 1, "view"), (1, t(1), 2, "click"), (1, t(2), 3, "purchase"),
        # user 2: purchase BEFORE click -> purchase stage not reached
        (2, t(0), 4, "view"), (2, t(1), 5, "purchase"), (2, t(2), 6, "click"),
        # user 3: click with NO prior view -> nothing past stage 1
        (3, t(0), 7, "click"), (3, t(1), 8, "view"),
        # user 4: click at the SAME ts as view -> strictly-after fails
        (4, t(0), 9, "view"), (4, t(0), 10, "click"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    out = {r.user_id: r for r in funnel_stages(df).collect()}
    assert (out[1].t_view, out[1].t_click, out[1].t_purchase) == (t(0), t(1), t(2))
    assert out[2].t_click == t(2) and out[2].t_purchase is None
    assert out[3].t_view == t(1) and out[3].t_click is None
    assert out[4].t_view == t(0) and out[4].t_click is None


def test_regression_by_scale_factor_exact(spark):
    """ADVICE round 1: fractional y without a scale silently truncates
    (slope 2.0); with y_scale=10 the fit is exact (slope 2.05)."""
    from cancer_survival_etl_spark.operators.stats import regression_by

    df = spark.createDataFrame(
        [("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.1)], ["k", "x", "y"]
    )
    row = regression_by(
        df, ["k"], "x", "y", x_is_cents=False, y_is_cents=False, y_scale=10
    ).collect()[0]
    assert row.slope == 2.05
    assert row.intercept == round(4.033333333333333 - 2.05 * 2.0, 6)
    # degenerate x variance -> NULL slope/intercept, n_rows intact
    deg = spark.createDataFrame([("g", 1.0, 1.0), ("g", 1.0, 2.0)], ["k", "x", "y"])
    drow = regression_by(
        deg, ["k"], "x", "y", x_is_cents=False, y_is_cents=False
    ).collect()[0]
    assert drow.slope is None and drow.intercept is None and drow.n_rows == 2


def test_histogram_by_clamp_and_null_bin(spark):
    from cancer_survival_etl_spark.operators.stats import histogram_by

    df = spark.createDataFrame(
        [("g", -5.0), ("g", 0.0), ("g", 9.9), ("g", 25.0), ("g", 999.0),
         ("g", None)],
        ["k", "v"],
    )
    out = {
        (r.bin): (r.bin_lo, r.n)
        for r in histogram_by(df, ["k"], "v", lo=0.0, hi=100.0, bins=10).collect()
    }
    assert out[0] == (0.0, 3)   # -5 clamps into bin 0; 0.0 and 9.9 land there
    assert out[2] == (20.0, 1)
    assert out[9] == (90.0, 1)  # 999 clamps into the top bin
    assert out[None] == (None, 1)  # NULL value -> NULL-bin row, documented


def test_snapshot_diff_statuses_and_changed_cols(spark):
    from cancer_survival_etl_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),        # unchanged
         (2, "B", 21.0),        # both columns changed
         (3, "c", 30.0),        # NULL -> value counts as change
         (5, "e", 50.0)],       # added; 4 removed
        ["k", "s", "v"],
    )
    out = {r.k: (r.status, r.changed_cols)
           for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out[2] == ("changed", "s,v")
    assert out[3] == ("changed", "v")
    assert out[4] == ("removed", "")
    assert out[5] == ("added", "")
    assert 1 not in out  # unchanged filtered by default
    full = snapshot_diff(old, new, ["k"], include_unchanged=True)
    assert full.filter(F.col("status") == "unchanged").count() == 1


def test_weighted_hash_sample_properties(spark, sf_dir):
    from cancer_survival_etl_spark.llm.sampling import weighted_hash_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = weighted_hash_sample(d, "n_chars", "doc_id", k=20, group_cols=("lang",))
    b = weighted_hash_sample(
        d.repartition(17), "n_chars", "doc_id", k=20, group_cols=("lang",)
    )
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert ids_a == ids_b  # row-stable under repartitioning
    sizes = {r.lang: r.n for r in
             a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(n == 20 for n in sizes.values())  # exactly k per group
    # weight bias: sampled docs skew longer than the population
    pop_avg = d.agg(F.avg("n_chars")).collect()[0][0]
    samp_avg = a.agg(F.avg("n_chars")).collect()[0][0]
    assert samp_avg > pop_avg
    # re-salting re-rolls the sample
    c = weighted_hash_sample(
        d, "n_chars", "doc_id", k=20, group_cols=("lang",), salt="x"
    )
    ids_c = sorted(r.doc_id for r in c.select("doc_id").collect())
    assert ids_c != ids_a


def test_pagerank_path_graph(spark):
    from cancer_survival_etl_spark.operators.graph import pagerank

    # path 1-2-3: the middle node accumulates the most rank; total
    # rank mass stays 1 (symmetrized graph has no dangling leak)
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["u", "v"])
    out = {r.node: r.rank for r in pagerank(edges, iters=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2] > out[1] == out[3]
    assert abs(sum(out.values()) - 1.0) < 1e-6
    # row-stable under repartitioning (fixed iters + end rounding)
    out2 = {
        r.node: r.rank
        for r in pagerank(edges.repartition(7), iters=3).collect()
    }
    assert out == out2


def test_cap_per_key_exact_and_salted_identical(spark, sf_dir):
    from cancer_survival_etl_spark.llm.sampling import cap_per_key

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    plain = cap_per_key(d, ["lang"], cap=5, id_col="doc_id")
    salted = cap_per_key(d, ["lang"], cap=5, id_col="doc_id", salt_buckets=4)
    rows_p = sorted((r.lang, r.doc_id, r.keep_rank) for r in plain.collect())
    rows_s = sorted((r.lang, r.doc_id, r.keep_rank) for r in salted.collect())
    # two-phase salted cap must return EXACTLY the unsalted result
    assert rows_p == rows_s
    # cap enforced, ranks are 1..k per key
    per_key: dict = {}
    for lang, _doc, rank in rows_p:
        per_key.setdefault(lang, []).append(rank)
    for lang, ranks in per_key.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5
    # row-stable under repartitioning
    rows_r = sorted(
        (r.lang, r.doc_id, r.keep_rank)
        for r in cap_per_key(
            d.repartition(13), ["lang"], cap=5, id_col="doc_id"
        ).collect()
    )
    assert rows_r == rows_p


def test_leakage_safe_split_coassigns_clusters(spark):
    from cancer_survival_etl_spark.llm.sampling import (
        hash_split,
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # clusters: {0,1,2} together, {10,11} together, rest singletons
    cluster_of = {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}
    clusters = spark.createDataFrame(
        [(i, cluster_of.get(i, i)) for i in range(200)],
        "doc_id long, cluster_id long",
    )
    got = {
        r.doc_id: r.split
        for r in leakage_safe_split(docs, clusters).collect()
    }
    assert len(got) == 200
    # every cluster member shares one split
    assert got[0] == got[1] == got[2]
    assert got[10] == got[11]
    # singletons match plain hash_split keyed on their own id
    plain = {
        r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()
    }
    for i in range(20, 200):
        assert got[i] == plain[i]
    # rough 80/10/10 over 200 ids
    from collections import Counter

    c = Counter(got.values())
    assert c["train"] > 120 and c["val"] > 5 and c["test"] > 5


def test_ancestor_closure_deep_chain_and_forest(spark):
    """Pointer doubling must produce exactly the (node, ancestor, depth)
    triples of a recursive walk — exercised on a 9-deep chain (needing
    multiple doubling rounds), a branching tree, and a disjoint root."""
    from cancer_survival_etl_spark.operators.graph import ancestor_closure

    rows = [(i, i + 1) for i in range(1, 9)]          # chain 1->2->...->9
    rows += [(20, 22), (21, 22), (22, None), (9, None)]  # small tree+roots
    df = spark.createDataFrame(rows, "node long, parent long")
    got = sorted(
        (r.node, r.ancestor, r.depth)
        for r in ancestor_closure(df, max_depth=16).collect()
    )
    want = []
    parent = dict((n, p) for n, p in rows if p is not None)
    for n, _ in rows:
        a, d = parent.get(n), 1
        while a is not None:
            want.append((n, a, d))
            a, d = parent.get(a), d + 1
    assert got == sorted(want)
    # max_depth truncates: depth-2 cap on the 9-chain
    capped = ancestor_closure(df, max_depth=2).collect()
    assert max(r.depth for r in capped) == 2
    assert all(r.depth <= 2 for r in capped)


def test_corpus_shuffle_dense_deterministic_and_salted(spark, sf_dir):
    from cancer_survival_etl_spark.llm.sampling import corpus_shuffle
    from cancer_survival_etl_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    a = {r.doc_id: r.shuffle_pos
         for r in corpus_shuffle(d, "doc_id", "s1").collect()}
    # dense total 0..n-1 permutation
    assert sorted(a.values()) == list(range(len(a)))
    # reproducible under repartitioning
    b = {r.doc_id: r.shuffle_pos
         for r in corpus_shuffle(d.repartition(13), "doc_id", "s1").collect()}
    assert a == b
    # a different salt is a different permutation (same support)
    c = {r.doc_id: r.shuffle_pos
         for r in corpus_shuffle(d, "doc_id", "s2").collect()}
    assert sorted(c.values()) == sorted(a.values()) and a != c


def test_cohort_retention_matrix_semantics(spark):
    """Hand-built cohorts: offset-0 ratio is 1.0 by construction,
    retention counts match the per-user activity map, and a user's
    multiple events in one week count once."""
    import datetime as dt

    from cancer_survival_etl_spark.operators.timeseries import (
        cohort_retention,
    )

    base = dt.datetime(2024, 1, 1)  # a Monday
    rows = [
        # cohort W0: users 1,2 -- user1 active W0,W1,W2; user2 W0,W2
        (1, base), (1, base + dt.timedelta(days=1)),      # dup in-week
        (1, base + dt.timedelta(days=8)),
        (1, base + dt.timedelta(days=15)),
        (2, base), (2, base + dt.timedelta(days=16)),
        # cohort W1: user 3 active W1 only
        (3, base + dt.timedelta(days=7)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_period.date(), r.period_offset):
            (r.n_active, r.cohort_size, r.retention_ratio)
        for r in cohort_retention(df, "user_id", "ts", "week").collect()
    }
    w0 = base.date()
    w1 = (base + dt.timedelta(days=7)).date()
    assert got[(w0, 0)] == (2, 2, 1.0)
    assert got[(w0, 1)] == (1, 2, 0.5)   # only user1 active in W1
    assert got[(w0, 2)] == (2, 2, 1.0)   # both active in W2
    assert got[(w1, 0)] == (1, 1, 1.0)
    assert len(got) == 4


def test_touch_attribution_first_and_last(spark):
    import datetime as dt

    from cancer_survival_etl_spark.operators.timeseries import (
        touch_attribution,
    )

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        (1, t0 + 0 * s, 1, "ad"),
        (1, t0 + 1 * s, 2, "email"),
        (1, t0 + 2 * s, 3, "purchase"),   # first=ad last=email
        (1, t0 + 3 * s, 4, "social"),
        (1, t0 + 4 * s, 5, "purchase"),   # first=ad last=social
        (2, t0 + 0 * s, 6, "purchase"),   # no touches -> NULLs
        (3, t0 + 0 * s, 7, "ad"),
        (3, t0 + 0 * s, 8, "purchase"),   # same-ts: touch id 7 < conv id 8
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {r.event_id: (r.first_touch, r.last_touch)
           for r in touch_attribution(df).collect()}
    assert got == {
        3: ("ad", "email"),
        5: ("ad", "social"),
        6: (None, None),
        8: ("ad", "ad"),
    }


def test_transition_matrix_counts_and_probs(spark):
    import datetime as dt

    from cancer_survival_etl_spark.operators.timeseries import (
        transition_matrix,
    )

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        (1, t0 + 0 * s, 1, "a"), (1, t0 + 1 * s, 2, "b"),
        (1, t0 + 2 * s, 3, "a"), (1, t0 + 3 * s, 4, "c"),
        (2, t0 + 0 * s, 5, "a"), (2, t0 + 1 * s, 6, "b"),
        (3, t0 + 0 * s, 7, "z"),  # lone event: no transitions
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {(r.from_type, r.to_type): (r.n_steps, r.prob)
           for r in transition_matrix(df).collect()}
    assert got == {
        ("a", "b"): (2, round(2 / 3, 6)),
        ("a", "c"): (1, round(1 / 3, 6)),
        ("b", "a"): (1, 1.0),
    }


def test_key_skew_profile_ranks_and_factors(spark):
    from cancer_survival_etl_spark.operators.quality import (
        key_skew_profile,
    )

    rows = [("hot",)] * 90 + [("warm",)] * 9 + [("cold",)]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    got = [(r.k, r.rank_val, r.n_rows, r.row_share, r.x_uniform)
           for r in key_skew_profile(df, "k", top_n=2)
           .orderBy("rank_val").collect()]
    # 3 keys, 100 rows: uniform = 100/3 rows per key
    assert got[0] == ("hot", 1, 90, 0.9, round(90 / (100 / 3), 6))
    assert got[1] == ("warm", 2, 9, 0.09, round(9 / (100 / 3), 6))
    assert len(got) == 2


def test_pattern_matches_contiguous_and_gapped(spark):
    import datetime as dt

    import pytest

    from cancer_survival_etl_spark.operators.timeseries import (
        pattern_matches,
    )

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, t0 + 0 * m, 1, "a"), (1, t0 + 1 * m, 2, "b"),
        (1, t0 + 2 * m, 3, "c"),                       # match at id 1
        (1, t0 + 3 * m, 4, "a"), (1, t0 + 4 * m, 5, "x"),
        (1, t0 + 5 * m, 6, "b"), (1, t0 + 6 * m, 7, "c"),  # interleaved: no
        (2, t0 + 0 * m, 8, "a"), (2, t0 + 90 * m, 9, "b"),
        (2, t0 + 91 * m, 10, "c"),                     # gap 90m on step 1
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    no_gap = pattern_matches(df, ["a", "b", "c"]).collect()
    assert {(r.user_id, r.start_id) for r in no_gap} == {(1, 1), (2, 8)}
    gapped = pattern_matches(
        df, ["a", "b", "c"], max_step_gap="30 minutes"
    ).collect()
    assert {(r.user_id, r.start_id) for r in gapped} == {(1, 1)}
    r = [x for x in no_gap if x.start_id == 1][0]
    assert (r.match_start_ts, r.match_end_ts) == (t0, t0 + 2 * m)
    with pytest.raises(ValueError):
        pattern_matches(df, ["a"])


def test_journey_matches_skip_till_next_and_nonoverlap(spark):
    import datetime as dt

    import pytest

    from cancer_survival_etl_spark.operators.timeseries import (
        journey_matches,
    )

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, t0 + 0 * m, 1, "view"), (1, t0 + 1 * m, 2, "error"),
        (1, t0 + 2 * m, 3, "click"),
        (1, t0 + 3 * m, 4, "view"),       # ignored mid-journey
        (1, t0 + 4 * m, 5, "purchase"),   # journey 1 completes
        (1, t0 + 5 * m, 6, "click"),      # skipped: machine is at stage 0
        (1, t0 + 6 * m, 7, "view"), (1, t0 + 7 * m, 8, "click"),
        (1, t0 + 8 * m, 9, "purchase"),   # journey 2
        (2, t0, 10, "purchase"),          # never starts
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = [
        (r.user_id, r.start_id, r.match_start_ts, r.match_end_ts)
        for r in journey_matches(df, ["view", "click", "purchase"])
        .orderBy("match_start_ts").collect()
    ]
    assert got == [
        (1, 1, t0, t0 + 4 * m),
        (1, 7, t0 + 6 * m, t0 + 8 * m),
    ]
    with pytest.raises(ValueError):
        journey_matches(df, ["view"])


def test_triangle_count_known_graph(spark):
    from cancer_survival_etl_spark.operators.graph import triangle_count

    # K4 (4 triangles... K4 has C(4,3)=4 triangles) plus a pendant edge
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(3, 9), (9, 3)]  # duplicate + reversed dup collapses
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    r = triangle_count(df).collect()[0]
    assert r.n_edges == 7          # 6 K4 edges + the pendant
    assert r.n_triangles == 4      # the four K4 faces, each once
    # triangle-free graph
    path = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "id_a long, id_b long"
    )
    assert triangle_count(path).collect()[0].n_triangles == 0


def test_global_last_carry_matches_pandas_ffill(spark):
    """global_last_carry: equals pandas ffill on the totally-ordered
    frame, leading nulls stay null, carries cross range-partition
    boundaries, and the fill is partitioning-invariant."""
    rows = []
    for i in range(500):
        v = float(i) if i % 7 == 0 else None
        w = f"s{i}" if i % 11 == 3 else None
        rows.append((i, v, w))
    df = spark.createDataFrame(rows, "k long, v double, w string")

    from cancer_survival_etl_spark.operators.windows import (
        global_last_carry,
    )

    got = (
        global_last_carry(df, ["k"], ["v", "w"], ["fv", "fw"])
        .orderBy("k")
        .collect()
    )
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["k", "v", "w"]).sort_values("k")
    pdf["fv"] = pdf["v"].ffill()
    pdf["fw"] = pdf["w"].ffill()
    for r, (_, e) in zip(got, pdf.iterrows()):
        ev = None if pd.isna(e["fv"]) else e["fv"]
        ew = None if pd.isna(e["fw"]) else e["fw"]
        assert (r.fv, r.fw) == (ev, ew), r.k
    # leading nulls: k < 3 has no w yet
    assert got[0].fw is None and got[3].fw == "s3"

    again = (
        global_last_carry(
            df.repartition(32), ["k"], ["v", "w"], ["fv", "fw"],
            num_partitions=5,
        )
        .orderBy("k")
        .collect()
    )
    assert [tuple(r) for r in again] == [tuple(r) for r in got]


def test_asof_join_nearest_semantics(spark):
    """asof_join_nearest: matches a brute-force nearest reference on
    hash-planted timestamps per key; equal-distance ties go to the
    PRECEDING right row; exact-timestamp rights match at distance 0;
    tolerance nulls far matches; leading/trailing edges fall back to
    the one available side."""
    import hashlib

    import pytest

    from cancer_survival_etl_spark.operators.asof import (
        asof_join_nearest,
    )

    def h(i, salt):
        return int(
            hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:6], 16
        ) % 1000

    lrows = [(i % 3, float(h(i, "L")), i) for i in range(120)]
    rrows = [
        (i % 3, float(h(i, "R")), float(i * 10)) for i in range(90)
    ]
    left = spark.createDataFrame(lrows, "k int, ts double, lid long")
    right = spark.createDataFrame(rrows, "k int, ts double, v double")

    got = {
        r.lid: r
        for r in asof_join_nearest(
            left, right, ["k"], "ts", ["v"]
        ).collect()
    }
    from collections import defaultdict

    by_k = defaultdict(list)
    for k, ts, v in rrows:
        by_k[k].append((ts, v))
    for k, ts, lid in lrows:
        cands = by_k[k]
        # nearest; tie -> preceding (smaller ts); among equal ts the
        # construction carries the LAST in (ts, side) order, but the
        # plant has no duplicate right ts per key
        best = min(
            cands,
            key=lambda c: (abs(c[0] - ts), 0 if c[0] <= ts else 1),
        )
        r = got[lid]
        assert r.matched_ts == best[0] and r.v == best[1], (k, ts)
        assert r.match_distance == abs(best[0] - ts)

    # duplicate right ts per key would be ambiguous — assert plant
    for k in by_k:
        tss = [t for t, _ in by_k[k]]
        assert len(tss) == len(set(tss))

    # exact-distance tie: right at 5 and 15, left at 10 -> backward
    lt = spark.createDataFrame([(1, 10.0, 0)], "k int, ts double, lid long")
    rt = spark.createDataFrame(
        [(1, 5.0, 1.0), (1, 15.0, 2.0)], "k int, ts double, v double"
    )
    tie = asof_join_nearest(lt, rt, ["k"], "ts", ["v"]).collect()[0]
    assert tie.v == 1.0 and tie.match_distance == 5.0

    # tolerance: cap below the distance nulls the match
    tol = asof_join_nearest(
        lt, rt, ["k"], "ts", ["v"], tolerance=4.0
    ).collect()[0]
    assert tol.v is None and tol.match_distance is None

    with pytest.raises(ValueError, match="tolerance"):
        asof_join_nearest(lt, rt, ["k"], "ts", ["v"], tolerance=0)
