"""Sketch aggregations (error-bound pins vs exact answers) and
data-quality checks (grain uniqueness, column profiling)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cancer_survival_etl_spark.operators.quality import (
    GrainViolation,
    assert_unique_grain,
    duplicate_grains,
    profile_columns,
)
from cancer_survival_etl_spark.operators.sketches import (
    approx_distinct_by,
    approx_quantiles_by,
    frequent_items,
)


def test_approx_distinct_within_rsd(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    approx = {
        r["o_orderpriority"]: r["approx_distinct"]
        for r in approx_distinct_by(
            o, ["o_orderpriority"], "o_custkey", rsd=0.05
        ).collect()
    }
    exact = {
        r["o_orderpriority"]: r["exact"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("exact"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(3, 0.15 * exact[k])


def test_approx_quantiles_bounded_rank_error(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = approx_quantiles_by(
        o, ["o_orderstatus"], "o_totalprice", (0.5,), accuracy=10_000
    ).collect()
    for r in got:
        grp = o.filter(F.col("o_orderstatus") == r["o_orderstatus"])
        n = grp.count()
        rank = grp.filter(F.col("o_totalprice") <= r["p50"]).count()
        # within 1/accuracy + slack of the target rank
        assert abs(rank / n - 0.5) < 0.01 + 10_000 / max(n, 1) / 10_000


def test_frequent_items_never_undercounts(spark):
    df = spark.range(20_000).select((F.col("id") % 10).alias("v"))
    out = {
        r["value"]: r["est_count"]
        for r in frequent_items(df, "v", candidates=[0, 5, 9]).collect()
    }
    for v in [0, 5, 9]:
        assert out[v] >= 2000          # CMS never undercounts
        assert out[v] <= 2000 + 0.001 * 20_000 * 5  # eps*N envelope (x5 slack)


def test_frequent_items_string_values(spark):
    df = spark.createDataFrame(
        [("a",)] * 30 + [("b",)] * 3, ["v"]
    )
    out = {
        r["value"]: r["est_count"]
        for r in frequent_items(df, "v", candidates=["a", "b"]).collect()
    }
    assert out["a"] >= 30 and out["b"] >= 3


def test_grain_uniqueness(spark, sf_dir):
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    # s_suppkey is unique in the synthetic data — must hold
    assert_unique_grain(s, ["s_suppkey"])
    # nationkey alone is NOT a key — must raise with examples
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with pytest.raises(GrainViolation) as e:
        assert_unique_grain(li, ["l_orderkey"])
    assert "l_orderkey" in str(e.value)
    assert duplicate_grains(li, ["l_orderkey"]).count() > 0


def test_profile_columns_single_pass(spark, sf_dir):
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    prof = {r["column"]: r for r in profile_columns(s, ["s_suppkey", "s_name"]).collect()}
    n = s.count()
    assert prof["s_suppkey"]["n_rows"] == n
    assert prof["s_suppkey"]["n_null"] == 0
    assert int(prof["s_suppkey"]["min_value"]) == 0
    # approx_distinct of a unique key ~ row count
    assert abs(prof["s_suppkey"]["approx_distinct"] - n) <= max(3, 0.1 * n)


def test_expect_rules_single_pass_counts(spark):
    from cancer_survival_etl_spark.operators.quality import expect_rules

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, "b"), (3, None, "a"), (4, 7.0, None)],
        "id long, amount double, tag string",
    )
    out = {
        r["rule"]: (r["n_violations"], r["pass_rate"])
        for r in expect_rules(
            df,
            {
                "amount_positive": F.col("amount") > 0,
                "tag_not_null": F.col("tag").isNotNull(),
                "id_unique_range": F.col("id").between(1, 4),
            },
        ).collect()
    }
    # NULL amount counts as violation; -5 violates
    assert out["amount_positive"] == (2, 0.5)
    assert out["tag_not_null"] == (1, 0.75)
    assert out["id_unique_range"] == (0, 1.0)


def test_kmv_distinct_within_error_bound(spark, sf_dir):
    # KMV expected relative error ~ 1/sqrt(k-2) (~13% at k=64); pin 3x.
    from cancer_survival_etl_spark.operators.sketches import kmv_distinct_by

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = {
        r["o_orderpriority"]: r["kmv_distinct"]
        for r in kmv_distinct_by(
            o, ["o_orderpriority"], "o_custkey", k=64
        ).collect()
    }
    exact = {
        r["o_orderpriority"]: r["exact"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("exact"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for key in exact:
        assert abs(got[key] - exact[key]) <= max(3, 0.40 * exact[key]), (
            key,
            got[key],
            exact[key],
        )


def test_kmv_distinct_exact_below_k(spark):
    # Fewer than k distinct values -> the sketch IS the distinct set.
    from cancer_survival_etl_spark.operators.sketches import kmv_distinct_by

    df = spark.range(1000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 17).alias("v")
    )
    got = {
        r["g"]: r["kmv_distinct"]
        for r in kmv_distinct_by(df, ["g"], "v", k=64).collect()
    }
    assert got == {0: 17.0, 1: 17.0, 2: 17.0}


def test_hash_sample_quantiles_bounded_rank_error(spark, sf_dir):
    from cancer_survival_etl_spark.operators.sketches import (
        hash_sample_quantiles_by,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = hash_sample_quantiles_by(
        o, ["o_orderstatus"], "o_totalprice", "o_orderkey", k=256
    ).collect()
    for r in got:
        grp = o.filter(F.col("o_orderstatus") == r["o_orderstatus"])
        n = grp.count()
        for p, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75")):
            rank = grp.filter(F.col("o_totalprice") <= r[col]).count()
            # sampling rank error ~ sqrt(p(1-p)/k): 3 sigma + small-n slack
            tol = 3 * (p * (1 - p) / 256) ** 0.5 + 3 / max(n, 1)
            assert abs(rank / n - p) < tol, (r["o_orderstatus"], col)


def test_hash_sample_is_deterministic_across_partitionings(spark, sf_dir):
    from cancer_survival_etl_spark.operators.sketches import (
        hash_sample_quantiles_by,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = hash_sample_quantiles_by(
        o, ["o_orderstatus"], "o_totalprice", "o_orderkey"
    ).collect()
    b = hash_sample_quantiles_by(
        o.repartition(7, "o_orderkey"),
        ["o_orderstatus"],
        "o_totalprice",
        "o_orderkey",
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_heavy_hitters_exact_output_and_guarantee(spark):
    """MG candidate generation + exact verify must return EXACTLY the
    items above threshold with exact counts — on a skewed stream
    split across many partitions, including with the minimum legal
    summary size."""
    from cancer_survival_etl_spark.operators.sketches import heavy_hitters
    import pytest
    from pyspark.sql import functions as F

    # 3 heavy values (3000/2000/1000 of 6600) + 600 singletons
    rows = (["a"] * 3000 + ["b"] * 2000 + ["c"] * 1000
            + [f"x{i}" for i in range(600)])
    df = spark.createDataFrame(
        [(v,) for v in rows], "v string"
    ).repartition(16)
    got = {
        r.value: (r.n_rows_total, r.exact_count)
        for r in heavy_hitters(df, "v", threshold_fraction=0.1).collect()
    }
    assert got == {"a": (6600, 3000), "b": (6600, 2000), "c": (6600, 1000)}
    # minimum legal summary size still exact (guarantee margin = 0+)
    tight = {
        r.value: r.exact_count
        for r in heavy_hitters(
            df, "v", threshold_fraction=0.1, summary_size=10
        ).collect()
    }
    assert tight == {"a": 3000, "b": 2000, "c": 1000}
    with pytest.raises(ValueError):
        heavy_hitters(df, "v", threshold_fraction=0.1, summary_size=5)


def test_calibration_bins_edges_and_rates(spark):
    from cancer_survival_etl_spark.llm.evals import calibration_bins

    cal = spark.createDataFrame(
        [(0.05, 0), (0.15, 0), (0.95, 1), (1.0, 1), (0.55, 1), (0.52, 0)],
        "score double, label int",
    )
    out = {r.bin: r for r in calibration_bins(cal, "score", "label").collect()}
    assert out[9].n == 2          # 0.95 and the 1.0 clamp share the top bin
    assert out[5].frac_pos == 0.5
    assert out[0].mean_score == 0.05


def test_ndcg_at_k_matches_manual(spark):
    import math

    from cancer_survival_etl_spark.llm.evals import ndcg_at_k

    rows = [(1, 1, 3), (1, 2, 2), (1, 3, 3), (1, 4, 0), (1, 5, 1), (1, 6, 2)]
    df = spark.createDataFrame(rows, "query_id long, rank_val int, rel int")
    got = ndcg_at_k(df, k=5).collect()[0]
    dcg = sum(
        (2**r - 1) / math.log2(p + 1)
        for p, r in [(1, 3), (2, 2), (3, 3), (4, 0), (5, 1)]
    )
    ideal = sorted([3, 2, 3, 0, 1, 2], reverse=True)[:5]
    idcg = sum(
        (2**r - 1) / math.log2(p + 2) for p, r in enumerate(ideal)
    )
    assert got.ndcg == pytest.approx(dcg / idcg, abs=1e-6)
    # all-irrelevant query -> NULL (undefined), not 0/0
    zero = spark.createDataFrame(
        [(2, 1, 0), (2, 2, 0)], "query_id long, rank_val int, rel int"
    )
    assert ndcg_at_k(zero, k=5).collect()[0].ndcg is None


def test_cohens_kappa_matches_manual_and_degenerate(spark):
    from cancer_survival_etl_spark.llm.evals import cohens_kappa

    lab = [("a", "a"), ("a", "a"), ("b", "b"), ("a", "b"), ("b", "a"), ("b", "b")]
    kdf = spark.createDataFrame(lab, "ra string, rb string")
    k = cohens_kappa(kdf, "ra", "rb").collect()[0]
    n = len(lab)
    po = sum(1 for x, y in lab if x == y) / n
    pe = (3 / 6) * (3 / 6) + (3 / 6) * (3 / 6)
    assert k.kappa == pytest.approx((po - pe) / (1 - pe), abs=1e-6)
    # both raters constant -> p_e = 1 -> NULL kappa (undefined)
    const = spark.createDataFrame(
        [("x", "x")] * 4, "ra string, rb string"
    )
    assert cohens_kappa(const, "ra", "rb").collect()[0].kappa is None


def test_rouge_n_clipped_counts(spark):
    from cancer_survival_etl_spark.llm.evals import rouge_n

    pr = spark.createDataFrame(
        [(1, "the cat sat on the mat", "the cat lay on the mat"),
         (2, "a a a", "a a"),       # clipping: bigram 'a a' x2 vs x1
         (3, "x", "y z")],          # candidate has no bigrams
        "pair_id long, candidate string, reference string",
    )
    out = {r.pair_id: r for r in rouge_n(pr, n=2).collect()}
    assert (out[1].n_overlap, out[1].n_cand, out[1].n_ref) == (3, 5, 5)
    assert out[1].rouge_f1 == 0.6
    assert (out[2].n_overlap, out[2].n_cand, out[2].n_ref) == (1, 2, 1)
    assert out[3].rouge_p is None and out[3].rouge_r == 0.0


def test_bleu_n_matches_manual(spark):
    import math

    from cancer_survival_etl_spark.llm.evals import bleu_n

    pr = spark.createDataFrame(
        [(1, "the cat sat on the mat", "the cat lay on the mat"),
         (2, "a a a", "a a"),
         (3, "x", "y z")],
        "pair_id long, candidate string, reference string",
    )
    out = {r.pair_id: r for r in bleu_n(pr, max_n=2).collect()}
    # p1 = 5/6 (the:2 clipped, cat, on, mat), p2 = 3/5, BP = 1
    assert out[1].bleu == pytest.approx(
        math.sqrt((5 / 6) * (3 / 5)), abs=1e-6
    )
    # brevity penalty inactive when candidate longer than reference
    assert out[2].bleu == pytest.approx(
        math.sqrt((2 / 3) * (1 / 2)), abs=1e-6
    )
    # zero any-precision -> 0.0, not NULL
    assert out[3].bleu == 0.0


def test_confusion_stats_per_class(spark):
    from cancer_survival_etl_spark.llm.evals import confusion_stats

    cm = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a")],
        "actual string, predicted string",
    )
    out = {r.label: r for r in confusion_stats(cm, "actual", "predicted").collect()}
    assert (out["b"].precision, out["b"].recall, out["b"].f1) == (
        pytest.approx(2 / 3, abs=1e-6), 1.0, 0.8)
    # never-predicted class: NULL precision, 0 recall, NULL f1
    assert out["c"].precision is None and out["c"].recall == 0.0
    assert out["c"].f1 is None


def test_group_kfold_never_splits_a_group(spark, sf_dir):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.llm.evals import group_kfold
    from cancer_survival_etl_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    kf = group_kfold(e, "user_id", n_folds=5)
    worst = (
        kf.groupBy("user_id")
        .agg(F.countDistinct("fold").alias("nf"))
        .agg(F.max("nf"))
        .collect()[0][0]
    )
    assert worst == 1
    folds = kf.select("fold").distinct().collect()
    assert all(0 <= r.fold < 5 for r in folds)


def test_hll_rollup_merge_partitioning_independent(spark, sf_dir):
    """The merged estimate equals the direct whole-table sketch (union
    of fine sketches is lossless for HLL) and is identical at 1 vs 64
    partitions; the sketch table re-aggregates without raw data."""
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.sketches import (
        hll_rollup,
        hll_rollup_merge,
    )
    from cancer_survival_etl_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "user_id"
    )
    outs = []
    for parts in (1, 64):
        daily = hll_rollup(e.repartition(parts), ["event_type", "day"], "user_id")
        merged = hll_rollup_merge(daily, "event_type").toPandas()
        outs.append(
            merged.sort_values("event_type").reset_index(drop=True)
        )
    assert (outs[0]["distinct_estimate"] == outs[1]["distinct_estimate"]).all()
    direct = (
        hll_rollup_merge(hll_rollup(e, "event_type", "user_id"), "event_type")
        .toPandas().sort_values("event_type").reset_index(drop=True)
    )
    assert (outs[0]["distinct_estimate"] == direct["distinct_estimate"]).all()
    exact = (
        e.groupBy("event_type").agg(F.countDistinct("user_id").alias("x"))
        .toPandas().sort_values("event_type").reset_index(drop=True)
    )
    err = (outs[0]["distinct_estimate"] - exact["x"]).abs() / exact["x"]
    assert (err <= 0.05).all()


def test_kll_rollup_merge_rank_guarantee(spark, sf_dir):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.sketches import (
        kll_rollup,
        kll_rollup_quantile,
    )
    from cancer_survival_etl_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    daily = kll_rollup(e, ["event_type", "day"], "cents")
    for q in (0.25, 0.5, 0.9):
        est = kll_rollup_quantile(daily, "event_type", q).toPandas()
        raw = e.toPandas()
        for r in est.itertuples():
            vals = raw[raw.event_type == r.event_type]["cents"]
            lo = (vals < r.q_estimate).mean()
            hi = (vals <= r.q_estimate).mean()
            assert lo <= q + 0.035 and hi >= q - 0.035, (r.event_type, q)


def test_theta_overlap_small_sets_exact(spark):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.sketches import theta_overlap

    t = spark.range(1000).select(
        F.when(F.col("id") < 600, "A").otherwise("B").alias("s"),
        (F.col("id") % 700).alias("u"),
    )
    r = theta_overlap(t, "s", "u", "A", "B").collect()[0]
    # A = {0..599}, B = {600..699} ∪ {0..299} → overlap {0..299}
    assert (r.n_a_est, r.n_b_est, r.overlap_est) == (600.0, 400.0, 300.0)


def test_isotonic_calibrate_monotone_mass_and_violation_fix(spark):
    from cancer_survival_etl_spark.llm.evals import isotonic_calibrate

    rows = []
    for i in range(2000):
        s = (i % 100) / 100.0
        p = 0.2 + 0.6 * s - (0.25 if 0.45 < s < 0.55 else 0)  # planted dip
        y = 1 if ((i * 2654435761) % 1000) / 1000.0 < p else 0
        rows.append((s, y))
    df = spark.createDataFrame(rows, "score double, label int")
    out = (
        isotonic_calibrate(df, "score", "label", n_bins=20)
        .toPandas().sort_values("bin").reset_index(drop=True)
    )
    cal = list(out["calibrated"])
    assert all(a <= b + 1e-12 for a, b in zip(cal, cal[1:]))  # monotone
    # PAVA preserves total positive mass exactly
    assert (out["calibrated"] * out["n"]).sum() == pytest.approx(
        out["n_pos"].sum(), abs=1e-6
    )
    # the dip bins (9, 10) got pooled: same calibrated value
    dip = out[out.bin.isin([9, 10])]["calibrated"]
    assert dip.nunique() == 1


def test_join_size_estimate_fanout_detection(spark):
    from cancer_survival_etl_spark.operators.sketches import (
        join_size_estimate,
    )

    # uniform 1:3 join -> exact estimate
    left = spark.range(1000).select(F.col("id").alias("k"))
    right = spark.range(3000).select((F.col("id") % 1000).alias("k"))
    r = join_size_estimate(left, right, "k").collect()[0]
    assert r.est_join_rows == pytest.approx(3000, rel=0.02)
    # planted 200x fan-out on one key: estimate must blow up with it
    hot = spark.range(200).select(F.lit(0).alias("k"))
    r2 = join_size_estimate(
        left.unionAll(hot), right.unionAll(hot), "k"
    ).collect()[0]
    exact = (
        left.unionAll(hot).groupBy("k").count().withColumnRenamed("count", "a")
        .join(right.unionAll(hot).groupBy("k").count()
              .withColumnRenamed("count", "b"), "k")
        .selectExpr("sum(a * b) s").collect()[0].s
    )
    # uniformity assumption underestimates pure hot-key mass, but the
    # estimate still signals a join far larger than the uniform case
    assert r2.est_join_rows > r.est_join_rows
    assert exact > 40000  # the planted explosion is real


def test_rolling_distinct_matches_exact_window(spark, sf_dir):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.sketches import (
        rolling_distinct,
    )
    from cancer_survival_etl_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    est = rolling_distinct(e, "ts", "user_id", window_days=7).toPandas()
    u = e.select(F.date_trunc("day", "ts").alias("d"), "user_id").distinct()
    days = e.select(F.date_trunc("day", "ts").alias("day")).distinct()
    exact = (
        days.join(
            u,
            (F.col("d") <= F.col("day"))
            & (F.col("d") > F.col("day") - F.expr("interval 7 days")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("x"))
        .toPandas()
    )
    m = est.merge(exact, on="day")
    assert len(m) == len(est) > 0
    err = (m["distinct_est"] - m["x"]).abs() / m["x"].clip(lower=1)
    assert (err <= 0.05).all()
    # the estimate is monotone in window content: a day's rolling value
    # is >= its single-day distinct estimate
    single = rolling_distinct(e, "ts", "user_id", window_days=1).toPandas()
    j = est.merge(single, on="day", suffixes=("_7", "_1"))
    assert (j["distinct_est_7"] >= j["distinct_est_1"]).all()


def test_countmin_never_underestimates_and_is_exact_when_wide(spark):
    from cancer_survival_etl_spark.operators.sketches import (
        countmin_estimate,
        countmin_rollup,
    )

    rows = [(f"k{i % 50}",) for i in range(1000)]  # each key 20×
    df = spark.createDataFrame(rows, "k string")
    probes = df.distinct()
    # narrow sketch: guaranteed ≥ exact
    cm = countmin_rollup(df, "k", depth=4, width=16)
    est = {r.k: r.cm_estimate for r in
           countmin_estimate(cm, probes, "k", depth=4, width=16).collect()}
    assert all(v >= 20 for v in est.values())
    # wide sketch: 50 keys over 4×4096 cells — collisions in all 4 rows
    # for the same key are (50/4096)^4-improbable; min recovers exact
    cm_w = countmin_rollup(df, "k", depth=4, width=4096)
    est_w = {r.k: r.cm_estimate for r in
             countmin_estimate(cm_w, probes, "k", depth=4, width=4096)
             .collect()}
    assert all(v == 20 for v in est_w.values())


def test_countmin_merges_and_weighted(spark):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.sketches import (
        countmin_rollup,
    )

    rows = [(i, f"k{i % 7}", i % 3) for i in range(300)]
    df = spark.createDataFrame(rows, "i long, k string, w long")
    whole = countmin_rollup(df, "k", depth=3, width=64, weight_col="w")
    h1 = countmin_rollup(
        df.filter("i % 2 = 0"), "k", depth=3, width=64, weight_col="w"
    )
    h2 = countmin_rollup(
        df.filter("i % 2 = 1"), "k", depth=3, width=64, weight_col="w"
    )
    merged = (
        h1.unionAll(h2)
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    a = {(r.j, r.bucket): r.cnt for r in whole.collect()}
    b = {(r.j, r.bucket): r.cnt for r in merged.collect()}
    assert a == b
    # total mass per sketch row = total weight
    tot = sum(v for (j, _), v in a.items() if j == 0)
    assert tot == sum(w for _, _, w in rows)


def test_winsorize_approx_bounds_within_kll_rank_error(spark):
    """The KLL arm of winsorize/robust-scale: approx clip bounds must
    sit within KLL's rank-error envelope of the requested percentiles
    (checked against EXACT ranks), the output contract must match the
    exact arm column-for-column, and integral inputs must stay
    integral (the r04 dtype-defect class, guarded here too)."""
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.stats import (
        robust_scale_by_approx,
        winsorize_by,
        winsorize_by_approx,
    )

    n = 5000
    df = spark.range(n).select(
        (F.col("id") % 4).alias("g"),
        # deterministic skewed values: md5-hash uniform, squared
        (
            F.pow(
                (
                    F.conv(
                        F.substring(F.md5(F.col("id").cast("string")), 1, 8),
                        16,
                        10,
                    ).cast("long")
                    % 10000
                )
                / 10000.0,
                2.0,
            )
            * 1000
        )
        .cast("long")
        .alias("v"),
    )
    exact = winsorize_by(df, "g", "v", 0.05, 0.95)
    approx = winsorize_by_approx(df, "g", "v", 0.05, 0.95, k=200)
    assert approx.columns == exact.columns
    assert dict(approx.dtypes)["value_winsorized"] == "bigint"
    # exact rank of the approx bounds: reconstruct bounds per group
    b = (
        approx.groupBy("g")
        .agg(
            F.min(F.when(~F.col("was_clipped"), F.col("value_winsorized")))
            .alias("lo"),
            F.max(F.when(~F.col("was_clipped"), F.col("value_winsorized")))
            .alias("hi"),
        )
    )
    r = (
        df.join(b, "g")
        .groupBy("g")
        .agg(
            (F.sum((F.col("v") < F.col("lo")).cast("long")) / F.count("*"))
            .alias("rank_lo"),
            (F.sum((F.col("v") <= F.col("hi")).cast("long")) / F.count("*"))
            .alias("rank_hi"),
        )
        .collect()
    )
    for row in r:
        assert row.rank_lo <= 0.05 + 0.04, row
        assert row.rank_hi >= 0.95 - 0.04, row
    # robust-scale approx: same contract as the exact arm
    rs = robust_scale_by_approx(df, "g", "v", k=200)
    assert dict(rs.dtypes)["value_winsorized"] == "bigint"
    got = rs.filter(F.col("value_scaled").isNotNull()).count()
    assert got > 0
    assert {"value_winsorized", "was_clipped", "value_scaled"} <= set(
        rs.columns
    )
