"""Rolling-MAD anomaly detection and PSI drift detection."""

from __future__ import annotations

import math
import statistics

import pytest
from pyspark.sql import functions as F

from cancer_survival_etl_spark.operators.driverfit import (
    round_half_up as _rhu,
)
from cancer_survival_etl_spark.operators.stats import psi_drift
from cancer_survival_etl_spark.operators.timeseries import anomaly_mad


def test_anomaly_mad_matches_python_reference(spark):
    vals = [10, 11, 12, 10, 11, 100, 12, 11, 10, 11, 9, 12, 50, 11]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "k long, t long, v long"
    )
    got = {r.t: r for r in anomaly_mad(
        df, "k", "t", "v", "t", window_size=5, k=3).collect()}
    for i, v in enumerate(vals):
        w = sorted(vals[max(0, i - 4): i + 1])
        med = statistics.median(w)
        mad = statistics.median(sorted(abs(x - med) for x in w))
        r = got[i]
        assert r.med2 == int(2 * med)
        assert r.mad4 == int(4 * mad)
        assert r.dev2 == abs(2 * v - int(2 * med))
        expected = len(w) >= 5 and abs(v - med) > 3 * mad
        assert r.is_anomaly == expected, (i, v)
    # the two injected spikes are the only flags
    assert {t for t, r in got.items() if r.is_anomaly} == {5, 12}


def test_anomaly_mad_constant_series_never_flags(spark):
    df = spark.createDataFrame(
        [(1, i, 7) for i in range(30)], "k long, t long, v long"
    )
    rows = anomaly_mad(df, "k", "t", "v", "t", window_size=5, k=3).collect()
    assert all(not r.is_anomaly for r in rows)
    assert all(r.mad4 == 0 for r in rows)


def test_anomaly_mad_keys_are_independent(spark):
    rows = [(1, i, 10) for i in range(10)] + [(2, i, 1000) for i in range(10)]
    df = spark.createDataFrame(rows, "k long, t long, v long")
    out = anomaly_mad(df, "k", "t", "v", "t", window_size=5, k=3)
    # neither key sees the other's level as anomalous
    assert all(not r.is_anomaly for r in out.collect())


def test_psi_drift_matches_python_reference(spark):
    ref_rows = [(i, i % 5) for i in range(300)]
    cur_rows = [(i, (i * 7) % 6) for i in range(200)]  # bucket 5 appears
    ref = spark.createDataFrame(ref_rows, "id long, b long")
    cur = spark.createDataFrame(cur_rows, "id long, b long")
    got = {r.bucket: r for r in psi_drift(ref, cur, "b", alpha=0.5).collect()}
    n_ref, n_cur = {}, {}
    for _, b in ref_rows:
        n_ref[b] = n_ref.get(b, 0) + 1
    for _, b in cur_rows:
        n_cur[b] = n_cur.get(b, 0) + 1
    buckets = set(n_ref) | set(n_cur)
    nb, nr, nc = len(buckets), len(ref_rows), len(cur_rows)
    for b in buckets:
        pr = (n_ref.get(b, 0) + 0.5) / (nr + 0.5 * nb)
        pc = (n_cur.get(b, 0) + 0.5) / (nc + 0.5 * nb)
        assert got[b].n_ref == n_ref.get(b, 0)
        assert got[b].n_cur == n_cur.get(b, 0)
        assert got[b].psi_contrib == pytest.approx(
            round((pc - pr) * math.log(pc / pr), 6), abs=1e-9
        )
    # identical distributions -> PSI ~ 0
    same = psi_drift(ref, ref, "b", alpha=0.5)
    total = same.agg(F.sum("psi_contrib")).collect()[0][0]
    assert total == pytest.approx(0.0, abs=1e-6)


def test_chi_square_matches_python_reference(spark):
    """Pin chi2 and Cramér's V against a direct Python computation on a
    contingency table with real association."""
    from cancer_survival_etl_spark.operators.stats import chi_square_assoc

    rows = (
        [("x", "p")] * 30 + [("x", "q")] * 10
        + [("y", "p")] * 10 + [("y", "q")] * 30
        + [("z", "p")] * 20 + [("z", "q")] * 20
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_square_assoc(df, "a", "b").collect()[0]
    n = len(rows)
    counts = {}
    for a, b in rows:
        counts[(a, b)] = counts.get((a, b), 0) + 1
    ras = {a: sum(c for (x, _), c in counts.items() if x == a)
           for a in "xyz"}
    cbs = {b: sum(c for (_, y), c in counts.items() if y == b)
           for b in "pq"}
    micro = 0
    for (a, b), o in counts.items():
        e = ras[a] * cbs[b] / n
        micro += round(round((o - e) * (o - e) / e, 6) * 1e6)
    chi2 = micro / 1e6
    assert (r.n, r.n_a, r.n_b, r.dof) == (n, 3, 2, 2)
    assert r.chi2 == pytest.approx(chi2, abs=1e-9)
    assert r.cramers_v == pytest.approx(
        round(math.sqrt(chi2 / (n * 1)), 6), abs=1e-9
    )
    # independence -> chi2 ~ 0
    indep = spark.createDataFrame(
        [("u", "p")] * 10 + [("u", "q")] * 10
        + [("v", "p")] * 20 + [("v", "q")] * 20,
        "a string, b string",
    )
    r0 = chi_square_assoc(indep, "a", "b").collect()[0]
    assert r0.chi2 == pytest.approx(0.0, abs=1e-6)


def test_winsorize_by_clips_at_exact_percentiles(spark):
    from cancer_survival_etl_spark.operators.stats import winsorize_by

    vals = list(range(1, 101))  # 1..100 per group
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp string, id long, v long")
    out = {r.id: (r.value_winsorized, r.was_clipped)
           for r in winsorize_by(df, "grp", "v", 0.05, 0.95).collect()}
    # percentile_disc(0.05) of 1..100 = 5; (0.95) = 95
    assert out[0] == (5, True)      # v=1 clipped up
    assert out[99] == (95, True)    # v=100 clipped down
    assert out[49] == (50, False)   # middle untouched
    n_clipped = sum(1 for v, c in out.values() if c)
    assert n_clipped == 4 + 5       # v in {1..4} and {96..100}


def test_robust_scale_by_fused_clip_and_scale(spark):
    from cancer_survival_etl_spark.operators.stats import robust_scale_by

    vals = list(range(1, 101))  # 1..100
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp string, id long, v long")
    out = {r.id: r for r in robust_scale_by(df, "grp", "v", 0.05, 0.95).collect()}
    # clip bounds 5/95 (as winsorize_by), median 50, IQR = 75 - 25 = 50
    assert out[0].value_winsorized == 5 and out[0].was_clipped
    assert out[0].value_scaled == pytest.approx((5 - 50) / 50, abs=1e-6)
    assert out[49].value_scaled == pytest.approx(0.0, abs=1e-6)
    assert out[99].value_scaled == pytest.approx((95 - 50) / 50, abs=1e-6)
    # degenerate IQR -> NULL scaled, winsorized still defined
    const = spark.createDataFrame(
        [("c", i, 7) for i in range(10)], "grp string, id long, v long"
    )
    got = robust_scale_by(const, "grp", "v").collect()
    assert all(r.value_scaled is None for r in got)
    assert all(r.value_winsorized == 7 for r in got)


def test_ols2_by_matches_numpy_lstsq(spark):
    import numpy as np

    from cancer_survival_etl_spark.operators.stats import ols2_by

    rows = [
        ("g", x1, x2, 3 + 2 * x1 - 5 * x2 + (x1 * x2) % 7)
        for x1 in range(10) for x2 in range(10)
    ]
    df = spark.createDataFrame(rows, "grp string, x1 long, x2 long, y long")
    out = ols2_by(df, "grp", "x1", "x2", "y").collect()[0]
    X = np.array([[1, r[1], r[2]] for r in rows])
    Y = np.array([r[3] for r in rows])
    b = np.linalg.lstsq(X, Y, rcond=None)[0]
    assert out.b0 == pytest.approx(b[0], abs=1e-6)
    assert out.b1 == pytest.approx(b[1], abs=1e-6)
    assert out.b2 == pytest.approx(b[2], abs=1e-6)
    # collinear features -> singular -> NULL weights
    col = spark.createDataFrame(
        [("g", i, 2 * i, i) for i in range(10)],
        "grp string, x1 long, x2 long, y long",
    )
    r = ols2_by(col, "grp", "x1", "x2", "y").collect()[0]
    assert r.b0 is None and r.b1 is None and r.b2 is None


def test_ridge2_by_matches_numpy_and_shrinks(spark):
    import numpy as np

    from cancer_survival_etl_spark.operators.stats import ridge2_by

    rows = [
        ("g", x1, x2, 3 + 2 * x1 - 5 * x2 + (x1 * x2) % 7)
        for x1 in range(10) for x2 in range(10)
    ]
    df = spark.createDataFrame(rows, "grp string, x1 long, x2 long, y long")
    X = np.array([[1, r[1], r[2]] for r in rows])
    Y = np.array([r[3] for r in rows])
    for lam in (0, 50, 5000):
        out = ridge2_by(df, "grp", "x1", "x2", "y", lam=lam).collect()[0]
        A = X.T @ X + lam * np.diag([0, 1, 1])
        b = np.linalg.solve(A, X.T @ Y)
        assert out.b0 == pytest.approx(b[0], abs=1e-6), lam
        assert out.b1 == pytest.approx(b[1], abs=1e-6), lam
        assert out.b2 == pytest.approx(b[2], abs=1e-6), lam
    # slopes shrink monotonically toward 0 as lam grows
    b_small = ridge2_by(df, "grp", "x1", "x2", "y", lam=10).collect()[0]
    b_big = ridge2_by(df, "grp", "x1", "x2", "y", lam=100000).collect()[0]
    assert abs(b_big.b1) < abs(b_small.b1)
    assert abs(b_big.b2) < abs(b_small.b2)
    # collinear features: ridge (lam>0) resolves what OLS can't
    col = spark.createDataFrame(
        [("g", i, 2 * i, 3 * i) for i in range(10)],
        "grp string, x1 long, x2 long, y long",
    )
    r = ridge2_by(col, "grp", "x1", "x2", "y", lam=10).collect()[0]
    assert r.b1 is not None and r.b2 is not None
    with pytest.raises(ValueError):
        ridge2_by(df, "grp", "x1", "x2", "y", lam=0.5)


def test_auc_by_exact_with_ties_and_degenerate(spark):
    from cancer_survival_etl_spark.operators.stats import auc_by

    pairs = [(0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1),
             (0.5, 0), (0.5, 1), (0.4, 0), (0.3, 0)]
    df = spark.createDataFrame(
        [("g", s, l) for s, l in pairs], "grp string, score double, label int"
    )
    got = auc_by(df, "grp", "score", "label").collect()[0]
    pos = [s for s, l in pairs if l == 1]
    neg = [s for s, l in pairs if l == 0]
    want = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    ) / (len(pos) * len(neg))
    assert got.auc == pytest.approx(want, abs=1e-6)
    assert (got.n_pos, got.n_neg) == (4, 4)
    # single-class group -> NULL (AUC undefined)
    one = spark.createDataFrame(
        [("h", 0.5, 1), ("h", 0.7, 1)], "grp string, score double, label int"
    )
    assert auc_by(one, "grp", "score", "label").collect()[0].auc is None
    # perfect separation -> 1.0
    perf = spark.createDataFrame(
        [("p", 0.9, 1), ("p", 0.8, 1), ("p", 0.2, 0)],
        "grp string, score double, label int",
    )
    assert auc_by(perf, "grp", "score", "label").collect()[0].auc == 1.0


def test_js_divergence_bounds_and_identity(spark):
    import math

    from cancer_survival_etl_spark.operators.stats import js_divergence

    a = spark.createDataFrame([("x",)] * 6 + [("y",)] * 4, "b string")
    # identical distributions -> 0
    r0 = js_divergence(a, a, "b").collect()[0]
    assert r0.jsd == pytest.approx(0.0, abs=1e-9)
    # disjoint supports -> ln 2 (the JSD maximum)
    b = spark.createDataFrame([("z",)] * 10, "b string")
    r1 = js_divergence(a, b, "b").collect()[0]
    assert r1.jsd == pytest.approx(math.log(2), abs=1e-6)
    assert r1.n_buckets == 3
    # manual middle case
    c = spark.createDataFrame([("x",)] * 4 + [("y",)] * 6, "b string")
    p, q = [0.6, 0.4], [0.4, 0.6]
    want = sum(
        pi / 2 * math.log(pi / ((pi + qi) / 2))
        + qi / 2 * math.log(qi / ((pi + qi) / 2))
        for pi, qi in zip(p, q)
    )
    r2 = js_divergence(a, c, "b").collect()[0]
    assert r2.jsd == pytest.approx(want, abs=1e-6)


def test_ngram_containment_quote_detection(spark):
    from cancer_survival_etl_spark.llm.dedup import ngram_containment_pairs

    long_doc = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lambda mu nu xi omicron pi rho sigma tau")
    quote = "epsilon zeta eta theta iota kappa"  # verbatim inside long
    rows = [(0, long_doc), (1, quote), (2, "totally unrelated words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_containment_pairs(df, "text", "doc_id", n=3, threshold=0.8)
    got = {(r.id_a, r.id_b): (r.contain_ab, r.contain_ba) for r in out.collect()}
    # every 3-gram of the quote appears in the long doc: c(B->A) = 1.0
    assert (0, 1) in got and got[(0, 1)][1] == 1.0
    # but Jaccard would be tiny — containment is the right detector
    assert got[(0, 1)][0] < 0.5
    assert (0, 2) not in got and (1, 2) not in got


def test_spearman_by_ties_and_monotone_invariance(spark):
    import pandas as pd

    from cancer_survival_etl_spark.operators.stats import spearman_by

    rows = [("g", float(x), float((x * 7) % 13 + (x % 3)))
            for x in range(50)] + [("g", 5.0, 99.0)]  # tie in x
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    got = spearman_by(df, "grp", "x", "y").collect()[0]
    pdf = pd.DataFrame(rows, columns=["g", "x", "y"])
    want = pdf["x"].rank().corr(pdf["y"].rank())  # pandas = average ties
    assert got.spearman_rho == pytest.approx(want, abs=1e-6)
    # monotone transform of y leaves rho unchanged
    import math

    df2 = spark.createDataFrame(
        [(g, x, math.exp(y / 50)) for g, x, y in rows],
        "grp string, x double, y double",
    )
    assert spearman_by(df2, "grp", "x", "y").collect()[0].spearman_rho == \
        got.spearman_rho
    # constant column -> NULL
    const = spark.createDataFrame(
        [("c", 1.0, float(i)) for i in range(5)],
        "grp string, x double, y double",
    )
    assert spearman_by(const, "grp", "x", "y").collect()[0].spearman_rho is None


def test_welch_and_rank_sum_match_manual(spark):
    import math
    import statistics

    from cancer_survival_etl_spark.operators.stats import (
        rank_sum_test,
        welch_ttest,
    )

    a = [1, 2, 3, 4, 5, 6, 7, 8]
    b = [3, 4, 5, 6, 7, 8, 9, 11]
    rows = [("A", float(v)) for v in a] + [("B", float(v)) for v in b]
    df = spark.createDataFrame(rows, "v string, m double")
    w = welch_ttest(df, "v", "m", metric_is_cents=False).collect()[0]
    ma, mb = sum(a) / 8, sum(b) / 8
    va, vb = statistics.variance(a), statistics.variance(b)
    se2 = va / 8 + vb / 8
    t = (ma - mb) / math.sqrt(se2)
    dof = se2**2 / ((va / 8) ** 2 / 7 + (vb / 8) ** 2 / 7)
    assert w.t_stat == pytest.approx(t, abs=1e-6)
    assert w.df == pytest.approx(dof, abs=1e-6)
    r = rank_sum_test(df, "v", "m").collect()[0]
    assert r.u_stat == 18.0  # hand-computed with average-rank ties
    assert r.z_stat == pytest.approx(-1.476824, abs=1e-6)
    # all-equal values: sigma = 0 -> NULL z
    const = spark.createDataFrame(
        [("A", 1.0)] * 3 + [("B", 1.0)] * 3, "v string, m double"
    )
    assert rank_sum_test(const, "v", "m").collect()[0].z_stat is None


def test_bh_adjust_suffix_min_and_cap(spark):
    from cancer_survival_etl_spark.operators.stats import bh_adjust

    p = spark.createDataFrame(
        [("m1", 0.01), ("m2", 0.02), ("m3", 0.04), ("m4", 0.5)],
        "k string, p double",
    )
    out = {r.k: r.adj_p for r in bh_adjust(p, "p", "k").collect()}
    # steps: .04, .04, .0533.., .5; suffix-min preserves monotonicity
    assert out["m1"] == out["m2"] == 0.04
    assert out["m3"] == pytest.approx(0.053333333, abs=1e-9)
    assert out["m4"] == 0.5
    # cap at 1
    hi = spark.createDataFrame([("x", 0.9), ("y", 0.95)], "k string, p double")
    assert all(r.adj_p <= 1.0 for r in bh_adjust(hi, "p", "k").collect())


def test_kendall_tau_matches_brute_force_and_extremes(spark):
    import itertools
    import math
    import random

    from cancer_survival_etl_spark.operators.stats import kendall_tau_by

    random.seed(7)
    rows = [("g", random.randint(0, 10), random.randint(0, 10))
            for _ in range(200)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    got = kendall_tau_by(df, "grp", "x", "y").collect()[0]
    con = dis = 0
    n = len(rows)
    tx = sum(1 for (_, xa, _), (_, xb, _) in itertools.combinations(rows, 2)
             if xa == xb)
    ty = sum(1 for (_, _, ya), (_, _, yb) in itertools.combinations(rows, 2)
             if ya == yb)
    for (_, xa, ya), (_, xb, yb) in itertools.combinations(rows, 2):
        s = (xa - xb) * (ya - yb)
        con += s > 0
        dis += s < 0
    n0 = n * (n - 1) // 2
    want = (con - dis) / math.sqrt((n0 - tx) * (n0 - ty))
    assert got.tau_b == pytest.approx(want, abs=1e-6)
    # strictly monotone -> ±1; all-tied -> NULL
    inc = spark.createDataFrame(
        [("m", i, 2 * i) for i in range(30)], "grp string, x long, y long"
    )
    assert kendall_tau_by(inc, "grp", "x", "y").collect()[0].tau_b == 1.0
    const = spark.createDataFrame(
        [("c", 1, i) for i in range(10)], "grp string, x long, y long"
    )
    assert kendall_tau_by(const, "grp", "x", "y").collect()[0].tau_b is None


def test_welch_and_rank_sum_null_stats_on_three_variants(spark):
    """Two-variant precondition (ADVICE r2): with 3+ variants the
    min/max selection drops middle variants, so the test statistics
    must come back NULL rather than silently wrong."""
    from cancer_survival_etl_spark.operators.stats import (
        rank_sum_test,
        welch_ttest,
    )

    rows = [(v, float(i % 7)) for v in ("a", "b", "c") for i in range(20)]
    df = spark.createDataFrame(rows, "variant string, metric double")
    w = welch_ttest(df, "variant", "metric").collect()[0]
    assert w.t_stat is None and w.df is None
    # the extreme variants are still reported (a, c) with their sizes
    assert (w.variant_a, w.variant_b) == ("a", "c")
    r = rank_sum_test(df, "variant", "metric").collect()[0]
    assert r.u_stat is None and r.z_stat is None
    # exactly two variants: stats present again
    two = df.where(F.col("variant") != "c")
    assert welch_ttest(two, "variant", "metric").collect()[0].t_stat is not None
    assert rank_sum_test(two, "variant", "metric").collect()[0].z_stat is not None


def test_get_spark_applies_explicit_conf_on_reuse(spark):
    from cancer_survival_etl_spark.session import get_spark

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        s = get_spark("ignored", shuffle_partitions=13)
        assert s is spark  # reused, not a new session
        assert spark.conf.get("spark.sql.shuffle.partitions") == "13"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_cusum_matches_sequential_recursion(spark):
    """The window form P_t - min(P_j) must equal the textbook
    max(0, S + y) fold exactly, alarms included."""
    import datetime

    from cancer_survival_etl_spark.operators.timeseries import (
        cusum_changepoints,
    )

    base = datetime.datetime(2024, 1, 1)
    # planted upward shift from day 10, downward from day 20
    vals = [10.0] * 10 + [14.0] * 10 + [4.0] * 10
    rows = [("a", base + datetime.timedelta(days=i), v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {r.day.day + (r.day.month - 1) * 31: r for r in
           cusum_changepoints(df, "event_type", "ts", "value",
                              k_slack_cents=50, h_cents=1500).collect()}

    cents = [round(v * 100) for v in vals]
    mean_c = sum(cents) // len(cents)
    sp = sn = 0
    for i, c in enumerate(cents):
        sp = max(0, sp + c - mean_c - 50)
        sn = max(0, sn + mean_c - c - 50)
        r = out[i + 1]
        assert (r.cusum_pos, r.cusum_neg) == (sp, sn), (i, sp, sn, r)
        assert r.alarm_pos == (sp > 1500) and r.alarm_neg == (sn > 1500)
    # the planted shifts actually fire
    assert any(r.alarm_pos for r in out.values())
    assert any(r.alarm_neg for r in out.values())


def test_kendall_weighted_cells_equal_raw_rows(spark):
    """Feeding pre-aggregated (x, y, count) cells through weight_col
    must reproduce the raw-row result exactly — n_rows included."""
    import random

    from cancer_survival_etl_spark.operators.stats import kendall_tau_by

    random.seed(13)
    rows = [("g", random.randint(0, 6), random.randint(0, 6))
            for _ in range(300)]
    raw = spark.createDataFrame(rows, "grp string, x long, y long")
    cells = raw.groupBy("grp", "x", "y").count()
    a = kendall_tau_by(raw, "grp", "x", "y").collect()[0]
    b = kendall_tau_by(
        cells, "grp", "x", "y", weight_col="count"
    ).collect()[0]
    assert (a.n_rows, a.tau_b) == (b.n_rows, b.tau_b)
    assert a.n_rows == 300


def test_seasonal_decompose_recovers_planted_pattern(spark):
    """Pure weekly signal + linear trend: the decomposition must (a)
    satisfy the additive identity exactly on complete-window days,
    (b) recover the planted weekly shape ordering in the seasonal
    index, and (c) NULL out incomplete boundary windows."""
    import datetime

    from cancer_survival_etl_spark.operators.timeseries import (
        seasonal_decompose,
    )

    base = datetime.datetime(2024, 1, 1)
    season = [10.0, -5.0, 0.0, 5.0, -10.0, 3.0, -3.0]
    rows = []
    for i in range(35):
        v = 100.0 + 0.5 * i + season[i % 7]
        rows.append(("a", base + datetime.timedelta(days=i), v))
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    out = {r.day: r for r in
           seasonal_decompose(df, "event_type", "ts", "value").collect()}
    days = sorted(out)
    # boundary: first/last 3 days have NULL trend and remainder
    for d in days[:3] + days[-3:]:
        assert out[d].trend is None and out[d].remainder is None
    # additive identity on interior days (round-6 arithmetic)
    for d in days[3:-3]:
        r = out[d]
        total = round(r.trend + r.seasonal + r.remainder, 5)
        assert total == round(r.day_cents / 100.0, 5), (d, r)
    # seasonal index preserves the planted ordering across phases
    seas_by_phase = {}
    for d in days[3:-3]:
        seas_by_phase[out[d].phase] = out[d].seasonal
    # the strongest phase must be the planted maximum (season[0]=10,
    # which falls on day 0's phase), and all 7 phases must be present
    top_phase = max(seas_by_phase, key=lambda p: seas_by_phase[p])
    assert (top_phase - out[days[0]].phase) % 7 == 0
    assert len(seas_by_phase) == 7


def test_theil_sen_robust_to_outlier(spark):
    """A clean slope-2 line with one wild outlier: OLS bends, Theil-Sen
    doesn't. Also checks the exact lower-median selection."""
    import datetime

    from cancer_survival_etl_spark.operators.stats import theil_sen_by

    base = datetime.datetime(2024, 3, 1)
    rows = []
    for i in range(11):
        v = 10.0 + 2.0 * i
        if i == 5:
            v = 500.0  # outlier
        rows.append(("a", base + datetime.timedelta(days=i), v))
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    r = theil_sen_by(df, "event_type", "ts", "value").collect()[0]
    assert r.n_days == 11
    assert r.slope == 2.0  # median slope untouched by the outlier
    # intercept: median of (y - 2*day_idx); day_idx is absolute epoch
    # days, so verify via the residual definition rather than 10.0
    d0 = int(base.timestamp() // 86400)
    resid = sorted(
        (10.0 + 2.0 * i if i != 5 else 500.0) - 2.0 * (d0 + i)
        for i in range(11)
    )
    assert r.intercept == round(resid[5], 6)


def test_mann_kendall_hand_formula(spark):
    import datetime
    import math

    from cancer_survival_etl_spark.operators.stats import mann_kendall_by

    base = datetime.datetime(2024, 5, 1)
    vals = [1.0, 3.0, 2.0, 5.0, 4.0, 7.0, 6.0, 9.0, 8.0, 10.0]
    rows = [("up", base + datetime.timedelta(days=i), v)
            for i, v in enumerate(vals)]
    rows += [("flat", base + datetime.timedelta(days=i), 2.0)
             for i in range(6)]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    out = {r.key: r for r in
           mann_kendall_by(df, "event_type", "ts", "value").collect()}
    c = [round(v * 100) for v in vals]
    s_hand = sum(
        (c[j] > c[i]) - (c[j] < c[i])
        for i in range(len(c)) for j in range(i + 1, len(c))
    )
    n = len(c)
    var = n * (n - 1) * (2 * n + 5) / 18.0  # no ties in vals
    z_hand = round((s_hand - 1) / math.sqrt(var), 6)
    r = out["up"]
    assert (r.n_days, r.s_stat, r.z) == (n, s_hand, z_hand)
    assert r.z > 2.0  # clear upward trend is significant
    f = out["flat"]
    assert f.s_stat == 0 and f.z is None  # all tied -> Var 0 -> NULL


def test_gini_and_entropy_known_distributions(spark):
    from cancer_survival_etl_spark.operators.stats import (
        entropy_by,
        gini_by,
    )

    # perfectly equal values -> Gini 0; one-holder-takes-all -> (n-1)/n
    rows = [("eq", 5.0)] * 8 + [("all", 0.0)] * 7 + [("all", 10.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    g = {r.key: r.gini for r in gini_by(df, "k", "v").collect()}
    assert g["eq"] == 0.0
    assert g["all"] == round((8 - 1) / 8, 6)
    # uniform over 4 categories -> H = ln 4, norm 1; single cat -> 0
    import math
    rows2 = [("u", c) for c in "abcd" for _ in range(3)] + [("s", "x")] * 5
    df2 = spark.createDataFrame(rows2, "k string, c string")
    e = {r.key: (r.entropy, r.entropy_norm)
         for r in entropy_by(df2, "k", "c").collect()}
    assert e["u"] == (round(math.log(4), 6), 1.0)
    assert e["s"] == (0.0, None)


def test_benford_uniform_digits_fail_the_screen(spark):
    from cancer_survival_etl_spark.operators.quality import benford_report

    # values 1..9 uniformly -> obs_share 1/9 each, chi2 far from 0;
    # a Benford-ish sample (1-heavy) scores much lower
    rows = [("uni", float(d)) for d in range(1, 10) for _ in range(10)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = benford_report(df, "v", "k").collect()
    assert len(out) == 9
    assert all(r.obs_share == round(1 / 9, 6) for r in out)
    chi2 = out[0].chi2
    assert all(r.chi2 == chi2 for r in out) and chi2 > 15
    # first-digit extraction handles decimals, negatives, leading zeros
    tricky = spark.createDataFrame(
        [("t", 0.042), ("t", -7.1), ("t", 300.0), ("t", 0.0)],
        "k string, v double",
    )
    got = {r.digit: r.n_obs for r in
           benford_report(tricky, "v", "k").collect()}
    assert got == {4: 1, 7: 1, 3: 1}  # zero row excluded


def test_trimmed_mean_drops_extremes_exactly(spark):
    from cancer_survival_etl_spark.operators.stats import trimmed_mean_by

    # 20 values: 1..18 plus two wild outliers; 5% trim drops exactly
    # one from each end (k = floor(20*0.05) = 1)
    vals = [float(v) for v in range(1, 19)] + [-1000.0, 1000.0]
    df = spark.createDataFrame(
        [("a", v) for v in vals], "k string, v double"
    )
    r = trimmed_mean_by(df, "k", "v", 0.05).collect()[0]
    assert (r.n_rows, r.n_trimmed) == (20, 2)
    assert r.trimmed_mean == round(sum(range(1, 19)) / 18, 6)
    # trim that empties the key -> NULL
    tiny = spark.createDataFrame([("b", 1.0)], "k string, v double")
    r2 = trimmed_mean_by(tiny, "k", "v", 0.5).collect()[0]
    assert r2.trimmed_mean == 1.0  # k = floor(1*0.5) = 0, keeps the row
    r3 = trimmed_mean_by(
        spark.createDataFrame([("c", 1.0), ("c", 2.0)], "k string, v double"),
        "k", "v", 0.5,
    ).collect()[0]
    assert r3.trimmed_mean is None  # k = 1 trims both rows


def test_ks_test_matches_manual_and_degenerate(spark):
    import itertools

    from cancer_survival_etl_spark.operators.stats import ks_test

    a = [1, 2, 2, 3, 7]
    b = [2, 5, 5, 8]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "v string, m long")
    r = ks_test(df, "v", "m").collect()[0]
    # manual D over the pooled support
    support = sorted(set(a) | set(b))
    best, loc = -1, None
    for x in support:
        fa = sum(1 for t in a if t <= x) / len(a)
        fb = sum(1 for t in b if t <= x) / len(b)
        d = abs(fa - fb)
        if d > best + 1e-12:
            best, loc = d, x
    assert r.variant_a == "a" and r.variant_b == "b"
    assert r.n_a == len(a) and r.n_b == len(b)
    assert r.d_stat == pytest.approx(best, abs=1e-6)
    assert r.d_location == loc
    want_z = best * (len(a) * len(b) / (len(a) + len(b))) ** 0.5
    assert r.ks_z == pytest.approx(want_z, abs=1e-6)

    # identical samples -> D = 0
    same = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in a], "v string, m long"
    )
    assert ks_test(same, "v", "m").collect()[0].d_stat == 0.0

    # three variants -> NULL stats
    three = spark.createDataFrame(
        rows + [("c", 1)], "v string, m long"
    )
    r3 = ks_test(three, "v", "m").collect()[0]
    assert r3.d_stat is None and r3.ks_z is None


def test_mutual_information_manual_and_extremes(spark):
    import math

    from cancer_survival_etl_spark.operators.stats import (
        mutual_information,
    )

    # deterministic relation: y = x  =>  MI = H(X), NMI = 1
    rows = [(c, c) for c in "aabbbcc"]
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information(df, "x", "y").collect()[0]
    n = len(rows)
    from collections import Counter

    px = Counter(c for c, _ in rows)
    h = -sum((k / n) * math.log(k / n) for k in px.values())
    assert r.mi_nats == pytest.approx(h, abs=1e-6)
    assert r.h_x == pytest.approx(h, abs=1e-6)
    assert r.nmi == pytest.approx(1.0, abs=1e-6)

    # independent uniform -> MI = 0 exactly (product cells)
    indep = [(x, y) for x in "ab" for y in "cd" for _ in range(3)]
    df2 = spark.createDataFrame(indep, "x string, y string")
    r2 = mutual_information(df2, "x", "y").collect()[0]
    assert r2.mi_nats == pytest.approx(0.0, abs=1e-6)

    # constant column -> zero entropy -> NULL nmi
    const = spark.createDataFrame(
        [("a", "z"), ("b", "z")], "x string, y string"
    )
    assert mutual_information(const, "x", "y").collect()[0].nmi is None


def test_pr_auc_manual_and_extremes(spark):
    from cancer_survival_etl_spark.operators.stats import pr_auc

    # scores with a tie block; step AP over distinct thresholds
    rows = [(0.9, 1), (0.8, 0), (0.7, 1), (0.7, 0), (0.6, 1), (0.5, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    # thresholds desc: 0.9 (1/1 pos, P=1), 0.8 (P=1/2), 0.7 (2 rows,
    # 1 pos, cum 2/4), 0.6 (3/5), 0.5 (3/6)
    npos = 3
    want = (1 / npos) * (1 / 1) + (1 / npos) * (2 / 4) + (1 / npos) * (3 / 5)
    r = pr_auc(df, "score", "label").collect()[0]
    assert r.n == 6 and r.n_pos == 3
    assert r.pr_auc == pytest.approx(want, abs=1e-6)

    # perfect separation -> AP = 1
    perfect = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], "score double, label int"
    )
    assert pr_auc(perfect, "score", "label").collect()[0].pr_auc == 1.0

    # no positives -> NULL
    nopos = spark.createDataFrame(
        [(0.9, 0), (0.1, 0)], "score double, label int"
    )
    assert pr_auc(nopos, "score", "label").collect()[0].pr_auc is None


def test_bootstrap_ci_brackets_mean_and_deterministic(spark):
    from cancer_survival_etl_spark.operators.stats import bootstrap_ci

    rows = [(i, 10.0 + (i % 7)) for i in range(400)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    r = bootstrap_ci(df, "event_id", "value", n_replicas=64).collect()[0]
    true_mean = sum(v for _, v in rows) / len(rows)
    assert r.n == 400 and r.n_replicas == 64
    assert r.mean == pytest.approx(true_mean, abs=1e-6)
    # percentile CI must bracket the point estimate and be reasonably
    # tight for a 400-row sample of a bounded variable
    assert r.ci_lo <= r.mean <= r.ci_hi
    assert (r.ci_hi - r.ci_lo) < 1.0

    # identical numbers at any partitioning (md5-deterministic)
    r2 = bootstrap_ci(
        df.repartition(17), "event_id", "value", n_replicas=64
    ).collect()[0]
    assert (r.ci_lo, r.ci_hi, r.mean) == (r2.ci_lo, r2.ci_hi, r2.mean)


def test_bootstrap_poisson_weights_mean_one(spark):
    """The pinned hex lattice must actually induce Poisson(1)-ish
    weights: mean weight ~ 1, var ~ 1 over many (row, replica)
    draws."""
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.stats import (
        POISSON1_HEX_THRESHOLDS,
    )

    df = spark.range(3000).select(F.col("id").cast("string").alias("_id"))
    prefix = F.substring(F.md5(F.col("_id")), 1, 8)
    w = sum(
        (prefix >= F.lit(t)).cast("long")
        for t in POISSON1_HEX_THRESHOLDS
    )
    got = df.select(w.alias("w")).agg(
        F.avg("w").alias("m"), F.var_pop("w").alias("v")
    ).collect()[0]
    assert got.m == pytest.approx(1.0, abs=0.07)
    assert got.v == pytest.approx(1.0, abs=0.15)


def test_grouped_ks_and_pr_auc_match_global_per_group(spark):
    """The grouped siblings must reproduce the global operators run
    group-by-group, including one-armed/no-positive NULL gates."""
    from cancer_survival_etl_spark.operators.stats import (
        ks_test,
        ks_test_by,
        pr_auc,
        pr_auc_by,
    )

    rows = []
    for gi, grp in enumerate(["g1", "g2", "g3"]):
        for i in range(60):
            variant = str(i % 2) if grp != "g3" else "0"  # g3 one-armed
            rows.append((grp, variant, float((i * (gi + 3)) % 17),
                         i, 1 if (i * 7) % 3 == 0 and grp != "g3" else 0))
    df = spark.createDataFrame(
        rows, "grp string, variant string, metric double, rid long, label int"
    )

    got_ks = {r.grp: r for r in ks_test_by(
        df, "grp", "variant", "metric").collect()}
    for grp in ("g1", "g2"):
        sub = df.filter(F.col("grp") == grp)
        want = ks_test(sub, "variant", "metric").collect()[0]
        assert got_ks[grp].d_stat == want.d_stat, grp
        assert got_ks[grp].ks_z == want.ks_z, grp
    assert got_ks["g3"].d_stat is None  # one-armed group

    got_ap = {r.grp: r for r in pr_auc_by(
        df, "grp", "metric", "label").collect()}
    for grp in ("g1", "g2"):
        sub = df.filter(F.col("grp") == grp)
        want = pr_auc(sub, "metric", "label").collect()[0]
        assert got_ap[grp].pr_auc == want.pr_auc, grp
        assert got_ap[grp].n_pos == want.n_pos, grp
    assert got_ap["g3"].pr_auc is None  # no positives


def test_kruskal_wallis_matches_scipy_formula(spark):
    """H with tie correction vs a sequential implementation of the
    textbook formula on a planted 3-group frame with heavy ties."""
    from cancer_survival_etl_spark.operators.stats import kruskal_wallis

    rows = []
    for i in range(240):
        g = f"g{i % 3}"
        m = ((i * 7) % 10) + (i % 3)  # group-shifted, tie-heavy
        rows.append((g, m))
    df = spark.createDataFrame(rows, "g string, m long")
    got = kruskal_wallis(df, "g", "m").collect()[0]

    # sequential reference
    vals = sorted(set(m for _, m in rows))
    below, t_of = {}, {}
    c = 0
    for v in vals:
        t = sum(1 for _, m in rows if m == v)
        below[v], t_of[v] = c, t
        c += t
    n = len(rows)
    rsums, ns = {}, {}
    for g, m in rows:
        ar = below[m] + (t_of[m] + 1) / 2
        rsums[g] = rsums.get(g, 0) + ar
        ns[g] = ns.get(g, 0) + 1
    h = 12 / (n * (n + 1)) * sum(
        r * r / ns[g] for g, r in rsums.items()
    ) - 3 * (n + 1)
    tie3 = sum(t ** 3 - t for t in t_of.values())
    hc = h / (1 - tie3 / (n ** 3 - n))
    assert got.k_groups == 3 and got.n_total == 240 and got.dof == 2
    assert got.h_stat == pytest.approx(h, abs=1e-6)
    assert got.h_stat_corrected == pytest.approx(hc, abs=1e-6)
    # all-ties degenerate: corrected NULL
    const = spark.createDataFrame(
        [("a", 5), ("b", 5), ("c", 5)] * 4, "g string, m long"
    )
    r = kruskal_wallis(const, "g", "m").collect()[0]
    assert r.h_stat_corrected is None


def test_anova_oneway_matches_numpy(spark):
    import numpy as np

    from cancer_survival_etl_spark.operators.stats import anova_oneway

    rows = [(f"g{i % 4}", (i * 13) % 29 + 3 * (i % 4)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, m long")
    got = anova_oneway(df, "g", "m").collect()[0]
    groups = {}
    for g, m in rows:
        groups.setdefault(g, []).append(m)
    arrs = [np.array(v, float) for v in groups.values()]
    allv = np.concatenate(arrs)
    ssb = sum(len(a) * (a.mean() - allv.mean()) ** 2 for a in arrs)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in arrs)
    k, n = len(arrs), len(allv)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got.f_stat == pytest.approx(f, abs=1e-6)
    assert got.eta_squared == pytest.approx(ssb / (ssb + ssw), abs=1e-6)
    assert (got.dof_between, got.dof_within) == (3, 196)
    # zero within-variance -> NULL F
    z = spark.createDataFrame(
        [("a", 1)] * 5 + [("b", 2)] * 5, "g string, m long"
    )
    assert anova_oneway(z, "g", "m").collect()[0].f_stat is None


def test_rfm_segmentation_quintiles_and_mass(spark):
    """RFM scores reproduce SQL NTILE allocation deterministically;
    segment mass conserves users and cents; high scores mean
    recent/frequent/big."""
    import datetime

    from cancer_survival_etl_spark.operators.timeseries import (
        rfm_segmentation,
    )

    base = datetime.datetime(2026, 1, 1)
    rows = []
    for u in range(50):
        n_ev = 1 + (u % 10)           # frequency rises with u % 10
        for j in range(n_ev):
            rows.append(
                (u, base + datetime.timedelta(days=u % 20, hours=j),
                 float(u))             # monetary rises with u
            )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    seg = rfm_segmentation(df, "user_id", "ts", "value", n_tiles=5)
    got = seg.collect()
    assert sum(r.n_users for r in got) == 50
    assert sum(r.total_cents for r in got) == sum(
        round(v * 100) for _, _, v in rows
    )
    assert all(1 <= r.r_score <= 5 and 1 <= r.f_score <= 5
               and 1 <= r.m_score <= 5 for r in got)
    # user 49: most monetary (value 49) -> must sit in m_score 5;
    # users with u % 20 == 19 are most recent -> r_score 5 exists
    m5 = [r for r in got if r.m_score == 5]
    assert sum(r.n_users for r in m5) == 10  # exactly one quintile
    assert any(r.r_score == 5 for r in got)


def test_glm_poisson_recovers_planted_rates(spark):
    """Poisson GLM with exposure offset: matches a sequential Fisher-
    scoring reference on the same nano-lattice data, recovers planted
    log-rates, honors the offset (coefficients describe the RATE, not
    the count), and is bit-identical under repartitioning."""
    import math

    import numpy as np

    from cancer_survival_etl_spark.operators.stats import glm_poisson

    rows = []
    for i in range(2000):
        x = (i % 8) / 8.0
        expo = 1 + (i % 4)
        lam = math.exp(0.3 + 0.9 * x) * expo
        jitter = ((i * 2654435761) % 3) - 1
        yv = max(round(lam) + jitter, 0)
        rows.append((float(x), float(yv), float(math.log(expo))))
    df = spark.createDataFrame(rows, "x double, y double, lnexpo double")
    beta = glm_poisson(df, ["x"], "y", offset_col="lnexpo", iters=8)
    assert abs(beta[0] - 0.3) < 0.1, beta
    assert abs(beta[1] - 0.9) < 0.1, beta
    # partitioning independence (exact)
    assert glm_poisson(
        df.repartition(32), ["x"], "y", offset_col="lnexpo", iters=8
    ) == beta
    # sequential reference with identical lattice arithmetic
    X = np.array([[1.0, r[0]] for r in rows])
    Y = np.array([r[1] for r in rows])
    O = np.array([r[2] for r in rows])
    b = np.zeros(2)
    for _ in range(8):
        mu = np.exp(O + X @ b)
        g = np.array([
            np.sum(_rhu((Y - mu) * X[:, j] * 1e9)) / 1e9
            for j in range(2)
        ])
        I = np.zeros((2, 2))
        for j in range(2):
            for k in range(2):
                I[j, k] = np.sum(_rhu(mu * X[:, j] * X[:, k] * 1e9)) / 1e9
        b = np.round(b + np.linalg.solve(I, g), 9)
    assert list(b) == beta
    # without the offset the intercept must absorb mean exposure
    b2 = glm_poisson(df, ["x"], "y", iters=8)
    assert b2[0] > beta[0] + 0.3


def test_glm_logistic_irls_matches_gd_and_converges_fast(spark):
    """IRLS logistic: recovers the same separating weights the tuned
    GD trainer finds, in ~8 passes instead of ~100, with no lr; exact
    under repartitioning."""
    import math

    from cancer_survival_etl_spark.operators.stats import glm_logistic

    rows = []
    for i in range(4000):
        s = (i % 100) / 100.0
        u = ((i * 2654435761) % 999983) / 999983.0
        sig = 1.0 / (1.0 + math.exp(-(6.0 * s - 3.0)))
        rows.append((s, 1 if u < sig else 0))
    df = spark.createDataFrame(rows, "score double, y int")
    beta = glm_logistic(df, ["score"], "y", iters=8)
    assert abs(beta[0] + 3.0) < 0.4, beta     # planted b = -3
    assert abs(beta[1] - 6.0) < 0.8, beta     # planted a = 6
    assert glm_logistic(
        df.repartition(32), ["score"], "y", iters=8
    ) == beta


def test_diff_in_diff_recovers_planted_effect(spark):
    """DiD: planted parallel trends (control drifts +2, treated
    drifts +2 plus a +5 effect) must yield did_effect = 5 exactly on
    the cents lattice, with a tight SE; swapping the treatment label
    flips the sign."""
    from cancer_survival_etl_spark.operators.stats import diff_in_diff

    rows = []
    for i in range(4000):
        t = i % 2
        p = (i // 2) % 2
        noise = (((i * 2654435761) % 1000) - 500) / 1000.0
        y = 10.0 + 2.0 * p + 5.0 * t * p + 0.5 * t + noise
        rows.append((t, p, round(y, 2)))
    df = spark.createDataFrame(rows, "treated int, post int, y double")
    r = diff_in_diff(df, "treated", "post", "y").collect()[0]
    assert abs(r.did_effect - 5.0) < 0.05, r
    assert r.t_stat > 50
    assert r.n_treated_post == 1000
    # label swap flips the sign
    r2 = diff_in_diff(
        df.withColumn("treated", 1 - F.col("treated")),
        "treated", "post", "y",
    ).collect()[0]
    assert abs(r2.did_effect + r.did_effect) < 1e-9


def test_diff_in_diff_empty_cell_fails_fast(spark):
    """VERDICT r05 advice: an empty 2x2 cell (e.g. a mislabeled
    treated column) raises naming the cell instead of emitting
    silent NULL means/se/t_stat."""
    import pytest

    from cancer_survival_etl_spark.operators.stats import diff_in_diff

    rows = [(t, p, 10.0 + t + p) for t in (0, 1) for p in (0, 1)
            for _ in range(5)]
    df = spark.createDataFrame(rows, "treated int, post int, y double")
    # drop the treated_post cell entirely
    broken = df.filter(~((F.col("treated") == 1) & (F.col("post") == 1)))
    with pytest.raises(Exception, match="treated_post"):
        diff_in_diff(broken, "treated", "post", "y").collect()


def test_glm_iters_validated(spark):
    """VERDICT r05 advice: iters=0 is a ValueError up front (info/row
    were only bound inside the loop — previously a NameError at
    return_se time)."""
    import pytest

    from cancer_survival_etl_spark.operators.stats import (
        glm_logistic,
        glm_poisson,
    )

    df = spark.createDataFrame(
        [(0.0, 1), (1.0, 0)], "x double, y int"
    )
    with pytest.raises(ValueError, match="iters"):
        glm_poisson(df, ["x"], "y", iters=0)
    with pytest.raises(ValueError, match="iters"):
        glm_logistic(df, ["x"], "y", iters=0, return_se=True)


def test_msprt_two_sample_decisions(spark):
    """mSPRT: a planted true effect must reject (log-lambda far above
    ln(1/alpha)); the null must not; the statistic replicates the
    closed form on the same lattices."""
    import math

    from cancer_survival_etl_spark.operators.stats import (
        msprt_two_sample,
    )

    def cohort(effect):
        rows = []
        for i in range(3000):
            g = "a" if i % 2 == 0 else "b"
            noise = (((i * 2654435761) % 1000) - 500) / 250.0
            y = 10.0 + (effect if g == "a" else 0.0) + noise
            rows.append((g, round(y, 2)))
        return spark.createDataFrame(rows, "grp string, y double")

    hit = msprt_two_sample(cohort(1.0), "grp", "y", tau=1.0).collect()[0]
    assert hit.rejected and hit.log_lambda > math.log(20) * 5
    null = msprt_two_sample(cohort(0.0), "grp", "y", tau=1.0).collect()[0]
    assert not null.rejected
    # closed-form replication from the reported moments
    n = min(hit.n_a, hit.n_b)
    d = hit.mean_a - hit.mean_b
    v = hit.pooled_var
    want = 0.5 * math.log(2 * v / (2 * v + n * 1.0)) + (
        n * n * 1.0 * d * d / (4 * v * (2 * v + n * 1.0))
    )
    assert hit.log_lambda == pytest.approx(want, abs=1e-3)  # from 6dp-rounded moments
    with pytest.raises(ValueError):
        msprt_two_sample(
            cohort(0.0).withColumn("grp", F.lit("x")), "grp", "y"
        )


def test_glm_se_and_poisson_dispersion(spark):
    """GLM Wald SEs shrink ~1/sqrt(n) and cover planted truth at 5se;
    Pearson dispersion reads ~1 on equidispersed counts and flags a
    variance-inflated plant."""
    import math

    from cancer_survival_etl_spark.operators.stats import (
        glm_poisson,
        poisson_dispersion,
    )

    def cohort(n, inflate):
        rows = []
        for i in range(n):
            x = (i % 8) / 8.0
            lam = math.exp(0.3 + 0.9 * x)
            base = ((i * 2654435761) % 7)  # 0..6, mean 3
            noise = (base - 3) * inflate
            yv = max(round(lam) + round(noise), 0)
            rows.append((float(x), float(yv)))
        return spark.createDataFrame(rows, "x double, y double")

    df = cohort(3000, 0.5)
    beta, se = glm_poisson(df, ["x"], "y", iters=8, return_se=True)
    assert abs(beta[1] - 0.9) < 5 * se[1]
    _, se_big = glm_poisson(
        cohort(12000, 0.5), ["x"], "y", iters=8, return_se=True
    )
    assert 0.35 < se_big[1] / se[1] < 0.65
    # equidispersed-ish plant: phi near 1; inflated plant: flagged
    d1 = poisson_dispersion(df, ["x"], beta, "y").collect()[0]
    big = cohort(3000, 3.0)
    beta2 = glm_poisson(big, ["x"], "y", iters=8)
    d2 = poisson_dispersion(big, ["x"], beta2, "y").collect()[0]
    assert d2.dispersion > d1.dispersion * 2
    assert d2.overdispersed
    assert d1.p_params == 2


def test_glm_poisson_robust_se(spark):
    """Sandwich SEs: beta identical to glm_poisson (same fit); under
    PLANTED overdispersion (NB-generated counts) the robust SE is
    materially LARGER than the model-based SE (which understates);
    under true Poisson data the two agree within 20%."""
    import math

    from cancer_survival_etl_spark.operators.stats import (
        glm_poisson,
        glm_poisson_robust_se,
    )

    def draw_pois(lam, u):
        # inverse-cdf Poisson from one uniform (deterministic)
        k, p, c = 0, math.exp(-lam), 0.0
        c = p
        while u > c and k < 200:
            k += 1
            p *= lam / k
            c += p
        return k

    rows_p, rows_nb = [], []
    for i in range(4000):
        x = (i % 10) / 10.0
        lam = math.exp(0.3 + 0.9 * x)
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        rows_p.append((x, draw_pois(lam, u)))
        # NB via gamma-mixed Poisson: scale lam by a 2-point mixing
        # multiplier with mean 1, var 0.49 -> strongly overdispersed
        m = 0.3 if (i * 48271) % 4 < 2 else 1.7
        rows_nb.append((x, draw_pois(lam * m, u)))
    dfp = spark.createDataFrame(rows_p, "x double, y long")
    dfnb = spark.createDataFrame(rows_nb, "x double, y long")

    beta_fit = glm_poisson(dfp, ["x"], "y", iters=6)
    beta_r, se_r = glm_poisson_robust_se(dfp, ["x"], "y", iters=6)
    assert beta_r == beta_fit
    _, se_model = glm_poisson(dfp, ["x"], "y", iters=6, return_se=True)
    for a, b in zip(se_r, se_model):
        assert abs(a - b) / b < 0.2, (se_r, se_model)
    # overdispersed: robust SE inflates well past model SE
    _, se_r_nb = glm_poisson_robust_se(dfnb, ["x"], "y", iters=6)
    _, se_m_nb = glm_poisson(dfnb, ["x"], "y", iters=6, return_se=True)
    assert se_r_nb[1] > 1.3 * se_m_nb[1], (se_r_nb, se_m_nb)


def test_glm_negative_binomial(spark):
    """NB2: huge theta reproduces glm_poisson to 6 dp; on planted
    overdispersed counts the moment-estimated theta is finite and
    beta still recovers the planted slope."""
    import math

    from cancer_survival_etl_spark.operators.stats import (
        glm_negative_binomial,
        glm_poisson,
    )

    def draw_pois(lam, u):
        k, p = 0, math.exp(-lam)
        c = p
        while u > c and k < 200:
            k += 1
            p *= lam / k
            c += p
        return k

    rows = []
    for i in range(4000):
        x = (i % 10) / 10.0
        lam = math.exp(0.3 + 0.9 * x)
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        m = 0.4 if (i * 48271) % 4 < 2 else 1.6
        rows.append((x, draw_pois(lam * m, u)))
    df = spark.createDataFrame(rows, "x double, y long")

    b_pois = glm_poisson(df, ["x"], "y", iters=6)
    b_nb_inf, th = glm_negative_binomial(
        df, ["x"], "y", theta=1e9, iters=6
    )
    for a, b in zip(b_nb_inf, b_pois):
        assert abs(a - b) < 1e-6, (b_nb_inf, b_pois)
    b_nb, theta_hat = glm_negative_binomial(df, ["x"], "y", iters=6)
    assert 0.5 < theta_hat < 50, theta_hat
    assert abs(b_nb[1] - 0.9) < 0.2, b_nb
    import pytest as _p

    with _p.raises(ValueError, match="iters"):
        glm_negative_binomial(df, ["x"], "y", theta=2.0, iters=0)


def test_mantel_haenszel_adjusts_confounding(spark):
    """MH: (1) hand-check on two hand-built strata (exact micro
    arithmetic); (2) a Simpson's-paradox plant where the CRUDE OR is
    inflated by a confounder but the stratum-specific OR is 1 - MH
    must report ~1 and its CI must cover 1 while the crude OR
    excludes it."""
    from cancer_survival_etl_spark.operators.stats import mantel_haenszel

    # hand strata: k1 a=10 b=20 c=5 d=40 (n=75); k2 a=8 b=8 c=4 d=16
    rows = (
        [("k1", 1, 1)] * 10 + [("k1", 1, 0)] * 20
        + [("k1", 0, 1)] * 5 + [("k1", 0, 0)] * 40
        + [("k2", 1, 1)] * 8 + [("k2", 1, 0)] * 8
        + [("k2", 0, 1)] * 4 + [("k2", 0, 0)] * 16
    )
    df = spark.createDataFrame(rows, "s string, exposed int, case int")
    r = mantel_haenszel(df, "s", "exposed", "case").collect()[0]
    num = round(10 * 40 / 75 * 1e6) / 1e6 + round(8 * 16 / 36 * 1e6) / 1e6
    den = round(20 * 5 / 75 * 1e6) / 1e6 + round(8 * 4 / 36 * 1e6) / 1e6
    assert r.or_mh == round(num / den, 6)
    assert r.n_strata == 2 and r.n_subjects == len(rows)
    assert r.or_lower < r.or_mh < r.or_upper
    rr_num = round(10 * 45 / 75 * 1e6) / 1e6 + round(8 * 20 / 36 * 1e6) / 1e6
    rr_den = round(5 * 30 / 75 * 1e6) / 1e6 + round(4 * 16 / 36 * 1e6) / 1e6
    assert r.rr_mh == round(rr_num / rr_den, 6)

    # Simpson plant: stratum A mostly exposed & high base rate,
    # stratum B mostly unexposed & low base rate; within-stratum
    # exposure has NO effect
    rows2 = (
        # stratum A: P(case)=0.5 regardless of exposure
        [("A", 1, 1)] * 200 + [("A", 1, 0)] * 200
        + [("A", 0, 1)] * 25 + [("A", 0, 0)] * 25
        # stratum B: P(case)=0.1 regardless
        + [("B", 1, 1)] * 5 + [("B", 1, 0)] * 45
        + [("B", 0, 1)] * 40 + [("B", 0, 0)] * 360
    )
    df2 = spark.createDataFrame(rows2, "s string, exposed int, case int")
    adj = mantel_haenszel(df2, "s", "exposed", "case").collect()[0]
    crude = mantel_haenszel(
        df2.withColumn("s", F.lit("all")), "s", "exposed", "case"
    ).collect()[0]
    assert adj.or_lower < 1.0 < adj.or_upper, adj
    assert abs(adj.or_mh - 1.0) < 0.05
    assert crude.or_lower > 2.0, crude  # confounded crude estimate


def test_breslow_day_homogeneity(spark):
    """B-D: homogeneous strata (same OR everywhere) give a small
    chi-square; a planted heterogeneous pair (OR 4 vs OR 0.25) gives
    a large one. Fitted-cell identity: with one stratum the fitted a
    equals the observed a, so chi-square == 0 exactly."""
    from cancer_survival_etl_spark.operators.stats import breslow_day

    def stratum(name, a, b, c, d):
        return ([(name, 1, 1)] * a + [(name, 1, 0)] * b
                + [(name, 0, 1)] * c + [(name, 0, 0)] * d)

    homog = stratum("k1", 40, 60, 20, 80) + stratum("k2", 20, 30, 10, 40)
    dfh = spark.createDataFrame(homog, "s string, exposed int, case int")
    rh = breslow_day(dfh, "s", "exposed", "case").collect()[0]
    assert rh.df == 1
    assert rh.bd_chi_square < 0.01, rh  # identical ORs
    hetero = stratum("k1", 40, 30, 10, 120) + stratum("k2", 10, 120, 40, 30)
    dfx = spark.createDataFrame(hetero, "s string, exposed int, case int")
    rx = breslow_day(dfx, "s", "exposed", "case").collect()[0]
    assert rx.bd_chi_square > 20, rx
    single = spark.createDataFrame(
        stratum("only", 30, 20, 10, 40), "s string, exposed int, case int"
    )
    r1 = breslow_day(single, "s", "exposed", "case").collect()[0]
    assert abs(r1.bd_chi_square) < 1e-6 and r1.df == 0


def test_breslow_day_excludes_zero_margin_strata(spark):
    """A stratum with no cases (m1 == 0) carries no OR-homogeneity
    information: it must be excluded from n_strata/df and NOT poison
    the chi-square with a silently-skipped NaN (ADVICE r06). The
    statistic over {informative strata + degenerate stratum} equals
    the statistic over the informative strata alone."""
    from cancer_survival_etl_spark.operators.stats import breslow_day

    def stratum(name, a, b, c, d):
        return ([(name, 1, 1)] * a + [(name, 1, 0)] * b
                + [(name, 0, 1)] * c + [(name, 0, 0)] * d)

    base = stratum("k1", 40, 60, 20, 80) + stratum("k2", 20, 30, 10, 40)
    with_degen = base + stratum("k3", 0, 50, 0, 50)  # no cases at all
    r_base = breslow_day(
        spark.createDataFrame(base, "s string, exposed int, case int"),
        "s", "exposed", "case",
    ).collect()[0]
    r_deg = breslow_day(
        spark.createDataFrame(
            with_degen, "s string, exposed int, case int"
        ),
        "s", "exposed", "case",
    ).collect()[0]
    assert r_deg.n_strata == 2 and r_deg.df == 1, r_deg
    assert r_deg.bd_chi_square == r_base.bd_chi_square, (r_deg, r_base)
    assert r_deg.or_mh == r_base.or_mh  # zero-margin adds 0 to R and S


def test_breslow_day_degenerate_psi_raises(spark):
    """All-strata b*c == 0 makes the MH odds ratio infinite — named
    error, not Infinity propagation (ADVICE r06)."""
    import pytest

    from cancer_survival_etl_spark.operators.stats import breslow_day

    rows = ([("k1", 1, 1)] * 10 + [("k1", 0, 0)] * 10
            + [("k2", 1, 1)] * 5 + [("k2", 0, 0)] * 20
            + [("k2", 1, 0)] * 3)
    df = spark.createDataFrame(rows, "s string, exposed int, case int")
    with pytest.raises(Exception, match="degenerate"):
        breslow_day(df, "s", "exposed", "case").collect()


def test_cochran_armitage_trend(spark):
    """C-A: hand formula replication on a 3-level table with a real
    trend; a flat table gives z ~ 0."""
    from cancer_survival_etl_spark.operators.stats import cochran_armitage

    # dose 0: 10/100, dose 1: 20/100, dose 2: 30/100
    rows = []
    for s, r, nn in [(0.0, 10, 100), (1.0, 20, 100), (2.0, 30, 100)]:
        rows += [(s, 1)] * r + [(s, 0)] * (nn - r)
    df = spark.createDataFrame(rows, "score double, case int")
    r = cochran_armitage(df, "score", "case").collect()[0]
    N, R = 300, 60
    p = R / N
    t = (0 * 10 + 1 * 20 + 2 * 30) - p * (0 * 100 + 1 * 100 + 2 * 100)
    v = p * (1 - p) * ((0 + 1 * 100 + 4 * 100) - (300 ** 2) / N * 1.0)
    import math as _m
    assert r.n_groups == 3 and r.n_subjects == 300 and r.n_cases == 60
    assert abs(r.t_stat - t) < 1e-6
    assert abs(r.variance - v) < 1e-4
    assert abs(r.z - t / _m.sqrt(v)) < 1e-6
    assert r.chi_square > 10
    flat = []
    for s in (0.0, 1.0, 2.0):
        flat += [(s, 1)] * 20 + [(s, 0)] * 80
    rf = cochran_armitage(
        spark.createDataFrame(flat, "score double, case int"),
        "score", "case",
    ).collect()[0]
    assert abs(rf.z) < 1e-6


def test_cuzick_trend(spark):
    """Cuzick: sequential textbook replication (midranks, tie
    correction) on a tied cohort; a planted monotone shift gives a
    loud positive z, a flat plant ~0, and reversing the scores flips
    the sign exactly."""
    import numpy as np

    from cancer_survival_etl_spark.operators.stats import cuzick_trend

    rows = []
    for i in range(300):
        dose = i % 3
        base = (i * 7) % 10
        rows.append((dose, base + 2 * dose))      # planted trend
    df = spark.createDataFrame(rows, "dose long, y long")
    r = cuzick_trend(df, "dose", "y").collect()[0]

    # sequential reference with midranks
    ys = np.array([y for _, y in rows], float)
    ds = np.array([d for d, _ in rows], float)
    order = np.argsort(ys, kind="stable")
    ranks = np.empty(len(ys))
    sorted_y = ys[order]
    i = 0
    pos = 1
    while i < len(sorted_y):
        j = i
        while j < len(sorted_y) and sorted_y[j] == sorted_y[i]:
            j += 1
        mid = (pos + (pos + (j - i) - 1)) / 2.0
        ranks[order[i:j]] = mid
        pos += j - i
        i = j
    n = len(ys)
    t = float((ds * ranks).sum())
    ln = float(ds.sum())
    lln = float((ds * ds).sum())
    _, counts = np.unique(ys, return_counts=True)
    ctie = 1.0 - float((counts ** 3 - counts).sum()) / (n ** 3 - n)
    e_t = (n + 1) / 2.0 * ln
    var = (n + 1) / 12.0 * (n * lln - ln * ln) * ctie
    z = (t - e_t) / math.sqrt(var)
    assert abs(r.t_rank_sum - t) < 1e-6
    assert abs(r.e_t - e_t) < 1e-6
    assert abs(r.variance - var) < 1e-4
    assert abs(r.z - z) < 1e-6
    assert r.z > 5  # the trend is loud

    flat = spark.createDataFrame(
        [(i % 3, (i * 7) % 10) for i in range(300)], "dose long, y long"
    )
    rf = cuzick_trend(flat, "dose", "y").collect()[0]
    assert abs(rf.z) < 1.0, rf
    rev = cuzick_trend(
        df.withColumn("dose", 2 - F.col("dose")), "dose", "y"
    ).collect()[0]
    assert abs(rev.z + r.z) < 1e-9, (rev.z, r.z)


def test_mcnemar_test(spark):
    """Textbook replication on planted pair counts; continuity
    correction toggles; degenerate edges (no discordant pairs ->
    NULL chi and OR; one-sided discordance -> chi defined, OR NULL);
    agreement with conditional_logistic's ln(OR) on the same pairs."""
    import math

    from cancer_survival_etl_spark.operators.stats import mcnemar_test
    from cancer_survival_etl_spark.operators.survival import (
        conditional_logistic,
    )

    rows = ([(1, 1)] * 30 + [(0, 0)] * 40 + [(1, 0)] * 25
            + [(0, 1)] * 10)
    df = spark.createDataFrame(rows, "first int, second int")
    r = mcnemar_test(df, "first", "second").collect()[0]
    assert (r.n_pairs, r.n_both, r.n_neither) == (105, 30, 40)
    assert (r.b_first_only, r.c_second_only) == (25, 10)
    want_chi = (abs(25 - 10) - 1) ** 2 / 35
    assert abs(r.chi_square - want_chi) < 1e-6  # 6-dp output contract
    assert abs(r.or_discordant - 2.5) < 1e-9
    half = 1.96 * math.sqrt(1 / 25 + 1 / 10)
    assert abs(r.or_lower - math.exp(math.log(2.5) - half)) < 1e-5
    assert abs(r.or_upper - math.exp(math.log(2.5) + half)) < 1e-5
    r2 = mcnemar_test(df, "first", "second",
                      correction=False).collect()[0]
    assert abs(r2.chi_square - (25 - 10) ** 2 / 35) < 1e-6

    # CLR identity: beta == ln(b/c) on the same pairs
    long = spark.createDataFrame(
        [(i, float(f), 1) for i, (f, s) in enumerate(rows)]
        + [(i, float(s), 0) for i, (f, s) in enumerate(rows)],
        "pair long, x double, case int",
    )
    beta = conditional_logistic(long, "pair", ["x"], iters=8)
    assert abs(beta[0] - math.log(2.5)) < 1e-6

    conc = spark.createDataFrame(
        [(1, 1)] * 5 + [(0, 0)] * 5, "first int, second int"
    )
    rc = mcnemar_test(conc, "first", "second").collect()[0]
    assert rc.chi_square is None and rc.or_discordant is None
    one = spark.createDataFrame(
        [(1, 0)] * 7 + [(1, 1)] * 3, "first int, second int"
    )
    ro = mcnemar_test(one, "first", "second").collect()[0]
    assert ro.chi_square is not None and ro.or_discordant is None


def test_glm_logistic_firth_haldane_closed_form(spark):
    """Firth logistic on a SATURATED single-binary-covariate model
    has the Haldane closed form (add 1/2 to each 2x2 cell). Pins the
    whole two-pass hat-corrected IRLS to 1e-6, checks the
    bias-reduction direction (|beta1| shrunk vs the raw log-OR), and
    exactness under repartitioning."""
    import math

    from cancer_survival_etl_spark.operators.stats import (
        glm_logistic_firth,
    )

    a, b, c, d = 7, 3, 2, 8
    rows = (
        [(1, 1)] * a + [(1, 0)] * b + [(0, 1)] * c + [(0, 0)] * d
    )
    df = spark.createDataFrame(rows, "x int, y int")
    beta = glm_logistic_firth(df, ["x"], "y", iters=8)
    b1 = math.log((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)))
    b0 = math.log((c + 0.5) / (d + 0.5))
    assert abs(beta[0] - b0) < 1e-6, beta
    assert abs(beta[1] - b1) < 1e-6, beta
    raw = math.log(a * d / (b * c))
    assert abs(beta[1]) < abs(raw)  # Jeffreys shrinkage toward 0
    assert (
        glm_logistic_firth(df.repartition(32), ["x"], "y", iters=8)
        == beta
    )


def test_glm_logistic_firth_separation_finite(spark):
    """Complete separation in one cell (b = 0): the plain MLE
    diverges (|beta1| grows without bound with iterations) but the
    Firth estimate is finite and equals the Haldane closed form.
    iters=0 fails fast; return_se gives finite positive SEs."""
    import math

    from cancer_survival_etl_spark.operators.stats import (
        glm_logistic,
        glm_logistic_firth,
    )
    import pytest

    a, b, c, d = 12, 0, 3, 7
    rows = (
        [(1, 1)] * a + [(1, 0)] * b + [(0, 1)] * c + [(0, 0)] * d
    )
    df = spark.createDataFrame(rows, "x int, y int")
    beta, se = glm_logistic_firth(
        df, ["x"], "y", iters=8, return_se=True
    )
    b1 = math.log((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)))
    assert abs(beta[1] - b1) < 2e-6, beta
    assert all(s > 0 and math.isfinite(s) for s in se), se
    # plain MLE walks off to infinity under separation
    mle8 = glm_logistic(df, ["x"], "y", iters=8)
    mle12 = glm_logistic(df, ["x"], "y", iters=12)
    assert abs(mle12[1]) > abs(mle8[1]) > abs(beta[1])
    with pytest.raises(ValueError, match="iters"):
        glm_logistic_firth(df, ["x"], "y", iters=0)


def test_zero_inflated_poisson_recovers_plant_and_reduction(spark):
    """ZIP EM over three sufficient statistics: a planted 30%
    structural-zero / Poisson(2.5) mixture is recovered within
    sampling error; pure-Poisson data drives pi to ~0 with lambda ~
    ybar; p_zero_fitted matches the observed zero fraction (the ZIP
    zero-moment identity at the fit); all-zero and iters=0 fail
    fast; bit-identical under repartitioning."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.stats import (
        zero_inflated_poisson,
    )

    def pois(u_seed, lam):
        # deterministic inverse-cdf draw on a hash lattice
        u = ((u_seed * 2654435761 + 13) % 999983) / 999983.0
        k, cdf, p = 0, 0.0, math.exp(-lam)
        while cdf + p < u and k < 50:
            cdf += p
            k += 1
            p *= lam / k
        return k

    rows = []
    for i in range(20000):
        u1 = ((i * 48271 + 3) % 999979) / 999979.0
        rows.append((0 if u1 < 0.3 else pois(i, 2.5),))
    df = spark.createDataFrame(rows, "y int")
    r = zero_inflated_poisson(df, "y", iters=15).collect()[0]
    assert abs(r.pi_zero - 0.3) < 0.02, r
    assert abs(r.lambda_pois - 2.5) < 0.05, r
    obs_zero = sum(1 for (v,) in rows if v == 0) / 20000
    assert abs(r.p_zero_fitted - obs_zero) < 0.01, (r, obs_zero)
    r32 = zero_inflated_poisson(
        df.repartition(32), "y", iters=15
    ).collect()[0]
    assert tuple(r32) == tuple(r)

    pure = spark.createDataFrame(
        [(pois(i, 1.7),) for i in range(20000)], "y int"
    )
    rp = zero_inflated_poisson(pure, "y", iters=15).collect()[0]
    assert rp.pi_zero < 0.02, rp
    assert abs(rp.lambda_pois - 1.7) < 0.05, rp

    zeros = spark.createDataFrame([(0,), (0,)], "y int")
    with pytest.raises(ValueError, match="all-zero"):
        zero_inflated_poisson(zeros, "y")
    with pytest.raises(ValueError, match="iters"):
        zero_inflated_poisson(pure, "y", iters=0)


def test_gee_logistic_exchangeable_recovers_and_reduces(spark):
    """GEE exchangeable logistic: on independent clustered data the
    working correlation lands near 0 and beta matches glm_logistic
    closely; on a shared-cluster-shock plant alpha is recovered well
    above 0 and the ROBUST sandwich SE exceeds the naive
    glm_logistic SE (the understatement GEE exists to fix);
    bit-identical under repartitioning; iters fail-fast."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.stats import (
        gee_logistic_exchangeable,
        glm_logistic,
    )

    import hashlib

    def u(i, tag):
        # md5 mixing - arithmetic-progression hashes correlate
        # CONSECUTIVE i (cluster mates) and plant spurious alpha
        h = hashlib.md5(f"{tag}:{i}".encode()).hexdigest()[:8]
        return int(h, 16) / 16 ** 8

    # independent data (cluster labels carry no shock)
    rows = []
    for i in range(8000):
        x = 1 if u(i, "x") < 0.5 else 0
        pr = 1 / (1 + math.exp(-(-1.0 + 1.2 * x)))
        rows.append((i // 4, x, 1 if u(i, "y") < pr else 0))
    ind = spark.createDataFrame(rows, "cl long, x int, y int")
    beta_i, alpha_i = gee_logistic_exchangeable(
        ind, "cl", ["x"], "y", iters=8
    )
    mle = glm_logistic(ind, ["x"], "y", iters=8)
    assert alpha_i < 0.02, alpha_i
    assert abs(beta_i[0] - mle[0]) < 5e-3
    assert abs(beta_i[1] - mle[1]) < 5e-3

    # shared cluster shock: exchangeable correlation within clusters
    rows = []
    for c in range(2000):
        shock = 2.0 * (u(c, "shock") - 0.5) * 4.0
        for j in range(4):
            i = c * 4 + j
            x = 1 if u(i, "x") < 0.5 else 0
            pr = 1 / (1 + math.exp(-(-1.0 + 1.2 * x + shock)))
            rows.append(
                (c, x, 1 if u(i, "y") < pr else 0)
            )
    clu = spark.createDataFrame(rows, "cl long, x int, y int")
    beta_c, alpha_c, se_c = gee_logistic_exchangeable(
        clu, "cl", ["x"], "y", iters=8, return_se=True
    )
    assert alpha_c > 0.1, alpha_c
    _, se_naive = glm_logistic(
        clu, ["x"], "y", iters=8, return_se=True
    )
    # the intercept SE is where clustering bites hardest
    assert se_c[0] > 1.2 * se_naive[0], (se_c, se_naive)
    assert all(s > 0 for s in se_c)
    # exactness under partitioning
    again = gee_logistic_exchangeable(
        clu.repartition(32), "cl", ["x"], "y", iters=8
    )
    assert again == (beta_c, alpha_c)
    with pytest.raises(ValueError, match="iters"):
        gee_logistic_exchangeable(clu, "cl", ["x"], "y", iters=0)


def test_meta_analysis_dl(spark):
    """DerSimonian-Laird meta-analysis: replicates the sequential
    formulas on the same micro lattices; homogeneous studies give
    tau2 = 0 with random == fixed exactly; a planted heterogeneous
    set gives tau2 > 0, I2 large, and a WIDER random-effects CI;
    non-positive SEs raise in the plan."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.stats import (
        meta_analysis_dl,
    )

    studies = [(0.40, 0.10), (0.80, 0.15), (-0.10, 0.12),
               (0.55, 0.20), (0.20, 0.08)]
    df = spark.createDataFrame(studies, "est double, se double")
    r = meta_analysis_dl(df, "est", "se").collect()[0]

    sw = sum(round(1 / s**2 * 1e6) for _, s in studies) / 1e6
    swy = sum(round(y / s**2 * 1e6) for y, s in studies) / 1e6
    swy2 = sum(round(y * y / s**2 * 1e6) for y, s in studies) / 1e6
    sw2 = sum(round(1 / s**4 * 1e6) for _, s in studies) / 1e6
    q = swy2 - swy * swy / sw
    tau2 = round(max(0.0, (q - 4) / (sw - sw2 / sw)), 9)
    swr = sum(round(1 / (s**2 + tau2) * 1e6) for _, s in studies) / 1e6
    swry = sum(
        round(y / (s**2 + tau2) * 1e6) for y, s in studies
    ) / 1e6
    assert r.k == 5
    assert r.fixed == round(swy / sw, 6)
    assert r.q_stat == round(q, 6)
    assert r.tau2 == round(tau2, 6)
    assert r.random == round(swry / swr, 6)
    assert r.random_se == round(1 / math.sqrt(swr), 6)
    assert r.tau2 > 0 and r.i2 > 0.5
    assert (r.random_upper - r.random_lower) > (
        r.fixed_upper - r.fixed_lower
    )

    homog = spark.createDataFrame(
        [(0.30, 0.10)] * 6, "est double, se double"
    )
    rh = meta_analysis_dl(homog, "est", "se").collect()[0]
    assert rh.tau2 == 0.0 and rh.i2 == 0.0
    assert rh.random == rh.fixed and rh.random_se == rh.fixed_se

    bad = spark.createDataFrame(
        [(0.3, 0.1), (0.2, 0.0)], "est double, se double"
    )
    with pytest.raises(Exception, match="se must be positive"):
        meta_analysis_dl(bad, "est", "se").collect()


def test_ordinal_logistic_recovers_plant_and_binary_reduction(spark):
    """Proportional-odds model: recovers planted cutpoints and slope
    on a 3-level outcome; with 2 levels it collapses to ordinary
    logistic regression (alpha = -beta0, shared slope) against
    glm_logistic on the same rows; partitioning-invariant; level
    guards raise."""
    import hashlib
    import math

    import pytest

    from cancer_survival_etl_spark.operators.stats import (
        glm_logistic,
        ordinal_logistic,
    )

    def uhash(i, salt):
        return (
            int(
                hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16
            )
            % 1000000
        ) / 1000000.0

    # P(Y<=1) = sigma(-1 - 0.8x), P(Y<=2) = sigma(1 - 0.8x)
    rows = []
    for i in range(900):
        x = float(i % 3) / 2.0
        u = uhash(i, "y")
        g1 = 1 / (1 + math.exp(-(-1.0 - 0.8 * x)))
        g2 = 1 / (1 + math.exp(-(1.0 - 0.8 * x)))
        y = 1 if u < g1 else (2 if u < g2 else 3)
        rows.append((x, y))
    df = spark.createDataFrame(rows, "x double, y int")

    levels, alphas, betas, se = ordinal_logistic(
        df, ["x"], "y", return_se=True
    )
    assert levels == [1, 2, 3]
    assert abs(alphas[0] + 1.0) < 0.25
    assert abs(alphas[1] - 1.0) < 0.25
    assert abs(betas[0] - 0.8) < 0.3
    assert alphas[0] < alphas[1]
    assert all(v > 0 for v in se)

    lv2, al2, be2 = ordinal_logistic(
        df.repartition(32), ["x"], "y"
    )
    assert (lv2, al2, be2) == (levels, alphas, betas)

    # binary reduction: P(Y=hi|x) = sigma(x*beta - alpha) == ordinary
    # logistic with beta0 = -alpha
    brows = [(x, 1 if y >= 2 else 0) for x, y in rows]
    bdf = spark.createDataFrame(brows, "x double, yb int")
    _, a_b, b_b = ordinal_logistic(
        bdf, ["x"], "yb"
    )
    blog = glm_logistic(bdf, ["x"], "yb")
    assert abs(a_b[0] + blog[0]) < 1e-6
    assert abs(b_b[0] - blog[1]) < 1e-6

    with pytest.raises(ValueError, match="levels"):
        ordinal_logistic(
            spark.createDataFrame([(0.0, i) for i in range(30)],
                                  "x double, y int"),
            ["x"], "y",
        )
    with pytest.raises(ValueError, match=">= 2"):
        ordinal_logistic(
            spark.createDataFrame([(0.0, 1)] * 5, "x double, y int"),
            ["x"], "y",
        )
    with pytest.raises(ValueError, match="iters"):
        ordinal_logistic(df, ["x"], "y", iters=0)


def test_tmle_ate_debias_and_randomized_reduction(spark):
    """TMLE: under strong confounding the estimate lands near the
    true ATE while the naive mean difference is badly biased; under
    randomization it agrees with the difference in means; the Wald
    CI brackets the estimate; partitioning-invariant; bad g_bounds
    raise."""
    import hashlib
    import math

    import pytest

    from cancer_survival_etl_spark.operators.stats import tmle_ate

    def uhash(i, salt):
        return (
            int(
                hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16
            )
            % 1000000
        ) / 1000000.0

    def sigma(v):
        return 1 / (1 + math.exp(-v))

    # confounded plant: x in {0, 1/3, 2/3, 1};
    # P(A=1|x) = sigma(-1.5 + 3x); P(Y=1|a,x) = sigma(-1 + 0.9a + 1.5x)
    rows = []
    for i in range(4000):
        x = (i % 4) / 3.0
        a_ = 1 if uhash(i, "a") < sigma(-1.5 + 3.0 * x) else 0
        y_ = 1 if uhash(i, "y") < sigma(-1 + 0.9 * a_ + 1.5 * x) else 0
        rows.append((x, a_, y_))
    df = spark.createDataFrame(rows, "x double, a int, y int")
    truth = sum(
        sigma(-1 + 0.9 + 1.5 * x) - sigma(-1 + 1.5 * x)
        for x in (0, 1 / 3, 2 / 3, 1)
    ) / 4

    ate, se, lo, hi, eps = tmle_ate(df, ["x"], "a", "y")
    n1 = sum(1 for _, a_, _ in rows if a_)
    naive = sum(y_ for _, a_, y_ in rows if a_) / n1 - sum(
        y_ for _, a_, y_ in rows if not a_
    ) / (len(rows) - n1)
    assert abs(ate - truth) < 0.04
    assert abs(naive - truth) > abs(ate - truth)
    assert lo < ate < hi and se > 0
    # fluctuation solved the EIF equation: eps near 0 when Q is
    # correctly specified
    assert all(abs(e) < 0.5 for e in eps)

    again = tmle_ate(df.repartition(32), ["x"], "a", "y")
    assert again == (ate, se, lo, hi, eps)

    # randomized plant: g does not depend on x -> TMLE ~ diff in means
    rrows = []
    for i in range(4000):
        x = (i % 4) / 3.0
        a_ = 1 if uhash(i, "ra") < 0.5 else 0
        y_ = 1 if uhash(i, "ry") < sigma(-1 + 0.9 * a_ + 1.5 * x) else 0
        rrows.append((x, a_, y_))
    rdf = spark.createDataFrame(rrows, "x double, a int, y int")
    rate, *_ = tmle_ate(rdf, ["x"], "a", "y")
    rn1 = sum(1 for _, a_, _ in rrows if a_)
    rnaive = sum(y_ for _, a_, y_ in rrows if a_) / rn1 - sum(
        y_ for _, a_, y_ in rrows if not a_
    ) / (len(rrows) - rn1)
    assert abs(rate - rnaive) < 0.02

    with pytest.raises(ValueError, match="g_bounds"):
        tmle_ate(df, ["x"], "a", "y", g_bounds=(0.5, 0.4))


def test_fisher_exact_matches_enumeration(spark):
    """Fisher exact: matches exact math.comb enumeration (point and
    two-sided p with R's point-probability rule) on the tea-tasting
    table and an asymmetric one; invariant to transposing the table;
    repartition-invariant; wide support raises the named guard."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.stats import fisher_exact

    def enum_p(a, b, c, d):
        r1, r2, c1 = a + b, c + d, a + c
        kmin, kmax = max(0, c1 - r2), min(r1, c1)
        pmf = {
            k: math.comb(r1, k) * math.comb(r2, c1 - k)
            for k in range(kmin, kmax + 1)
        }
        tot = sum(pmf.values())
        pa = pmf[a]
        two = sum(v for v in pmf.values() if v <= pa * (1 + 1e-7))
        return pa / tot, two / tot

    def rows_for(grp, a, b, c, d):
        return (
            [(grp, 1, 1)] * a + [(grp, 1, 0)] * b
            + [(grp, 0, 1)] * c + [(grp, 0, 0)] * d
        )

    tables = {"tea": (3, 1, 1, 3), "asym": (12, 5, 3, 18)}
    rows = []
    for gname, (a, b, c, d) in tables.items():
        rows += rows_for(gname, a, b, c, d)
    df = spark.createDataFrame(rows, "grp string, exposed int, cs int")
    got = {
        r.grp: r
        for r in fisher_exact(df, ["grp"], "exposed", "cs").collect()
    }
    for gname, (a, b, c, d) in tables.items():
        pp, p2 = enum_p(a, b, c, d)
        r = got[gname]
        assert (r.a, r.b, r.c, r.d) == (a, b, c, d)
        assert abs(r.p_point - pp) < 1e-6, (gname, r.p_point, pp)
        assert abs(r.p_two_sided - p2) < 1e-6, (gname, r.p_two_sided, p2)
        assert r.odds_ratio == round(a * d / (b * c), 6)
    # the tea-tasting two-sided p is the textbook 0.485714...
    assert abs(got["tea"].p_two_sided - 0.485714285) < 1e-6

    # transpose invariance: swapping the roles of exposure and case
    tdf = spark.createDataFrame(
        [(g, c_, e_) for g, e_, c_ in rows],
        "grp string, exposed int, cs int",
    )
    tgot = {
        r.grp: r
        for r in fisher_exact(tdf, ["grp"], "exposed", "cs").collect()
    }
    for gname in tables:
        assert (
            tgot[gname].p_two_sided == got[gname].p_two_sided
        ), gname

    again = {
        r.grp: r
        for r in fisher_exact(
            df.repartition(32), ["grp"], "exposed", "cs"
        ).collect()
    }
    for gname in tables:
        assert tuple(again[gname]) == tuple(got[gname])

    wide = spark.createDataFrame(
        rows_for("w", 60, 60, 60, 60), "grp string, exposed int, cs int"
    )
    with pytest.raises(Exception, match="max_support"):
        fisher_exact(
            wide, ["grp"], "exposed", "cs", max_support=50
        ).collect()


def test_psm_att_recovers_att_and_caliper(spark):
    """PSM/ATT: on the strongly confounded plant the matched estimate
    lands near the true ATT while the naive contrast is badly biased;
    an exact-score twin always matches (distance 0 when treated and
    control share an x-pattern); a tiny caliper drops matches;
    partitioning-invariant; bad caliper raises."""
    import hashlib
    import math

    import pytest

    from cancer_survival_etl_spark.operators.stats import psm_att

    def uhash(i, salt):
        return (
            int(
                hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16
            )
            % 1000000
        ) / 1000000.0

    def sigma(v):
        return 1 / (1 + math.exp(-v))

    rows = []
    for i in range(4000):
        x = (i % 4) / 3.0
        a_ = 1 if uhash(i, "a") < sigma(-1.5 + 3.0 * x) else 0
        y_ = 1 if uhash(i, "y") < sigma(-1 + 0.9 * a_ + 1.5 * x) else 0
        rows.append((x, a_, y_))
    df = spark.createDataFrame(rows, "x double, a int, y int")
    # ATT truth: effect averaged over the TREATED x-distribution
    pw = [(x, sigma(-1.5 + 3.0 * x)) for x in (0, 1 / 3, 2 / 3, 1)]
    zt = sum(w for _, w in pw)
    truth = sum(
        w * (sigma(-1 + 0.9 + 1.5 * x) - sigma(-1 + 1.5 * x))
        for x, w in pw
    ) / zt

    r = psm_att(df, ["x"], "a", "y").collect()[0]
    n1 = sum(a for _, a, _ in rows)
    naive = sum(y for _, a, y in rows if a) / n1 - sum(
        y for _, a, y in rows if not a
    ) / (len(rows) - n1)
    # discrete x: every treated has an exact-score control twin, so
    # matching is exact-on-x and n_matched == n_treated
    assert r.n_treated == n1 and r.n_matched == n1
    assert abs(r.att - truth) < 0.05
    assert abs(naive - truth) > abs(r.att - truth)
    assert r.ci_lo < r.att < r.ci_hi and r.se_paired > 0

    again = psm_att(df.repartition(32), ["x"], "a", "y").collect()[0]
    assert tuple(again) == tuple(r)

    # matching exact-on-x means the estimate equals the stratified
    # (exact-matching) contrast over treated x-cells
    from collections import defaultdict

    cell = defaultdict(lambda: [0, 0, 0, 0])  # nt, yt, nc, yc
    for x, a_, y_ in rows:
        if a_:
            cell[x][0] += 1
            cell[x][1] += y_
        else:
            cell[x][2] += 1
            cell[x][3] += y_
    strat = (
        sum(
            c[1] - c[0] * round(c[3] * 1e6 / c[2]) / 1e6
            for c in cell.values()
        )
        / n1
    )
    assert abs(r.att - strat) < 1e-6

    tiny = psm_att(df, ["x"], "a", "y", caliper=1e-12).collect()[0]
    assert tiny.n_matched == tiny.n_treated  # exact twins at dist 0

    with pytest.raises(ValueError, match="caliper"):
        psm_att(df, ["x"], "a", "y", caliper=0.0)


def test_multinomial_logistic_plant_and_binary_reduction(spark):
    """Multinomial logit: recovers a planted 3-category softmax;
    with 2 levels it IS ordinary logistic regression (pinned to
    glm_logistic at 1e-6); fitted cell probabilities reproduce the
    empirical mix; partitioning-invariant; level guards raise."""
    import hashlib
    import math

    import pytest

    from cancer_survival_etl_spark.operators.stats import (
        glm_logistic,
        multinomial_logistic,
    )

    def uhash(i, salt):
        return (
            int(
                hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16
            )
            % 1000000
        ) / 1000000.0

    # eta_A = 0.5 - 1.0x, eta_B = -0.5 + 1.5x, baseline C
    rows = []
    for i in range(1500):
        x = (i % 5) / 4.0
        ea, eb = math.exp(0.5 - 1.0 * x), math.exp(-0.5 + 1.5 * x)
        z = 1 + ea + eb
        u = uhash(i, "y")
        y = "A" if u < ea / z else ("B" if u < (ea + eb) / z else "C")
        rows.append((x, y))
    df = spark.createDataFrame(rows, "x double, y string")

    levels, betas, se = multinomial_logistic(
        df, ["x"], "y", return_se=True
    )
    assert levels == ["A", "B", "C"]
    assert abs(betas[0][0] - 0.5) < 0.25 and abs(
        betas[0][1] + 1.0
    ) < 0.35
    assert abs(betas[1][0] + 0.5) < 0.25 and abs(
        betas[1][1] - 1.5
    ) < 0.35
    assert all(v > 0 for row_ in se for v in row_)

    lv2, be2 = multinomial_logistic(df.repartition(32), ["x"], "y")
    assert lv2 == levels and be2 == betas

    # binary reduction: levels {0,1} with baseline 1 ->
    # P(Y=0) = sigma(eta_0), i.e. glm_logistic on the 0-indicator
    brows = [(x, 0 if y == "A" else 1) for x, y in rows]
    bdf = spark.createDataFrame(brows, "x double, yb int")
    _, bb = multinomial_logistic(bdf, ["x"], "yb")
    blog = glm_logistic(
        bdf.select("x", (1 - F.col("yb")).alias("y0")), ["x"], "y0"
    )
    assert abs(bb[0][0] - blog[0]) < 1e-6
    assert abs(bb[0][1] - blog[1]) < 1e-6

    with pytest.raises(ValueError, match="levels"):
        multinomial_logistic(
            spark.createDataFrame(
                [(0.0, i) for i in range(20)], "x double, y int"
            ),
            ["x"], "y",
        )
    with pytest.raises(ValueError, match=">= 2"):
        multinomial_logistic(
            spark.createDataFrame([(0.0, 1)] * 5, "x double, y int"),
            ["x"], "y",
        )


def test_funnel_control_flags_planted_outlier(spark):
    """Funnel plot: a planted bad unit falls outside both limits
    while in-control units stay inside; limits widen as volume
    shrinks; phi clips at 1 for homogeneous data and inflates the
    limits under overdispersion; repartition-invariant."""
    import hashlib

    from cancer_survival_etl_spark.operators.quality import (
        funnel_control,
    )

    def u(i, salt):
        return (
            int(
                hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16
            )
            % 1000000
        ) / 1000000.0

    rows = []
    # 11 in-control units at p=0.2 (varied volumes), one bad at 0.45
    for unit in range(11):
        n = 150 + unit * 60
        for i in range(n):
            rows.append((f"u{unit:02d}", 1 if u(i, unit) < 0.2 else 0))
    for i in range(400):
        rows.append(("bad", 1 if u(i, "bad") < 0.45 else 0))
    df = spark.createDataFrame(rows, "unit string, cs int")
    got = {
        r.unit: r for r in funnel_control(df, ["unit"], "cs").collect()
    }
    assert got["bad"].outside95 and got["bad"].outside998
    ok_units = [f"u{k:02d}" for k in range(11)]
    assert sum(got[k].outside998 for k in ok_units) == 0
    # limits widen with smaller volume
    assert (got["u00"].hi95 - got["u00"].lo95) > (
        got["u10"].hi95 - got["u10"].lo95
    )
    # phi is shared and >= 1
    phis = {round(got[k].phi, 6) for k in got}
    assert len(phis) == 1 and min(phis) >= 1.0

    again = {
        r.unit: r
        for r in funnel_control(
            df.repartition(32), ["unit"], "cs"
        ).collect()
    }
    assert all(tuple(again[k]) == tuple(got[k]) for k in got)

    # homogeneous binomial data: phi clips at exactly 1
    hom = spark.createDataFrame(
        [
            (f"h{unit}", 1 if u(i, f"h{unit}") < 0.3 else 0)
            for unit in range(10)
            for i in range(300)
        ],
        "unit string, cs int",
    )
    hr = funnel_control(hom, ["unit"], "cs").collect()[0]
    assert hr.phi == 1.0

    # degenerate pooled rate (no cases anywhere → p̄ = 0): z, phi and
    # every limit column publish NULL — the km_curve NULL-SE
    # convention — instead of NaN/Inf from a zero-variance division
    # (ADVICE r09); counts and proportions still publish
    deg = spark.createDataFrame(
        [(f"d{unit}", 0) for unit in range(4) for _ in range(50)],
        "unit string, cs int",
    )
    for r in funnel_control(deg, ["unit"], "cs").collect():
        assert r.n == 50 and r.cases == 0 and r.proportion == 0.0
        for c in ("z", "phi", "lo95", "hi95", "lo998", "hi998",
                  "outside95", "outside998"):
            assert r[c] is None, (r.unit, c, r[c])
    # all-cases (p̄ = 1) is the mirrored degenerate
    deg1 = spark.createDataFrame(
        [(f"e{unit}", 1) for unit in range(4) for _ in range(50)],
        "unit string, cs int",
    )
    assert all(
        r.z is None and r.phi is None
        for r in funnel_control(deg1, ["unit"], "cs").collect()
    )


def test_wilcoxon_signed_rank_reference(spark):
    """Signed-rank: matches a pure-Python tie-averaged reference on
    W+ and z; a planted positive shift gives a large positive z while
    a symmetric null stays small; zero differences drop; repartition-
    invariant."""
    import hashlib

    from cancer_survival_etl_spark.operators.stats import (
        wilcoxon_signed_rank,
    )

    def u(i, salt):
        return (
            int(
                hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16
            )
            % 1000
        )

    rows = []
    for i in range(300):
        a = float(u(i, "a") % 50)
        # shifted-up post with ties and some zero diffs
        d = (u(i, "d") % 7) - 2  # in {-2..4}, mean +1
        rows.append((a, a + d))
    df = spark.createDataFrame(rows, "va double, vb double")
    r = wilcoxon_signed_rank(df, "va", "vb").collect()[0]

    # pure-Python reference
    ds = [b - a for a, b in rows if b != a]
    n = len(ds)
    srt = sorted(abs(x) for x in ds)
    ranks = {}
    i = 0
    while i < len(srt):
        j = i
        while j < len(srt) and srt[j] == srt[i]:
            j += 1
        ranks[srt[i]] = (i + 1 + j) / 2
        i = j
    wp = sum(ranks[abs(x)] for x in ds if x > 0)
    from collections import Counter

    tc = Counter(abs(x) for x in ds)
    tie3 = sum(t ** 3 - t for t in tc.values())
    mu = n * (n + 1) / 4
    var = n * (n + 1) * (2 * n + 1) / 24 - tie3 / 48
    z = (wp - mu) / var ** 0.5
    assert r.n_pairs == 300 and r.n_nonzero == n
    assert r.w_plus == round(wp, 6)
    assert r.z_stat == round(z, 6)
    assert r.z_stat > 3  # planted positive shift

    null_rows = [(float(u(i, "n1") % 40), float(u(i, "n2") % 40))
                 for i in range(300)]
    ndf = spark.createDataFrame(null_rows, "va double, vb double")
    rn = wilcoxon_signed_rank(ndf, "va", "vb").collect()[0]
    assert abs(rn.z_stat) < 2.5

    again = wilcoxon_signed_rank(
        df.repartition(32), "va", "vb"
    ).collect()[0]
    assert tuple(again) == tuple(r)


def test_friedman_reference_and_guard(spark):
    """Friedman: matches a pure-Python tie-averaged reference
    (including the tie correction); a planted consistently-better
    treatment yields a large Q while a null panel stays small; the
    one-observation-per-cell guard raises; repartition-invariant."""
    import hashlib

    import pytest

    from cancer_survival_etl_spark.operators.stats import friedman_test

    def u(i, salt):
        return (
            int(
                hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16
            )
            % 100
        )

    rows = []
    k = 4
    for blk in range(60):
        for t in range(k):
            v = float(u(blk * 7 + t, "v") % 20) + (
                5.0 if t == 2 else 0.0
            )
            rows.append((blk, f"t{t}", v))
    df = spark.createDataFrame(rows, "blk int, trt string, v double")
    r = friedman_test(df, "blk", "trt", "v").collect()[0]

    # reference
    from collections import defaultdict

    by_b = defaultdict(list)
    for blk, t, v in rows:
        by_b[blk].append((t, v))
    rsum = defaultdict(float)
    tie3 = 0
    for blk, items in by_b.items():
        vals = sorted(v for _, v in items)
        rk = {}
        i = 0
        while i < len(vals):
            j = i
            while j < len(vals) and vals[j] == vals[i]:
                j += 1
            rk[vals[i]] = (i + 1 + j) / 2
            i = j
        from collections import Counter

        for t_, c in Counter(vals).items():
            tie3 += c ** 3 - c
        for t, v in items:
            rsum[t] += rk[v]
    n = len(by_b)
    q = 12 / (n * k * (k + 1)) * sum(
        v * v for v in rsum.values()
    ) - 3 * n * (k + 1)
    corr = 1 - tie3 / (n * k * (k ** 3 - k))
    assert r.n_blocks == n and r.k_treatments == k and r.df == 3
    assert r.q_stat == round(q, 6)
    assert r.q_stat_tie_corrected == round(q / corr, 6)
    assert r.q_stat_tie_corrected > 16.27  # chi2(3) 0.1% point

    again = friedman_test(
        df.repartition(32), "blk", "trt", "v"
    ).collect()[0]
    assert tuple(again) == tuple(r)

    dup = spark.createDataFrame(
        rows + [(0, "t0", 1.0)], "blk int, trt string, v double"
    )
    with pytest.raises(Exception, match="exactly one value"):
        friedman_test(dup, "blk", "trt", "v").collect()

    # a block MISSING a treatment (no duplicate anywhere) must also
    # raise — within-block ranks would span < k rows while the formula
    # uses the global k (ADVICE r09 completeness guard)
    missing = spark.createDataFrame(
        [t for t in rows if not (t[0] == 0 and t[1] == "t3")],
        "blk int, trt string, v double",
    )
    with pytest.raises(Exception, match="incomplete block design"):
        friedman_test(missing, "blk", "trt", "v").collect()


def test_bayes_ab_beta_exact_formula(spark):
    """Bayesian A/B: matches the lgamma closed form at 1e-6 on
    several planted tables; no-data-A identity P = E[p_B]; swap
    complement P(B>A) = 1 - P(A>B); guards raise; repartition-
    invariant."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.stats import bayes_ab_beta

    def exact(sa, na, sb, nb):
        aa, ba = sa + 1, na - sa + 1
        ab, bb = sb + 1, nb - sb + 1

        def lbeta(x, y):
            return (
                math.lgamma(x) + math.lgamma(y) - math.lgamma(x + y)
            )

        return sum(
            math.exp(
                lbeta(aa + i, ba + bb)
                - math.log(bb + i)
                - lbeta(1 + i, bb)
                - lbeta(aa, ba)
            )
            for i in range(ab)
        )

    def rows_for(grp, sa, na, sb, nb):
        return (
            [(grp, "A", 1)] * sa + [(grp, "A", 0)] * (na - sa)
            + [(grp, "B", 1)] * sb + [(grp, "B", 0)] * (nb - sb)
        )

    tables = {
        "g1": (12, 50, 20, 50),
        "g2": (5, 8, 3, 9),
        "g3": (40, 200, 38, 180),
    }
    rows = []
    for gname, t in tables.items():
        rows += rows_for(gname, *t)
    df = spark.createDataFrame(rows, "grp string, v string, cs int")
    got = {
        r.grp: r
        for r in bayes_ab_beta(df, ["grp"], "v", "cs").collect()
    }
    for gname, (sa, na, sb, nb) in tables.items():
        want = exact(sa, na, sb, nb)
        r = got[gname]
        assert (r.s_a, r.n_a, r.s_b, r.n_b) == (sa, na, sb, nb)
        assert abs(r.prob_b_beats_a - want) < 1e-6, (gname, want)

    # swap complement: relabeling the variants flips the probability
    swapped = spark.createDataFrame(
        [
            ("g1", "A" if v == "B" else "B", c)
            for _, v, c in rows_for("g1", *tables["g1"])
        ],
        "grp string, v string, cs int",
    )
    ps = bayes_ab_beta(swapped, ["grp"], "v", "cs").collect()[0]
    assert abs(ps.prob_b_beats_a + got["g1"].prob_b_beats_a - 1) < 1e-6

    again = {
        r.grp: r
        for r in bayes_ab_beta(
            df.repartition(32), ["grp"], "v", "cs"
        ).collect()
    }
    for gname in tables:
        assert tuple(again[gname]) == tuple(got[gname])

    one = spark.createDataFrame(
        [("g", "A", 1)], "grp string, v string, cs int"
    )
    with pytest.raises(Exception, match="exactly two variants"):
        bayes_ab_beta(one, ["grp"], "v", "cs").collect()
    with pytest.raises(Exception, match="max_terms"):
        bayes_ab_beta(
            df, ["grp"], "v", "cs", max_terms=10
        ).collect()


def test_tost_equivalence(spark):
    """TOST: matches a hand Welch computation; truly-equal variants
    with a generous margin declare equivalence while a real shift
    bigger than the margin does not; a significant-but-tiny shift
    IS equivalent (the case TOST exists for); margin guard raises;
    repartition-invariant."""
    import hashlib
    import math

    import pytest

    from cancer_survival_etl_spark.operators.stats import (
        tost_equivalence,
    )

    def u(i, salt):
        return (
            int(
                hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16
            )
            % 1000
        ) / 1000.0

    # equal means, margin 0.5 -> equivalent
    rows = [("A", 10.0 + u(i, "a")) for i in range(4000)] + [
        ("B", 10.0 + u(i, "b")) for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "v string, m double")
    r = tost_equivalence(df, "v", "m", margin=0.5).collect()[0]
    assert r.equivalent is True
    assert abs(r.mean_diff) < 0.05 and r.t_lower > 0 > r.t_upper

    # hand check of the statistics
    av = [m for v, m in rows if v == "A"]
    bv = [m for v, m in rows if v == "B"]

    def cents_moments(vals):
        # engine _cents uses HALF_UP (F.round); Python round is
        # banker's, so mirror HALF_UP explicitly
        import decimal

        cs = [
            int(
                decimal.Decimal(x * 100).quantize(
                    0, rounding=decimal.ROUND_HALF_UP
                )
            )
            for x in vals
        ]
        n = len(cs)
        s1, s2 = sum(cs), sum(c * c for c in cs)
        mean = s1 / n
        var = (s2 - n * mean * mean) / (n - 1)
        return n, mean, var

    na, ma_, va = cents_moments(av)
    nb, mb_, vb = cents_moments(bv)
    d = (mb_ - ma_) / 100.0
    se = math.sqrt(va / na + vb / nb) / 100.0
    assert r.mean_diff == round(d, 6)
    assert r.se_diff == round(se, 6)
    assert r.t_lower == round((d + 0.5) / se, 6)
    assert r.t_upper == round((d - 0.5) / se, 6)

    # a shift LARGER than the margin is not equivalent
    far = spark.createDataFrame(
        [("A", 10.0 + u(i, "a")) for i in range(4000)]
        + [("B", 11.0 + u(i, "b")) for i in range(4000)],
        "v string, m double",
    )
    rf = tost_equivalence(far, "v", "m", margin=0.5).collect()[0]
    assert rf.equivalent is False

    # a tiny-but-significant shift IS equivalent under a wide margin
    tiny = spark.createDataFrame(
        [("A", 10.0 + u(i, "a")) for i in range(4000)]
        + [("B", 10.03 + u(i, "b")) for i in range(4000)],
        "v string, m double",
    )
    rt = tost_equivalence(tiny, "v", "m", margin=0.5).collect()[0]
    assert rt.equivalent is True and abs(rt.mean_diff) > 0.02

    again = tost_equivalence(
        df.repartition(32), "v", "m", margin=0.5
    ).collect()[0]
    assert tuple(again) == tuple(r)

    with pytest.raises(ValueError, match="margin"):
        tost_equivalence(df, "v", "m", margin=0.0)


def test_qini_coefficient_orderings_and_reference(spark):
    """Qini: matches a pure-Python trapezoid reference on a tied,
    mixed cohort; a perfect uplift ranking scores positive, the
    reversed ranking scores the mirrored negative, and a constant
    score (one giant tie) scores ~0; repartition-invariant."""
    import hashlib

    from cancer_survival_etl_spark.operators.stats import (
        qini_coefficient,
    )

    def u(i, salt):
        return (
            int(
                hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16
            )
            % 1000
        ) / 1000.0

    # true uplift depends on segment s in {0,1,2}: responders only
    # when treated and s=2
    rows = []
    for i in range(3000):
        s = i % 3
        t = 1 if u(i, "t") < 0.5 else 0
        base = 0.1
        lift = 0.4 if s == 2 else 0.0
        p = base + lift * t
        y = 1.0 if u(i, "y") < p else 0.0
        score = float(s)  # ties within segments — the perfect model
        rows.append((score, t, y))
    df = spark.createDataFrame(rows, "score double, t int, y double")
    r = qini_coefficient(df, "score", "t", "y").collect()[0]

    # pure-Python reference on the same tie discipline
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0, 0.0, 0.0])
    for score, t, y in rows:
        c = cells[score]
        c[0] += t
        c[1] += 1 - t
        c[2] += y if t else 0.0
        c[3] += y if not t else 0.0
    n = len(rows)
    cum = [0, 0, 0.0, 0.0]
    prev_u, area = 0.0, 0.0
    for score in sorted(cells, reverse=True):
        nt, nc, yt, yc = cells[score]
        cum = [cum[0] + nt, cum[1] + nc, cum[2] + yt, cum[3] + yc]
        uu = (
            cum[2] - cum[3] * cum[0] / cum[1]
            if cum[1] > 0
            else cum[2]
        )
        area += (prev_u + uu) / 2 * (nt + nc)
        prev_u = uu
    area /= n
    u_tot = prev_u
    assert abs(r.qini_area - area) < 1e-4
    assert abs(r.u_total - u_tot) < 1e-4
    assert abs(r.qini_coefficient - (area - u_tot / 2)) < 1e-4
    assert r.qini_coefficient > 10  # perfect ranking concentrates

    # reversed ranking mirrors the sign
    rev = qini_coefficient(
        df.withColumn("score", -F.col("score")), "score", "t", "y"
    ).collect()[0]
    assert rev.qini_coefficient < -10
    assert abs(
        (r.qini_coefficient - r.qini_random * 0)
        + rev.qini_coefficient
        - (r.u_total - 2 * r.qini_random)
    ) < 1.0  # mirrored around the random line

    # constant score: one tie class, curve is the straight line
    const = qini_coefficient(
        df.withColumn("score", F.lit(1.0)), "score", "t", "y"
    ).collect()[0]
    assert abs(const.qini_coefficient) < 1e-6

    again = qini_coefficient(
        df.repartition(32), "score", "t", "y"
    ).collect()[0]
    assert tuple(again) == tuple(r)


def test_cronbach_alpha_reference_and_structure(spark):
    """Cronbach alpha: matches a pure-Python micro-lattice twin;
    correlated items (shared latent factor) score high while
    independent noise scores near 0; parallel-forms identity
    alpha = k*rbar/(1+(k-1)*rbar) approximately holds; guards raise;
    repartition-invariant."""
    import hashlib

    import pytest

    from cancer_survival_etl_spark.operators.stats import cronbach_alpha

    def u(i, salt):
        return (
            int(
                hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16
            )
            % 1000
        ) / 1000.0

    # shared latent factor + item noise
    rows = []
    for i in range(800):
        f = u(i, "f")
        rows.append(
            tuple(
                round(f + 0.35 * u(i, f"e{j}"), 3) for j in range(4)
            )
        )
    df = spark.createDataFrame(
        rows, "i1 double, i2 double, i3 double, i4 double"
    )
    cols = ["i1", "i2", "i3", "i4"]
    r = cronbach_alpha(df, cols).collect()[0]

    # micro-lattice twin
    ys = [[round(x * 1e6) for x in col] for col in zip(*rows)]
    n, k = len(rows), 4

    def var(v):
        s, q = sum(v), sum(x * x for x in v)
        m = s / n
        return (q - n * m * m) / (n - 1)

    iv = sum(var(v) for v in ys)
    tv = var([sum(t) for t in zip(*ys)])
    alpha = k / (k - 1) * (1 - iv / tv)
    assert r.n == n and r.k == k
    assert r.sum_item_var == round(iv / 1e12, 6)
    assert r.total_var == round(tv / 1e12, 6)
    assert r.alpha == round(alpha, 6)
    assert r.alpha > 0.75

    # Spearman-Brown style identity via the mean inter-item corr
    import statistics

    cors = []
    for a in range(k):
        for b in range(a + 1, k):
            cors.append(
                statistics.correlation(ys[a], ys[b])
            )
    rbar = sum(cors) / len(cors)
    sb = k * rbar / (1 + (k - 1) * rbar)
    assert abs(r.alpha - sb) < 0.05

    # independent noise: alpha near 0
    noise = spark.createDataFrame(
        [
            tuple(u(i, f"n{j}") for j in range(4))
            for i in range(800)
        ],
        "i1 double, i2 double, i3 double, i4 double",
    )
    rn = cronbach_alpha(noise, cols).collect()[0]
    assert abs(rn.alpha) < 0.15

    again = cronbach_alpha(df.repartition(32), cols).collect()[0]
    assert tuple(again) == tuple(r)

    with pytest.raises(ValueError, match=">= 2 item"):
        cronbach_alpha(df, ["i1"])
    with pytest.raises(Exception, match=">= 2 rows"):
        cronbach_alpha(df.limit(1), cols).collect()


def test_mi_rubin_glm_reduction_recovery_and_guards(spark):
    """Multiple imputation with Rubin's rules: (a) with NO missing
    values every imputation is the identity, so the pooled estimates
    are BIT-EQUAL to the single glm fit, riv = 0 and fmi collapses to
    the complete-data 2/(nu+3) limit; (b) with 25% MCAR missingness
    on a planted logistic signal the pooled coefficient keeps the
    planted sign with between-imputation variance > 0 (riv > 0) and
    more missing information on the damaged term than the intercept;
    (c) exact under repartitioning (the md5 draws are a pure function
    of (seed,key,feature,imputation,summand)); (d) named errors for
    bad family, m < 2, NULL outcomes and an all-missing feature."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.stats import (
        glm_logistic,
        mi_rubin_glm,
    )

    rows = []
    for i in range(900):
        x = ((i * 2654435761) % 999983) / 999983.0 * 4.0 - 2.0
        u = ((i * 40503) % 65521) / 65521.0
        sig = 1.0 / (1.0 + math.exp(-(-0.5 + 1.2 * x)))
        miss = ((i * 69069) % 104729) / 104729.0 < 0.25
        rows.append((i, None if miss else round(x, 6), 1 if u < sig else 0))
    df = spark.createDataFrame(rows, "k long, x double, y long")

    # (a) no-missingness reduction: bit-equal to the single fit
    full = df.filter("x is not null")
    red = mi_rubin_glm(full, "k", ["x"], "y", m=3, iters=8).collect()
    beta, se = glm_logistic(full, ["x"], "y", iters=8, return_se=True)
    assert [r["term"] for r in red] == ["intercept", "x"]
    for j, r in enumerate(red):
        assert r["estimate"] == beta[j]
        assert abs(r["se"] - se[j]) < 1e-9
        assert r["riv"] == 0.0

    # (b) recovery under 25% MCAR + (c) partitioning invariance
    out = mi_rubin_glm(df, "k", ["x"], "y", m=5, seed=7, iters=8)
    got = {r["term"]: r for r in out.collect()}
    assert got["x"]["estimate"] > 0.4          # planted +1.2, attenuated
    assert got["intercept"]["estimate"] < 0.0  # planted -0.5
    assert got["x"]["riv"] > 0.0
    assert got["x"]["fmi"] > got["intercept"]["fmi"]
    out2 = mi_rubin_glm(
        df.repartition(32), "k", ["x"], "y", m=5, seed=7, iters=8
    )
    assert [tuple(r) for r in out2.collect()] == [
        tuple(r) for r in out.collect()
    ]

    # (d) named errors
    with pytest.raises(ValueError, match="unknown family"):
        mi_rubin_glm(df, "k", ["x"], "y", family="probit")
    with pytest.raises(ValueError, match="m must be >= 2"):
        mi_rubin_glm(df, "k", ["x"], "y", m=1)
    ynull = spark.createDataFrame(
        [(1, 1.0, None), (2, 2.0, 1)], "k long, x double, y long"
    )
    with pytest.raises(ValueError, match="NULL values in the outcome"):
        mi_rubin_glm(ynull, "k", ["x"], "y")
    allmiss = spark.createDataFrame(
        [(1, None, 1), (2, None, 0)], "k long, x double, y long"
    )
    with pytest.raises(ValueError, match="zero observed values"):
        mi_rubin_glm(allmiss, "k", ["x"], "y")


def test_quantile_regression_recovery_twin_and_guards(spark):
    """quantile_regression: (a) heteroscedastic plant y = 2 + 3x +
    u·(1+2x), u ~ U(−.5,.5) → median recovers (2, 3), τ=0.9 recovers
    (2.4, 3.8), τ=0.1 recovers (1.6, 2.2), with the slope ordering
    q10 < median < q90; (b) a pure-Python MM twin replaying the exact
    micro-lattice per-row rounding reproduces β BIT-EQUAL; (c) exact
    under repartitioning; (d) pseudo-R¹(τ) ∈ (0,1) on signal, NULL on
    constant y; (e) named errors for tau ∉ (0,1), iters < 1, empty."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.stats import (
        quantile_regression,
    )

    rows = []
    for i in range(4000):
        x = ((i * 2654435761) % 999983) / 999983.0 * 4.0
        u = ((i * 69069 + 11) % 104729) / 104729.0 - 0.5
        y = 2.0 + 3.0 * x + u * (1.0 + 2.0 * x)
        rows.append((round(x, 6), round(y, 6)))
    df = spark.createDataFrame(rows, "x double, y double")

    got = {}
    for tau, (b0, b1) in [(0.5, (2.0, 3.0)), (0.9, (2.4, 3.8)),
                          (0.1, (1.6, 2.2))]:
        fit = {r["term"]: r for r in
               quantile_regression(df, ["x"], "y", tau).collect()}
        got[tau] = fit
        assert abs(fit["intercept"]["estimate"] - b0) < 0.25, (tau, fit)
        assert abs(fit["x"]["estimate"] - b1) < 0.25, (tau, fit)
        assert fit["x"]["n_rows"] == 4000
    assert (got[0.1]["x"]["estimate"] < got[0.5]["x"]["estimate"]
            < got[0.9]["x"]["estimate"])
    assert 0.0 < got[0.5]["x"]["pseudo_r2"] < 1.0

    # (b) bit-equal pure-Python MM twin (identical micro lattice)
    def twin(data, tau, iters=15, eps=1e-3):
        n = len(data)
        s0 = sum(int(math.floor(abs(1.0 * 1e6) + 0.5)) for _ in data)
        s1 = sum(
            int(math.copysign(math.floor(abs(x * 1e6) + 0.5), x))
            for x, _ in data
        )
        ys = sorted(v for _, v in data)
        # Spark percentile(): linear interpolation at rank tau*(n-1)
        rk = tau * (n - 1)
        lo, hi = int(math.floor(rk)), int(math.ceil(rk))
        q = ys[lo] + (rk - lo) * (ys[hi] - ys[lo])
        sv = [s0 / 1e6, s1 / 1e6]
        beta = [0.0, 0.0]

        def r6(v):
            t = v * 1e6
            m = math.floor(abs(t) + 0.5)
            return int(m if t >= 0 else -m)

        for _ in range(iters):
            b = [0, 0]
            a = {(0, 0): 0, (0, 1): 0, (1, 1): 0}
            for x, yv in data:
                d = abs(yv - beta[0] - beta[1] * x) + eps
                xsv = [1.0, x]
                for j in range(2):
                    b[j] += r6(xsv[j] * yv / d)
                    for k in range(j, 2):
                        a[(j, k)] += r6(xsv[j] * xsv[k] / d)
            det = a[(0, 0)] / 1e6 * (a[(1, 1)] / 1e6) - (
                a[(0, 1)] / 1e6
            ) ** 2
            rb = [
                b[0] / 1e6 + (2 * tau - 1) * sv[0],
                b[1] / 1e6 + (2 * tau - 1) * sv[1],
            ]
            beta = [
                round(
                    (a[(1, 1)] / 1e6 * rb[0] - a[(0, 1)] / 1e6 * rb[1])
                    / det, 9),
                round(
                    (a[(0, 0)] / 1e6 * rb[1] - a[(0, 1)] / 1e6 * rb[0])
                    / det, 9),
            ]
        return beta, q

    small = rows[:600]
    sdf = spark.createDataFrame(small, "x double, y double")
    tb, _ = twin(small, 0.75)
    fit = {r["term"]: r["estimate"] for r in
           quantile_regression(sdf, ["x"], "y", 0.75).collect()}
    assert fit["intercept"] == tb[0] and fit["x"] == tb[1], (fit, tb)

    # (c) partitioning invariance on the full frame
    a = quantile_regression(df, ["x"], "y", 0.75).collect()
    b = quantile_regression(
        df.repartition(32), ["x"], "y", 0.75
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]

    # (d) constant y → NULL pseudo-R
    const = spark.createDataFrame(
        [(float(i % 7), 5.0) for i in range(40)], "x double, y double"
    )
    cf = quantile_regression(const, ["x"], "y", 0.5).collect()
    assert all(r["pseudo_r2"] is None for r in cf)

    # (e) guards
    with pytest.raises(ValueError, match="tau must be in"):
        quantile_regression(df, ["x"], "y", 1.0)
    with pytest.raises(ValueError, match="iters must be >= 1"):
        quantile_regression(df, ["x"], "y", 0.5, iters=0)
    with pytest.raises(ValueError, match="empty input"):
        quantile_regression(df.limit(0), ["x"], "y", 0.5)


def test_cochran_q_closed_form_k2_mcnemar_and_guards(spark):
    from cancer_survival_etl_spark.operators.stats import cochran_q

    # 3 care pathways judged on 8 blocks (complete binary panel)
    vals = {
        1: (1, 1, 0), 2: (1, 1, 1), 3: (0, 1, 0), 4: (1, 0, 0),
        5: (1, 1, 1), 6: (0, 1, 0), 7: (1, 1, 0), 8: (0, 1, 0),
    }
    rows = [
        (b, t, v)
        for b, tv in vals.items()
        for t, v in zip(("x", "y", "z"), tv)
    ]
    df = spark.createDataFrame(rows, "b long, t string, v long")
    got = cochran_q(df, "b", "t", "v").collect()[0]
    # closed form from the exact margins
    cj = [sum(tv[i] for tv in vals.values()) for i in range(3)]
    ri = [sum(tv) for tv in vals.values()]
    nn = sum(cj)
    k = 3
    num = k * (k - 1) * (sum(c * c for c in cj) - nn * nn / k)
    den = k * nn - sum(r * r for r in ri)
    assert got["n_blocks"] == 8
    assert got["k_treatments"] == 3
    assert got["n_success"] == nn
    assert got["df"] == 2
    assert got["q_stat"] == round(num / den, 6)

    # k = 2: Q is McNemar's chi-square WITHOUT continuity correction,
    # (b − c)² / (b + c) over the discordant cells
    pairs = [(1, 0)] * 6 + [(0, 1)] * 2 + [(1, 1)] * 5 + [(0, 0)] * 3
    df2 = spark.createDataFrame(
        [
            (i, t, v)
            for i, pv in enumerate(pairs)
            for t, v in zip(("f", "s"), pv)
        ],
        "b long, t string, v long",
    )
    got2 = cochran_q(df2, "b", "t", "v").collect()[0]
    assert got2["q_stat"] == pytest.approx((6 - 2) ** 2 / (6 + 2), abs=1e-6)

    # no discordance anywhere -> denominator 0 -> NULL statistic
    dfc = spark.createDataFrame(
        [(b, t, 1) for b in range(4) for t in ("x", "y")],
        "b long, t string, v long",
    )
    assert cochran_q(dfc, "b", "t", "v").collect()[0]["q_stat"] is None

    # guards: duplicate cell, incomplete block, non-binary value
    dup = spark.createDataFrame(
        [(1, "x", 1), (1, "x", 0), (1, "y", 1)],
        "b long, t string, v long",
    )
    with pytest.raises(Exception, match="exactly one value"):
        cochran_q(dup, "b", "t", "v").collect()
    inc = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 0), (2, "x", 1)],
        "b long, t string, v long",
    )
    with pytest.raises(Exception, match="incomplete block"):
        cochran_q(inc, "b", "t", "v").collect()
    bad = spark.createDataFrame(
        [(1, "x", 2), (1, "y", 0)], "b long, t string, v long"
    )
    with pytest.raises(Exception, match="must be 0 or 1"):
        cochran_q(bad, "b", "t", "v").collect()


def test_e_value_rr_closed_form_and_edges(spark):
    import math

    from cancer_survival_etl_spark.operators.stats import e_value_rr

    def ev(x):
        xs = 1 / x if x < 1 else x
        return xs + math.sqrt(xs * (xs - 1))

    # planted 2x2: a=30 b=70 c=10 d=90 -> RR = 3.0
    rows = (
        [(1, 1)] * 30 + [(1, 0)] * 70 + [(0, 1)] * 10 + [(0, 0)] * 90
    )
    df = spark.createDataFrame(rows, "e long, o long")
    got = e_value_rr(df, "e", "o").collect()[0]
    assert (
        got["n_exposed_outcome"],
        got["n_exposed_clear"],
        got["n_unexposed_outcome"],
        got["n_unexposed_clear"],
    ) == (30, 70, 10, 90)
    rr = (30 / 100) / (10 / 100)
    se = math.sqrt(1 / 30 - 1 / 100 + 1 / 10 - 1 / 100)
    lo = math.exp(math.log(rr) - 1.96 * se)
    assert got["rr"] == pytest.approx(rr, abs=1e-6)
    assert got["e_value"] == pytest.approx(ev(rr), abs=1e-6)
    # CI excludes 1 here -> E-value of the lower bound
    assert lo > 1
    assert got["e_value_ci"] == pytest.approx(ev(lo), abs=1e-6)

    # CI crossing 1 -> e_value_ci pinned to exactly 1.0
    rows2 = [(1, 1)] * 11 + [(1, 0)] * 89 + [(0, 1)] * 10 + [(0, 0)] * 90
    got2 = e_value_rr(
        spark.createDataFrame(rows2, "e long, o long"), "e", "o"
    ).collect()[0]
    assert got2["rr_lower"] < 1 < got2["rr_upper"]
    assert got2["e_value_ci"] == 1.0

    # protective exposure (RR < 1): transform flips through 1/RR and
    # the CI side closer to the null is the UPPER bound
    rows3 = [(1, 1)] * 10 + [(1, 0)] * 90 + [(0, 1)] * 30 + [(0, 0)] * 70
    got3 = e_value_rr(
        spark.createDataFrame(rows3, "e long, o long"), "e", "o"
    ).collect()[0]
    rr3 = (10 / 100) / (30 / 100)
    hi3 = math.exp(
        math.log(rr3)
        + 1.96 * math.sqrt(1 / 10 - 1 / 100 + 1 / 30 - 1 / 100)
    )
    assert got3["e_value"] == pytest.approx(ev(rr3), abs=1e-6)
    assert got3["e_value_ci"] == pytest.approx(ev(hi3), abs=1e-6)

    # degenerate margin: no outcomes among the unexposed -> counts
    # publish, effect columns NULL
    rows4 = [(1, 1)] * 5 + [(1, 0)] * 5 + [(0, 0)] * 10
    got4 = e_value_rr(
        spark.createDataFrame(rows4, "e long, o long"), "e", "o"
    ).collect()[0]
    assert got4["n_unexposed_outcome"] == 0
    assert got4["rr"] is None and got4["e_value"] is None

    bad = spark.createDataFrame([(2, 1)], "e long, o long")
    with pytest.raises(Exception, match="must be 0 or 1"):
        e_value_rr(bad, "e", "o").collect()
