"""Survival-analysis family (operators/survival.py): Kaplan-Meier /
Greenwood / Nelson-Aalen against a sequential pure-Python reference,
the log-rank test against its textbook hand computation, and the
DSR's exact-weighting contract."""

import math

import pytest
from pyspark.sql import functions as F

from cancer_survival_etl_spark.operators.survival import (
    age_standardized_rates,
    km_curve,
    logrank_test,
)

# Freireich 6-MP trial, treatment arm (the classic KM teaching set):
# remission lengths in weeks; + = censored.
SIX_MP = [
    (6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1), (10, 0),
    (11, 0), (13, 1), (16, 1), (17, 0), (19, 0), (20, 0), (22, 1),
    (23, 1), (25, 0), (32, 0), (32, 0), (34, 0), (35, 0),
]
PLACEBO = [
    (1, 1), (1, 1), (2, 1), (2, 1), (3, 1), (4, 1), (4, 1), (5, 1),
    (5, 1), (8, 1), (8, 1), (8, 1), (8, 1), (11, 1), (11, 1), (12, 1),
    (12, 1), (15, 1), (17, 1), (22, 1), (23, 1),
]


def km_reference(subjects):
    """Sequential KM/Greenwood/Nelson-Aalen over (duration, event)
    pairs, replicating the module's micro-lattice arithmetic."""
    from collections import Counter

    d_at = Counter(t for t, e in subjects if e)
    c_at = Counter(t for t, e in subjects if not e)
    times = sorted(set(d_at) | set(c_at))
    n = len(subjects)
    lt = na = gw = 0
    dead_all = False
    out = {}
    for t in times:
        d, c = d_at.get(t, 0), c_at.get(t, 0)
        if 0 < d < n:
            lt += round(math.log(1.0 - d / n) * 1e6)
            gw += round(d / (n * (n - d)) * 1e12)
        if d > 0:
            na += round(d / n * 1e6)
        if d > 0 and d == n:
            dead_all = True
        surv = 0.0 if dead_all else round(math.exp(lt / 1e6), 6)
        se = (
            None
            if dead_all
            else round(math.exp(lt / 1e6) * math.sqrt(gw / 1e12), 6)
        )
        out[t] = (n, d, c, surv, round(na / 1e6, 6), se)
        n -= d + c
    return out


def test_km_curve_matches_sequential_reference(spark):
    df = spark.createDataFrame(
        [("6mp", t, e) for t, e in SIX_MP]
        + [("plac", t, e) for t, e in PLACEBO],
        "cohort string, duration long, event int",
    )
    got = {
        (r.cohort, r.duration): (
            r.n_risk, r.n_event, r.n_censored,
            r.survival, r.cum_hazard, r.se_greenwood,
        )
        for r in km_curve(df, ["cohort"]).collect()
    }
    want = {
        **{("6mp", t): v for t, v in km_reference(SIX_MP).items()},
        **{("plac", t): v for t, v in km_reference(PLACEBO).items()},
    }
    assert got == want
    # spot-check the canonical published values for the 6-MP arm
    assert got[("6mp", 6)][3] == pytest.approx(0.857143, abs=1e-6)
    assert got[("6mp", 10)][3] == pytest.approx(0.753, abs=1e-3)
    assert got[("6mp", 23)][3] == pytest.approx(0.448, abs=1e-3)
    # placebo arm has no censoring: S(23) = 0 exactly, SE NULL there
    assert got[("plac", 23)][3] == 0.0
    assert got[("plac", 23)][5] is None
    # but survival is positive and SE defined just before
    assert got[("plac", 22)][3] > 0 and got[("plac", 22)][5] is not None


def test_logrank_matches_hand_computation(spark):
    df = spark.createDataFrame(
        [("6mp", t, e) for t, e in SIX_MP]
        + [("plac", t, e) for t, e in PLACEBO],
        "cohort string, duration long, event int",
    )
    r = logrank_test(df, "cohort").collect()[0]
    # sequential replication of the module's lattice arithmetic
    from collections import Counter

    d1_at = Counter(t for t, e in SIX_MP if e)
    d_at = Counter(t for t, e in SIX_MP + PLACEBO if e)
    rm1_at = Counter(t for t, _ in SIX_MP)
    rm_at = Counter(t for t, _ in SIX_MP + PLACEBO)
    n1, n = len(SIX_MP), len(SIX_MP) + len(PLACEBO)
    o1 = se = sv = 0
    for t in sorted(rm_at):
        d, d1 = d_at.get(t, 0), d1_at.get(t, 0)
        if d > 0:
            p1 = n1 / n
            se += round(d * p1 * 1e6)
            if n > 1:
                sv += round(d * p1 * (1.0 - p1) * (n - d) / (n - 1) * 1e6)
            o1 += d1
        n1 -= rm1_at.get(t, 0)
        n -= rm_at.get(t, 0)
    assert (r.observed_1, r.expected_1, r.variance) == (
        o1, round(se / 1e6, 6), round(sv / 1e6, 6),
    )
    oe, v = o1 - se / 1e6, sv / 1e6
    assert r.chi_square == round(oe * oe / v, 6)
    assert r.log_hazard_ratio == round(oe / v, 6)
    # the published result for this trial: chi2 ≈ 16.8, 6-MP protective
    assert 15.0 < r.chi_square < 18.0
    assert r.log_hazard_ratio < 0
    with pytest.raises(ValueError):
        logrank_test(df.withColumn("cohort", F.lit("only")), "cohort")


def test_age_standardized_rates_exact(spark):
    df = spark.createDataFrame(
        [(0, 2, 100), (0, 0, 100), (1, 5, 50), (1, 5, 150), (2, 1, 100)],
        "band long, cases long, t long",
    )
    rows = {
        r.band: r
        for r in age_standardized_rates(
            df, "band", "cases", "t", {0: 60, 1: 40}
        ).collect()
    }
    assert rows[0].rate_per_1000 == pytest.approx(10.0)
    assert rows[1].rate_per_1000 == pytest.approx(50.0)
    assert rows[2].std_weight == 0  # band absent from weights
    # DSR = (60*10 + 40*50 + 0*5) / 100 = 26.0, identical on all rows
    assert {r.dsr_per_1000 for r in rows.values()} == {26.0}
    with pytest.raises(ValueError):
        age_standardized_rates(df, "band", "cases", "t", {0: 1.5})


def test_survival_at_horizons_loglog_ci(spark):
    from cancer_survival_etl_spark.operators.survival import (
        survival_at_horizons,
    )

    df = spark.createDataFrame(
        [("6mp", t, e) for t, e in SIX_MP],
        "cohort string, duration long, event int",
    )
    km = km_curve(df, ["cohort"])
    out = {
        r.period: r
        for r in survival_at_horizons(
            km, ["cohort"], {"w10": 10, "w25": 25, "pre": 5}
        ).collect()
    }
    assert set(out) == {"w10", "w25", "pre"}
    # before the first event time: S = 100%, SE = 0, CI undefined
    pre = out["pre"]
    assert (pre.survival_percent, pre.standard_error) == (100.0, 0.0)
    assert pre.lower_ci is None and pre.upper_ci is None
    assert pre.patient_numbers == len(SIX_MP)
    # at w10 the curve's last cell <= 10 is t=10; replicate the CI
    ref = km_reference(SIX_MP)
    last = max(t for t in ref if t <= 10)
    _, _, _, s, _, se = ref[last]
    assert out["w10"].survival_percent == round(s * 100, 6)
    se_theta = se / (s * abs(math.log(s)))
    assert out["w10"].lower_ci == pytest.approx(
        round(s ** math.exp(1.96 * se_theta) * 100, 6), abs=1e-9
    )
    assert out["w10"].upper_ci == pytest.approx(
        round(s ** math.exp(-1.96 * se_theta) * 100, 6), abs=1e-9
    )
    assert out["w10"].lower_ci < out["w10"].survival_percent
    assert out["w10"].upper_ci > out["w10"].survival_percent
    # published 6-MP S(10) ≈ 75.3% (63.3% .. 90.0%-ish band)
    assert 50 < out["w10"].lower_ci < out["w25"].upper_ci <= 100


def test_km_all_die_at_first_time(spark):
    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 1)], "cohort string, duration long, event int"
    )
    r = km_curve(df, ["cohort"]).collect()[0]
    assert (r.n_risk, r.n_event, r.survival) == (2, 2, 0.0)
    assert r.se_greenwood is None
