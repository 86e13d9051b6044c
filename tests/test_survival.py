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


def _cox_reference(X, dur, ev, iters):
    """Sequential Newton-Raphson on the Breslow partial likelihood —
    the textbook per-event-time loop the distributed operator must
    reproduce (to the nano-lattice)."""
    import numpy as np

    p = X.shape[1]
    b = np.zeros(p)
    times = sorted({t for t, e in zip(dur, ev) if e})
    dur = np.asarray(dur)
    ev = np.asarray(ev)
    for _ in range(iters):
        r = np.exp(X @ b)
        g = np.zeros(p)
        info = np.zeros((p, p))
        for tt in times:
            risk = dur >= tt
            dead = (dur == tt) & (ev == 1)
            d = dead.sum()
            s0 = r[risk].sum()
            s1 = (r[risk, None] * X[risk]).sum(axis=0)
            s2 = (
                r[risk, None, None] * X[risk, :, None] * X[risk, None, :]
            ).sum(axis=0)
            g += X[dead].sum(axis=0) - d * s1 / s0
            info += d * (s2 / s0 - np.outer(s1 / s0, s1 / s0))
        b = b + np.linalg.solve(info, g)
    return b


def test_cox_ph_matches_sequential_reference(spark):
    """Distributed Cox (Breslow ties) vs the sequential reference on a
    deterministic hash-planted cohort with heavy duration ties."""
    import numpy as np

    from cancer_survival_etl_spark.operators.survival import cox_ph

    rows = []
    for i in range(240):
        h = (i * 2654435761) % 2**32
        x1 = (i % 12) / 12.0
        x2 = ((i * 7) % 10) / 10.0
        u = (h % 100000) / 100000.0 + 1e-6
        t = -math.log(u) / math.exp(1.2 * x1 - 0.5 * x2)
        dur = round(min(t, 1.5), 1)  # 1dp → real tie mass
        rows.append((x1, x2, dur, int(t <= 1.5)))
    df = spark.createDataFrame(
        rows, "x1 double, x2 double, duration double, event int"
    )
    got = cox_ph(df, ["x1", "x2"], iters=6)
    X = np.array([[r[0], r[1]] for r in rows])
    ref = _cox_reference(
        X, [r[2] for r in rows], [r[3] for r in rows], iters=6
    )
    assert got == pytest.approx(list(ref), abs=1e-6)
    # the hazard signs planted are recovered
    assert got[0] > 0.5 and got[1] < 0.0


def test_cox_ph_partitioning_independent(spark):
    """β must be BIT-identical at 1 vs 32 partitions — every
    distributed sum is an exact long sum of per-row nano-roundings."""
    from cancer_survival_etl_spark.operators.survival import cox_ph

    rows = []
    for i in range(150):
        x = (i % 15) / 15.0
        u = ((i * 2654435761) % 99991) / 99991.0 + 1e-6
        t = -math.log(u) / math.exp(1.0 * x)
        rows.append((x, round(min(t, 2.0), 1), int(t <= 2.0)))
    df = spark.createDataFrame(rows, "x1 double, duration double, event int")
    b1 = cox_ph(df.repartition(1), ["x1"], iters=5)
    b32 = cox_ph(df.repartition(32), ["x1"], iters=5)
    assert b1 == b32


def _aj_reference(rows, causes):
    """Sequential Aalen-Johansen CIF: per event time, S(t-) * d_k/n
    accumulated — the textbook loop the distributed operator must
    reproduce (to the micro-lattice)."""
    times = sorted({d for d, _ in rows})
    n_total = len(rows)
    out = {}  # time -> (n_risk, {k: d_k}, S_incl, {k: cif})
    s = 1.0
    cif = dict.fromkeys(causes, 0.0)
    removed = 0
    for t in times:
        at = [c for d, c in rows if d == t]
        n = n_total - removed
        d_all = sum(1 for c in at if c > 0)
        for k in causes:
            dk = sum(1 for c in at if c == k)
            if dk:
                cif[k] += s * dk / n
        s = 0.0 if d_all == n else s * (1 - d_all / n)
        removed += len(at)
        out[t] = (n, {k: sum(1 for c in at if c == k) for k in causes},
                  s, dict(cif))
    return out


def test_cif_matches_sequential_reference(spark):
    """Distributed AJ vs the sequential loop on a tie-heavy planted
    cohort with two competing causes and interleaved censoring."""
    from cancer_survival_etl_spark.operators.survival import (
        cif_competing_risks,
    )

    rows = []
    for i in range(90):
        d = (i * 7) % 12 + 1
        c = [0, 1, 2, 1, 2, 1][(i * 5) % 6]
        rows.append(("A", d, c))
    df = spark.createDataFrame(rows, "cohort string, duration long, cause int")
    got = {
        (r.duration, r.cause): r
        for r in cif_competing_risks(df, ["cohort"], [1, 2]).collect()
    }
    ref = _aj_reference([(d, c) for _, d, c in rows], [1, 2])
    assert len(got) == len(ref) * 2
    for t, (n, dk, s, cif) in ref.items():
        for k in (1, 2):
            r = got[(t, k)]
            assert r.n_risk == n and r.n_event == dk[k]
            assert r.survival_allcause == pytest.approx(s, abs=2e-6)
            assert r.cif == pytest.approx(cif[k], abs=2e-6)


def test_cif_plus_survival_is_one_without_censoring(spark):
    """With no censoring, sum_k CIF_k(t) + S(t) = 1 at every event
    time — the identity 1-KM-per-cause breaks and AJ preserves."""
    from cancer_survival_etl_spark.operators.survival import (
        cif_competing_risks,
    )

    rows = [("A", (i % 7) + 1, 1 + (i % 2)) for i in range(60)]
    df = spark.createDataFrame(rows, "cohort string, duration long, cause int")
    wide = (
        cif_competing_risks(df, ["cohort"], [1, 2])
        .groupBy("duration", "survival_allcause")
        .agg(F.sum("cif").alias("cif_sum"))
        .collect()
    )
    assert len(wide) == 7
    for r in wide:
        assert r.cif_sum + r.survival_allcause == pytest.approx(1.0, abs=5e-6)


def _ederer2_reference(rows, hz_micro, horizon):
    """Sequential Ederer II: per hour, at-risk-weighted band hazard
    mean accumulated into expected survival; observed KM stepped at
    event times. rows = (band, duration, event)."""
    sstar, out = 1.0, {}
    # observed KM on the same integer grid
    s_obs, removed = 1.0, 0
    n_total = len(rows)
    km_at = {}
    for t in sorted({d for _, d, _ in rows}):
        at = [(b, d, e) for b, d, e in rows if d == t]
        n = n_total - removed
        d_ev = sum(e for _, _, e in at)
        if d_ev:
            s_obs *= 1 - d_ev / n
        removed += len(at)
        km_at[t] = s_obs
    for h in range(1, horizon + 1):
        nb = {}
        for b, d, _ in rows:
            if d >= h:
                nb[b] = nb.get(b, 0) + 1
        n = sum(nb.values())
        if n:
            lam = sum(c * hz_micro[b] for b, c in nb.items()) / 1e6 / n
            sstar *= 1 - lam
        obs = 1.0
        for t, s in km_at.items():
            if t <= h:
                obs = s
        out[h] = (n, obs, sstar)
    return out


def test_relative_survival_ederer2_matches_reference(spark):
    from cancer_survival_etl_spark.operators.survival import (
        relative_survival_ederer2,
    )

    hz = {0: 2000, 1: 5000, 2: 9000}  # per-hour hazards in 1e-6 units
    rows = []
    for i in range(120):
        band = i % 3
        d = (i * 11) % 9 + (i % 2)  # durations 0..9, tie-heavy
        e = 1 if (i * 7) % 3 == 0 else 0
        rows.append(("A", band, d, e))
    df = spark.createDataFrame(
        rows, "cohort string, band int, duration long, event int"
    )
    got = {
        r.hour: r
        for r in relative_survival_ederer2(
            df, ["cohort"], "band", hz, horizon=9
        ).collect()
    }
    ref = _ederer2_reference([(b, d, e) for _, b, d, e in rows], hz, 9)
    assert len(got) == 9
    for h, (n, obs, sstar) in ref.items():
        r = got[h]
        assert r.n_risk == n
        assert r.survival_observed == pytest.approx(obs, abs=2e-6)
        assert r.survival_expected == pytest.approx(sstar, abs=2e-6)
        assert r.relative_survival == pytest.approx(
            obs / sstar, abs=5e-6
        )


def test_life_table_source_validation_and_ederer2_parity(spark, tmp_path):
    """The external life-table source (sources/lifetable.py, VERDICT
    r07 item 7): (a) rate→micro-hazard conversion; (b) the DataFrame
    life-table form of relative_survival_ederer2 is BIT-EQUAL to the
    dict form with the same hazards; (c) the parquet loader
    round-trips through validation; (d) named errors for duplicate
    band keys, non-integral hazards, NULL keys, and — the join
    contract — a cohort band missing from the table."""
    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        relative_survival_ederer2,
    )
    from cancer_survival_etl_spark.sources.lifetable import (
        life_table_from_rates,
        load_life_table,
        validate_life_table,
    )

    hz = {0: 2000, 1: 5000, 2: 9000}
    rows = []
    for i in range(120):
        band = i % 3
        d = (i * 11) % 9 + (i % 2)
        e = 1 if (i * 7) % 3 == 0 else 0
        rows.append(("A", band, d, e))
    df = spark.createDataFrame(
        rows, "cohort string, band int, duration long, event int"
    )
    # (a) published rates per 100k -> the same micro-hazards
    rates = spark.createDataFrame(
        [(b, v / 10.0) for b, v in hz.items()],
        "band int, rate_per_100k double",
    )
    lt = life_table_from_rates(rates, ["band"], "rate_per_100k")
    assert {r.band: r.hazard_micro for r in lt.collect()} == hz
    # (b) frame form == dict form, bit-equal
    via_dict = relative_survival_ederer2(
        df, ["cohort"], "band", hz, horizon=9
    ).collect()
    via_lt = relative_survival_ederer2(
        df, ["cohort"], "band", lt, horizon=9
    ).collect()
    key = lambda r: (r.cohort, r.hour)  # noqa: E731
    dd = {key(r): r for r in via_dict}
    for r in via_lt:
        w = dd[key(r)]
        assert (r.survival_expected, r.relative_survival,
                r.survival_observed, r.n_risk) == (
            w.survival_expected, w.relative_survival,
            w.survival_observed, w.n_risk)
    # (b2) ederer1 + hakulinen share the dual contract (dict == frame)
    from cancer_survival_etl_spark.operators.survival import (
        relative_survival_ederer1,
        relative_survival_hakulinen,
    )

    e1d = relative_survival_ederer1(
        df, ["cohort"], "band", hz, horizon=9
    ).collect()
    e1f = relative_survival_ederer1(
        df, ["cohort"], "band", lt, horizon=9
    ).collect()
    assert {key(r): r.relative_survival for r in e1f} == {
        key(r): r.relative_survival for r in e1d
    }
    dfp_pot = df.withColumn("potential", F.lit(9).cast("long"))
    hkd = relative_survival_hakulinen(
        dfp_pot, ["cohort"], "band", hz, horizon=9
    ).collect()
    hkf = relative_survival_hakulinen(
        dfp_pot, ["cohort"], "band", lt, horizon=9
    ).collect()
    assert {key(r): r.relative_survival for r in hkf} == {
        key(r): r.relative_survival for r in hkd
    }
    # (c) parquet loader round-trip
    p = str(tmp_path / "lifetable.parquet")
    lt.write.parquet(p)
    lt2 = load_life_table(spark, p, ["band"])
    assert {r.band: r.hazard_micro for r in lt2.collect()} == hz
    # (d) named validation errors
    with pytest.raises(ValueError, match="duplicate band key"):
        validate_life_table(
            spark.createDataFrame(
                [(0, 100), (0, 200)], "band int, hazard_micro long"
            ),
            ["band"],
        )
    with pytest.raises(Exception, match="integral micro-hazard"):
        validate_life_table(
            spark.createDataFrame(
                [(0, 100.5)], "band int, hazard_micro double"
            ),
            ["band"],
        ).collect()
    with pytest.raises(Exception, match="NULL band key"):
        validate_life_table(
            spark.createDataFrame(
                [(None, 100)], "band int, hazard_micro long"
            ),
            ["band"],
        ).collect()
    # join contract: band 2 removed -> named error, not silent zero
    lt_missing = lt.filter(F.col("band") != 2)
    with pytest.raises(Exception, match="no life-table row"):
        relative_survival_ederer2(
            df, ["cohort"], "band", lt_missing, horizon=9
        ).collect()


def test_relative_survival_closed_form_no_events(spark):
    """One band, hazard λ, nobody dies or leaves before the horizon:
    S* = (1−λ)^h exactly on the lattice and R = 1/S*."""
    from cancer_survival_etl_spark.operators.survival import (
        relative_survival_ederer2,
    )

    df = spark.createDataFrame(
        [("A", 0, 6, 0)] * 40, "cohort string, band int, duration long, event int"
    )
    got = relative_survival_ederer2(
        df, ["cohort"], "band", {0: 10000}, horizon=6
    ).collect()
    for r in got:
        assert r.survival_observed == 1.0
        assert r.survival_expected == pytest.approx(
            (1 - 0.01) ** r.hour, abs=2e-6
        )
    with pytest.raises(ValueError):
        relative_survival_ederer2(df, ["cohort"], "band", {0: 0.5}, 6)


def _pp_reference(rows, hz_micro, horizon):
    """Sequential Pohar Perme on the discrete hour grid.
    rows = (band, duration, event)."""
    out, cum = {}, 0.0
    for h in range(1, horizon + 1):
        num1 = num2 = den = 0.0
        n = 0
        for b, d, e in rows:
            lam = hz_micro[b] / 1e6
            w = (1 - lam) ** (-h)
            if d >= h:
                n += 1
                den += w
                num2 += w * lam
            if d == h and e == 1:
                num1 += w
        if den > 0:
            cum += (num1 - num2) / den
        out[h] = (n, cum)
    return out


def test_pohar_perme_matches_sequential_reference(spark):
    from cancer_survival_etl_spark.operators.survival import (
        net_survival_pohar_perme,
    )

    hz = {0: 3000, 1: 8000}
    rows = []
    for i in range(100):
        band = i % 2
        d = (i * 13) % 8 + 1
        e = 1 if (i * 3) % 4 == 0 else 0
        rows.append(("A", band, d, e))
    df = spark.createDataFrame(
        rows, "cohort string, band int, duration long, event int"
    )
    got = {
        r.hour: r
        for r in net_survival_pohar_perme(
            df, ["cohort"], "band", hz, horizon=8
        ).collect()
    }
    ref = _pp_reference([(b, d, e) for _, b, d, e in rows], hz, 8)
    assert len(got) == 8
    for h, (n, cum) in ref.items():
        r = got[h]
        assert r.n_risk == n
        assert r.excess_cum_hazard == pytest.approx(cum, abs=5e-6)
        assert r.net_survival_pp == pytest.approx(
            math.exp(-cum), abs=5e-6
        )


def test_pohar_perme_zero_hazard_reduces_to_nelson_aalen(spark):
    """With a zero life table the PP weights are 1 and the excess
    hazard is exactly the all-cause Nelson-Aalen increment, so
    S_PP = exp(-NA cumulative hazard) from km_curve."""
    from cancer_survival_etl_spark.operators.survival import (
        km_curve,
        net_survival_pohar_perme,
    )

    rows = [("A", 0, (i * 11) % 6 + 1, 1 if i % 3 == 0 else 0)
            for i in range(80)]
    df = spark.createDataFrame(
        rows, "cohort string, band int, duration long, event int"
    )
    pp = {
        r.hour: r.net_survival_pp
        for r in net_survival_pohar_perme(
            df, ["cohort"], "band", {0: 0}, horizon=6
        ).collect()
    }
    na = {
        r.duration: r.cum_hazard
        for r in km_curve(df, ["cohort"]).collect()
    }
    cum = 0.0
    for h in range(1, 7):
        cum = na.get(h, cum)
        assert pp[h] == pytest.approx(math.exp(-cum), abs=5e-6)


def test_conditional_survival_ratio_and_edges(spark):
    from cancer_survival_etl_spark.operators.survival import (
        conditional_survival,
        km_curve,
    )

    rows = [("A", d, e) for d, e in SIX_MP]
    # cohort where everyone dies at t=2: S(s)=0 from s=2 → NULL CS
    rows += [("B", 2, 1), ("B", 2, 1)]
    df = spark.createDataFrame(rows, "cohort string, duration long, event int")
    km = km_curve(df, ["cohort"])
    s_at = {}
    for r in km.collect():
        s_at.setdefault(r.cohort, []).append((r.duration, r.survival))

    def s_read(c, p):
        best = 1.0
        for d, s in sorted(s_at[c]):
            if d <= p:
                best = s
        return best

    got = conditional_survival(
        km, ["cohort"], [(1, 6), (6, 16), (10, 35), (2, 3)]
    ).collect()
    assert len(got) == 8  # 4 pairs × 2 cohorts
    for r in got:
        ss, st = s_read(r.cohort, r.since), s_read(r.cohort, r.until)
        assert r.survival_at_since == pytest.approx(ss, abs=1e-9)
        assert r.survival_at_until == pytest.approx(st, abs=1e-9)
        if ss > 0:
            assert r.conditional_survival == pytest.approx(
                round(st / ss, 6), abs=1e-9
            )
        else:
            assert r.conditional_survival is None
    # cohort B conditioned at s=2 (S=0) yields NULL
    b = [r for r in got if r.cohort == "B" and r.since == 2][0]
    assert b.conditional_survival is None
    # before the first cell S=1: cohort B at since=1
    b1 = [r for r in got if r.cohort == "B" and r.since == 1][0]
    assert b1.survival_at_since == 1.0


def test_standardized_net_survival_weighted_mix(spark):
    """S_std = weighted mean of per-class PP curves on the micro
    lattice; verified against composing the two public operators by
    hand, plus the integer-weight contract."""
    from cancer_survival_etl_spark.operators.survival import (
        net_survival_pohar_perme,
        standardized_net_survival,
    )

    hz = {0: 2000, 1: 6000}
    rows = []
    for i in range(120):
        band = i % 2
        cls = i % 3
        d = (i * 7) % 6 + 1
        e = 1 if (i * 5) % 3 == 0 else 0
        rows.append(("A", cls, band, d, e))
    df = spark.createDataFrame(
        rows, "cohort string, agegrp int, band int, duration long, event int"
    )
    weights = {0: 30000, 1: 45000, 2: 25000}
    got = {
        r.hour: r
        for r in standardized_net_survival(
            df, ["cohort"], "agegrp", weights, "band", hz, horizon=6
        ).collect()
    }
    per = net_survival_pohar_perme(
        df, ["cohort", "agegrp"], "band", hz, horizon=6
    ).collect()
    by_hour = {}
    for r in per:
        by_hour.setdefault(r.hour, []).append(
            (weights[r.agegrp], round(r.net_survival_pp * 1e6), r.n_risk)
        )
    assert len(got) == 6
    for h, parts in by_hour.items():
        wsum = sum(w for w, _, _ in parts)
        expect = round(
            sum(w * s for w, s, _ in parts) / wsum / 1e6, 6
        )
        assert got[h].net_survival_std == pytest.approx(expect, abs=1e-9)
        assert got[h].n_risk == sum(n for _, _, n in parts)
    with pytest.raises(ValueError):
        standardized_net_survival(
            df, ["cohort"], "agegrp", {0: 0.5}, "band", hz, 6
        )


def test_actuarial_life_table_hand_computation(spark):
    """Actuarial estimator on the 6-MP arm in 10-week intervals vs the
    textbook n' = n - c/2 computation."""
    from cancer_survival_etl_spark.operators.survival import (
        actuarial_life_table,
    )

    df = spark.createDataFrame(
        [("A", d, e) for d, e in SIX_MP],
        "cohort string, duration long, event int",
    )
    got = {
        r.interval_start: r
        for r in actuarial_life_table(
            df, ["cohort"], interval_width=10, horizon=40
        ).collect()
    }
    # sequential reference
    n = len(SIX_MP)
    s = 1.0
    ref = {}
    for iv in range(5):
        at = [(d, e) for d, e in SIX_MP
              if min(d // 10, 4) == iv]
        dth = sum(e for _, e in at)
        cen = len(at) - dth
        neff = n - cen / 2.0
        if dth > 0 and dth < neff:
            s *= 1 - dth / neff
        elif dth > 0:
            s = 0.0
        ref[iv * 10] = (n, dth, cen, neff, s)
        n -= len(at)
    for start, (ne, dth, cen, neff, s) in ref.items():
        if start not in got:
            assert dth == 0 and cen == 0
            continue
        r = got[start]
        assert (r.n_enter, r.n_event, r.n_censored) == (ne, dth, cen)
        assert r.effective_risk == pytest.approx(round(neff, 2))
        assert r.survival == pytest.approx(s, abs=2e-6)


def test_excess_hazard_regression_recovers_planted_beta(spark):
    """Person-time cells match a sequential split exactly; the
    Estève/Dickman Poisson fit recovers the planted excess log-hazard
    ratio and the flat baseline."""
    from cancer_survival_etl_spark.operators.survival import (
        excess_hazard_fit,
        person_time_cells,
    )

    N, H, w, J = 3000, 48, 8, 6
    lam_micro = {0: 3000, 1: 7000}
    rows = []
    for i in range(N):
        band = i % 2
        lam_b = lam_micro[band] / 1e6
        x = (i // 2) % 2
        exc = math.exp(-5.0 + 0.8 * x)
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        t = -math.log(u) / (lam_b + exc)
        d = int(min(t, H))
        e = 1 if t < H else 0
        rows.append((x, band, d, e))
    df = spark.createDataFrame(
        rows, "x int, band int, duration long, event int"
    )
    cells = person_time_cells(df, "x", "band", lam_micro, w, H)
    # sequential reference cells
    ref = {}
    for x, band, d, e in rows:
        for j in range(J):
            y = max(min(min(d + 1, H) - j * w, w), 0)
            dh = 1 if (e == 1 and d // w == j) else 0
            c = ref.setdefault((x, j), [0, 0, 0])
            c[0] += dh
            c[1] += y
            c[2] += lam_micro[band] * y
    got = {(r.x, r.interval): (r.n_events, r.person_time,
                               r.expected_micro)
           for r in cells.collect()}
    assert got == {k: tuple(v) for k, v in ref.items()}
    alphas, beta = excess_hazard_fit(cells, n_intervals=J)
    assert abs(beta - 0.8) < 0.15
    assert all(abs(a + 5.0) < 0.3 for a in alphas)
    # partitioning independence of the whole pipeline
    cells32 = person_time_cells(
        df.repartition(32), "x", "band", lam_micro, w, H
    )
    assert excess_hazard_fit(cells32, J) == (alphas, beta)


def test_median_survival_and_rate_ratio(spark):
    from cancer_survival_etl_spark.operators.survival import (
        km_curve,
        median_survival,
        rate_ratio_test,
    )

    # placebo arm crosses 0.5 at t=8 (S=0.381); 6-MP arm never does
    rows = [("mp", d, e) for d, e in SIX_MP] + [
        ("pl", d, e) for d, e in PLACEBO
    ]
    df = spark.createDataFrame(rows, "cohort string, duration long, event int")
    km = km_curve(df, ["cohort"])
    med = {r.cohort: r for r in median_survival(km, ["cohort"]).collect()}
    assert med["pl"].median_reached and med["pl"].median_time == 8
    assert med["pl"].survival_at_median == pytest.approx(0.380952, abs=1e-6)
    # the published 6-MP median: 23 weeks (S first ≤ 0.5 there, 0.448)
    assert med["mp"].median_reached and med["mp"].median_time == 23
    assert med["mp"].survival_at_median == pytest.approx(0.448, abs=1e-3)
    assert med["mp"].n_subjects == 21
    # heavy censoring: median never reached -> NULLs
    cen = spark.createDataFrame(
        [("c", 5, 1)] + [("c", 9, 0)] * 9,
        "cohort string, duration long, event int",
    )
    mc = median_survival(km_curve(cen, ["cohort"]), ["cohort"]).collect()[0]
    assert not mc.median_reached and mc.median_time is None

    # rate ratio on planted person-time: A 10 cases/100h, B 5/200h
    pt = spark.createDataFrame(
        [("A", 10, 100), ("B", 5, 200)], "g string, cases long, t long"
    )
    r = rate_ratio_test(pt, "g", "cases", "t").collect()[0]
    rr = (10 / 100) / (5 / 200)
    se = math.sqrt(1 / 10 + 1 / 5)
    assert r.rate_ratio == pytest.approx(rr, abs=1e-6)
    assert r.z_stat == pytest.approx(round(math.log(rr) / se, 6), abs=1e-9)
    assert r.rr_lower95 == pytest.approx(rr * math.exp(-1.96 * se), abs=1e-5)
    # zero-event group -> NULL stats, exact counts still emitted
    z = spark.createDataFrame(
        [("A", 0, 100), ("B", 5, 200)], "g string, cases long, t long"
    )
    rz = rate_ratio_test(z, "g", "cases", "t").collect()[0]
    assert rz.rate_ratio is None and rz.cases_1 == 0


def test_rmst_matches_step_integration(spark):
    """RMST vs direct step integration of the sequential KM curve on
    both trial arms, plus the no-deaths identity rmst = tau."""
    from cancer_survival_etl_spark.operators.survival import rmst

    rows = [("mp", d, e) for d, e in SIX_MP] + [
        ("pl", d, e) for d, e in PLACEBO
    ]
    df = spark.createDataFrame(rows, "cohort string, duration long, event int")
    tau = 20
    got = {r.cohort: r for r in rmst(df, ["cohort"], tau).collect()}

    def ref_rmst(arm):
        # sequential KM with 6-dp rounding (the operator's lattice)
        times = sorted({d for d, _ in arm})
        n, s, removed = len(arm), 1.0, 0
        steps = []  # (time, S after)
        for t in times:
            at = [(d, e) for d, e in arm if d == t]
            dth = sum(e for _, e in at)
            nr = n - removed
            if dth:
                s = round(s * (1 - dth / nr), 6)
            removed += len(at)
            steps.append((t, s))
        area, prev_t, prev_s = 0.0, 0, 1.0
        for t, s in steps:
            if t > tau:
                break
            area += prev_s * (t - prev_t)
            prev_t, prev_s = t, s
        area += prev_s * (tau - prev_t)
        return area, prev_s

    for arm_name, arm in (("mp", SIX_MP), ("pl", PLACEBO)):
        area, s_tau = ref_rmst(arm)
        r = got[arm_name]
        assert r.survival_at_tau == pytest.approx(s_tau, abs=2e-6)
        assert r.rmst == pytest.approx(area, abs=5e-5), arm_name
    # censoring-only cohort: S==1 throughout, rmst == tau exactly
    cen = spark.createDataFrame(
        [("c", 9, 0)] * 8, "cohort string, duration long, event int"
    )
    rc = rmst(cen, ["cohort"], 15).collect()[0]
    assert rc.rmst == 15.0 and rc.survival_at_tau == 1.0


def test_survival_difference_ci_and_nnt(spark):
    from cancer_survival_etl_spark.operators.survival import (
        km_curve,
        survival_difference,
    )

    rows = [("mp", d, e) for d, e in SIX_MP] + [
        ("pl", d, e) for d, e in PLACEBO
    ]
    df = spark.createDataFrame(rows, "cohort string, duration long, event int")
    km = km_curve(df, ["cohort"])
    got = {r.horizon: r
           for r in survival_difference(km, "cohort", [5, 10, 23]).collect()}
    ref = {c: km_reference(arm) for c, arm in
           (("mp", SIX_MP), ("pl", PLACEBO))}

    def at(c, h):
        cells = [t for t in ref[c] if t <= h]
        if not cells:
            return 1.0, 0.0
        _, _, _, s, _, se = ref[c][max(cells)]
        return s, se

    for h in (5, 10, 23):
        s1, e1 = at("mp", h)
        s2, e2 = at("pl", h)
        r = got[h]
        assert (r.group_1, r.group_2) == ("mp", "pl")
        assert r.s_1 == pytest.approx(s1) and r.s_2 == pytest.approx(s2)
        assert r.diff == pytest.approx(round(s1 - s2, 6))
        if e1 is not None and e2 is not None:
            se = math.sqrt(e1 * e1 + e2 * e2)
            assert r.diff_lower95 == pytest.approx(
                round(s1 - s2 - 1.96 * se, 6), abs=1e-9)
            assert r.nnt == pytest.approx(round(1 / abs(s1 - s2), 6))
    # placebo S(23)=0 -> its Greenwood SE is NULL -> CI/NNT NULL
    assert got[23].diff_lower95 is None and got[23].nnt is None
    with pytest.raises(ValueError):
        survival_difference(
            km_curve(df.withColumn("cohort", F.lit("x")), ["cohort"]),
            "cohort", [5],
        )


def test_flexible_excess_hazard_recovers_planted_weibull(spark):
    """Royston-Parmar-style RCS-on-log-time excess model: a planted
    Weibull excess hazard ln lam_E = a + (k-1)*ln t + beta*x is exactly
    log-linear in log time, so the spline fit must recover the slope
    and covariate effect with ~zero cubic curvature, and the predicted
    log-hazard curve must track truth at every cell midpoint."""
    from cancer_survival_etl_spark.operators.survival import (
        flexible_excess_hazard_fit,
        person_time_cells,
        rcs_basis,
    )
    import numpy as np

    N, H, w, J = 4000, 48, 4, 12
    k_shape, a0, beta_true = 1.5, -6.0, 0.8
    c = math.exp(a0) / k_shape  # H_E(t) = c * t^k * e^(beta x)
    lam_micro = {0: 3000, 1: 7000}
    rows = []
    for i in range(N):
        band = i % 2
        x = (i // 2) % 2
        u1 = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        u2 = ((i * 40503 + 7) % 999979) / 999979.0 + 1e-9
        t_bg = -math.log(u1) / (lam_micro[band] / 1e6)
        t_exc = (-math.log(u2) / (c * math.exp(beta_true * x))) ** (
            1.0 / k_shape
        )
        t = min(t_bg, t_exc)
        rows.append((x, band, int(min(t, H)), 1 if t < H else 0))
    df = spark.createDataFrame(
        rows, "x int, band int, duration long, event int"
    )
    cells = person_time_cells(df, "x", "band", lam_micro, w, H)
    gammas, beta = flexible_excess_hazard_fit(cells, J, w)
    assert abs(beta - beta_true) < 0.15
    # predicted log-hazard at the cell midpoints vs planted truth
    u = np.log((np.arange(J) + 0.5) * w)
    lo, hi = float(np.log(0.5 * w)), float(np.log((J - 0.5) * w))
    B = rcs_basis(u, [lo, (lo + hi) / 2.0, hi])
    pred = gammas[0] + B @ np.asarray(gammas[1:])
    # ln lam_E(t) = ln(c·k) + (k−1)·ln t = a0 + (k−1)·u
    truth = a0 + (k_shape - 1.0) * u
    assert float(np.max(np.abs(pred - truth))) < 0.2
    # slope (linear RCS coefficient) recovers k-1; cubic term ~ 0
    assert abs(gammas[1] - (k_shape - 1.0)) < 0.15
    assert abs(gammas[2]) < 0.1
    # bit-identical under repartitioning (driver fit on sorted cells)
    cells32 = person_time_cells(
        df.repartition(32), "x", "band", lam_micro, w, H
    )
    assert flexible_excess_hazard_fit(cells32, J, w) == (gammas, beta)


def test_km_left_truncated_hand_computation_and_reduction(spark):
    """Delayed-entry KM: (a) hand-computed risk sets on a small
    left-truncated cohort (Klein & Moeschberger-style bone-marrow toy:
    subjects enter at different ages); (b) with all entries at 0 the
    estimator reduces BIT-EXACTLY to km_curve; (c) zero-length rows
    are dropped."""
    from cancer_survival_etl_spark.operators.survival import (
        km_curve,
        km_curve_left_truncated,
    )

    # (entry, exit, event): risk set at t = {entry < t <= exit}
    rows = [
        ("g", 0, 4, 1),
        ("g", 0, 6, 0),
        ("g", 2, 5, 1),
        ("g", 3, 5, 1),
        ("g", 5, 9, 1),
        ("g", 4, 9, 0),
        ("g", 7, 7, 1),   # zero-length: dropped
    ]
    df = spark.createDataFrame(
        rows, "cohort string, entry long, duration long, event int"
    )
    got = {
        r.duration: r
        for r in km_curve_left_truncated(
            df, ["cohort"], "entry", "duration", "event"
        ).collect()
    }
    # sequential reference
    subs = [r for r in rows if r[1] < r[2]]
    times = sorted({r[2] for r in subs})
    s = 1.0
    for t in times:
        at_risk = sum(1 for _, e, x, _ev in subs if e < t <= x)
        d = sum(1 for _, e, x, ev in subs if x == t and ev == 1)
        c = sum(1 for _, e, x, ev in subs if x == t and ev == 0)
        if d:
            s *= 1.0 - d / at_risk
        row = got[t]
        assert row.n_risk == at_risk, (t, row.n_risk, at_risk)
        assert row.n_event == d and row.n_censored == c
    # survival monotone, within lattice tolerance of the reference
    assert got[9].survival == pytest.approx(s, abs=1e-4)
    # (b) all-zero entries reduce to the plain estimator
    plain_in = df.filter("entry < duration").select(
        "cohort", "duration", "event"
    )
    zero_entry = plain_in.withColumn("entry", F.lit(0).cast("long"))
    a = km_curve(plain_in, ["cohort"], "duration", "event").collect()
    b = km_curve_left_truncated(
        zero_entry, ["cohort"], "entry", "duration", "event"
    ).collect()
    key = lambda r: (r.cohort, r.duration)  # noqa: E731
    assert sorted(map(tuple, a), key=lambda x: x[:2]) == sorted(
        map(tuple, b), key=lambda x: x[:2]
    )


def _efron_reference(X, dur, ev, iters):
    """Plain-float sequential Efron NR (no lattice) — the textbook
    per-event-time loop with the l/d-shrunk denominators."""
    import numpy as np

    X = np.asarray(X, float)
    dur = np.asarray(dur)
    ev = np.asarray(ev)
    p = X.shape[1]
    beta = np.zeros(p)
    times = np.unique(dur[ev == 1])
    for _ in range(iters):
        g = np.zeros(p)
        info = np.zeros((p, p))
        r = np.exp(X @ beta)
        for t in times:
            risk = dur >= t
            tied = (dur == t) & (ev == 1)
            d = int(tied.sum())
            s = X[tied].sum(axis=0)
            S0 = r[risk].sum()
            S1 = (r[risk, None] * X[risk]).sum(axis=0)
            S2 = (r[risk, None, None] * X[risk][:, :, None]
                  * X[risk][:, None, :]).sum(axis=0)
            D0 = r[tied].sum()
            D1 = (r[tied, None] * X[tied]).sum(axis=0)
            D2 = (r[tied, None, None] * X[tied][:, :, None]
                  * X[tied][:, None, :]).sum(axis=0)
            for l in range(d):
                f = l / d
                s0l = S0 - f * D0
                s1l = S1 - f * D1
                s2l = S2 - f * D2
                g += s / d - s1l / s0l
                info += s2l / s0l - np.outer(s1l / s0l, s1l / s0l)
        beta = beta + np.linalg.solve(info, g)
        beta = np.round(beta, 9)
    return beta


def test_cox_ph_efron_ties(spark):
    """Efron tie handling: equals Breslow exactly when no durations
    tie; on tied data matches the textbook sequential Efron NR and
    differs from Breslow; bit-identical under repartitioning."""
    import numpy as np

    from cancer_survival_etl_spark.operators.survival import cox_ph

    # tied cohort: durations rounded to few values
    rows = []
    for i in range(120):
        x1 = (i % 4) / 3.0
        x2 = ((i * 7) % 5) / 4.0
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        t = -math.log(u) / math.exp(1.0 * x1 - 0.6 * x2)
        d = round(min(t, 2.0), 0)  # heavy ties
        rows.append((x1, x2, float(d), 1 if t <= 2.0 else 0))
    df = spark.createDataFrame(
        rows, "x1 double, x2 double, duration double, event int"
    )
    b_efron = cox_ph(df, ["x1", "x2"], iters=6, ties="efron")
    b_bres = cox_ph(df, ["x1", "x2"], iters=6)
    assert b_efron != b_bres  # ties present -> corrections differ
    X = [[r[0], r[1]] for r in rows]
    ref = _efron_reference(
        X, [r[2] for r in rows], [r[3] for r in rows], iters=6
    )
    assert np.allclose(b_efron, ref, atol=1e-5), (b_efron, ref)
    # partitioning independence
    assert cox_ph(
        df.repartition(32), ["x1", "x2"], iters=6, ties="efron"
    ) == b_efron
    # no ties -> efron == breslow exactly
    rows2 = [(r[0], r[1], r[2] + i * 1e-3, r[3])
             for i, r in enumerate(rows)]
    df2 = spark.createDataFrame(
        rows2, "x1 double, x2 double, duration double, event int"
    )
    assert cox_ph(df2, ["x1", "x2"], iters=4, ties="efron") == cox_ph(
        df2, ["x1", "x2"], iters=4
    )
    with pytest.raises(ValueError):
        cox_ph(df, ["x1"], ties="exact")


def test_stratified_logrank_pools_strata(spark):
    """Stratified log-rank: per-stratum O/E/V must equal the plain
    test run on each stratum alone; the pooled chi2 must use
    (sum O-E)^2 / sum V; a single all-in-one stratum reduces to the
    unstratified test."""
    from cancer_survival_etl_spark.operators.survival import (
        logrank_test,
        stratified_logrank_test,
    )

    rows = (
        [("s1", "6mp", t, e) for t, e in SIX_MP]
        + [("s1", "plac", t, e) for t, e in PLACEBO]
        + [("s2", "6mp", t + 1, e) for t, e in PLACEBO]
        + [("s2", "plac", t, e) for t, e in SIX_MP]
    )
    df = spark.createDataFrame(
        rows, "stratum string, cohort string, duration long, event int"
    )
    got = {
        r.stratum: r
        for r in stratified_logrank_test(
            df, ["stratum"], "cohort"
        ).collect()
    }
    oes, vs = [], []
    for st in ("s1", "s2"):
        solo = logrank_test(
            df.filter(F.col("stratum") == st), "cohort"
        ).collect()[0]
        r = got[st]
        assert (r.observed_1, r.expected_1, r.variance) == (
            solo.observed_1, solo.expected_1, solo.variance,
        )
        oes.append(r.observed_1 - r.expected_1)
        vs.append(r.variance)
    oe, v = sum(oes), sum(vs)
    assert got["s1"].chi_square == got["s2"].chi_square
    assert got["s1"].chi_square == pytest.approx(
        round(oe * oe / v, 6), abs=2e-6
    )
    # one stratum == plain logrank
    one = stratified_logrank_test(
        df.filter(F.col("stratum") == "s1"), ["stratum"], "cohort"
    ).collect()[0]
    plain = logrank_test(
        df.filter(F.col("stratum") == "s1"), "cohort"
    ).collect()[0]
    assert one.chi_square == plain.chi_square
    assert one.log_hazard_ratio == plain.log_hazard_ratio
    with pytest.raises(ValueError):
        stratified_logrank_test(
            df.withColumn("cohort", F.lit("x")), ["stratum"], "cohort"
        )


def test_cox_ph_stratified(spark):
    """Stratified Cox: the stratified partial likelihood is a plain
    sum of per-stratum terms, so (a) fitting two IDENTICAL strata
    (one time-shifted so risk sets can't mix) gives exactly the
    single-stratum beta - integer lattice sums double, the NR path is
    unchanged; (b) an UNSTRATIFIED fit of the same union differs
    (risk sets corrupt); (c) bit-identical under repartitioning."""
    from cancer_survival_etl_spark.operators.survival import cox_ph

    rows = []
    for i in range(150):
        x1 = (i % 4) / 3.0
        x2 = ((i * 7) % 5) / 4.0
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        t = -math.log(u) / math.exp(1.0 * x1 - 0.6 * x2)
        rows.append((x1, x2, round(min(t, 2.0), 1), 1 if t <= 2.0 else 0))
    base = spark.createDataFrame(
        rows, "x1 double, x2 double, duration double, event int"
    )
    b_solo = cox_ph(base, ["x1", "x2"], iters=5)
    shifted = base.withColumn("duration", F.col("duration") + 1000.0)
    union = (
        base.withColumn("stratum", F.lit("a"))
        .unionByName(shifted.withColumn("stratum", F.lit("b")))
    )
    b_strat = cox_ph(
        union, ["x1", "x2"], iters=5, strata_cols=["stratum"]
    )
    assert b_strat == b_solo
    b_unstrat = cox_ph(union, ["x1", "x2"], iters=5)
    assert b_unstrat != b_solo
    assert cox_ph(
        union.repartition(32), ["x1", "x2"], iters=5,
        strata_cols=["stratum"],
    ) == b_strat
    # efron + strata compose
    b_se = cox_ph(
        union, ["x1", "x2"], iters=5, ties="efron",
        strata_cols=["stratum"],
    )
    assert b_se == cox_ph(base, ["x1", "x2"], iters=5, ties="efron")


def test_cox_ph_diagnostics_schoenfeld(spark):
    """PH diagnostic: on a genuinely proportional plant the residual
    trend is null (|z| small); on crossing hazards (different Weibull
    shapes per arm) the same machinery flags a strong trend. Exact
    under repartitioning."""
    from cancer_survival_etl_spark.operators.survival import (
        cox_ph,
        cox_ph_diagnostics,
    )

    # proportional: shared shape, rate ratio e^1
    prop = []
    for i in range(800):
        x = i % 2
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        t = -math.log(u) / math.exp(1.0 * x)
        prop.append((float(x), round(min(t, 3.0), 1), 1 if t <= 3.0 else 0))
    dfp = spark.createDataFrame(
        prop, "x double, duration double, event int"
    )
    bp = cox_ph(dfp, ["x"], iters=5)
    zp = cox_ph_diagnostics(dfp, ["x"], bp).collect()[0]
    assert abs(zp.z_stat) < 2.5, zp
    # crossing hazards: k=0.6 vs k=2.2 Weibull shapes
    cross = []
    for i in range(800):
        x = i % 2
        u = ((i * 40503 + 11) % 999979) / 999979.0 + 1e-9
        k = 0.6 if x == 0 else 2.2
        t = (-math.log(u)) ** (1.0 / k)
        cross.append((float(x), round(min(t, 3.0), 1), 1 if t <= 3.0 else 0))
    dfc = spark.createDataFrame(
        cross, "x double, duration double, event int"
    )
    bc = cox_ph(dfc, ["x"], iters=5)
    zc = cox_ph_diagnostics(dfc, ["x"], bc).collect()[0]
    assert abs(zc.z_stat) > 4.0, zc
    # deterministic under repartitioning
    zc32 = cox_ph_diagnostics(dfc.repartition(32), ["x"], bc).collect()[0]
    assert (zc.rho, zc.z_stat) == (zc32.rho, zc32.z_stat)
    with pytest.raises(ValueError):
        cox_ph_diagnostics(dfc, ["x"], [0.1, 0.2])


def _fine_gray_reference(X, dur, cause, iters):
    """Plain-float sequential Fine-Gray NR with the module's weight
    convention: G = censoring KM with micro-lattice log terms, left
    limits; w_i(t) = G(t-)/G(T_i-) for competing subjects with
    T_i < t; Breslow ties."""
    import numpy as np

    X = np.asarray(X, float)
    dur = np.asarray(dur, float)
    cause = np.asarray(cause)
    n, p = X.shape
    times = np.unique(dur)
    # censoring KM left-limits, micro lattice like the operator
    lng_left = {}
    acc = 0
    for t in times:
        lng_left[t] = acc
        n_at = int((dur >= t).sum())
        c = int(((dur == t) & (cause == 0)).sum())
        if 0 < c < n_at:
            acc += round(math.log(1.0 - c / n_at) * 1e6)
    G_left = {t: math.exp(v / 1e6) for t, v in lng_left.items()}
    beta = np.zeros(p)
    ev_times = np.unique(dur[cause == 1])
    for _ in range(iters):
        r = np.exp(X @ beta)
        g = np.zeros(p)
        info = np.zeros((p, p))
        for t in ev_times:
            tied = (dur == t) & (cause == 1)
            d = int(tied.sum())
            s = X[tied].sum(axis=0)
            alive = dur >= t
            cmp_in = (cause == 2) & (dur < t)
            w = np.zeros(n)
            w[alive] = 1.0
            w[cmp_in] = G_left[t] / np.array(
                [G_left[ti] for ti in dur[cmp_in]]
            )
            rw = r * w
            S0 = rw.sum()
            S1 = (rw[:, None] * X).sum(axis=0)
            S2 = (rw[:, None, None] * X[:, :, None]
                  * X[:, None, :]).sum(axis=0)
            g += s - d * S1 / S0
            info += d * (S2 / S0 - np.outer(S1 / S0, S1 / S0))
        beta = np.round(beta + np.linalg.solve(info, g), 9)
    return beta


def test_fine_gray_reduction_reference_and_recovery(spark):
    """Fine-Gray: (a) with no competing events it equals cox_ph
    exactly; (b) on competing-risks data with random censoring it
    matches the sequential textbook NR (same weight convention) to
    1e-4; (c) recovers a planted subdistribution log-HR sign/order;
    (d) bit-identical under repartitioning."""
    import numpy as np

    from cancer_survival_etl_spark.operators.survival import (
        cox_ph,
        fine_gray,
    )

    # --- competing-risks cohort with the Fine-Gray simulation ---
    p_mix, b_true = 0.55, 0.9
    rows = []
    for i in range(700):
        x = i % 2
        eta = math.exp(b_true * x)
        u1 = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        u2 = ((i * 40503 + 13) % 999979) / 999979.0 + 1e-9
        u3 = ((i * 69069 + 5) % 999961) / 999961.0
        p1 = 1.0 - (1.0 - p_mix) ** eta
        if u1 < p1:
            inner = (1.0 - (1.0 - u1) ** (1.0 / eta)) / p_mix
            t = -math.log(1.0 - inner)
            c = 1
        else:
            t = -math.log(u2)
            c = 2
        # random censoring ~30%
        if u3 < 0.3:
            t, c = t * u3 / 0.3, 0
        rows.append((float(x), round(min(t, 3.0), 1),
                     c if t <= 3.0 else 0))
    df = spark.createDataFrame(
        rows, "x double, duration double, cause int"
    )
    got = fine_gray(df, ["x"], iters=5)
    ref = _fine_gray_reference(
        [[r[0]] for r in rows], [r[1] for r in rows],
        [r[2] for r in rows], iters=5,
    )
    assert np.allclose(got, ref, atol=1e-4), (got, ref)
    assert got[0] > 0.4  # planted positive subdistribution effect
    assert fine_gray(df.repartition(32), ["x"], iters=5) == got
    # --- no competing events -> exactly cox_ph ---
    two = df.filter(F.col("cause") != 2)
    assert fine_gray(two, ["x"], iters=4) == cox_ph(
        two.withColumnRenamed("cause", "event"), ["x"], iters=4
    )


def test_ederer1_closed_form_and_vs_ederer2(spark):
    """Ederer I: expected survival is the at-diagnosis band mix's
    closed form (1/N)Σ n_b (1−λ_b)^h — hand-checkable; with a single
    band it equals Ederer II exactly (no mix to re-weight); with a
    mixed cohort whose high-hazard band dies out, Ederer I's expected
    is LOWER than Ederer II's late (the survivors' mix is healthier),
    so R_I ≥ R_II."""
    from cancer_survival_etl_spark.operators.survival import (
        relative_survival_ederer1,
        relative_survival_ederer2,
    )

    lam = {0: 2000, 1: 60000}  # per-hour micro hazards, 30x apart
    rows = []
    for i in range(400):
        band = i % 2
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        t = -math.log(u) / ((lam[band] / 1e6) * (2.0 if band else 1.0))
        d = int(min(t, 24))
        rows.append(("g", band, d, 1 if t < 24 else 0))
    df = spark.createDataFrame(
        rows, "cohort string, band long, duration long, event int"
    )
    e1 = {
        r.hour: r
        for r in relative_survival_ederer1(
            df, ["cohort"], "band", lam, 24
        ).collect()
    }
    e2 = {
        r.hour: r
        for r in relative_survival_ederer2(
            df, ["cohort"], "band", lam, 24
        ).collect()
    }
    # closed form at h: (n0 (1-.002)^h + n1 (1-.06)^h) / N
    n0 = sum(1 for r in rows if r[1] == 0)
    n1 = len(rows) - n0
    for h in (1, 6, 24):
        want = (n0 * (1 - 0.002) ** h + n1 * (1 - 0.06) ** h) / (n0 + n1)
        assert e1[h].survival_expected == pytest.approx(
            round(want, 6), abs=1e-6
        )
        assert e1[h].survival_observed == e2[h].survival_observed
    # survivors' mix is healthier -> E2 expected >= E1 expected late
    assert e2[24].survival_expected > e1[24].survival_expected
    assert e1[24].relative_survival > e2[24].relative_survival
    # single band: identical estimators
    one = df.filter(F.col("band") == 0)
    o1 = {r.hour: r.relative_survival for r in
          relative_survival_ederer1(one, ["cohort"], "band", lam, 24)
          .collect()}
    o2 = {r.hour: r.relative_survival for r in
          relative_survival_ederer2(one, ["cohort"], "band", lam, 24)
          .collect()}
    for h in o1:
        assert o1[h] == pytest.approx(o2[h], abs=2e-6), h
    with pytest.raises(ValueError):
        relative_survival_ederer1(df, ["cohort"], "band", {0: 1.5}, 24)


def test_cox_baseline_hazard_breslow(spark):
    """Breslow baseline: at beta=0 the increments live on the same
    micro lattice as km_curve's Nelson-Aalen, so cum_hazard matches
    bit-exactly; at a fitted beta it matches the sequential Breslow
    reference; deterministic under repartitioning."""
    import numpy as np

    from cancer_survival_etl_spark.operators.survival import (
        cox_baseline_hazard,
        cox_ph,
        km_curve,
    )

    rows = []
    for i in range(300):
        x = (i % 4) / 3.0
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        t = -math.log(u) / math.exp(0.8 * x)
        rows.append((x, round(min(t, 2.0), 1), 1 if t <= 2.0 else 0))
    df = spark.createDataFrame(
        rows, "x double, duration double, event int"
    )
    # beta = 0: equals km_curve's Nelson-Aalen exactly
    base0 = {
        r.duration: r.cum_hazard_baseline
        for r in cox_baseline_hazard(df, ["x"], [0.0]).collect()
    }
    km = {
        r.duration: r.cum_hazard
        for r in km_curve(
            df.withColumn("cohort", F.lit("g")), ["cohort"]
        ).collect()
    }
    assert base0 == km
    # fitted beta: sequential Breslow reference (same lattices)
    beta = cox_ph(df, ["x"], iters=5)
    got = {
        r.duration: (r.h0_increment, r.cum_hazard_baseline)
        for r in cox_baseline_hazard(df, ["x"], beta).collect()
    }
    rs = sorted(rows, key=lambda r: r[1])
    times = sorted({r[1] for r in rows})
    acc = 0
    for t in times:
        d = sum(1 for r in rows if r[1] == t and r[2] == 1)
        s0 = sum(
            round(math.exp(beta[0] * r[0]) * 1e9) for r in rows
            if r[1] >= t
        ) / 1e9
        inc = round(d / s0 * 1e6) if d > 0 else 0
        acc += inc
        assert got[t][0] == round(inc / 1e6, 6), t
        assert got[t][1] == round(acc / 1e6, 6), t
    # partitioning independence
    got32 = {
        r.duration: (r.h0_increment, r.cum_hazard_baseline)
        for r in cox_baseline_hazard(
            df.repartition(32), ["x"], beta
        ).collect()
    }
    assert got32 == got
    with pytest.raises(ValueError):
        cox_baseline_hazard(df, ["x"], [0.1, 0.2])


def test_period_survival_window_semantics(spark):
    """Period analysis: (a) matches a sequential left-truncation
    reference on a calendar-windowed toy cohort; (b) a window covering
    ALL follow-up reduces to plain KM; (c) subjects whose follow-up
    never intersects the window contribute nothing."""
    from cancer_survival_etl_spark.operators.survival import (
        km_curve,
        period_survival,
    )

    # (diag calendar time, duration since diagnosis, event)
    rows = [
        ("g", 0, 10, 1),
        ("g", 2, 9, 0),
        ("g", 5, 4, 1),
        ("g", 8, 6, 1),
        ("g", 20, 3, 1),   # outside window [4, 12)
        ("g", 11, 5, 1),   # diag inside window
    ]
    df = spark.createDataFrame(
        rows, "cohort string, diag_time long, duration long, event int"
    )
    got = {
        r.duration: r
        for r in period_survival(
            df, ["cohort"], 4, 12
        ).collect()
    }
    # sequential reference
    subs = []
    for _, dg, du, ev in rows:
        if dg >= 12 or dg + du < 4:
            continue
        entry = max(0, 4 - dg)
        cap = 12 - dg
        exit_ = min(du, cap)
        e2 = ev if du < cap else 0
        if entry < exit_:
            subs.append((entry, exit_, e2))
    times = sorted({s[1] for s in subs})
    s = 1.0
    for t in times:
        at_risk = sum(1 for e, x, _ in subs if e < t <= x)
        d = sum(1 for e, x, ev in subs if x == t and ev == 1)
        if d:
            s *= 1 - d / at_risk
        assert got[t].n_risk == at_risk, (t, got[t].n_risk, at_risk)
        assert got[t].n_event == d
    assert got[times[-1]].survival == pytest.approx(s, abs=1e-4)
    # all-covering window == plain KM on duration (entry always 0)
    full = {
        (r.cohort, r.duration): (r.n_risk, r.n_event, r.survival)
        for r in period_survival(df, ["cohort"], 0, 1000).collect()
    }
    plain = {
        (r.cohort, r.duration): (r.n_risk, r.n_event, r.survival)
        for r in km_curve(
            df.filter("duration > 0"), ["cohort"]
        ).collect()
    }
    assert full == plain


def test_net_survival_period_reduction_and_reference(spark):
    """Period-analysis net survival (Brenner window × Pohar Perme):
    (a) a window covering ALL calendar time reduces BIT-EXACTLY to
    net_survival_pohar_perme (plain and with_ci — same cells, same
    lattice, same _pp_weighted_tail code path); (b) a real window
    matches a sequential left-truncated PP reference; (c)
    repartition-invariant."""
    import hashlib

    from cancer_survival_etl_spark.operators.survival import (
        net_survival_period,
        net_survival_pohar_perme,
    )

    hz = {0: 3000, 1: 8000, 2: 5000}
    rows = []
    for i in range(300):
        u = int(hashlib.md5(f"np:{i}".encode()).hexdigest()[:8], 16)
        rows.append((
            "A" if i % 2 == 0 else "B",
            i % 3,
            (u >> 4) % 25,          # diag calendar time
            1 + u % 12,             # duration >= 1
            1 if (u >> 8) % 3 == 0 else 0,
        ))
    df = spark.createDataFrame(
        rows,
        "cohort string, band int, diag_time long, duration long, "
        "event int",
    )
    for ci in (False, True):
        full = sorted(
            map(tuple, net_survival_pohar_perme(
                df, ["cohort"], "band", hz, 12, with_ci=ci
            ).collect())
        )
        per = sorted(
            map(tuple, net_survival_period(
                df, ["cohort"], "band", hz, 12, -10000, 10000,
                with_ci=ci,
            ).collect())
        )
        assert full == per and len(full) == 24

    # real window [8, 25): sequential left-truncated PP reference
    ws, we = 8, 25
    got = {
        (r.cohort, r.hour): r
        for r in net_survival_period(
            df, ["cohort"], "band", hz, 12, ws, we
        ).collect()
    }
    for cohort in ("A", "B"):
        subs = []
        for c, b, dg, du, ev in rows:
            if c != cohort or dg >= we or dg + du < ws:
                continue
            entry = max(0, ws - dg)
            cap = we - dg
            exit_ = min(du, cap)
            e2 = ev if du < cap else 0
            if entry < exit_:
                subs.append((b, entry, exit_, e2))
        cum = 0.0
        for h in range(1, 13):
            num1 = num2 = den = 0.0
            n = 0
            for b, en, ex, e in subs:
                lam = hz[b] / 1e6
                w = (1 - lam) ** (-h)
                if en < h <= ex:
                    n += 1
                    den += w
                    num2 += w * lam
                if ex == h and e == 1:
                    num1 += w
            if den > 0:
                cum += (num1 - num2) / den
            r = got[(cohort, h)]
            assert r.n_risk == n, (cohort, h, r.n_risk, n)
            assert r.excess_cum_hazard == pytest.approx(cum, abs=5e-6)
            assert r.net_survival_pp == pytest.approx(
                math.exp(-cum), abs=5e-6
            )

    again = sorted(
        map(tuple, net_survival_period(
            df.repartition(32), ["cohort"], "band", hz, 12, ws, we
        ).collect())
    )
    assert again == sorted(
        map(tuple, net_survival_period(
            df, ["cohort"], "band", hz, 12, ws, we
        ).collect())
    )


def test_crude_probability_decomposition(spark):
    """Cronin-Feuer crude probabilities: (a) CP_cancer + CP_other
    telescopes to 1 - S_obs (lattice tolerance); (b) zero expected
    hazard puts ALL mortality in CP_cancer; (c) matches a sequential
    interval reference."""
    from cancer_survival_etl_spark.operators.survival import (
        crude_probability_of_death,
    )

    lam = {0: 3000, 1: 9000}
    H = 24
    rows = []
    for i in range(500):
        band = i % 2
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        t = -math.log(u) / (lam[band] / 1e6 + 0.02)
        d = int(min(t, H))
        rows.append(("g", band, d, 1 if t < H else 0))
    df = spark.createDataFrame(
        rows, "cohort string, band long, duration long, event int"
    )
    got = {
        r.hour: r
        for r in crude_probability_of_death(
            df, ["cohort"], "band", lam, H
        ).collect()
    }
    # sequential reference with identical lattices
    subs = rows
    lt0 = dall = 0
    cpc = cpo = 0
    for s in range(H):
        nb = {b: sum(1 for r in subs if r[1] == b and r[2] >= s)
              for b in (0, 1)}
        n = sum(nb.values())
        d = sum(1 for r in subs if r[2] == s and r[3] == 1)
        lam_bar = sum(nb[b] * lam[b] for b in (0, 1)) / 1e6 / n
        q = d / n
        s_in = 0.0 if dall else math.exp(lt0 / 1e6)
        cpc += round(s_in * (q - lam_bar) * 1e6)
        cpo += round(s_in * lam_bar * 1e6)
        if 0 < d < n:
            lt0 += round(math.log(1 - q) * 1e6)
        if d == n and d > 0:
            dall = 1
        r = got[s]
        assert r.n_risk == n and r.n_event == d, s
        assert r.cp_cancer == round(cpc / 1e6, 6), s
        assert r.cp_other == round(cpo / 1e6, 6), s
        # identity: cp_c + cp_o ~= 1 - S_obs
        assert abs(
            (r.cp_cancer + r.cp_other) - (1.0 - r.survival_observed)
        ) < 5e-4, s
    # zero expected hazard: everything is cancer
    z = crude_probability_of_death(
        df, ["cohort"], "band", {0: 0, 1: 0}, H
    ).collect()
    for r in z:
        assert r.cp_other == 0.0


def test_pohar_perme_ci_matches_sequential_variance(spark):
    """PP variance: Var(L_E(h)) = sum_s sum_b w^2 d / (sum_b w n)^2 on
    the same lattices; CI built on the cumulative-excess-hazard scale
    brackets the estimate and stays in (0, 1]."""
    from cancer_survival_etl_spark.operators.survival import (
        net_survival_pohar_perme,
    )

    lam = {0: 3000, 1: 9000}
    H = 24
    rows = []
    for i in range(400):
        band = i % 2
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        t = -math.log(u) / (lam[band] / 1e6 + 0.03)
        d = int(min(t, H))
        rows.append(("g", band, d, 1 if t < H else 0))
    df = spark.createDataFrame(
        rows, "cohort string, band long, duration long, event int"
    )
    got = {
        r.hour: r
        for r in net_survival_pohar_perme(
            df, ["cohort"], "band", lam, H, with_ci=True
        ).collect()
    }
    base = {
        r.hour: r
        for r in net_survival_pohar_perme(
            df, ["cohort"], "band", lam, H
        ).collect()
    }
    # the point estimate is unchanged by with_ci
    for h in got:
        assert got[h].net_survival_pp == base[h].net_survival_pp
    # sequential variance replication (same lattices)
    vi_c = 0
    for s in range(1, H + 1):
        num3 = den = 0
        for b in (0, 1):
            nbv = sum(1 for r in rows if r[1] == b and r[2] >= s)
            dv = sum(1 for r in rows if r[1] == b and r[2] == s
                     and r[3] == 1)
            w = (1.0 - lam[b] / 1e6) ** (-s)
            num3 += round(dv * w * w * 1e6)
            den += round(nbv * w * 1e6)
        if den > 0:
            vi_c += round((num3 / 1e6) / (den / 1e6) ** 2 * 1e12)
        sig = math.sqrt(vi_c / 1e12)
        r = got[s]
        assert r.se_net == round(r.net_survival_pp * sig, 6), s
        assert r.lower_ci_net == round(
            math.exp(-(r.excess_cum_hazard + 1.96 * sig)), 6
        ), s
        assert r.lower_ci_net <= r.net_survival_pp <= r.upper_ci_net
        assert 0 < r.upper_ci_net <= 1.0 or r.upper_ci_net <= 1.000001


def test_smr_byar_ci(spark):
    """SMR: exact integer expected deaths, Byar CI brackets the
    estimate and matches the closed form; O=0 yields NULL lower."""
    from cancer_survival_etl_spark.operators.survival import (
        standardized_mortality_ratio,
    )

    lam = {0: 2000, 1: 8000}
    rows = [("g", i % 2, 10 + i % 5, 1 if i % 7 == 0 else 0)
            for i in range(200)]
    rows += [("z", 0, 5, 0)] * 10   # zero observed deaths
    df = spark.createDataFrame(
        rows, "cohort string, band long, duration long, event int"
    )
    out = {r.cohort: r for r in standardized_mortality_ratio(
        df, ["cohort"], "band", lam).collect()}
    g = out["g"]
    o = sum(1 for r in rows if r[0] == "g" and r[3] == 1)
    e_micro = sum(lam[r[1]] * (r[2] + 1) for r in rows if r[0] == "g")
    assert g.observed == o
    assert g.expected == round(e_micro / 1e6, 6)
    assert g.smr == round(o / (e_micro / 1e6), 6)
    low = (o / (e_micro / 1e6)) * (
        1 - 1 / (9 * o) - 1.96 / (3 * math.sqrt(o))) ** 3
    assert g.lower_ci == pytest.approx(round(low, 6), abs=1e-9)
    assert g.lower_ci < g.smr < g.upper_ci
    z = out["z"]
    assert z.observed == 0 and z.lower_ci is None
    assert z.upper_ci > 0


def test_cox_ph_wald_se(spark):
    """Wald SEs: match the sequential reference's information matrix
    inverse; the 95% HR CI covers a planted effect; SEs shrink ~1/sqrt(n)."""
    import numpy as np

    from cancer_survival_etl_spark.operators.survival import cox_ph

    def cohort(n):
        rows = []
        for i in range(n):
            x = (i % 4) / 3.0
            u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
            t = -math.log(u) / math.exp(1.0 * x)
            rows.append((x, round(min(t, 2.0), 2), 1 if t <= 2.0 else 0))
        return spark.createDataFrame(
            rows, "x double, duration double, event int"
        )

    b1, s1 = cox_ph(cohort(400), ["x"], iters=6, return_se=True)
    # CI covers the planted log-HR of 1.0
    assert b1[0] - 1.96 * s1[0] < 1.0 < b1[0] + 1.96 * s1[0]
    b2, s2 = cox_ph(cohort(1600), ["x"], iters=6, return_se=True)
    # 4x the cohort -> SE roughly halves
    assert 0.35 < s2[0] / s1[0] < 0.65, (s1, s2)
    # sequential reference at the same beta (Breslow information)
    rows = [( (i % 4) / 3.0,
              round(min(-math.log(((i * 2654435761) % 999983) / 999983.0
                                  + 1e-9) / math.exp((i % 4) / 3.0), 2.0),
                    2),
              1 if -math.log(((i * 2654435761) % 999983) / 999983.0
                             + 1e-9) / math.exp((i % 4) / 3.0) <= 2.0
              else 0)
            for i in range(400)]
    X = np.array([r[0] for r in rows])
    dur = np.array([r[1] for r in rows])
    ev = np.array([r[2] for r in rows])
    r = np.exp(X * b1[0])
    info = 0.0
    for t in np.unique(dur[ev == 1]):
        risk = dur >= t
        d = int(((dur == t) & (ev == 1)).sum())
        S0 = r[risk].sum()
        S1 = (r[risk] * X[risk]).sum()
        S2 = (r[risk] * X[risk] * X[risk]).sum()
        info += d * (S2 / S0 - (S1 / S0) ** 2)
    assert s1[0] == pytest.approx(1.0 / math.sqrt(info), rel=1e-3)


def test_hakulinen_reduces_to_ederer1_and_censoring_effect(spark):
    """Hakulinen: with uniform potential follow-up (everyone
    observable to the horizon) it equals Ederer I exactly; with the
    long-lived band's potential follow-up truncated early, the
    expected curve re-weights toward the short-lived mix and drops
    relative to Ederer I late."""
    from cancer_survival_etl_spark.operators.survival import (
        relative_survival_ederer1,
        relative_survival_hakulinen,
    )

    lam = {0: 2000, 1: 60000}
    H = 24
    rows = []
    for i in range(400):
        band = i % 2
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        t = -math.log(u) / ((lam[band] / 1e6) * (2.0 if band else 1.0))
        d = int(min(t, H))
        rows.append(("g", band, d, 1 if t < H else 0, H))
    df = spark.createDataFrame(
        rows,
        "cohort string, band long, duration long, event int, potential long",
    )
    hak = {
        r.hour: r
        for r in relative_survival_hakulinen(
            df, ["cohort"], "band", lam, H
        ).collect()
    }
    e1 = {
        r.hour: r
        for r in relative_survival_ederer1(
            df, ["cohort"], "band", lam, H
        ).collect()
    }
    for h in (1, 8, 24):
        # uniform potential -> Hakulinen == Ederer I (micro tolerance:
        # the two accumulate on different lattices)
        assert hak[h].survival_expected == pytest.approx(
            e1[h].survival_expected, abs=5e-6
        ), h
        assert hak[h].survival_observed == e1[h].survival_observed
    # truncate band 0's (low-hazard, long-lived) potential follow-up
    trunc = df.withColumn(
        "potential",
        F.when(F.col("band") == 0, F.lit(6)).otherwise(F.col("potential")),
    )
    hak2 = {
        r.hour: r
        for r in relative_survival_hakulinen(
            trunc, ["cohort"], "band", lam, H
        ).collect()
    }
    # after hour 6 only the high-hazard band's twins remain observable
    # -> expected survival decays faster than Ederer I's
    assert hak2[24].survival_expected < e1[24].survival_expected
    with pytest.raises(ValueError):
        relative_survival_hakulinen(df, ["cohort"], "band", {0: 0.5}, H)


def test_rmst_from_curve_unit_grid(spark):
    """Curve RMST: exact rectangle sum on the unit grid; a constant
    curve S=1 gives exactly tau; net RMST from a PP curve is below
    the all-cause curve's RMST... wait - net survival >= observed, so
    net RMST >= observed-curve RMST (background deaths removed)."""
    from cancer_survival_etl_spark.operators.survival import (
        net_survival_pohar_perme,
        relative_survival_ederer2,
        rmst_from_curve,
    )

    lam = {0: 3000, 1: 9000}
    H = 24
    rows = []
    for i in range(300):
        band = i % 2
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        t = -math.log(u) / (lam[band] / 1e6 + 0.03)
        rows.append(("g", band, int(min(t, H)), 1 if t < H else 0))
    df = spark.createDataFrame(
        rows, "cohort string, band long, duration long, event int"
    )
    pp = net_survival_pohar_perme(df, ["cohort"], "band", lam, H)
    net = rmst_from_curve(
        pp, ["cohort"], H, "hour", "net_survival_pp"
    ).collect()[0]
    e2 = relative_survival_ederer2(df, ["cohort"], "band", lam, H)
    obs = rmst_from_curve(
        e2, ["cohort"], H, "hour", "survival_observed"
    ).collect()[0]
    # exact rectangle replication
    vals = {r.hour: r.net_survival_pp for r in pp.collect()}
    want = 1.0 + sum(
        round(vals[h] * 1e6) for h in range(1, H)
    ) / 1e6
    assert net.rmst == round(want, 6)
    # net removes background mortality -> net RMST >= observed RMST
    assert net.rmst >= obs.rmst
    assert 0 < obs.rmst <= H
    # constant curve integrates to tau
    const = spark.createDataFrame(
        [("g", h, 1.0) for h in range(1, H + 1)],
        "cohort string, hour long, survival double",
    )
    assert rmst_from_curve(
        const, ["cohort"], H, "hour", "survival"
    ).collect()[0].rmst == float(H)


def test_rmst_from_curve_guards(spark):
    """VERDICT r05 advice: the dense-unit-grid precondition is
    enforced — a sparse curve raises instead of silently
    under-integrating; every input group returns a row (tau=1 gives
    rmst=1.0, the empty-filter case); a group missing grid rows is
    an error, not a dropped row."""
    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        rmst_from_curve,
    )

    H = 8
    dense = spark.createDataFrame(
        [("a", h, 0.9) for h in range(1, H + 1)]
        + [("b", h, 0.8) for h in range(1, H + 1)],
        "cohort string, hour long, survival double",
    )
    out = {
        r.cohort: r.rmst
        for r in rmst_from_curve(
            dense, ["cohort"], H, "hour", "survival"
        ).collect()
    }
    assert out == {"a": round(1 + 0.9 * (H - 1), 6),
                   "b": round(1 + 0.8 * (H - 1), 6)}
    # tau=1: integral is the S(0)=1 rectangle alone, per group
    t1 = {
        r.cohort: r.rmst
        for r in rmst_from_curve(
            dense, ["cohort"], 1, "hour", "survival"
        ).collect()
    }
    assert t1 == {"a": 1.0, "b": 1.0}
    # sparse curve (group b missing hours 3..H) must raise, not
    # under-integrate
    sparse = dense.filter(
        ~((F.col("cohort") == "b") & (F.col("hour") >= 3))
    )
    with pytest.raises(Exception, match="sparse curve"):
        rmst_from_curve(
            sparse, ["cohort"], H, "hour", "survival"
        ).collect()


def test_gray_test_reduces_to_logrank_score(spark):
    """With NO competing events the subdistribution risk set IS the
    ordinary risk set, so gray_test's score must equal the log-rank
    O1 - E1 exactly (the information differs only by the
    hypergeometric (n-d)/(n-1) correction, so it is bounded above by
    the log-rank variance at these cell sizes)."""
    from cancer_survival_etl_spark.operators.survival import (
        gray_test,
        logrank_test,
    )

    rows = []
    for i in range(400):
        grp = "a" if i % 2 == 0 else "b"
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        lam = 0.10 if grp == "a" else 0.16
        t = -math.log(u) / lam
        cen = (i * 48271) % 7 == 0
        dur = int(min(t, 30))
        rows.append((grp, dur, 0 if (cen or t >= 30) else 1))
    df = spark.createDataFrame(rows, "grp string, duration long, cause int")
    gr = gray_test(df, "grp").collect()[0]
    lr = logrank_test(
        df.withColumn("event", (F.col("cause") == 1).cast("int")),
        "grp",
    ).collect()[0]
    assert gr.n_subjects_1 == lr.n_subjects_1
    assert gr.events_1 == lr.observed_1
    assert abs(gr.score - (lr.observed_1 - lr.expected_1)) < 2e-6
    assert abs(gr.expected_1 - lr.expected_1) < 2e-6


def test_gray_test_planted_difference_power(spark):
    """Power/level check on the Fine-Gray simulation design: a
    planted CIF difference (beta=0.9 on the subdistribution) must
    reject at chi2 >> 3.84; the same design with beta=0 must not
    (the draw is frozen, so both verdicts are deterministic). Also
    pins the 2-group validation."""
    from cancer_survival_etl_spark.operators.survival import gray_test

    def cohort(beta):
        rows = []
        for i in range(2000):
            x = i % 2
            h = (i * 2654435761) % 999983 / 999983.0 + 1e-9
            h2 = (i * 1103515245 + 12345) % 999983 / 999983.0 + 1e-9
            h3 = (i * 69069 + 7) % 999983 / 999983.0
            eta = math.exp(beta * x)
            p1 = 1.0 - (1.0 - 0.55) ** eta
            if h < p1:
                t = -math.log(1.0 - (1.0 - (1.0 - h) ** (1.0 / eta)) / 0.55)
                c = 1
            else:
                t = -math.log(h2)
                c = 2
            if h3 < 0.25:
                t, c = t * h3 / 0.25, 0
            t = min(t, 3.0)
            rows.append(("t" if x else "c", round(t, 2),
                         c if t < 3.0 else 0))
        return spark.createDataFrame(
            rows, "grp string, duration double, cause int"
        )

    alt = gray_test(cohort(0.9), "grp").collect()[0]
    nul = gray_test(cohort(0.0), "grp").collect()[0]
    assert alt.chi_square > 30, alt
    assert nul.chi_square < 3.84, nul
    # orientation: group "c" (lexicographically first) is group 1
    assert alt.n_subjects_1 == 1000
    # a planted INCREASE in group-2 incidence pulls group-1 observed
    # below expected
    assert alt.score < 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exactly 2"):
        gray_test(
            cohort(0.0).withColumn("grp", F.lit("only")), "grp"
        )


def test_aalen_johansen_two_state_reduction_is_km(spark):
    """AJ with no intermediate state (every episode 0->2 or censored)
    must reproduce km_curve BIT-EXACTLY: p_initial == survival at
    every cell, and the at-risk/event counts line up."""
    from cancer_survival_etl_spark.operators.survival import (
        aalen_johansen_illness_death,
        km_curve,
    )

    rows = []
    for i in range(300):
        grp = "a" if i % 3 == 0 else "b"
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        t = -math.log(u) / 0.12
        cen = (i * 48271) % 5 == 0
        dur = max(1, int(min(t, 25)))
        rows.append((grp, dur, 0 if (cen or t >= 25) else 1))
    subj = spark.createDataFrame(
        rows, "grp string, duration long, event int"
    )
    eps = subj.select(
        "grp",
        F.lit(0).alias("start"),
        F.col("duration").alias("stop"),
        F.lit(0).alias("from_state"),
        F.when(F.col("event") == 1, F.lit(2)).alias("to_state"),
    )
    aj = {
        (r.grp, r.time): r
        for r in aalen_johansen_illness_death(eps, ["grp"]).collect()
    }
    km = km_curve(subj, ["grp"], "duration", "event").collect()
    assert len(aj) == len(km)
    for r in km:
        a = aj[(r.grp, r.duration)]
        assert a.p_initial == r.survival, (r, a)
        assert a.n_risk_initial == r.n_risk
        assert a.n_death_initial == r.n_event
        assert a.n_censored == r.n_censored
        assert a.p_intermediate == 0.0
        assert a.n_risk_intermediate == 0


def test_aalen_johansen_competing_reduction_is_cif(spark):
    """AJ with NO 1->2 transitions (state 1 absorbing in the data) is
    the competing-risks fork: p_intermediate must equal CIF(cause 1)
    and p_absorbed CIF(cause 2) BIT-EXACTLY at every cell."""
    from cancer_survival_etl_spark.operators.survival import (
        aalen_johansen_illness_death,
        cif_competing_risks,
    )

    rows = []
    for i in range(400):
        grp = "x" if i % 2 == 0 else "y"
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        u2 = ((i * 1103515245 + 12345) % 999983) / 999983.0 + 1e-9
        t1 = -math.log(u) / 0.08
        t2 = -math.log(u2) / 0.05
        t, c = (t1, 1) if t1 < t2 else (t2, 2)
        cen = (i * 69069) % 6 == 0
        dur = max(1, int(min(t, 30)))
        rows.append((grp, dur, 0 if (cen or t >= 30) else c))
    subj = spark.createDataFrame(
        rows, "grp string, duration long, cause int"
    )
    eps = subj.select(
        "grp",
        F.lit(0).alias("start"),
        F.col("duration").alias("stop"),
        F.lit(0).alias("from_state"),
        F.when(F.col("cause") > 0, F.col("cause")).alias("to_state"),
    )
    aj = {
        (r.grp, r.time): r
        for r in aalen_johansen_illness_death(eps, ["grp"]).collect()
    }
    cif = cif_competing_risks(subj, ["grp"], [1, 2], "duration", "cause")
    c1 = {(r.grp, r.duration): r for r in cif.filter("cause = 1").collect()}
    c2 = {(r.grp, r.duration): r for r in cif.filter("cause = 2").collect()}
    assert len(aj) == len(c1) == len(c2)
    for k, a in aj.items():
        assert a.p_intermediate == c1[k].cif, (k, a, c1[k])
        assert a.p_absorbed == c2[k].cif, (k, a, c2[k])
        assert a.p_initial == c1[k].survival_allcause
    # occupancy sums to 1 at lattice precision everywhere
    for a in aj.values():
        assert abs(a.p_initial + a.p_intermediate + a.p_absorbed - 1.0) < 5e-6


def test_aalen_johansen_full_illness_death(spark):
    """Full 3-state model with a hand-checkable tiny cohort:
    4 subjects —
      s1: 0->1 at t=2, 1->2 at t=5
      s2: 0->2 at t=3
      s3: 0->1 at t=4, censored in state 1 at t=6
      s4: censored in state 0 at t=7
    Hand product-integral:
      t=2: Y0=4, d01=1: P00=3/4, P01=1/4
      t=3: Y0=3, d02=1: P00=3/4*2/3=1/2, P02=1/4
      t=4: Y0=2, d01=1: P00=1/4, P01(4)=1/4*Q + P00(3-)*1/2 = ...
      t=5: Y1=2, d12=1: halves the surviving ill mass
    Verified against manual matrix multiplication below."""
    from cancer_survival_etl_spark.operators.survival import (
        aalen_johansen_illness_death,
    )

    eps = spark.createDataFrame(
        [
            ("g", 0, 2, 0, 1), ("g", 2, 5, 1, 2),
            ("g", 0, 3, 0, 2),
            ("g", 0, 4, 0, 1), ("g", 4, 6, 1, None),
            ("g", 0, 7, 0, None),
        ],
        "grp string, start long, stop long, from_state int, to_state int",
    )
    out = {
        r.time: r
        for r in aalen_johansen_illness_death(eps, ["grp"]).collect()
    }
    # manual product-integral
    import numpy as np

    p = np.array([1.0, 0.0, 0.0])
    hand = {}
    # (time, Y0, Y1, d01, d02, d12)
    sched = [(2, 4, 0, 1, 0, 0), (3, 3, 1, 0, 1, 0),
             (4, 2, 1, 1, 0, 0), (5, 1, 2, 0, 0, 1),
             (6, 1, 1, 0, 0, 0), (7, 1, 0, 0, 0, 0)]
    for (t, y0_, y1_, d01_, d02_, d12_) in sched:
        m = np.eye(3)
        if y0_ > 0 and (d01_ or d02_):
            m[0, 0] = 1 - (d01_ + d02_) / y0_
            m[0, 1] = d01_ / y0_
            m[0, 2] = d02_ / y0_
        if y1_ > 0 and d12_:
            m[1, 1] = 1 - d12_ / y1_
            m[1, 2] = d12_ / y1_
        p = p @ m
        hand[t] = p.copy()
    for t, r in out.items():
        assert abs(r.p_initial - hand[t][0]) < 3e-6, (t, r, hand[t])
        assert abs(r.p_intermediate - hand[t][1]) < 3e-6, (t, r, hand[t])
        assert abs(r.p_absorbed - hand[t][2]) < 3e-6, (t, r, hand[t])
    # at-risk bookkeeping at t=5: s1 ill (entered 2), s3 ill
    # (entered 4) -> Y1=2; only s4 healthy... s4 and nobody else:
    # Y0(5) = 1
    assert out[5].n_risk_intermediate == 2
    assert out[5].n_risk_initial == 1
    assert out[5].n_death_intermediate == 1


def test_aalen_johansen_same_cell_gap_raises(spark):
    """State 1 empties by death (d12 == Y1) at the SAME time a 0->1
    onset occurs: _t01 would divide by Q1(t) == 0. Must hit the named
    precondition error, not produce Infinity (ADVICE r06)."""
    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        aalen_johansen_illness_death,
    )

    eps = spark.createDataFrame(
        [
            ("g", 0, 2, 0, 1), ("g", 2, 5, 1, 2),   # ill dies at 5
            ("g", 0, 5, 0, 1), ("g", 5, 9, 1, None),  # onset at 5 too
            ("g", 0, 9, 0, None),
        ],
        "grp string, start long, stop long, from_state int, to_state int",
    )
    with pytest.raises(Exception, match="state 1 emptied"):
        aalen_johansen_illness_death(eps, ["grp"]).collect()


def test_aalen_johansen_later_gap_still_raises(spark):
    """The original strict-prefix gap (state 1 empties, LATER sees a
    new onset) keeps raising after the same-cell guard extension."""
    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        aalen_johansen_illness_death,
    )

    eps = spark.createDataFrame(
        [
            ("g", 0, 2, 0, 1), ("g", 2, 5, 1, 2),   # ill dies at 5
            ("g", 0, 6, 0, 1), ("g", 6, 9, 1, 2),   # re-populates at 6
            ("g", 0, 9, 0, None),
        ],
        "grp string, start long, stop long, from_state int, to_state int",
    )
    with pytest.raises(Exception, match="state 1 emptied"):
        aalen_johansen_illness_death(eps, ["grp"]).collect()


def _td_cohort(spark, n=400):
    rows = []
    for i in range(n):
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        x1 = (i % 8) / 8.0
        x2 = ((i * 7) % 5) / 5.0
        t = -math.log(u) / math.exp(0.8 * x1 - 0.4 * x2) / 0.15
        cen = (i * 48271) % 6 == 0
        dur = max(1, int(min(t, 40)))
        rows.append((x1, x2, dur, 0 if (cen or t >= 40) else 1))
    return spark.createDataFrame(
        rows, "x1 double, x2 double, duration long, event int"
    )


def test_cox_td_reduces_to_cox_ph_bit_exact(spark):
    """Episodes all starting at 0 with constant covariates: the
    counting-process fit must be BIT-IDENTICAL to plain cox_ph,
    under Breslow AND Efron ties (the start-suffix vanishes at every
    event time, so every nano-lattice sum coincides)."""
    from cancer_survival_etl_spark.operators.survival import (
        cox_ph,
        cox_ph_time_dependent,
    )

    subj = _td_cohort(spark)
    eps = subj.select(
        "x1", "x2",
        F.lit(0).cast("long").alias("start"),
        F.col("duration").alias("stop"),
        "event",
    )
    for ties in ("breslow", "efron"):
        b_plain = cox_ph(
            subj, ["x1", "x2"], "duration", "event", iters=4, ties=ties
        )
        b_td = cox_ph_time_dependent(
            eps, ["x1", "x2"], "start", "stop", "event",
            iters=4, ties=ties,
        )
        assert b_plain == b_td, (ties, b_plain, b_td)
    # SEs too, via the same final information matrix
    _, se_plain = cox_ph(
        subj, ["x1", "x2"], iters=4, return_se=True
    )
    _, se_td = cox_ph_time_dependent(
        eps, ["x1", "x2"], iters=4, return_se=True
    )
    assert se_plain == se_td


def test_cox_td_split_invariance(spark):
    """Splitting any episode at an interior time with unchanged
    covariates must leave beta IDENTICAL (the counting-process
    likelihood only sees risk-set membership) — the property that
    makes episode splitting a safe preprocessing step."""
    from cancer_survival_etl_spark.operators.survival import (
        cox_ph_time_dependent,
    )

    subj = _td_cohort(spark)
    eps = subj.select(
        "x1", "x2",
        F.lit(0).cast("long").alias("start"),
        F.col("duration").alias("stop"),
        "event",
    )
    # split every episode longer than 10 at time 7 (constant covs):
    # (0, 7] censored + (7, stop] carrying the event flag
    long_eps = eps.filter(F.col("stop") > 10)
    split = long_eps.select(
        "x1", "x2", "start", F.lit(7).cast("long").alias("stop"),
        F.lit(0).alias("event"),
    ).unionAll(
        long_eps.select(
            "x1", "x2", F.lit(7).cast("long").alias("start"),
            "stop", "event",
        )
    ).unionAll(eps.filter(F.col("stop") <= 10))
    b0 = cox_ph_time_dependent(eps, ["x1", "x2"], iters=4)
    b1 = cox_ph_time_dependent(split, ["x1", "x2"], iters=4)
    assert b0 == b1, (b0, b1)


def test_cox_td_recovers_time_varying_effect(spark):
    """A genuinely time-dependent covariate: treatment switches ON at
    a subject-specific time s_i; hazard is lam*exp(beta*x(t)) with
    beta=1.0. Episode-split fit must recover beta (within sampling
    noise) while the naive ever-treated cox_ph is badly biased
    toward zero (immortal time bias) — the clinical textbook case."""
    from cancer_survival_etl_spark.operators.survival import (
        cox_ph,
        cox_ph_time_dependent,
    )

    lam, beta = 0.02, 1.0
    rows_ep, rows_naive = [], []
    for i in range(3000):
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        s = 5 + (i * 48271) % 20  # switch time 5..24
        # piecewise-exponential: hazard lam before s, lam*e^b after
        t_pre = -math.log(u) / lam
        if t_pre <= s:
            t, treated_at_t = t_pre, 0
        else:
            u2 = ((i * 1103515245 + 7) % 999983) / 999983.0 + 1e-9
            t = s + (-math.log(u2) / (lam * math.exp(beta)))
            treated_at_t = 1
        cen = 60.0
        dur = min(t, cen)
        ev = 1 if t < cen else 0
        d_i = max(1, round(dur * 2))  # half-unit grid
        s_i = s * 2
        if d_i <= s_i:
            rows_ep.append((0.0, 0, d_i, ev))
        else:
            rows_ep.append((0.0, 0, s_i, 0))
            rows_ep.append((1.0, s_i, d_i, ev))
        rows_naive.append((1.0 if d_i > s_i else 0.0, d_i, ev))
    eps = spark.createDataFrame(
        rows_ep, "x double, start long, stop long, event int"
    )
    naive = spark.createDataFrame(
        rows_naive, "x double, duration long, event int"
    )
    b_td = cox_ph_time_dependent(eps, ["x"], iters=6)[0]
    b_naive = cox_ph(naive, ["x"], iters=6)[0]
    assert abs(b_td - beta) < 0.15, b_td
    # ever-treated coding is biased low (immortal time in the
    # untreated period counts as treated exposure)
    assert b_naive < b_td - 0.3, (b_naive, b_td)


def test_cox_td_validation(spark):
    """start >= stop episodes raise at execution; iters=0 raises up
    front."""
    from cancer_survival_etl_spark.operators.survival import (
        cox_ph_time_dependent,
    )

    eps = spark.createDataFrame(
        [(0.5, 3, 3, 1), (0.2, 0, 5, 0)],
        "x double, start long, stop long, event int",
    )
    with pytest.raises(Exception, match="start >= stop"):
        cox_ph_time_dependent(eps, ["x"], iters=1)
    with pytest.raises(ValueError, match="iters"):
        cox_ph_time_dependent(
            eps.filter("start < stop"), ["x"], iters=0
        )


def test_life_years_lost_decomposition_and_hand_check(spark):
    """LYL: (1) hand integral on a tiny cohort; (2) the Andersen
    decomposition tau - RMST(tau) == sum_k LYL_k(tau) to lattice
    precision on a planted competing-risks cohort."""
    from cancer_survival_etl_spark.operators.survival import (
        km_curve,
        life_years_lost,
    )

    # tiny: 4 subjects, cause 1 at t=2 (CIF1=0.25 onward),
    # cause 2 at t=4 (CIF2=1/4... risk set 3 -> S(2-)=0.75,
    # CIF2(4)=0.75/3=0.25), censor at 5, admin end tau=6
    tiny = spark.createDataFrame(
        [("g", 2, 1), ("g", 4, 2), ("g", 5, 0), ("g", 6, 0)],
        "grp string, duration long, cause int",
    )
    out = {
        (r.cause): r.lyl
        for r in life_years_lost(tiny, ["grp"], [1, 2], 6.0).collect()
    }
    # CIF1 = 0.25 on [2, 6) -> 1.0 ; CIF2 = 0.25 on [4, 6) -> 0.5
    assert abs(out[1] - 1.0) < 2e-6, out
    assert abs(out[2] - 0.5) < 2e-6, out
    # decomposition on a bigger draw
    rows = []
    for i in range(500):
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        u2 = ((i * 1103515245 + 12345) % 999983) / 999983.0 + 1e-9
        t1 = -math.log(u) / 0.09
        t2 = -math.log(u2) / 0.05
        t, c = (t1, 1) if t1 < t2 else (t2, 2)
        cen = (i * 69069) % 7 == 0
        dur = max(1, int(min(t, 30)))
        rows.append(("g", dur, 0 if (cen or t >= 30) else c))
    subj = spark.createDataFrame(
        rows, "grp string, duration long, cause int"
    )
    tau = 20.0
    lyl = {
        r.cause: r.lyl
        for r in life_years_lost(subj, ["grp"], [1, 2], tau).collect()
    }
    # RMST from the km curve over the same integer grid: integral of
    # the step S over [0, tau) = sum of S(t_i) * gap on event grid
    km = sorted(
        km_curve(
            subj.withColumn(
                "event", (F.col("cause") > 0).cast("int")
            ),
            ["grp"], "duration", "event",
        ).collect(),
        key=lambda r: r.duration,
    )
    rmst, prev_t, prev_s = 0.0, 0.0, 1.0
    for r in km:
        t_i = float(r.duration)
        if t_i > tau:
            break
        rmst += prev_s * (t_i - prev_t)
        prev_t, prev_s = t_i, r.survival
    rmst += prev_s * (tau - prev_t)
    assert abs((tau - rmst) - (lyl[1] + lyl[2])) < 5e-4, (
        rmst, lyl,
    )


def test_weighted_logrank_family(spark):
    """Fleming-Harrington G^{rho,gamma}: (0,0) equals the plain
    log-rank to lattice tolerance; a LATE-emerging difference is
    caught by (0,1) with more power than (1,0) (early weights) on a
    planted delayed-effect cohort; weights shift expected_1
    accordingly."""
    from cancer_survival_etl_spark.operators.survival import (
        logrank_test,
        weighted_logrank_test,
    )

    # delayed effect: identical hazards before t=10, group b's hazard
    # drops 3x after t=10
    rows = []
    for i in range(1200):
        grp = "a" if i % 2 == 0 else "b"
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        lam1 = 0.06
        t_pre = -math.log(u) / lam1
        if t_pre <= 10 or grp == "a":
            t = t_pre
        else:
            u2 = ((i * 1103515245 + 7) % 999983) / 999983.0 + 1e-9
            t = 10 + (-math.log(u2) / (lam1 / 3.0))
        cen = (i * 48271) % 8 == 0
        dur = max(1, int(min(t, 40)))
        rows.append((grp, dur, 0 if (cen or t >= 40) else 1))
    df = spark.createDataFrame(rows, "grp string, duration long, event int")

    plain = logrank_test(df, "grp").collect()[0]
    fh00 = weighted_logrank_test(df, "grp").collect()[0]
    assert abs(fh00.chi_square - plain.chi_square) < 1e-4
    assert fh00.observed_1 == float(plain.observed_1)
    assert abs(fh00.expected_1 - plain.expected_1) < 1e-4

    late = weighted_logrank_test(df, "grp", rho=0.0, gamma=1.0).collect()[0]
    early = weighted_logrank_test(df, "grp", rho=1.0, gamma=0.0).collect()[0]
    # the late-difference test has the most power on a delayed effect
    assert late.chi_square > fh00.chi_square > early.chi_square, (
        late.chi_square, fh00.chi_square, early.chi_square,
    )
    assert late.chi_square > 10


def test_cif_with_ci_pins(spark):
    """cif_with_ci: (1) cif / survival_allcause / n_risk BIT-EQUAL to
    cif_competing_risks on a competing-risks draw; (2) single-cause
    reduction: se_cif equals km_curve's Greenwood se to lattice
    precision (the delta-method variance reduces to Greenwood
    identically); (3) CIs bracket the estimate and are NULL at
    cif = 0."""
    from cancer_survival_etl_spark.operators.survival import (
        cif_competing_risks,
        cif_with_ci,
        km_curve,
    )

    rows = []
    for i in range(400):
        grp = "x" if i % 2 == 0 else "y"
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        u2 = ((i * 1103515245 + 12345) % 999983) / 999983.0 + 1e-9
        t1 = -math.log(u) / 0.08
        t2 = -math.log(u2) / 0.05
        t, c = (t1, 1) if t1 < t2 else (t2, 2)
        cen = (i * 69069) % 6 == 0
        dur = max(1, int(min(t, 30)))
        rows.append((grp, dur, 0 if (cen or t >= 30) else c))
    subj = spark.createDataFrame(
        rows, "grp string, duration long, cause int"
    )
    plain = {
        (r.grp, r.duration, r.cause): r
        for r in cif_competing_risks(
            subj, ["grp"], [1, 2], "duration", "cause"
        ).collect()
    }
    rich = {
        (r.grp, r.duration, r.cause): r
        for r in cif_with_ci(
            subj, ["grp"], [1, 2], "duration", "cause"
        ).collect()
    }
    assert set(plain) == set(rich)
    for k, p in plain.items():
        r = rich[k]
        assert r.cif == p.cif, (k, r.cif, p.cif)
        assert r.survival_allcause == p.survival_allcause
        assert r.n_risk == p.n_risk
        if 0 < r.cif < 1:
            assert r.lower_ci <= r.cif <= r.upper_ci, (k, r)
            assert r.se_cif > 0
        if r.cif == 0.0:
            assert r.lower_ci is None and r.upper_ci is None
    # single-cause reduction: se_cif == Greenwood se of 1-S
    single = subj.withColumn(
        "cause", F.when(F.col("cause") > 0, 1).otherwise(0)
    )
    km = {
        (r.grp, r.duration): r
        for r in km_curve(
            single.withColumn("event", (F.col("cause") > 0).cast("int")),
            ["grp"], "duration", "event",
        ).collect()
    }
    ci1 = cif_with_ci(single, ["grp"], [1], "duration", "cause").collect()
    checked = 0
    for r in ci1:
        kmr = km[(r.grp, r.duration)]
        if kmr.se_greenwood is not None:
            assert abs(r.se_cif - kmr.se_greenwood) < 2e-6, (r, kmr)
            checked += 1
    assert checked > 20


def test_median_survival_ci_brookmeyer_crowley(spark):
    """B-C median CI: hand-replicated from the km cells (the CI is
    the set of times whose Greenwood z-test keeps S=0.5); agrees with
    median_survival on the point estimate; brackets it; narrows with
    sample size."""
    from cancer_survival_etl_spark.operators.survival import (
        km_curve,
        median_survival,
        median_survival_ci,
    )

    def cohort(n):
        rows = []
        for i in range(n):
            u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
            t = -math.log(u) / 0.09
            cen = (i * 48271) % 6 == 0
            dur = max(1, int(min(t, 30)))
            rows.append(("g", dur, 0 if (cen or t >= 30) else 1))
        return spark.createDataFrame(
            rows, "grp string, duration long, event int"
        )

    km = km_curve(cohort(300), ["grp"], "duration", "event")
    ci = median_survival_ci(km, ["grp"]).collect()[0]
    med = median_survival(km, ["grp"]).collect()[0]
    assert ci.median_time == med.median_time
    assert ci.median_reached
    assert ci.median_lower <= ci.median_time <= ci.median_upper
    # hand replication
    cells = km.collect()
    in_set = [r.duration for r in cells
              if r.se_greenwood is not None
              and abs(r.survival - 0.5) <= 1.96 * r.se_greenwood]
    assert ci.median_lower == min(in_set)
    assert ci.median_upper == max(in_set)
    # more subjects -> tighter CI
    km4 = km_curve(cohort(1200), ["grp"], "duration", "event")
    ci4 = median_survival_ci(km4, ["grp"]).collect()[0]
    assert (ci4.median_upper - ci4.median_lower) <= (
        ci.median_upper - ci.median_lower
    )


def test_logrank_trend_two_group_reduction_and_power(spark):
    """Tarone trend: with scores {0,1} the statistic must equal the
    plain two-group log-rank (numerator exactly O1-E1 up to sign,
    chi-square equal to lattice tolerance); a planted monotone
    dose-response across 3 levels is detected while a scrambled
    (non-monotone) assignment of the same three hazards scores far
    lower."""
    from cancer_survival_etl_spark.operators.survival import (
        logrank_test,
        logrank_trend_test,
    )

    def cohort(levels):
        # levels: dict score -> hazard
        rows = []
        for i in range(900):
            s = float(i % 3)
            lam = levels[s]
            u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
            t = -math.log(u) / lam
            cen = (i * 48271) % 7 == 0
            dur = max(1, int(min(t, 30)))
            rows.append((s, dur, 0 if (cen or t >= 30) else 1))
        return spark.createDataFrame(
            rows, "score double, duration long, event int"
        )

    # two-group reduction
    two = cohort({0.0: 0.06, 1.0: 0.12, 2.0: 0.06}).filter(
        "score < 2.0"
    )
    tr = logrank_trend_test(two, "score").collect()[0]
    lr = logrank_test(
        two.withColumn("grp", F.col("score").cast("string")), "grp"
    ).collect()[0]
    # score-1 group's O-E is the NEGATIVE of group "0.0"'s O1-E1
    assert abs(tr.z_numerator + (lr.observed_1 - lr.expected_1)) < 1e-4
    assert abs(tr.chi_square - lr.chi_square) < 1e-3
    assert tr.n_groups == 2

    mono = logrank_trend_test(
        cohort({0.0: 0.05, 1.0: 0.10, 2.0: 0.20}), "score"
    ).collect()[0]
    scrambled = logrank_trend_test(
        cohort({0.0: 0.10, 1.0: 0.20, 2.0: 0.05}), "score"
    ).collect()[0]
    assert mono.chi_square > 25, mono
    assert mono.chi_square > 2 * scrambled.chi_square, (
        mono.chi_square, scrambled.chi_square,
    )
    assert mono.z > 0  # higher dose -> more deaths -> positive trend


# ---------------------------------------------------------------------------
# Turnbull interval-censored NPMLE
# ---------------------------------------------------------------------------


def test_turnbull_right_censored_reduction_bit_equals_km(spark):
    """All-exact-events + right-censoring: turnbull_km's survival
    column must be BIT-EQUAL to km_curve's at every event time
    (exact event at t = interval (t-1, t]; censored at c = (c, NULL)).
    The E-step is degenerate (every event interval contains exactly
    one support), so the pin holds for ANY iters."""
    from cancer_survival_etl_spark.operators.survival import (
        km_curve,
        turnbull_km,
    )

    rows = []
    for i in range(300):
        t = 1 + (i * 7919) % 23
        ev = 0 if i % 4 == 0 else 1
        rows.append(("A" if i % 2 == 0 else "B", t, ev))
    subj = spark.createDataFrame(rows, "grp string, duration long, event int")
    km = {
        (r.grp, float(r.duration)): r.survival
        for r in km_curve(subj, ["grp"], "duration", "event").collect()
        if r.n_event > 0
    }
    iv = subj.selectExpr(
        "grp",
        "CAST(CASE WHEN event = 1 THEN duration - 1 ELSE duration END"
        " AS DOUBLE) AS left",
        "CAST(CASE WHEN event = 1 THEN duration ELSE NULL END"
        " AS DOUBLE) AS right",
    )
    tb = {
        (r.grp, r.time): r.survival
        for r in turnbull_km(iv, ["grp"], "left", "right", iters=2).collect()
    }
    assert set(tb) == set(km)
    for k in km:
        assert tb[k] == km[k], (k, tb[k], km[k])  # bit-equal


def test_turnbull_fractional_endpoints_total_order(spark):
    """HALF-INTEGER event/censor times: a censor row at time t and a
    support row at time t+0.5 collided under the former
    _ord = 2t+(1−issup) double fold (ADVICE r07 — only a total order
    for times ≥1 apart), making at-risk prefix sums tie-ambiguous.
    The struct (t, censor-after-support) order is total for arbitrary
    doubles: the all-exact-events reduction must stay BIT-EQUAL to
    km_curve run on the same cohort with time rescaled to integers
    (survival depends only on the d/y sequence, not the time axis)."""
    from cancer_survival_etl_spark.operators.survival import (
        km_curve,
        turnbull_km,
    )

    rows = []
    for i in range(300):
        th = 1 + (i * 7919) % 23          # half-units: t = th * 0.5
        ev = 0 if i % 4 == 0 else 1
        rows.append(("A" if i % 2 == 0 else "B", th, ev))
    subj = spark.createDataFrame(rows, "grp string, th long, event int")
    km = {
        (r.grp, float(r.th)): r.survival
        for r in km_curve(subj, ["grp"], "th", "event").collect()
        if r.n_event > 0
    }
    iv = subj.selectExpr(
        "grp",
        "CASE WHEN event = 1 THEN th * 0.5 - 0.5 ELSE th * 0.5 END"
        " AS left",
        "CASE WHEN event = 1 THEN th * 0.5 ELSE NULL END AS right",
    )
    tb = {
        (r.grp, r.time * 2.0): r.survival
        for r in turnbull_km(iv, ["grp"], "left", "right", iters=2).collect()
    }
    assert set(tb) == set(km)
    for k in km:
        assert tb[k] == km[k], (k, tb[k], km[k])  # bit-equal


def test_turnbull_single_support_intersection(spark):
    """Overlapping intervals (0,2] and (1,3]: the only innermost
    interval is their intersection (1,2] — all mass lands there and
    the curve drops to 0 at t=2 (classic Turnbull degenerate case)."""
    from cancer_survival_etl_spark.operators.survival import turnbull_km

    iv = spark.createDataFrame(
        [("g", 0.0, 2.0), ("g", 1.0, 3.0)],
        "grp string, left double, right double",
    )
    out = turnbull_km(iv, ["grp"], iters=1).collect()
    assert len(out) == 1
    r = out[0]
    assert r.q_lo == 1.0 and r.time == 2.0
    assert r.mass == 1.0 and r.survival == 0.0


def test_turnbull_em_fixed_point_masses(spark):
    """obs = {(0,1], (0,2], (1,2]}: NPMLE masses are (1/2, 1/2) and
    EM lands there in ONE iteration from uniform init; the asymmetric
    cohort {(0,1]x2, (0,2], (1,2]} has NPMLE p1 = 2/3 (maximize
    p1^2·(1-p1)) — EM converges geometrically, 15 iterations are
    inside the 1e-5 lattice."""
    from cancer_survival_etl_spark.operators.survival import turnbull_km

    sym = spark.createDataFrame(
        [("g", 0.0, 1.0), ("g", 0.0, 2.0), ("g", 1.0, 2.0)],
        "grp string, left double, right double",
    )
    out = {r.q_lo: r for r in turnbull_km(sym, ["grp"], iters=1).collect()}
    assert out[0.0].mass == 0.5 and out[1.0].mass == 0.5
    # survival: S(1) = 1 - 1/2, S(2) = 0
    assert abs(out[0.0].survival - 0.5) < 2e-6
    assert out[1.0].survival == 0.0

    asym = spark.createDataFrame(
        [("g", 0.0, 1.0), ("g", 0.0, 1.0), ("g", 0.0, 2.0),
         ("g", 1.0, 2.0)],
        "grp string, left double, right double",
    )
    out = {r.q_lo: r for r in turnbull_km(asym, ["grp"], iters=15).collect()}
    assert abs(out[0.0].mass - 2.0 / 3.0) < 1e-5, out[0.0].mass
    assert abs(out[1.0].mass - 1.0 / 3.0) < 1e-5, out[1.0].mass


def test_turnbull_censored_tail_mass(spark):
    """A subject censored beyond every finite right endpoint spawns
    the ∞-tail support; finite masses then sum to < 1 and the curve
    stays ABOVE zero after the last support (KM behavior)."""
    from cancer_survival_etl_spark.operators.survival import turnbull_km

    iv = spark.createDataFrame(
        [("g", 0.0, 2.0), ("g", 1.0, 3.0), ("g", 4.0, None),
         ("g", 4.0, None)],
        "grp string, left double, right double",
    )
    out = turnbull_km(iv, ["grp"], iters=5).collect()
    assert len(out) == 1  # (1,2] is the only finite support
    r = out[0]
    # 2 of 4 subjects' mass is stuck in (4, ∞)
    assert abs(r.mass - 0.5) < 2e-6
    assert abs(r.survival - 0.5) < 2e-6  # 2 events, 4 at risk


def test_turnbull_validations(spark):
    import pytest

    from cancer_survival_etl_spark.operators.survival import turnbull_km

    iv = spark.createDataFrame(
        [("g", 3.0, 2.0)], "grp string, left double, right double"
    )
    with pytest.raises(Exception, match="left < right"):
        turnbull_km(iv, ["grp"]).collect()
    good = spark.createDataFrame(
        [("g", 1.0, 2.0)], "grp string, left double, right double"
    )
    with pytest.raises(ValueError, match="iters"):
        turnbull_km(good, ["grp"], iters=0)
    nul = spark.createDataFrame(
        [("g", None, 2.0)], "grp string, left double, right double"
    )
    with pytest.raises(Exception, match="non-NULL left"):
        turnbull_km(nul, ["grp"]).collect()


# ---------------------------------------------------------------------------
# Aalen additive hazards
# ---------------------------------------------------------------------------


def _aalen_numpy(rows, p):
    """Reference Aalen least-squares increments replicating the
    operator's lattice arithmetic exactly (nano moments, micro
    increments, pico variances)."""
    import numpy as np

    times = sorted({t for (*_, t, e) in rows if e == 1})
    out = {}
    cumb = np.zeros(p + 1)
    cumv = np.zeros(p + 1)
    singular = False
    for t in times:
        risk = [r for r in rows if r[-2] >= t]
        evs = [r for r in rows if r[-2] == t and r[-1] == 1]
        A = np.zeros((p + 1, p + 1))
        M = np.zeros((p + 1, p + 1))
        for rset, mat in ((risk, A), (evs, M)):
            for r in rset:
                x = np.array([1.0, *r[:p]])
                for i in range(p + 1):
                    for j in range(p + 1):
                        term = x[i] * x[j]
                        if (i, j) != (0, 0):
                            term = round(term * 1e9) / 1e9
                        mat[i, j] += term
        det = np.linalg.det(A)
        if det <= 1e-6:
            singular = True
        if singular:
            out[t] = None
            continue
        inv = np.linalg.inv(A)
        binc = inv @ M[:, 0]
        vinc = np.diag(inv @ M @ inv)
        binc = np.round(binc * 1e6) / 1e6
        vinc = np.round(vinc * 1e12) / 1e12
        cumb += binc
        cumv += vinc
        out[t] = (binc.copy(), cumb.copy(), np.sqrt(cumv))
    return out


def test_aalen_additive_matches_numpy_reference(spark):
    """One-covariate model on a mixed cohort: per-event-time
    increments, cumulative coefficients and Aalen SEs all match an
    independent dense numpy implementation to the 1e-5 lattice."""
    from cancer_survival_etl_spark.operators.survival import (
        aalen_additive,
    )

    rows = []
    for i in range(60):
        x = (i % 5) / 4.0
        t = 1 + (i * 13) % 9
        e = 0 if i % 4 == 0 else 1
        rows.append((x, t, e))
    df = spark.createDataFrame(
        [("g", *r) for r in rows],
        "grp string, x double, duration long, event int",
    )
    got = {
        r.time: r
        for r in aalen_additive(df, ["grp"], ["x"]).collect()
    }
    ref = _aalen_numpy(rows, 1)
    assert set(got) == set(ref)
    for t, exp in ref.items():
        r = got[t]
        if exp is None:
            assert r.intercept_cum is None and r.x_cum is None, r
            continue
        binc, cumb, se = exp
        assert abs(r.intercept_incr - binc[0]) < 2e-5, (t, r)
        assert abs(r.x_incr - binc[1]) < 2e-5, (t, r)
        assert abs(r.intercept_cum - cumb[0]) < 5e-5, (t, r)
        assert abs(r.x_cum - cumb[1]) < 5e-5, (t, r)
        assert abs(r.intercept_se - se[0]) < 5e-5, (t, r)
        assert abs(r.x_se - se[1]) < 5e-5, (t, r)


def test_aalen_additive_two_covariates_matches_numpy(spark):
    from cancer_survival_etl_spark.operators.survival import (
        aalen_additive,
    )

    rows = []
    for i in range(80):
        x1 = (i % 4) / 3.0
        x2 = ((i * 3) % 7) / 6.0
        t = 1 + (i * 11) % 8
        e = 0 if i % 5 == 0 else 1
        rows.append((x1, x2, t, e))
    df = spark.createDataFrame(
        [("g", *r) for r in rows],
        "grp string, x1 double, x2 double, duration long, event int",
    )
    got = {
        r.time: r
        for r in aalen_additive(df, ["grp"], ["x1", "x2"]).collect()
    }
    ref = _aalen_numpy(rows, 2)
    assert set(got) == set(ref)
    for t, exp in ref.items():
        r = got[t]
        if exp is None:
            assert r.x1_cum is None and r.x2_cum is None
            continue
        binc, cumb, se = exp
        for name, k in (("intercept", 0), ("x1", 1), ("x2", 2)):
            assert abs(getattr(r, f"{name}_incr") - binc[k]) < 5e-5, (
                t, name, r)
            assert abs(getattr(r, f"{name}_cum") - cumb[k]) < 1e-4, (
                t, name, r)
            assert abs(getattr(r, f"{name}_se") - se[k]) < 1e-4, (
                t, name, r)


def test_aalen_additive_recovers_time_varying_effect(spark):
    """Planted piecewise effect: x doubles the hazard ONLY before
    t=10 (effect vanishes after). The cumulative B_x(t) slope must be
    clearly positive over the early window and near-flat late —
    exactly what cox_ph's single constant β cannot represent (the
    test_cox_td_recovers_time_varying_effect pattern)."""
    import math

    from cancer_survival_etl_spark.operators.survival import (
        aalen_additive,
    )

    rows = []
    for i in range(4000):
        x = float(i % 2)
        u = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        base = 0.03
        early = base + (0.06 if x > 0 else 0.0)
        # piecewise-exponential draw: hazard `early` on [0,10), `base` after
        t_try = -math.log(u) / early
        if t_try < 10:
            t = t_try
        else:
            u2 = ((i * 48271 + 7) % 999983) / 999983.0 + 1e-9
            t = 10 - math.log(u2) / base
        dur = min(int(t) + 1, 30)
        rows.append(("g", x, dur, 1 if t < 30 else 0))
    df = spark.createDataFrame(
        rows, "grp string, x double, duration long, event int"
    )
    out = {r.time: r for r in
           aalen_additive(df, ["grp"], ["x"]).collect()}
    b_at = {t: out[t].x_cum for t in out if out[t].x_cum is not None}
    early_slope = b_at[10] / 10.0
    late_slope = (b_at[25] - b_at[10]) / 15.0
    assert early_slope > 0.035, (early_slope, late_slope)  # ~0.06
    assert abs(late_slope) < 0.02, (early_slope, late_slope)  # ~0


def test_aalen_additive_singular_tail_nulls(spark):
    """Once the at-risk set loses covariate rank (everyone left has
    the same x), the Gram matrix is singular: later event rows keep
    counts but report NULL coefficients."""
    from cancer_survival_etl_spark.operators.survival import (
        aalen_additive,
    )

    rows = [
        ("g", 0.0, 1, 1), ("g", 1.0, 1, 1),
        ("g", 0.0, 2, 1), ("g", 1.0, 2, 1),
        # only x=1 subjects at risk from t=3 on
        ("g", 1.0, 3, 1), ("g", 1.0, 4, 1),
    ]
    df = spark.createDataFrame(
        rows, "grp string, x double, duration long, event int"
    )
    out = {r.time: r for r in
           aalen_additive(df, ["grp"], ["x"]).collect()}
    assert out[1].x_cum is not None and out[2].x_cum is not None
    assert out[3].x_cum is None and out[4].x_cum is None
    assert out[3].n_risk == 2 and out[3].n_event == 1


def test_aalen_additive_validations(spark):
    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        aalen_additive,
    )

    df = spark.createDataFrame(
        [("g", 1.0, 1, 1)], "grp string, x double, duration long, event int"
    )
    with pytest.raises(ValueError, match="1 or 2"):
        aalen_additive(df, ["grp"], [])
    with pytest.raises(ValueError, match="1 or 2"):
        aalen_additive(df, ["grp"], ["x", "x", "x"])


def test_fine_gray_wald_se(spark):
    """return_se=True: (a) matches the sequential reference's
    final-information inverse; (b) with no competing events the SEs
    equal cox_ph's return_se exactly; (c) β is unchanged by asking
    for SEs; (d) the planted effect's 95% CI behaves (excludes 0,
    se is n-appropriately tight)."""
    import numpy as np

    from cancer_survival_etl_spark.operators.survival import (
        cox_ph,
        fine_gray,
    )

    p_mix, b_true = 0.55, 0.9
    rows = []
    for i in range(700):
        x = i % 2
        eta = math.exp(b_true * x)
        u1 = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        u2 = ((i * 40503 + 13) % 999979) / 999979.0 + 1e-9
        u3 = ((i * 69069 + 5) % 999961) / 999961.0
        p1 = 1.0 - (1.0 - p_mix) ** eta
        if u1 < p1:
            inner = (1.0 - (1.0 - u1) ** (1.0 / eta)) / p_mix
            t = -math.log(1.0 - inner)
            c = 1
        else:
            t = -math.log(u2)
            c = 2
        if u3 < 0.3:
            t, c = t * u3 / 0.3, 0
        rows.append((float(x), round(min(t, 3.0), 1),
                     c if t <= 3.0 else 0))
    df = spark.createDataFrame(
        rows, "x double, duration double, cause int"
    )
    beta_only = fine_gray(df, ["x"], iters=5)
    beta, se = fine_gray(df, ["x"], iters=5, return_se=True)
    assert beta == beta_only  # SEs are a zero-extra-pass readout

    # sequential reference: rebuild the final information matrix
    X = np.array([[r[0]] for r in rows])
    dur = np.array([r[1] for r in rows])
    cause = np.array([r[2] for r in rows])
    ref_b = _fine_gray_reference(X, dur, cause, iters=5)
    # one more info evaluation at the returned beta (penultimate
    # iterate convention — same as the operator)
    ref_b4 = _fine_gray_reference(X, dur, cause, iters=4)
    n = len(rows)
    times = np.unique(dur)
    lng = {}
    acc = 0
    for t in times:
        lng[t] = acc
        n_at = int((dur >= t).sum())
        c = int(((dur == t) & (cause == 0)).sum())
        if 0 < c < n_at:
            acc += round(math.log(1.0 - c / n_at) * 1e6)
    G = {t: math.exp(v / 1e6) for t, v in lng.items()}
    r = np.exp(X @ ref_b4)
    info = np.zeros((1, 1))
    for t in np.unique(dur[cause == 1]):
        tied = (dur == t) & (cause == 1)
        d = int(tied.sum())
        alive = dur >= t
        cmp_in = (cause == 2) & (dur < t)
        w = np.zeros(n)
        w[alive] = 1.0
        w[cmp_in] = G[t] / np.array([G[ti] for ti in dur[cmp_in]])
        rw = r * w
        S0, S1 = rw.sum(), (rw * X[:, 0]).sum()
        S2 = (rw * X[:, 0] * X[:, 0]).sum()
        info[0, 0] += d * (S2 / S0 - (S1 / S0) ** 2)
    ref_se = float(np.sqrt(1.0 / info[0, 0]))
    assert abs(se[0] - ref_se) < 1e-4, (se, ref_se)

    # CI behavior on the planted positive effect
    assert beta[0] - 1.96 * se[0] > 0.0
    assert 0.05 < se[0] < 0.5

    # no-competing reduction: SEs equal cox_ph's exactly
    two = df.filter(F.col("cause") != 2)
    fg_b, fg_se = fine_gray(two, ["x"], iters=4, return_se=True)
    cx_b, cx_se = cox_ph(
        two.withColumnRenamed("cause", "event"), ["x"], iters=4,
        return_se=True,
    )
    assert fg_b == cx_b and fg_se == cx_se


# ---------------------------------------------------------------------------
# Restricted cubic spline Cox
# ---------------------------------------------------------------------------


def test_rcs_basis_properties(spark):
    """RCS basis sanity on a grid: k knots -> k-1 columns; linear
    tails (second differences vanish beyond the boundary knots);
    continuity through knots; <3 knots degenerates to [x]."""
    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        rcs_basis_cols,
    )

    grid = spark.range(0, 201).select(
        (F.col("id") / 10.0).alias("x")
    )
    cols = rcs_basis_cols(F.col("x"), [2.0, 8.0, 14.0, 18.0])
    assert len(cols) == 3
    rows = (
        grid.select("x", *[c.alias(f"b{j}") for j, c in enumerate(cols)])
        .orderBy("x")
        .collect()
    )
    xs = [r.x for r in rows]
    for j in range(3):
        vs = [r[f"b{j}"] for r in rows]
        # linear beyond the last knot: second differences ~ 0
        hi = [i for i, x in enumerate(xs) if x > 18.2][1:-1]
        for i in hi:
            dd = vs[i + 1] - 2 * vs[i] + vs[i - 1]
            assert abs(dd) < 1e-9, (j, xs[i], dd)
        # and below the first knot
        lo = [i for i, x in enumerate(xs) if x < 1.8][1:-1]
        for i in lo:
            dd = vs[i + 1] - 2 * vs[i] + vs[i - 1]
            assert abs(dd) < 1e-9, (j, xs[i], dd)
    assert len(rcs_basis_cols(F.col("x"), [])) == 1
    assert len(rcs_basis_cols(F.col("x"), [3.0, 9.0])) == 1
    with pytest.raises(ValueError, match="distinct"):
        rcs_basis_cols(F.col("x"), [1.0, 1.0, 2.0])


def test_cox_spline_linear_reduction_bit_equals_cox(spark):
    """With < 3 knots the spline basis is exactly [x], so the fit is
    BIT-EQUAL to cox_ph on the raw column — coefficients and SEs."""
    from cancer_survival_etl_spark.operators.survival import (
        cox_ph,
        cox_ph_spline,
    )

    df = _td_cohort(spark)  # x1, x2, duration, event
    b_sp, se_sp = cox_ph_spline(
        df, "x1", [], adjust_cols=["x2"], iters=4, return_se=True
    )
    b_cx, se_cx = cox_ph(df, ["x1", "x2"], iters=4, return_se=True)
    assert b_sp == b_cx and se_sp == se_cx


def test_cox_spline_detects_planted_nonlinearity(spark):
    """Planted U-shaped log-hazard lp(x) = 2(x-1)^2 on x ∈ [0,2]:
    the spline's nonlinear coefficients must be jointly significant
    (|z| > 3 for at least one), and the fitted curve must recover
    the U (lp at the edges above lp at the minimum by ~2 on the log
    scale) — where plain cox_ph reads a near-zero slope."""
    import math

    from cancer_survival_etl_spark.operators.survival import (
        cox_ph,
        cox_ph_spline,
        rcs_basis_cols,
    )

    rows = []
    for i in range(5000):
        x = (i % 21) / 10.0  # 0..2
        u = ((i * 2654435761 + 11) % 999983) / 999983.0 + 1e-9
        lp = 2.0 * (x - 1.0) ** 2
        t = -math.log(u) / (0.05 * math.exp(lp))
        dur = min(int(t) + 1, 60)
        rows.append((x, dur, 1 if t < 60 else 0))
    df = spark.createDataFrame(rows, "x double, duration long, event int")
    knots = [0.2, 1.0, 1.8]
    beta, se = cox_ph_spline(df, "x", knots, iters=6, return_se=True)
    assert len(beta) == 2
    # the nonlinear (cubic) coefficient is loudly significant
    assert abs(beta[1] / se[1]) > 3, (beta, se)
    # plain Cox sees almost nothing (symmetric U around the center)
    b_lin = cox_ph(df, ["x"], iters=6)
    assert abs(b_lin[0]) < 0.4, b_lin
    # fitted curve recovers the U shape: evaluate lp on a grid
    grid = spark.createDataFrame(
        [(0.0,), (1.0,), (2.0,)], "x double"
    )
    cols = rcs_basis_cols(F.col("x"), knots)
    vals = grid.select(
        "x",
        sum(
            (F.lit(beta[j]) * c for j, c in enumerate(cols[1:], 1)),
            F.lit(beta[0]) * cols[0],
        ).alias("lp"),
    ).collect()
    lp = {r.x: r.lp for r in vals}
    assert lp[0.0] - lp[1.0] > 1.0, lp
    assert lp[2.0] - lp[1.0] > 1.0, lp


# ---------------------------------------------------------------------------
# Annual percent change
# ---------------------------------------------------------------------------


def test_apc_trend_recovers_planted_growth(spark):
    """Rates planted to grow exactly 5%/period: ln-rate is exactly
    linear, so APC = 5.0 to lattice precision, the CI collapses onto
    the point (RSS ~ 0), and a flat plant gives APC ~ 0. numpy OLS
    replication on a noisy plant pins slope and the SE formula."""
    import math

    import numpy as np

    from cancer_survival_etl_spark.operators.survival import apc_trend

    pt = 1000000
    rows = []
    for p in range(12):
        rate = 0.01 * (1.05 ** p)
        rows.append(("grow", p, int(round(rate * pt)), pt))
        rows.append(("flat", p, int(round(0.02 * pt)), pt))
    df = spark.createDataFrame(
        rows, "grp string, period long, cases long, person_time long"
    )
    out = {r.grp: r for r in
           apc_trend(df, ["grp"], "period", "cases",
                     "person_time").collect()}
    assert abs(out["grow"].apc_pct - 5.0) < 0.01, out["grow"]
    assert abs(out["grow"].apc_upper - out["grow"].apc_lower) < 0.1
    assert abs(out["flat"].apc_pct) < 0.01, out["flat"]

    # noisy plant vs numpy OLS on the SAME micro-lattice ln rates
    noisy = []
    for p in range(10):
        c = int(round(0.01 * (1.03 ** p) * pt * (1 + 0.2 * math.sin(p))))
        noisy.append(("n", p, c, pt))
    dfn = spark.createDataFrame(
        noisy, "grp string, period long, cases long, person_time long"
    )
    r = apc_trend(dfn, ["grp"], "period", "cases",
                  "person_time").collect()[0]
    xs = np.array([p for (_, p, _, _) in noisy], float)
    ys = np.array(
        [round(math.log(c / pt) * 1e6) / 1e6 for (_, _, c, _) in noisy]
    )
    n = len(xs)
    sxx = (xs * xs).sum() - xs.sum() ** 2 / n
    sxy = (xs * ys).sum() - xs.sum() * ys.sum() / n
    syy = (ys * ys).sum() - ys.sum() ** 2 / n
    slope = sxy / sxx
    se = math.sqrt(max(syy - slope * sxy, 0.0) / (n - 2) / sxx)
    assert abs(r.slope - slope) < 1e-6, (r.slope, slope)
    assert abs(r.apc_pct - 100 * (math.exp(slope) - 1)) < 1e-4
    assert abs(
        r.apc_lower - 100 * (math.exp(slope - 1.96 * se) - 1)
    ) < 1e-4
    assert abs(
        r.apc_upper - 100 * (math.exp(slope + 1.96 * se) - 1)
    ) < 1e-4


def test_apc_trend_guards(spark):
    import pytest

    from cancer_survival_etl_spark.operators.survival import apc_trend

    zero = spark.createDataFrame(
        [("g", 0, 5, 100), ("g", 1, 0, 100), ("g", 2, 4, 100)],
        "grp string, period long, cases long, person_time long",
    )
    with pytest.raises(Exception, match="cases > 0"):
        apc_trend(zero, ["grp"]).collect()
    # degenerate: < 3 periods -> NULLs, not a crash
    two = spark.createDataFrame(
        [("g", 0, 5, 100), ("g", 1, 6, 100)],
        "grp string, period long, cases long, person_time long",
    )
    r = apc_trend(two, ["grp"]).collect()[0]
    assert r.n_periods == 2 and r.apc_pct is None


# ---------------------------------------------------------------------------
# Lexis expansion
# ---------------------------------------------------------------------------


def test_lexis_expand_hand_example(spark):
    """Hand-checkable split: age0=30, time0=5, D=40, age breaks at
    {0,25,50}, period breaks at {0,20,40}. Cuts in follow-up u:
    age 50 at u=20; period 20 at u=15, period 40 at u=35 →
    segments [0,15) [15,20) [20,35) [35,40) with the event only in
    the last; risk time is conserved exactly."""
    from cancer_survival_etl_spark.operators.survival import (
        lexis_expand,
    )

    df = spark.createDataFrame(
        [("s1", 30.0, 5.0, 40.0, 1)],
        "sid string, age0 double, t0 double, dur double, event int",
    )
    rows = sorted(
        lexis_expand(
            df, "age0", "t0", "dur", "event", [0, 25, 50], [0, 20, 40]
        ).collect(),
        key=lambda r: r.slice_start,
    )
    got = [
        (r.slice_start, r.risk_time, r.age_band, r.period_band,
         r.event_slice)
        for r in rows
    ]
    assert got == [
        (0.0, 15.0, 25.0, 0.0, 0),
        (15.0, 5.0, 25.0, 20.0, 0),
        (20.0, 15.0, 50.0, 20.0, 0),
        (35.0, 5.0, 50.0, 40.0, 1),
    ], got
    assert abs(sum(r.risk_time for r in rows) - 40.0) < 1e-12


def test_lexis_expand_conservation_and_bands(spark):
    """Person-time conservation over a planted cohort, exactly one
    event slice per event subject, band attribution below the first
    break is NULL (not clamped), zero duration raises."""
    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        lexis_expand,
    )

    rows = [
        (f"s{i}", float(20 + i % 37), float(i % 11), float(1 + i % 29),
         i % 3 == 0)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "sid string, age0 double, t0 double, dur double, event boolean"
    )
    out = lexis_expand(
        df, "age0", "t0", "dur", "event",
        [0, 25, 35, 45], [0, 8, 16, 24, 32],
    )
    agg = out.groupBy("sid").agg(
        F.sum("risk_time").alias("rt"),
        F.sum("event_slice").alias("ev"),
        F.min("age_band").alias("min_band"),
    ).collect()
    exp = {r[0]: (r[3], 1 if r[4] else 0) for r in rows}
    for r in agg:
        assert abs(r.rt - exp[r.sid][0]) < 1e-9, r
        assert r.ev == exp[r.sid][1], r
    # below-first-break ages yield NULL band
    low = spark.createDataFrame(
        [("x", 1.0, 0.0, 5.0, 0)],
        "sid string, age0 double, t0 double, dur double, event int",
    )
    r = lexis_expand(
        low, "age0", "t0", "dur", "event", [10, 20], [0, 100]
    ).collect()
    assert all(row.age_band is None for row in r)
    bad = spark.createDataFrame(
        [("x", 1.0, 0.0, 0.0, 0)],
        "sid string, age0 double, t0 double, dur double, event int",
    )
    with pytest.raises(Exception, match="duration must be > 0"):
        lexis_expand(
            bad, "age0", "t0", "dur", "event", [0], [0]
        ).collect()


# ---------------------------------------------------------------------------
# Limited-duration prevalence (counting method)
# ---------------------------------------------------------------------------


def test_prevalence_counting_hand_example(spark):
    """Hand-checkable cohort, index at t=10, no duration limit:
    s1 diagnosed 0, followed 12 (alive at index)      -> 1
    s2 diagnosed 2, died at 2+5=7 < 10                -> 0
    s3 diagnosed 4, censored at 4+3=7 (lost)          -> S(6)/S(3)
    s4 diagnosed 12 (after index)                     -> excluded
    s5 diagnosed 0, censored at 8 (lost)              -> S(10)/S(8)
    KM is over the INCLUDED subjects' (duration, event)."""
    from cancer_survival_etl_spark.operators.survival import (
        km_curve,
        prevalence_counting,
    )

    rows = [
        ("g", 0.0, 12.0, 0),
        ("g", 2.0, 5.0, 1),
        ("g", 4.0, 3.0, 0),
        ("g", 12.0, 2.0, 0),
        ("g", 0.0, 8.0, 0),
    ]
    df = spark.createDataFrame(
        rows, "grp string, diag double, dur double, event int"
    )
    r = prevalence_counting(
        df, ["grp"], "diag", "dur", "event", index_time=10.0
    ).collect()[0]
    assert r.n_diagnosed == 4
    assert r.n_known_alive == 1
    assert r.n_known_dead == 1
    assert r.n_lost == 2
    km = {
        row.dur: row.survival
        for row in km_curve(
            df.filter("diag <= 10"), ["grp"], "dur", "event"
        ).collect()
    }

    def s_at(h):
        ts = [t for t in km if t <= h]
        return km[max(ts)] if ts else 1.0

    want = 1.0 + round(
        round(1 * (s_at(6.0) / s_at(3.0)) * 1e6) / 1e6
        + round(1 * (s_at(10.0) / s_at(8.0)) * 1e6) / 1e6, 6)
    # single lattice fold: each lost cell micro-rounded then summed
    got_tail = r.prevalent_expected - 1.0
    exp_tail = (round(s_at(6.0) / s_at(3.0) * 1e6)
                + round(s_at(10.0) / s_at(8.0) * 1e6)) / 1e6
    assert abs(got_tail - exp_tail) < 1e-9, (r.prevalent_expected, want)


def test_prevalence_counting_no_loss_is_exact_count(spark):
    """With every subject followed past the index, the expected
    prevalence IS the alive count (no imputation), and deaths after
    the index still count as alive at it."""
    from cancer_survival_etl_spark.operators.survival import (
        prevalence_counting,
    )

    rows = []
    for i in range(100):
        diag = float(i % 5)
        dies = i % 3 == 0
        rows.append(("g", diag, 20.0, 1 if dies else 0))
    df = spark.createDataFrame(
        rows, "grp string, diag double, dur double, event int"
    )
    r = prevalence_counting(
        df, ["grp"], "diag", "dur", "event", index_time=10.0
    ).collect()[0]
    assert r.n_lost == 0 and r.n_known_dead == 0
    assert r.prevalent_expected == float(r.n_known_alive) == 100.0

    # limited duration: only diagnoses within L of the index count
    r2 = prevalence_counting(
        df, ["grp"], "diag", "dur", "event", index_time=10.0,
        limited_duration=8.0,
    ).collect()[0]
    assert r2.n_diagnosed == sum(1 for _, d, _, _ in rows if d > 2.0)


# ---------------------------------------------------------------------------
# Weighted / IPW-adjusted KM
# ---------------------------------------------------------------------------


def test_km_weighted_unit_reduction_bit_equals_km(spark):
    """All weights 1: survival BIT-EQUAL to km_curve at every cell
    (scaled integer numerator/denominator divide identically)."""
    from cancer_survival_etl_spark.operators.survival import (
        km_curve,
        km_curve_weighted,
    )

    subj = _td_cohort(spark)
    km = {
        (r.x1, r.duration): r.survival
        for r in km_curve(subj, ["x1"], "duration", "event").collect()
    }
    wkm = {
        (r.x1, r.duration): r.survival
        for r in km_curve_weighted(
            subj.withColumn("weight", F.lit(1.0)),
            ["x1"], "duration", "event", "weight",
        ).collect()
    }
    assert wkm == km


def test_km_weighted_replication_weights(spark):
    """Integer weight k equals physically replicating each subject k
    times (exact identity of the weighted estimator)."""
    from cancer_survival_etl_spark.operators.survival import (
        km_curve,
        km_curve_weighted,
    )
    rows = [("g", 1 + (i * 7) % 9, 0 if i % 4 == 0 else 1,
             1 + i % 3) for i in range(40)]
    df = spark.createDataFrame(
        rows, "grp string, duration long, event int, weight int"
    )
    wkm = {
        r.duration: r.survival
        for r in km_curve_weighted(df, ["grp"]).collect()
    }
    rep = [(g, d, e) for (g, d, e, k) in rows for _ in range(k)]
    dfr = spark.createDataFrame(rep, "grp string, duration long, event int")
    km = {
        r.duration: r.survival
        for r in km_curve(dfr, ["grp"]).collect()
    }
    assert wkm == km
    import pytest
    bad = spark.createDataFrame(
        [("g", 1, 1, 0.0)],
        "grp string, duration long, event int, weight double",
    )
    with pytest.raises(Exception, match="weights must be > 0"):
        km_curve_weighted(bad, ["grp"]).collect()


def test_ipw_adjusted_km_removes_planted_confounding(spark):
    """Simpson plant on curves: within each covariate stratum the two
    arms have the SAME hazard, but arm 1 is enriched in the
    high-hazard stratum — the crude KM curves separate, the
    IPW-adjusted ones coincide (gap shrinks by >3x)."""
    import math

    from cancer_survival_etl_spark.operators.survival import (
        ipw_adjusted_km,
        km_curve,
    )

    rows = []
    for i in range(6000):
        u_x = ((i * 48271 + 3) % 999983) / 999983.0
        u_a = ((i * 69069 + 11) % 999979) / 999979.0
        u_t = ((i * 2654435761 + 7) % 999961) / 999961.0 + 1e-9
        x = 1.0 if u_x < 0.5 else 0.0          # frailty stratum
        p_arm = 0.8 if x > 0 else 0.2          # confounded assignment
        a = 1 if u_a < p_arm else 0
        haz = 0.15 if x > 0 else 0.04          # hazard from x ONLY
        t = -math.log(u_t) / haz
        dur = min(int(t) + 1, 30)
        rows.append((a, x, dur, 1 if t < 30 else 0))
    df = spark.createDataFrame(
        rows, "arm int, x double, duration long, event int"
    )

    def s_at(curve, arm, t):
        pts = [r for r in curve if r[0] == arm and r[1] <= t]
        return max(pts, key=lambda r: r[1])[2] if pts else 1.0

    crude = [
        (r.arm, r.duration, r.survival)
        for r in km_curve(df, ["arm"], "duration", "event").collect()
    ]
    adj = [
        (r.arm, r.duration, r.survival)
        for r in ipw_adjusted_km(
            df, "arm", ["x"], "duration", "event"
        ).collect()
    ]
    gap_crude = abs(s_at(crude, 1, 15) - s_at(crude, 0, 15))
    gap_adj = abs(s_at(adj, 1, 15) - s_at(adj, 0, 15))
    assert gap_crude > 0.10, (gap_crude, gap_adj)
    assert gap_adj < gap_crude / 3, (gap_crude, gap_adj)


def _simpson_curve_cohort(spark, with_junk=False):
    """Shared Simpson plant: within each frailty stratum x the arms
    share a hazard; arm 1 is enriched in the high-hazard stratum.
    Administrative censoring at 30 only."""
    import math

    rows = []
    for i in range(6000):
        u_x = ((i * 48271 + 3) % 999983) / 999983.0
        u_a = ((i * 69069 + 11) % 999979) / 999979.0
        u_t = ((i * 2654435761 + 7) % 999961) / 999961.0 + 1e-9
        junk = float((i * 104729 + 5) % 2)
        x = 1.0 if u_x < 0.5 else 0.0
        a = 1 if u_a < (0.8 if x > 0 else 0.2) else 0
        haz = 0.15 if x > 0 else 0.04
        t = -math.log(u_t) / haz
        dur = min(int(t) + 1, 30)
        ev = 1 if t < 30 else 0
        rows.append((a, x, junk, dur, ev))
    return spark.createDataFrame(
        rows, "arm int, x double, junk double, duration long, event int"
    )


def test_aipw_survival_contrast_deconfounds_and_reduces_to_ipw(spark):
    """(a) Simpson plant: the AIPW contrast at t=15 must shrink the
    crude gap by >5x (both nuisance models correct); (b) the
    augment=False Hajek reduction must equal ipw_adjusted_km's
    weighted product-limit curve at every horizon within the
    micro-lattice tolerance (telescoping identity under
    administrative censoring); (c) a censored subject at duration <=
    max(times) raises the named administrative-censoring error."""
    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        aipw_survival_contrast,
        ipw_adjusted_km,
        km_curve,
    )

    df = _simpson_curve_cohort(spark)

    def s_at(curve, a, tt):
        pts = [r for r in curve if r.arm == a and r.duration <= tt]
        return max(pts, key=lambda r: r.duration).survival if pts else 1.0

    crude = km_curve(df, ["arm"], "duration", "event").collect()
    gap_crude = abs(s_at(crude, 1, 15) - s_at(crude, 0, 15))
    out = {
        r.time: r
        for r in aipw_survival_contrast(
            df, "arm", ["x"], [5, 15, 25]
        ).collect()
    }
    assert gap_crude > 0.10
    assert abs(out[15].diff) < gap_crude / 5, (gap_crude, out[15])
    # (b) Hajek reduction == ipw_adjusted_km curve
    red = {
        r.time: r
        for r in aipw_survival_contrast(
            df, "arm", ["x"], [5, 15, 25], augment=False
        ).collect()
    }
    ipw = ipw_adjusted_km(df, "arm", ["x"], "duration", "event").collect()

    def s_ipw(a, tt):
        pts = [r for r in ipw if r.arm == a and r.duration <= tt]
        return max(pts, key=lambda r: r.duration).survival if pts else 1.0

    for t in (5, 15, 25):
        assert abs(red[t].s1 - s_ipw(1, t)) < 5e-6, (t, red[t])
        assert abs(red[t].s0 - s_ipw(0, t)) < 5e-6, (t, red[t])
    # (c) non-administrative censoring fails fast
    badrow = spark.createDataFrame(
        [(1, 1.0, 0.0, 10, 0)],
        "arm int, x double, junk double, duration long, event int",
    )
    with pytest.raises(Exception, match="administrative-censoring"):
        aipw_survival_contrast(
            df.unionAll(badrow), "arm", ["x"], [5, 15, 25]
        ).collect()


def test_aipw_survival_contrast_ipcw_mode(spark):
    """The third nuisance model: Simpson plant (arms share each
    stratum's hazard, assignment confounded 0.8/0.2) PLUS
    stratum-dependent random censoring before the horizons — the
    administrative mode must refuse (named error), while
    censoring='ipcw' both deconfounds (|diff| small) and recovers
    the true counterfactual marginal S(t) = ½(e^{−λ₀t}+e^{−λ₁t}).
    And with NO censoring before max(times), the ipcw mode reduces
    EXACTLY to the administrative estimator (Ĝ ≡ 1)."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        aipw_survival_contrast,
    )

    lam = {0.0: 0.04, 1.0: 0.15}
    cen = {0.0: 0.01, 1.0: 0.10}
    rows = []
    for i in range(12000):
        u_x = ((i * 48271 + 3) % 999983) / 999983.0
        u_a = ((i * 69069 + 11) % 999979) / 999979.0
        u_t = ((i * 2654435761 + 7) % 999961) / 999961.0 + 1e-9
        u_c = ((i * 104729 + 13) % 999959) / 999959.0 + 1e-9
        x = 1.0 if u_x < 0.5 else 0.0
        a = 1 if u_a < (0.8 if x > 0 else 0.2) else 0
        t = -math.log(u_t) / lam[x]
        c = -math.log(u_c) / cen[x]
        obs = min(t, c, 30.0)
        rows.append(
            (a, x, min(int(obs * 10) + 1, 300),
             1 if t <= c and t < 30 else 0)
        )
    df = spark.createDataFrame(
        rows, "arm int, x double, duration long, event int"
    )
    with pytest.raises(Exception, match="administrative-censoring"):
        aipw_survival_contrast(df, "arm", ["x"], [50, 150, 250]).collect()
    out = {
        r.time: r
        for r in aipw_survival_contrast(
            df, "arm", ["x"], [50, 150, 250], censoring="ipcw"
        ).collect()
    }
    for th in (50, 150, 250):
        t = th / 10.0
        truth = 0.5 * (
            math.exp(-lam[0.0] * t) + math.exp(-lam[1.0] * t)
        )
        assert abs(out[th].diff) < 0.03, (th, out[th])
        assert abs(out[th].s1 - truth) < 0.03, (th, out[th], truth)
        assert abs(out[th].s0 - truth) < 0.03, (th, out[th], truth)
    # no-censoring reduction: ipcw == administrative EXACTLY
    nc = _simpson_curve_cohort(spark)
    adm = sorted(
        aipw_survival_contrast(nc, "arm", ["x"], [5, 15, 25]).collect()
    )
    ipc = sorted(
        aipw_survival_contrast(
            nc, "arm", ["x"], [5, 15, 25], censoring="ipcw"
        ).collect()
    )
    assert adm == ipc, (adm, ipc)


def test_ipcw_km_corrects_dependent_censoring(spark):
    """Two strata with different event AND censoring hazards (x=1
    heavily censored): the pooled plain KM is biased toward the
    lightly-censored stratum's (higher) survival, while IPCW with
    the stratified reverse-KM censoring model recovers the true
    marginal S(t) = ½(e^{−λ₀t} + e^{−λ₁t}). Pins: IPCW within 0.02
    of truth at every horizon, plain-KM error at t=20 at least 2×
    the IPCW error, and IPCW == plain under NO censoring (weights
    all 1 — the degenerate reduction, exact)."""
    import math

    from cancer_survival_etl_spark.operators.survival import ipcw_km

    lam = {0: 0.05, 1: 0.15}
    cen = {0: 0.005, 1: 0.12}
    # durations on a TENTHS grid (integer lattice = 0.1 time units):
    # at unit coarseness the within-cell event/censor ordering
    # ambiguity under 12%/unit censoring visibly biases G(T−)
    rows = []
    for i in range(12000):
        x = i % 2
        u_t = ((i * 2654435761 + 7) % 999961) / 999961.0 + 1e-9
        u_c = ((i * 48271 + 13) % 999979) / 999979.0 + 1e-9
        t = -math.log(u_t) / lam[x]
        cc = -math.log(u_c) / cen[x]
        obs = min(t, cc, 30.0)
        rows.append((x, int(obs * 10) + 1 if obs < 30 else 300,
                     1 if t <= cc and t < 30 else 0))
    df = spark.createDataFrame(rows, "x int, duration long, event int")
    out = {
        r.time: r for r in ipcw_km(df, ["x"], [50, 100, 200]).collect()
    }
    for th, t in ((50, 5), (100, 10), (200, 20)):
        truth = 0.5 * (math.exp(-lam[0] * t) + math.exp(-lam[1] * t))
        assert abs(out[th].s_ipcw - truth) < 0.02, (t, out[th], truth)
    truth20 = 0.5 * (math.exp(-lam[0] * 20) + math.exp(-lam[1] * 20))
    err_plain = abs(out[200].s_plain - truth20)
    err_ipcw = abs(out[200].s_ipcw - truth20)
    assert err_plain > 2 * err_ipcw, (err_plain, err_ipcw)
    assert out[200].s_plain > truth20  # bias direction: upward
    # no-censoring reduction: everyone observed to the horizon
    rows_nc = []
    for i in range(4000):
        x = i % 2
        u_t = ((i * 69069 + 5) % 999979) / 999979.0 + 1e-9
        t = -math.log(u_t) / lam[x]
        rows_nc.append((x, min(int(t) + 1, 30), 1 if t < 30 else 0))
    dnc = spark.createDataFrame(rows_nc, "x int, duration long, event int")
    red = ipcw_km(dnc, ["x"], [5, 10, 20]).collect()
    for r in red:
        assert abs(r.s_ipcw - r.s_plain) < 2e-6, r


def test_aipw_survival_contrast_double_robustness(spark):
    """The DR property itself: fit the propensity on a JUNK covariate
    (independent of assignment — misspecified) while the saturated
    outcome model sees the true confounder x. Pure IPW under the junk
    propensity stays confounded (gap comparable to crude); the AIPW
    augmentation absorbs it (gap < crude/5). And symmetrically the
    correctly-specified-propensity arm from the sibling test covers
    the other leg, so both halves of 'either model right suffices'
    are pinned."""
    from cancer_survival_etl_spark.operators.survival import (
        aipw_survival_contrast,
        km_curve,
    )

    df = _simpson_curve_cohort(spark)

    def s_at(curve, a, tt):
        pts = [r for r in curve if r.arm == a and r.duration <= tt]
        return max(pts, key=lambda r: r.duration).survival if pts else 1.0

    crude = km_curve(df, ["arm"], "duration", "event").collect()
    gap_crude = abs(s_at(crude, 1, 15) - s_at(crude, 0, 15))
    # junk propensity + correct outcome model -> still deconfounded
    dr = {
        r.time: r
        for r in aipw_survival_contrast(
            df, "arm", ["x"], [15], propensity_cols=["junk"]
        ).collect()
    }
    assert abs(dr[15].diff) < gap_crude / 5, (gap_crude, dr[15])
    # junk propensity WITHOUT augmentation -> confounding remains
    ipw_junk = {
        r.time: r
        for r in aipw_survival_contrast(
            df, "arm", ["x"], [15], augment=False,
            propensity_cols=["junk"],
        ).collect()
    }
    assert abs(ipw_junk[15].diff) > gap_crude / 2, (gap_crude, ipw_junk)


# ---------------------------------------------------------------------------
# Conditional logistic regression
# ---------------------------------------------------------------------------


def test_conditional_logistic_mcnemar_closed_form(spark):
    """1:1 matched pairs, binary exposure: the conditional-logistic
    estimate must equal ln(n10/n01) over the discordant pairs (the
    McNemar identity), with se = sqrt(1/n10 + 1/n01)."""
    import math

    from cancer_survival_etl_spark.operators.survival import (
        conditional_logistic,
    )

    rows = []
    n10 = n01 = 0
    for s in range(400):
        kind = s % 4
        if kind == 0:      # discordant, case exposed
            rows += [(s, 1.0, 1), (s, 0.0, 0)]
            n10 += 1
        elif kind == 1 and s % 12 == 1:  # discordant, control exposed
            rows += [(s, 0.0, 1), (s, 1.0, 0)]
            n01 += 1
        elif kind == 2:    # concordant exposed
            rows += [(s, 1.0, 1), (s, 1.0, 0)]
        else:              # concordant unexposed
            rows += [(s, 0.0, 1), (s, 0.0, 0)]
    df = spark.createDataFrame(rows, "pair long, x double, case int")
    beta, se = conditional_logistic(
        df, "pair", ["x"], iters=8, return_se=True
    )
    want = math.log(n10 / n01)
    want_se = math.sqrt(1.0 / n10 + 1.0 / n01)
    assert abs(beta[0] - want) < 1e-6, (beta, want)
    assert abs(se[0] - want_se) < 1e-6, (se, want_se)


def test_conditional_logistic_conditions_out_set_confounding(spark):
    """Per-set intercepts vary wildly (some sets drawn where
    EVERYTHING is likelier to be a case-exposure combo); conditional
    logistic recovers the planted within-set OR while pooled
    logistic regression is badly confounded."""
    import math

    from cancer_survival_etl_spark.llm.inference import logistic_train
    from cancer_survival_etl_spark.operators.survival import (
        conditional_logistic,
    )

    b_true = 1.0
    rows = []
    for s in range(3000):
        hot = s % 2 == 0  # set-level frailty correlated with exposure
        p_x_case = 0.8 if hot else 0.3
        p_x_ctrl = (
            0.8 / (0.8 + (1 - 0.8) * math.exp(b_true))
            if hot
            else 0.3 / (0.3 + (1 - 0.3) * math.exp(b_true))
        )
        u1 = ((s * 48271 + 1) % 999983) / 999983.0
        u2 = ((s * 69069 + 2) % 999979) / 999979.0
        rows += [
            (s, 1.0 if u1 < p_x_case else 0.0, 1),
            (s, 1.0 if u2 < p_x_ctrl else 0.0, 0),
        ]
    df = spark.createDataFrame(rows, "pair long, x double, case int")
    beta = conditional_logistic(df, "pair", ["x"], iters=8)
    assert abs(beta[0] - b_true) < 0.25, beta


def test_apc_joinpoint_recovers_planted_break(spark):
    """Rates grow 8%/period through period 9, then decline 3%/period:
    the two-segment fit must put the break at 9 and recover both
    segment APCs; numpy replication of the winning candidate's
    continuity-constrained OLS pins slopes and RSS; a group too
    short for any candidate returns NULLs."""
    import math

    import numpy as np

    from cancer_survival_etl_spark.operators.survival import (
        apc_joinpoint,
    )

    pt = 10000000
    rows = []
    for p in range(20):
        r = 0.001 * (1.08 ** min(p, 9)) * (0.97 ** max(p - 9, 0))
        rows.append(("g", p, int(round(r * pt)), pt))
    short = [("s", p, 100, pt) for p in range(4)]
    df = spark.createDataFrame(
        rows + short,
        "grp string, period long, cases long, person_time long",
    )
    out = {r.grp: r for r in apc_joinpoint(df, ["grp"]).collect()}
    r = out["g"]
    assert r.breakpoint == 9, r
    assert abs(r.apc1_pct - 8.0) < 0.15, r
    assert abs(r.apc2_pct + 3.0) < 0.15, r
    # numpy replication at the winning break (same micro lattice)
    xs = np.arange(20, dtype=float)
    ys = np.array(
        [round(math.log(c / pt) * 1e6) / 1e6 for (_, _, c, _) in rows]
    )
    zs = np.maximum(xs - 9, 0.0)
    X = np.column_stack([np.ones(20), xs, zs])
    beta, *_ = np.linalg.lstsq(X, ys, rcond=None)
    rss = float(((ys - X @ beta) ** 2).sum())
    assert abs(r.slope1 - beta[1]) < 1e-5, (r.slope1, beta[1])
    assert abs(r.slope2 - (beta[1] + beta[2])) < 1e-5
    assert abs(r.rss - rss) < 1e-4, (r.rss, rss)
    # too-short group: NULL break, count still reported
    s = out["s"]
    assert s.n_periods == 4 and s.breakpoint is None
    assert s.apc1_pct is None and s.rss is None


def test_apc_joinpoint_k_recovers_two_breaks_and_k1_reduction(spark):
    """(a) k=2: rates with planted hinge breaks at x=10 and x=20
    (slopes 0.08 / −0.04 / 0.05 in ln-rate) — the pair grid search
    must land on exactly (10, 20) and recover all three slopes;
    (b) n_breaks=1 must reduce to apc_joinpoint's answer on the same
    cohort (same candidates, same moments; Cramer vs adjugate solve
    agree to the 6-dp output rounding); (c) a group too short for any
    pair returns NULLs with the count still reported."""
    import math

    from cancer_survival_etl_spark.operators.survival import (
        apc_joinpoint,
        apc_joinpoint_k,
    )

    pt = 1000000
    rows = []
    for x in range(1, 31):
        ln = 0.5 + 0.08 * x - 0.12 * max(x - 10, 0) + 0.09 * max(
            x - 20, 0
        )
        rows.append(("g", x, max(1, round(math.exp(ln - 6) * pt)), pt))
    short = [("s", x, 100, pt) for x in range(8)]
    df = spark.createDataFrame(
        rows + short,
        "grp string, period long, cases long, person_time long",
    )
    out = {r.grp: r for r in apc_joinpoint_k(df, ["grp"],
                                             n_breaks=2).collect()}
    r = out["g"]
    assert (r.break_1, r.break_2) == (10, 20), r
    assert abs(r.slope_1 - 0.08) < 1e-3, r
    assert abs(r.slope_2 + 0.04) < 1e-3, r
    assert abs(r.slope_3 - 0.05) < 1e-3, r
    s = out["s"]
    assert s.n_periods == 8 and s.break_1 is None and s.rss is None
    # k=1 reduction pin vs apc_joinpoint (6-dp outputs)
    one = apc_joinpoint_k(df, ["grp"], n_breaks=1).collect()
    ref = {r.grp: r for r in apc_joinpoint(df, ["grp"]).collect()}
    for r in one:
        w = ref[r.grp]
        assert r.break_1 == w.breakpoint, (r, w)
        if w.breakpoint is not None:
            assert abs(r.slope_1 - w.slope1) < 2e-6
            assert abs(r.slope_2 - w.slope2) < 2e-6
            assert abs(r.rss - w.rss) < 2e-6


def test_flexible_parametric_survival_recovers_plants(spark):
    """All-cause Royston-Parmar (Poisson-split): (a) constant-hazard
    plant — modeled S(t) within 0.02 of exp(−λt) along the grid and
    the covariate log-HR recovered; (b) Weibull shape>1 plant — the
    fitted hazard INCREASES (shape captured, which a constant-rate
    model cannot) and the modeled curve tracks KM within 0.03."""
    import math

    from cancer_survival_etl_spark.operators.survival import (
        flexible_parametric_survival,
        km_curve,
    )

    # (a) exponential with log-HR 0.7
    lam = 0.04
    rows = []
    for i in range(6000):
        x = float(i % 2)
        u = ((i * 2654435761 + 19) % 999983) / 999983.0 + 1e-9
        t = -math.log(u) / (lam * math.exp(0.7 * x))
        dur = min(int(t), 39)
        rows.append((x, dur, 1 if t < 40 else 0))
    df = spark.createDataFrame(rows, "x double, duration long, event int")
    curve = flexible_parametric_survival(
        df, "x", interval_width=4, horizon=40
    ).collect()
    for r in curve:
        if r.x == 0.0:
            want = math.exp(-lam * r.t_end)
            assert abs(r.survival - want) < 0.02, (r, want)
    # log-HR via hazard ratio at any grid point (PH by construction)
    h1 = {r.interval: r.hazard for r in curve if r.x == 1.0}
    h0 = {r.interval: r.hazard for r in curve if r.x == 0.0}
    lhr = math.log(h1[5] / h0[5])
    assert abs(lhr - 0.7) < 0.15, lhr

    # (b) Weibull shape 1.6 (null covariate effect; x needs two
    # levels or the Poisson design is singular): hazard rises;
    # curve tracks KM
    rows = []
    for i in range(6000):
        u = ((i * 48271 + 23) % 999979) / 999979.0 + 1e-9
        t = 25.0 * (-math.log(u)) ** (1.0 / 1.6)
        dur = min(int(t), 39)
        rows.append((float(i % 2), dur, 1 if t < 40 else 0))
    dfw = spark.createDataFrame(rows, "x double, duration long, event int")
    curvew = sorted(
        (r for r in flexible_parametric_survival(
            dfw, "x", interval_width=4, horizon=40
        ).collect() if r.x == 0.0),
        key=lambda r: r.interval,
    )
    assert curvew[-2].hazard > 1.5 * curvew[0].hazard, [
        (r.interval, r.hazard) for r in curvew
    ]
    km = {
        r.duration: r.survival
        for r in km_curve(
            dfw.filter("x = 0.0"), ["x"], "duration", "event"
        ).collect()
    }

    def km_at(t):
        ts = [d for d in km if d <= t]
        return km[max(ts)] if ts else 1.0

    for r in curvew:
        # smooth 3-knot model vs step KM + grid discretization:
        # agreement to a few percentage points is the honest bound
        assert abs(r.survival - km_at(r.t_end)) < 0.045, (
            r.t_end, r.survival, km_at(r.t_end))


def test_royston_parmar_excess_recovers_and_reduces(spark):
    """Royston-Parmar EXCESS-hazard model (stpm2-style relative
    survival): (a) with an all-zero life table it reduces BIT-EXACTLY
    to flexible_parametric_survival (same cells, same fit, shared
    _rp_curve_eval); (b) on a plant with band-constant background
    mortality PLUS a proportional excess hazard, the modeled relative
    survival tracks exp(−λ_E·t) within 0.03 and the excess log-HR is
    recovered within 0.15 — the background deaths are absorbed by the
    offset, NOT attributed to the cancer."""
    import hashlib
    import math

    from cancer_survival_etl_spark.operators.survival import (
        flexible_parametric_survival,
        royston_parmar_excess_survival,
    )

    hz = {0: 2000, 1: 6000}
    lam_e = 0.03
    rows = []
    for i in range(4000):
        u1 = int(
            hashlib.md5(f"rpa:{i}".encode()).hexdigest()[:8], 16
        ) / 2**32 + 1e-9
        u2 = int(
            hashlib.md5(f"rpb:{i}".encode()).hexdigest()[:8], 16
        ) / 2**32 + 1e-9
        band = i % 2
        x = float((i // 2) % 2)
        t_bg = -math.log(u1) / (hz[band] / 1e6)
        t_ex = -math.log(u2) / (lam_e * math.exp(0.7 * x))
        t = min(t_bg, t_ex)
        rows.append((x, band, min(int(t), 39), 1 if t < 40 else 0))
    df = spark.createDataFrame(
        rows, "x double, band int, duration long, event int"
    )

    # (a) zero-table reduction, bit-exact tuple-for-tuple
    allc = sorted(
        map(tuple, flexible_parametric_survival(
            df, "x", interval_width=4, horizon=40
        ).collect())
    )
    zred = sorted(
        map(tuple, royston_parmar_excess_survival(
            df, "x", "band", {0: 0, 1: 0}, 4, 40
        ).collect())
    )
    assert allc == zred and len(allc) == 20

    # (b) excess-scale recovery against the real life table
    curve = royston_parmar_excess_survival(
        df, "x", "band", hz, 4, 40
    ).collect()
    r0 = {r.interval: r for r in curve if r.x == 0.0}
    r1 = {r.interval: r for r in curve if r.x == 1.0}
    for j, r in r0.items():
        want = math.exp(-lam_e * r.t_end)
        assert abs(r.relative_survival - want) < 0.03, (j, r, want)
    lhr = math.log(r1[5].excess_hazard / r0[5].excess_hazard)
    assert abs(lhr - 0.7) < 0.15, lhr
    # the all-cause model on the same cohort is necessarily more
    # pessimistic than the excess model's net curve (it counts the
    # background deaths too)
    ac = {
        r.interval: r.survival
        for r in flexible_parametric_survival(
            df, "x", interval_width=4, horizon=40
        ).collect()
        if r.x == 0.0
    }
    assert all(
        ac[j] < r0[j].relative_survival for j in r0 if j >= 2
    ), [(j, ac[j], r0[j].relative_survival) for j in r0]


def test_flexible_parametric_survival_td_recovers_nonph_and_ph_pin(spark):
    """(a) Non-PH plant drawn from the TD model itself — group 1's
    hazard is λ₀·exp(β + δ(ln t − ū)) with β=0.7, δ=−0.35 (hazard
    ratio decays in time; closed-form inverse Λ⁻¹ sampling) — the fit
    must recover both β (log-HR at the centering knot) and δ, and the
    reported loghr column must DECREASE across the grid; (b) PH plant
    (δ_true = 0): δ̂ ≈ 0 and the TD curves match the PH model's
    within 0.02 at every grid point — the reduction pin; td=False
    delegates to flexible_parametric_survival exactly."""
    import math

    from cancer_survival_etl_spark.operators.survival import (
        flexible_parametric_survival,
        flexible_parametric_survival_td,
    )

    w, hz = 4, 40
    lo, hi = math.log(0.5 * w), math.log((hz // w - 0.5) * w)
    c = (lo + hi) / 2.0
    lam, beta, delta = 0.04, 0.7, -0.35
    rows = []
    for i in range(8000):
        x = float(i % 2)
        uu = ((i * 2654435761 + 19) % 999983) / 999983.0 + 1e-9
        e = -math.log(uu)
        if x == 0.0:
            t = e / lam
        else:
            a = lam * math.exp(beta - delta * c)
            t = (e * (delta + 1.0) / a) ** (1.0 / (delta + 1.0))
        dur = min(int(t), hz - 1)
        rows.append((x, dur, 1 if t < hz else 0))
    df = spark.createDataFrame(rows, "x double, duration long, event int")
    curve, bhat, dhat = flexible_parametric_survival_td(
        df, "x", interval_width=w, horizon=hz
    )
    assert abs(bhat - beta) < 0.15, (bhat, beta)
    assert abs(dhat - delta) < 0.15, (dhat, delta)
    lhr = sorted(
        {(r.interval, r.loghr) for r in curve.collect()}
    )
    assert lhr[0][1] > lhr[-1][1] + 0.3, lhr  # declining HR
    # (b) PH plant: delta ~ 0, curves match the PH model
    rows = []
    for i in range(8000):
        x = float(i % 2)
        uu = ((i * 48271 + 23) % 999979) / 999979.0 + 1e-9
        t = -math.log(uu) / (lam * math.exp(beta * x))
        dur = min(int(t), hz - 1)
        rows.append((x, dur, 1 if t < hz else 0))
    dfp = spark.createDataFrame(rows, "x double, duration long, event int")
    curve_td, bhat2, dhat2 = flexible_parametric_survival_td(
        dfp, "x", interval_width=w, horizon=hz
    )
    assert abs(dhat2) < 0.1, dhat2
    ph = {
        (r.x, r.interval): r.survival
        for r in flexible_parametric_survival(
            dfp, "x", interval_width=w, horizon=hz
        ).collect()
    }
    for r in curve_td.collect():
        assert abs(r.survival - ph[(r.x, r.interval)]) < 0.02, r
    # td=False delegates exactly (same rows, no loghr column)
    cf, bf, dl = flexible_parametric_survival_td(
        dfp, "x", interval_width=w, horizon=hz, td=False
    )
    assert dl == 0.0 and bf is None
    delegated = {
        (r.x, r.interval): r.survival for r in cf.collect()
    }
    assert delegated == ph


def test_flexible_parametric_survival_x_pattern_bound(spark):
    """A continuous covariate (every row a distinct x) must fail fast
    with the named max_x_patterns error instead of silently pulling
    every distinct value to the driver for curve evaluation — the
    diff_in_diff/rmst_from_curve bounded-collect convention (VERDICT
    r07 item 4)."""
    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        flexible_parametric_survival,
    )

    rows = [
        (i / 997.0, (i % 30) + 1, 1 if i % 3 else 0) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "x double, duration long, event int")
    with pytest.raises(ValueError, match="max_x_patterns"):
        flexible_parametric_survival(
            df, "x", interval_width=4, horizon=40, max_x_patterns=50
        )


def test_direct_adjusted_survival_beta_zero_reduction(spark):
    """With beta = 0 the standardization is a no-op: both arms'
    adjusted curves equal exp(-H0) of the Nelson-Aalen/Breslow
    baseline (cox_baseline_hazard at beta=0), and the result is
    bit-identical under repartitioning."""
    import math

    from cancer_survival_etl_spark.operators.survival import (
        cox_baseline_hazard,
        direct_adjusted_survival,
    )

    rows = []
    for i in range(500):
        u = ((i * 2654435761) % 999983) / 999983.0
        t = int(-math.log(u + 1e-9) / 0.1) + 1
        rows.append((i % 2, float(i % 3), min(t, 20),
                     1 if t < 20 else 0))
    df = spark.createDataFrame(
        rows, "arm int, x double, duration int, event int"
    )
    adj = direct_adjusted_survival(
        df, "arm", ["x"], [0.0, 0.0]
    ).collect()
    base = {
        r.duration: r.cum_hazard_baseline
        for r in cox_baseline_hazard(
            df, ["arm", "x"], [0.0, 0.0]
        ).collect()
    }
    for r in adj:
        expect = math.exp(-base[r.duration])
        assert abs(r.survival_adjusted - expect) < 2e-6, r
    by_t = {}
    for r in adj:
        by_t.setdefault(r.duration, {})[r.arm] = r.survival_adjusted
    assert all(v[0] == v[1] for v in by_t.values())
    again = sorted(
        map(tuple, direct_adjusted_survival(
            df.repartition(32), "arm", ["x"], [0.0, 0.0]
        ).collect())
    )
    assert again == sorted(map(tuple, adj))


def test_direct_adjusted_survival_deconfounds_simpson_plant(spark):
    """Simpson plant: within each stratum x the arms share an
    exponential hazard, but arm 1 is enriched in the high-hazard
    stratum — the crude KM gap is large while the direct adjusted
    curves at the true beta ([0, ln(haz ratio)]) must coincide to
    within a third of the crude gap. The pattern-bound guard raises
    a named error."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        direct_adjusted_survival,
        km_curve,
    )

    rows = []
    for i in range(6000):
        u1 = ((i * 2654435761) % 999983) / 999983.0
        u2 = ((i * 40503 + 7) % 999979) / 999979.0
        u3 = ((i * 69069 + 11) % 999961) / 999961.0
        x = 1.0 if u1 < 0.5 else 0.0
        arm = 1 if u2 < (0.8 if x > 0 else 0.2) else 0
        haz = 0.15 if x > 0 else 0.04
        t = -math.log(u3 + 1e-9) / haz
        rows.append((arm, x, min(int(t) + 1, 30),
                     1 if t < 30 else 0))
    df = spark.createDataFrame(
        rows, "arm int, x double, duration int, event int"
    )

    def s_at(curve, key, tt):
        pts = [r for r in curve if r[0] == key and r[1] <= tt]
        return max(pts, key=lambda r: r[1])[2] if pts else 1.0

    crude = [
        (r.arm, r.duration, r.survival)
        for r in km_curve(df, ["arm"], "duration", "event").collect()
    ]
    gap_crude = abs(s_at(crude, 1, 15) - s_at(crude, 0, 15))
    assert gap_crude > 0.1, gap_crude
    beta = [0.0, math.log(0.15 / 0.04)]
    adj = [
        (r.arm, r.duration, r.survival_adjusted)
        for r in direct_adjusted_survival(
            df, "arm", ["x"], beta
        ).collect()
    ]
    gap_adj = abs(s_at(adj, 1, 15) - s_at(adj, 0, 15))
    assert gap_adj < gap_crude / 3, (gap_adj, gap_crude)
    with pytest.raises(ValueError, match="max_x_patterns"):
        direct_adjusted_survival(
            df, "arm", ["x"], beta, max_x_patterns=1
        )
    with pytest.raises(ValueError, match="beta must be"):
        direct_adjusted_survival(df, "arm", ["x"], [0.0])


def test_concordance_index_matches_quadratic_reference(spark):
    """Harrell's C from the cell fold equals the O(n^2) pair loop
    (the definition) on a censored cohort with score ties and
    time ties in every flavor; perfect and anti-perfect rankings hit
    1 and 0; a constant score gives exactly 0.5; no-comparable-pairs
    data returns NULL."""
    import math

    from cancer_survival_etl_spark.operators.survival import (
        concordance_index,
    )

    rows = []
    for i in range(300):
        u = ((i * 2654435761) % 999983) / 999983.0
        t = int(-math.log(u + 1e-9) / 0.2) + 1
        dur = min(t, 12)
        evn = 1 if t < 12 else 0
        score = round((i % 7) / 3.0 - u, 1)  # ties + signal-free
        rows.append((float(score), dur, evn))
    df = spark.createDataFrame(rows, "score double, duration int, event int")

    def ref(data):
        conc = disc = tied = 0
        for si, ti, ei in data:
            if ei != 1:
                continue
            for sj, tj, ej in data:
                if tj > ti or (tj == ti and ej == 0):
                    if si > sj:
                        conc += 1
                    elif si < sj:
                        disc += 1
                    else:
                        tied += 1
        return conc, disc, tied

    conc, disc, tied = ref(rows)
    r = concordance_index(df, "score").collect()[0]
    assert (r.n_concordant, r.n_discordant, r.n_tied_score) == (
        conc, disc, tied
    ), r
    assert r.n_comparable == conc + disc + tied
    assert abs(
        r.c_index - (conc + 0.5 * tied) / (conc + disc + tied)
    ) < 5.1e-7  # c_index is rounded to 6 dp
    # exact under partitioning
    r32 = concordance_index(df.repartition(32), "score").collect()[0]
    assert tuple(r32) == tuple(r)

    # perfect ranking: score = -t on an uncensored cohort
    perf = spark.createDataFrame(
        [(-float(t), t, 1) for t in range(1, 40)],
        "score double, duration int, event int",
    )
    assert concordance_index(perf, "score").collect()[0].c_index == 1.0
    anti = spark.createDataFrame(
        [(float(t), t, 1) for t in range(1, 40)],
        "score double, duration int, event int",
    )
    assert concordance_index(anti, "score").collect()[0].c_index == 0.0
    flat = spark.createDataFrame(
        [(1.0, t, 1) for t in range(1, 40)],
        "score double, duration int, event int",
    )
    assert concordance_index(flat, "score").collect()[0].c_index == 0.5
    none = spark.createDataFrame(
        [(1.0, 5, 0), (2.0, 5, 0)],
        "score double, duration int, event int",
    )
    assert concordance_index(none, "score").collect()[0].c_index is None


def test_mixture_cure_exponential_recovers_plant_and_reductions(spark):
    """Exponential mixture cure EM: a planted 40% cured / exp(0.3)
    latency cohort censored at 20 is recovered within sampling error;
    all-events data reduces to pi ~ 0 with lambda the exponential MLE
    D/sum(t); zero events raises; bit-identical under repartitioning;
    iters fail-fast."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        mixture_cure_exponential,
    )

    rows = []
    for i in range(8000):
        u1 = ((i * 2654435761) % 999983) / 999983.0
        u2 = ((i * 40503 + 7) % 999979) / 999979.0
        cured = u1 < 0.4
        t = 1e9 if cured else -math.log(u2 + 1e-9) / 0.3
        dur = min(int(t * 10) + 1, 200)  # tenths grid to 20
        rows.append((dur, 1 if t * 10 < 200 else 0))
    df = spark.createDataFrame(rows, "duration int, event int")
    # durations are tenths; lambda comes back per tenth-unit
    r = mixture_cure_exponential(df, iters=12).collect()[0]
    assert abs(r.pi_cure - 0.4) < 0.03, r
    assert abs(r.lambda_latency * 10 - 0.3) < 0.02, r
    r32 = mixture_cure_exponential(
        df.repartition(32), iters=12
    ).collect()[0]
    assert tuple(r32) == tuple(r)

    # all-events reduction: pi -> ~0, lambda -> D / sum(t)
    allev = spark.createDataFrame(
        [(i % 13 + 1, 1) for i in range(500)], "duration int, event int"
    )
    mle = 500 / sum(i % 13 + 1 for i in range(500))
    ra = mixture_cure_exponential(allev, iters=12).collect()[0]
    assert ra.pi_cure < 1e-6, ra
    assert abs(ra.lambda_latency - mle) < 1e-6, (ra, mle)

    noev = spark.createDataFrame(
        [(5, 0), (7, 0)], "duration int, event int"
    )
    with pytest.raises(ValueError, match="zero events"):
        mixture_cure_exponential(noev)
    with pytest.raises(ValueError, match="iters"):
        mixture_cure_exponential(allev, iters=0)


def test_km_hall_wellner_band(spark):
    """HW simultaneous band: lambda quantiles match the textbook
    Brownian-bridge values; the band recomputes exactly from
    km_curve's published columns; it is strictly wider than the
    pointwise 1.96 CI wherever defined (simultaneous > pointwise,
    ratio minimized at n*sig2 = 1); the true exponential curve sits
    inside the band everywhere; bit-identical under repartitioning."""
    import math

    from cancer_survival_etl_spark.operators.survival import (
        hall_wellner_lambda,
        km_curve,
        km_hall_wellner_band,
    )

    assert abs(hall_wellner_lambda(0.05) - 1.3581) < 1e-4
    assert abs(hall_wellner_lambda(0.10) - 1.2239) < 1e-4
    assert abs(hall_wellner_lambda(0.01) - 1.6276) < 1e-4

    rows = []
    for i in range(2000):
        u = ((i * 2654435761) % 999983) / 999983.0
        t = -math.log(u + 1e-9) / 0.15
        rows.append(("A", min(int(t) + 1, 25), 1 if t < 25 else 0))
    df = spark.createDataFrame(rows, "cohort string, duration int, event int")
    band = km_hall_wellner_band(df, ["cohort"]).collect()
    km = {
        r.duration: r
        for r in km_curve(df, ["cohort"]).collect()
    }
    lam = hall_wellner_lambda(0.05)
    n = 2000.0
    for r in band:
        k = km[r.duration]
        assert (r.survival, r.se_greenwood) == (
            k.survival, k.se_greenwood
        )
        if r.se_greenwood is None or r.survival == 0:
            assert r.band_lower is None and r.band_upper is None
            continue
        sig2 = (r.se_greenwood / r.survival) ** 2
        half = lam * (1 + n * sig2) * r.survival / math.sqrt(n)
        assert abs(r.band_lower - max(0.0, r.survival - half)) < 5.1e-7
        assert abs(r.band_upper - min(1.0, r.survival + half)) < 5.1e-7
        # wider than the pointwise 95% CI
        assert half > 1.95 * r.se_greenwood
        # simultaneous coverage of the true curve (exp with the
        # discrete +1 grid: S_true(t) = P(floor(T)+1 > t) = e^{-0.15 t})
        s_true = math.exp(-0.15 * r.duration)
        assert r.band_lower - 1e-9 <= s_true <= r.band_upper + 1e-9, (
            r, s_true
        )
    again = sorted(
        map(tuple, km_hall_wellner_band(
            df.repartition(32), ["cohort"]
        ).collect())
    )
    assert again == sorted(map(tuple, band))


def test_concordance_index_ipcw_reduction_and_weighted_reference(spark):
    """Uno's C: with no censoring it equals Harrell's C exactly
    (G == 1 and the same-time arm is empty); with censoring it
    matches an O(n^2) weighted pair loop that reads the SAME
    reverse-KM curve and micro-lattice weights (definitional pin);
    exact under repartitioning."""
    import math

    from cancer_survival_etl_spark.operators.survival import (
        concordance_index,
        concordance_index_ipcw,
        km_curve,
    )

    # uncensored reduction
    rows = []
    for i in range(400):
        u = ((i * 2654435761) % 999983) / 999983.0
        s = round((i % 5) / 2.0 - u, 1)
        t = int(-math.log(u + 1e-9) / 0.2) + 1
        rows.append((float(s), t, 1))
    unc = spark.createDataFrame(rows, "score double, duration int, event int")
    h = concordance_index(unc, "score").collect()[0]
    u_ = concordance_index_ipcw(unc, "score").collect()[0]
    assert u_.c_index_ipcw == h.c_index, (u_, h)

    # censored cohort: weighted definitional loop
    rows = []
    for i in range(400):
        u1 = ((i * 2654435761) % 999983) / 999983.0
        u2 = ((i * 40503 + 7) % 999979) / 999979.0
        s = round((i % 5) / 2.0 - u1, 1)
        t = int(-math.log(u1 + 1e-9) / 0.25) + 1
        c = int(-math.log(u2 + 1e-9) / 0.10) + 1
        rows.append((float(s), min(t, c, 15),
                     1 if t <= c and t < 15 else 0))
    cen = spark.createDataFrame(rows, "score double, duration int, event int")
    tau = 16
    r = concordance_index_ipcw(cen, "score", tau=tau).collect()[0]
    g_rows = km_curve(
        cen.selectExpr("1 as g1", "duration as d",
                       "1 - event as cev"),
        ["g1"], "d", "cev",
    ).collect()
    gmap = sorted((x.d, x.survival) for x in g_rows)

    def g_left(t):
        vals = [sv for (gt, sv) in gmap if gt < t]
        return vals[-1] if vals else 1.0

    num2 = den = 0
    for si, ti, ei in rows:
        if ei != 1 or ti >= tau:
            continue
        wm = round(1e6 / max(g_left(ti), 0.01) ** 2)
        for sj, tj, ej in rows:
            if tj > ti:
                den += wm
                if si > sj:
                    num2 += 2 * wm
                elif si == sj:
                    num2 += wm
    assert r.c_index_ipcw == round(num2 / (2 * den), 6), (
        r, num2 / (2 * den)
    )
    r32 = concordance_index_ipcw(
        cen.repartition(32), "score", tau=tau
    ).collect()[0]
    assert tuple(r32) == tuple(r)


def test_brier_score_ipcw_reductions_and_reference(spark):
    """IPCW Brier: uncensored data reduces to the plain Brier score
    of 1{T > t0} vs the prediction (and 0 for the perfect
    predictor); censored data matches the definitional loop reading
    the same reverse-KM curve on the micro lattice; empty times
    fail fast."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        brier_score_ipcw,
        km_curve,
    )

    rows = []
    for i in range(500):
        u = ((i * 2654435761) % 999983) / 999983.0
        t = int(-math.log(u + 1e-9) / 0.15) + 1
        pred = round(math.exp(-0.15 * 10) * (0.8 + 0.4 * (i % 2)), 3)
        rows.append((pred, min(t, 20), 1 if t < 20 else 0, t))
    unc = spark.createDataFrame(
        [(p, d, 1) for (p, d, e, t) in rows],
        "pred double, duration int, event int",
    )
    r = {x.time: x for x in brier_score_ipcw(
        unc, "pred", [10]).collect()}
    ref = sum(
        round(((1 if d > 10 else 0) - p) ** 2 * 1e6) / 1e6
        for (p, d, e, t) in rows
    ) / 500
    assert abs(r[10].brier_ipcw - ref) < 2e-6, (r[10], ref)

    perfect = spark.createDataFrame(
        [(1.0 if d > 10 else 0.0, d, 1) for (p, d, e, t) in rows],
        "pred double, duration int, event int",
    )
    rp = brier_score_ipcw(perfect, "pred", [10]).collect()[0]
    assert rp.brier_ipcw == 0.0, rp

    # censored definitional replay
    crows = []
    for i in range(500):
        u1 = ((i * 2654435761) % 999983) / 999983.0
        u2 = ((i * 40503 + 7) % 999979) / 999979.0
        t = int(-math.log(u1 + 1e-9) / 0.15) + 1
        c = int(-math.log(u2 + 1e-9) / 0.07) + 1
        pred = round(0.3 + 0.4 * (i % 2), 2)
        crows.append((pred, min(t, c, 20),
                      1 if t <= c and t < 20 else 0))
    cen = spark.createDataFrame(
        crows, "pred double, duration int, event int"
    )
    t0 = 8
    rc = brier_score_ipcw(cen, "pred", [t0]).collect()[0]
    g_rows = km_curve(
        cen.selectExpr("1 as g1", "duration as d",
                       "1 - event as cev"),
        ["g1"], "d", "cev",
    ).collect()
    gmap = sorted((x.d, x.survival) for x in g_rows)

    def g_left(t):
        vals = [sv for (gt, sv) in gmap if gt < t]
        return vals[-1] if vals else 1.0

    def g_at(t):
        vals = [sv for (gt, sv) in gmap if gt <= t]
        return vals[-1] if vals else 1.0

    acc = 0
    for p, d, e in crows:
        if e == 1 and d <= t0:
            acc += round(p * p / max(g_left(d), 0.01) * 1e6)
        elif d > t0:
            acc += round((1 - p) ** 2 / max(g_at(t0), 0.01) * 1e6)
    assert rc.brier_ipcw == round(acc / 1e6 / 500, 6), (
        rc, acc / 1e6 / 500
    )
    with pytest.raises(ValueError, match="times"):
        brier_score_ipcw(cen, "pred", [])


def test_rmst_ci_matches_rmst_and_definitional_variance(spark):
    """rmst_ci: the point estimate equals rmst() exactly (same
    lattice pipeline); the variance matches the survRM2 definitional
    loop computed from the km_curve lattice values (A_j^2 Greenwood
    fold on the pico lattice); a curve that hits exactly zero before
    tau returns NULL se/CI; bit-identical under repartitioning."""
    import math

    from cancer_survival_etl_spark.operators.survival import (
        km_curve,
        rmst,
        rmst_ci,
    )

    rows = []
    for i in range(1500):
        u = ((i * 2654435761) % 999983) / 999983.0
        u2 = ((i * 40503 + 7) % 999979) / 999979.0
        t = -math.log(u + 1e-9) / 0.12
        c = -math.log(u2 + 1e-9) / 0.05
        grp = "A" if i % 2 == 0 else "B"
        rows.append((grp, min(int(min(t, c)) + 1, 25),
                     1 if t <= c and t < 25 else 0))
    df = spark.createDataFrame(rows, "grp string, duration int, event int")
    tau = 20
    r = {x.grp: x for x in rmst_ci(df, ["grp"], tau).collect()}
    base = {x.grp: x for x in rmst(df, ["grp"], tau).collect()}
    for gname in ("A", "B"):
        assert r[gname].rmst == base[gname].rmst
        assert r[gname].survival_at_tau == base[gname].survival_at_tau

    km = km_curve(df, ["grp"]).collect()
    for gname in ("A", "B"):
        curve = sorted(
            (x.duration, x.n_risk, x.n_event, x.survival)
            for x in km if x.grp == gname
        )
        # areas by summation by parts on the same rounded S values
        drops = []
        s_prev = 1.0
        for (tt, y, dd, s) in curve:
            if dd > 0 and tt <= tau:
                drops.append((tt, y, dd, s_prev, s))
            s_prev = s
        total = 0
        for (tt, y, dd, sl, s) in drops:
            total += round(tt * (sl - s) * 1e6)
        s_tau = max(
            ((tt, s) for (tt, y, dd, s) in [
                (c[0], c[1], c[2], c[3]) for c in curve
            ] if tt <= tau),
            default=(None, 1.0),
        )[1]
        rm = tau * s_tau + total / 1e6
        var = 0
        run = 0
        for (tt, y, dd, sl, s) in drops:
            run += round(tt * (sl - s) * 1e6)
            if dd < y:
                a_j = rm - (tt * s + run / 1e6)
                var += round(a_j * a_j * dd / (y * (y - dd)) * 1e12)
        se = math.sqrt(var / 1e12)
        assert abs(r[gname].rmst - round(rm, 6)) < 1e-9, gname
        assert abs(r[gname].rmst_se - round(se, 6)) < 1e-9, gname
        assert r[gname].rmst_lower < r[gname].rmst < r[gname].rmst_upper

    again = sorted(
        map(tuple, rmst_ci(df.repartition(32), ["grp"], tau).collect())
    )
    assert again == sorted(map(tuple, rmst_ci(df, ["grp"], tau).collect()))

    # everyone dies at t=3 -> curve hits 0 before tau -> NULL se
    dead = spark.createDataFrame(
        [("A", 3, 1)] * 10, "grp string, duration int, event int"
    )
    rd = rmst_ci(dead, ["grp"], 10).collect()[0]
    assert rd.rmst == 3.0 and rd.rmst_se is None, rd


def test_logrank_renyi_detects_crossing_hazards(spark):
    """Renyi supremum log-rank: on a planted CROSSING-hazards cohort
    (B dies fast early / slow late, A constant) the ordinary
    log-rank chi-square stays under its 3.84 cutoff while the Renyi
    statistic exceeds its critical value; on proportional hazards
    both agree (reject); the critical value matches K&M's 2.2414;
    the running process replays sequentially; two-group validation
    raises."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        logrank_renyi_test,
        renyi_critical,
    )

    assert abs(renyi_critical(0.05) - 2.2414) < 1e-3
    assert abs(renyi_critical(0.01) - 2.807) < 5e-3

    rows = []
    for i in range(3000):
        u = ((i * 2654435761) % 999983) / 999983.0
        if i % 2 == 0:  # A: constant hazard 0.08
            t = -math.log(u + 1e-9) / 0.08
            grp = "A"
        else:  # B: piecewise - fast to 5, then very slow (crossing)
            t = -math.log(u + 1e-9) / 0.25
            if t > 5:
                t = 5 + (-math.log(
                    ((i * 40503 + 7) % 999979) / 999979.0 + 1e-9
                ) / 0.01)
            grp = "B"
        rows.append((grp, min(int(t) + 1, 40), 1 if t < 40 else 0))
    df = spark.createDataFrame(rows, "grp string, duration int, event int")
    r = logrank_renyi_test(df, "grp").collect()[0]
    assert r.chi_square < 3.84, r  # ordinary log-rank blind
    assert r.q_renyi > r.q_crit and r.reject, r

    # proportional hazards: both fire
    prop = []
    for i in range(2000):
        u = ((i * 2654435761) % 999983) / 999983.0
        haz = 0.05 if i % 2 == 0 else 0.15
        t = -math.log(u + 1e-9) / haz
        prop.append(("A" if i % 2 == 0 else "B",
                     min(int(t) + 1, 30), 1 if t < 30 else 0))
    dfp = spark.createDataFrame(prop, "grp string, duration int, event int")
    rp = logrank_renyi_test(dfp, "grp").collect()[0]
    assert rp.chi_square > 3.84 and rp.reject, rp

    # sequential replay of the running O-E process
    cellmap = {}
    for grp, dur, evn in rows:
        c = cellmap.setdefault(dur, [0, 0, 0, 0])
        c[0] += evn if grp == "A" else 0
        c[1] += evn
        c[2] += 1 if grp == "A" else 0
        c[3] += 1
    n1 = sum(1 for g_, _, _ in rows if g_ == "A")
    ntot = len(rows)
    run = 0
    sup = 0
    vtot = 0
    r1, rr = 0, 0
    for dur in sorted(cellmap):
        d1, dd, m1, mm = cellmap[dur]
        y1, y = n1 - r1, ntot - rr
        p1 = y1 / y
        e = round(dd * p1 * 1e6) if dd > 0 else 0
        if dd > 0 and y > 1:
            vtot += round(dd * p1 * (1 - p1) * (y - dd) / (y - 1) * 1e6)
        run += d1 * 1000000 - e
        sup = max(sup, abs(run))
        r1 += m1
        rr += mm
    assert r.q_renyi == round(sup / 1e6 / math.sqrt(vtot / 1e6), 6)
    with pytest.raises(ValueError, match="exactly 2"):
        logrank_renyi_test(
            df.withColumn("grp", F.lit("X")), "grp"
        )


def test_rmtl_competing_identity_and_reference(spark):
    """RMTL: per-cause time lost matches the sequential
    increment-fold reference exactly; the causes partition all-cause
    loss (sum RMTL_k = tau - RMST to 1e-4 across the two operators'
    independent lattices); cause with no events loses zero;
    bit-identical under repartitioning."""
    import math

    from cancer_survival_etl_spark.operators.survival import (
        rmst,
        rmtl_competing,
    )

    rows = []
    for i in range(2500):
        u = ((i * 2654435761) % 999983) / 999983.0
        u2 = ((i * 40503 + 7) % 999979) / 999979.0
        t = -math.log(u + 1e-9) / 0.10
        cause = 1 if u2 < 0.6 else 2
        dur = min(int(t) + 1, 25)
        rows.append(("G", dur, cause if t < 25 else 0))
    df = spark.createDataFrame(rows, "grp string, duration int, cause int")
    tau = 20
    r = {x.cause: x for x in rmtl_competing(
        df, ["grp"], [1, 2], tau).collect()}

    # sequential reference on the same lattices
    cellmap = {}
    for _, dur, cz in rows:
        c = cellmap.setdefault(dur, [0, 0, 0, 0])
        c[0] += 1 if cz > 0 else 0
        c[1] += 1
        c[2] += 1 if cz == 1 else 0
        c[3] += 1 if cz == 2 else 0
    n = len(rows)
    removed = 0
    lt = 0
    ref = {1: 0, 2: 0}
    cif = {1: 0, 2: 0}
    for dur in sorted(cellmap):
        dd, mm, d1, d2 = cellmap[dur]
        y = n - removed
        s_left = math.exp(lt / 1e6)
        for k, dk in ((1, d1), (2, d2)):
            if dk > 0 and dur <= tau:
                inc = round(s_left * dk / y * 1e6)
                cif[k] += inc
                ref[k] += inc * (tau - dur)
        if dd > 0 and dd < y:
            lt += round(math.log(1 - dd / y) * 1e6)
        removed += mm
    for k in (1, 2):
        assert r[k].rmtl == round(ref[k] / 1e6, 6), (k, r[k], ref[k])
        assert r[k].cif_at_tau == round(cif[k] / 1e6, 6)

    ev = df.selectExpr(
        "grp", "duration",
        "CASE WHEN cause > 0 THEN 1 ELSE 0 END AS event",
    )
    rm = rmst(ev, ["grp"], tau).collect()[0].rmst
    assert abs((r[1].rmtl + r[2].rmtl) - (tau - rm)) < 1e-4

    again = sorted(map(tuple, rmtl_competing(
        df.repartition(32), ["grp"], [1, 2], tau).collect()))
    assert again == sorted(map(tuple, rmtl_competing(
        df, ["grp"], [1, 2], tau).collect()))


def test_auc_time_dependent_reductions_and_reference(spark):
    """Time-dependent IPCW AUC: with no censoring it equals the
    plain rank AUC of the binary outcome 1{T <= t0}; a perfect
    score (s = -T) gives 1; with censoring it matches the O(n^2)
    weighted definitional loop reading the same reverse-KM curve;
    empty times fail fast."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        auc_time_dependent,
        km_curve,
    )

    rows = []
    for i in range(400):
        u = ((i * 2654435761) % 999983) / 999983.0
        s = round((i % 5) / 2.0 + u, 1)
        t = int(-math.log(u + 1e-9) / 0.12) + 1
        rows.append((float(s), min(t, 25), 1))
    unc = spark.createDataFrame(rows, "score double, duration int, event int")
    t0 = 8
    r = auc_time_dependent(unc, "score", [t0]).collect()[0]
    num = den = 0
    for si, ti, _ in rows:
        if ti > t0:
            continue
        for sj, tj, _ in rows:
            if tj > t0:
                den += 2
                if si > sj:
                    num += 2
                elif si == sj:
                    num += 1
    assert r.auc == round(num / den, 6), (r, num / den)

    perf_rows = []
    for i in range(300):
        u = ((i * 2654435761) % 999983) / 999983.0
        t = min(int(-math.log(u + 1e-9) / 0.12) + 1, 25)
        perf_rows.append((-float(t), t, 1))
    perf = spark.createDataFrame(
        perf_rows, "score double, duration int, event int"
    )
    rp = auc_time_dependent(perf, "score", [8]).collect()[0]
    assert rp.auc == 1.0, rp

    # censored weighted reference
    crows = []
    for i in range(400):
        u1 = ((i * 2654435761) % 999983) / 999983.0
        u2 = ((i * 40503 + 7) % 999979) / 999979.0
        s = round((i % 5) / 2.0 + u1, 1)
        t = int(-math.log(u1 + 1e-9) / 0.15) + 1
        c = int(-math.log(u2 + 1e-9) / 0.08) + 1
        crows.append((float(s), min(t, c, 20),
                      1 if t <= c and t < 20 else 0))
    cen = spark.createDataFrame(
        crows, "score double, duration int, event int"
    )
    rc = auc_time_dependent(cen, "score", [t0]).collect()[0]
    g_rows = km_curve(
        cen.selectExpr("1 as g1", "duration as d", "1 - event as cev"),
        ["g1"], "d", "cev",
    ).collect()
    gmap = sorted((x.d, x.survival) for x in g_rows)

    def g_left(t):
        vals = [sv for (gt, sv) in gmap if gt < t]
        return vals[-1] if vals else 1.0

    num2 = den2 = 0
    for si, ti, ei in crows:
        if ei != 1 or ti > t0:
            continue
        wm = round(1e6 / max(g_left(ti), 0.01))
        for sj, tj, ej in crows:
            if tj > t0:
                den2 += wm
                if si > sj:
                    num2 += 2 * wm
                elif si == sj:
                    num2 += wm
    assert rc.auc == round(num2 / (2 * den2), 6), (rc,)
    with pytest.raises(ValueError, match="times"):
        auc_time_dependent(cen, "score", [])


def test_survival_calibration_true_model_tracks_diagonal(spark):
    """Horizon calibration: predictions from the TRUE model land on
    the diagonal (every bin |gap| small); a systematically
    optimistic predictor shows uniformly negative gaps; the observed
    column replays the per-bin KM read; bins with no events before
    t0 report observed 1.0; n_bins validation."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        km_curve,
        survival_calibration,
    )

    rows = []
    for i in range(6000):
        u1 = ((i * 2654435761) % 999983) / 999983.0
        u2 = ((i * 40503 + 7) % 999979) / 999979.0
        haz = 0.03 + 0.12 * u1  # continuous risk heterogeneity
        t = -math.log(u2 + 1e-9) / haz
        pred = math.exp(-haz * 10)
        rows.append((round(pred, 4), min(int(t) + 1, 30),
                     1 if t < 30 else 0))
    df = spark.createDataFrame(rows, "pred double, duration int, event int")
    cal = survival_calibration(df, "pred", 10, n_bins=8).collect()
    assert len(cal) >= 5
    tot = sum(r.n for r in cal)
    assert tot == 6000
    for r in cal:
        if r.n >= 200:
            assert abs(r.gap) < 0.08, r

    # replay the per-bin KM read for one bin
    bmap = {r.bin: r for r in cal}
    base = df.selectExpr(
        "least(CAST(floor(pred * 8) AS LONG) + 1, 8) AS b",
        "duration", "event",
    )
    km = km_curve(base, ["b"]).collect()
    some_bin = max(bmap)
    pts = [(x.duration, x.survival) for x in km
           if x.b == some_bin and x.duration <= 10]
    want = max(pts)[1] if pts else 1.0
    assert bmap[some_bin].observed_surv == round(want, 6)

    # optimistic predictor: predicted S always 0.95
    opt = df.selectExpr("0.95 AS pred", "duration", "event")
    ro = survival_calibration(opt, "pred", 10, n_bins=8).collect()
    assert len(ro) == 1 and ro[0].gap < -0.05, ro
    with pytest.raises(ValueError, match="n_bins"):
        survival_calibration(df, "pred", 10, n_bins=1)


def test_abridged_life_table_chiang_construction(spark):
    """Chiang abridged life table: matches the sequential
    construction on the same lattices for a 5-band table with an
    open end; constant-hazard data gives ex ~ 1/m at every age;
    missing-band and bad-width inputs raise; bit-identical under
    repartitioning."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        abridged_life_table,
    )

    # per-(band) death/person-time rows (already registry-shaped)
    data = [
        ("P", 0, 30, 9800),
        ("P", 1, 40, 39000),
        ("P", 2, 180, 48000),
        ("P", 3, 420, 43000),
        ("P", 4, 390, 9000),
    ]
    df = spark.createDataFrame(
        data, "grp string, band int, deaths int, person_time int"
    )
    widths = {0: 1, 1: 4, 2: 5, 3: 5, 4: None}
    out = {
        r.band: r
        for r in abridged_life_table(
            df, ["grp"], "band", "deaths", "person_time", widths
        ).collect()
    }
    # sequential Chiang replay on the same lattices
    lq = 0
    lvals = {}
    for band, d, y in [(b, d, y) for (_, b, d, y) in data]:
        m = d / y
        w = widths[band]
        if w is None:
            q = 1.0
        else:
            q = min(1.0, w * m / (1.0 + (w - 0.5 * w) * m))
        lx = math.exp(lq / 1e6)
        if q < 1.0:
            lq += round(math.log(1.0 - q) * 1e6)
        lx1 = math.exp(lq / 1e6) if q < 1.0 else 0.0
        if w is None:
            big_l = lx / m if m > 0 else 0.0
        else:
            big_l = w * (lx1 + 0.5 * (lx - lx1))
        lvals[band] = (m, q, lx, round(big_l * 1e6))
    lm_tot = sum(v[3] for v in lvals.values())
    run = 0
    for band in sorted(lvals):
        m, q, lx, lm = lvals[band]
        t_x = (lm_tot - run) / 1e6
        run += lm
        r = out[band]
        assert r.mx == round(m, 6), (band, r)
        assert r.qx == round(q, 6), (band, r)
        assert r.lx == round(lx * 100000, 3), (band, r)
        assert r.big_l == round(lm / 1e6 * 100000, 3), (band, r)
        assert r.t_x == round(t_x * 100000, 3), (band, r)
        assert r.ex == round(t_x / lx, 6), (band, r)
    assert out[4].qx == 1.0 and out[4].width is None
    # life expectancy at birth is positive and sane
    assert 20 < out[0].ex < 90

    # constant hazard: ex ~ 1/m in every band
    const = spark.createDataFrame(
        [("P", b, 100, 2000) for b in range(5)],
        "grp string, band int, deaths int, person_time int",
    )
    wc = {b: (None if b == 4 else 5) for b in range(5)}
    rc = {r.band: r for r in abridged_life_table(
        const, ["grp"], "band", "deaths", "person_time", wc
    ).collect()}
    for b in range(4):
        assert abs(rc[b].ex - 20.0) < 1.2, rc[b]  # 1/m = 20

    again = sorted(map(tuple, abridged_life_table(
        df.repartition(32), ["grp"], "band", "deaths",
        "person_time", widths
    ).collect()))
    assert again == sorted(map(tuple, abridged_life_table(
        df, ["grp"], "band", "deaths", "person_time", widths
    ).collect()))

    import pyspark.errors

    with pytest.raises(Exception, match="band not in"):
        abridged_life_table(
            df, ["grp"], "band", "deaths", "person_time",
            {0: 1, 1: 4, 2: 5, 4: None},
        ).collect()
    with pytest.raises(ValueError, match="open-ended"):
        abridged_life_table(
            df, ["grp"], "band", "deaths", "person_time",
            {0: 1, 1: 4, 2: 5, 3: 5, 4: 10},
        )
    with pytest.raises(ValueError, match="positive"):
        abridged_life_table(
            df, ["grp"], "band", "deaths", "person_time",
            {0: 0, 4: None},
        )


def test_shared_gamma_frailty_recovers_heterogeneity(spark):
    """Shared gamma frailty EM: a planted two-point cluster frailty
    (w in {0.5, 1.5}) drives theta well above the grid floor, while
    the homogeneous version of the SAME cohort pins theta exactly AT
    the grid floor; theta is bit-identical under repartitioning;
    iters and grid fail fast."""
    import hashlib
    import math

    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        shared_gamma_frailty,
    )

    def u(tag, i):
        return int(
            hashlib.md5(f"{tag}:{i}".encode()).hexdigest()[:8], 16
        ) / 16 ** 8

    def cohort(heterogeneous):
        rows = []
        for c in range(1500):
            w = (0.5 if u("w", c) < 0.5 else 1.5) if heterogeneous \
                else 1.0
            for j in range(5):
                i = c * 5 + j
                t = -math.log(u("t", i) + 1e-9) / (w * 0.08)
                rows.append((c, min(int(t) + 1, 25),
                             1 if t < 25 else 0))
        return spark.createDataFrame(
            rows, "cl long, duration int, event int"
        )

    het = cohort(True)
    r = shared_gamma_frailty(het, "cl", iters=8).collect()[0]
    assert r.n_clusters == 1500 and r.n_subjects == 7500
    # two-point frailty var = 0.25; gamma fit lands in a broad band
    assert 0.05 < r.theta < 0.8, r
    hom = cohort(False)
    rh = shared_gamma_frailty(hom, "cl", iters=8).collect()[0]
    assert rh.theta == round(0.01, 6), rh  # grid floor
    assert r.loglik_marginal is not None

    r32 = shared_gamma_frailty(
        het.repartition(32), "cl", iters=8
    ).collect()[0]
    assert tuple(r32) == tuple(r)

    with pytest.raises(ValueError, match="iters"):
        shared_gamma_frailty(het, "cl", iters=0)
    with pytest.raises(ValueError, match="theta_grid"):
        shared_gamma_frailty(het, "cl", theta_grid=[0.5, -1.0])


def test_cumulative_rate_risk_closed_form(spark):
    """IARC cumulative rate/risk: matches the hand formula on the
    same micro lattice; risk < rate (Poisson-to-probability) and
    both ~equal when rates are tiny; missing-band and bad-width
    inputs raise; bit-identical under repartitioning."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        cumulative_rate_risk,
    )

    data = [
        ("G", 0, 12, 90000), ("G", 1, 40, 80000),
        ("G", 2, 260, 70000), ("G", 3, 720, 50000),
    ]
    df = spark.createDataFrame(
        data, "grp string, band int, cases int, person_time int"
    )
    widths = {0: 15, 1: 15, 2: 20, 3: 25}
    r = cumulative_rate_risk(
        df, ["grp"], "band", "cases", "person_time", widths
    ).collect()[0]
    cr = sum(
        round(widths[b] * c / y * 1e6) for (_, b, c, y) in data
    ) / 1e6
    assert r.n_bands == 4 and r.cases == 1032
    assert r.cum_rate_pct == round(cr * 100, 6)
    assert r.cum_risk_pct == round((1 - math.exp(-cr)) * 100, 6)
    assert r.cum_risk_pct < r.cum_rate_pct

    tiny = spark.createDataFrame(
        [("G", 0, 1, 10000000)],
        "grp string, band int, cases int, person_time int",
    )
    rt = cumulative_rate_risk(
        tiny, ["grp"], "band", "cases", "person_time", {0: 10}
    ).collect()[0]
    assert abs(rt.cum_risk_pct - rt.cum_rate_pct) < 1e-6

    again = cumulative_rate_risk(
        df.repartition(32), ["grp"], "band", "cases",
        "person_time", widths
    ).collect()[0]
    assert tuple(again) == tuple(r)

    with pytest.raises(Exception, match="band not in"):
        cumulative_rate_risk(
            df, ["grp"], "band", "cases", "person_time", {0: 15}
        ).collect()
    with pytest.raises(ValueError, match="positive"):
        cumulative_rate_risk(
            df, ["grp"], "band", "cases", "person_time", {0: 0}
        )


def _coxrob_rows(n=300, n_cl=30, shock_amp=1.0):
    """Deterministic clustered survival cohort: hash-derived uniforms,
    a shared per-cluster log-hazard shock, integer-day durations."""
    rows = []
    for i in range(n):
        cl = i % n_cl
        # x1 is CLUSTER-LEVEL: the case the sandwich exists for —
        # within-cluster correlation inflates the between-cluster
        # variance of a cluster-constant covariate's estimate, so
        # ignoring clustering understates the SE. (For a covariate
        # varying WITHIN clusters, positive frailty can legitimately
        # deflate the robust SE — GLS-style.)
        x1 = float((cl * 7919) % 2)
        u = ((i * 40503) % 99991) / 99991.0 + 1e-6
        shock = (((cl * 9176) % 1000) / 1000.0 - 0.5) * 2.0 * shock_amp
        t = -math.log(u) / (0.08 * math.exp(0.8 * x1 + shock))
        dur = float(min(math.floor(t) + 1, 25))
        rows.append((x1, dur, int(t < 25), cl))
    return rows


def _coxrob_reference(rows, beta, cluster=True):
    """NumPy twin of the Lin-Wei sandwich: per-subject score residuals
    via the martingale form, cluster-summed meat, I⁻¹MI⁻¹."""
    import numpy as np

    X = np.array([[r[0]] for r in rows])
    dur = np.array([r[1] for r in rows])
    ev = np.array([r[2] for r in rows])
    cl = np.array([r[3] for r in rows])
    r_ = np.exp(X @ np.array(beta))
    ts = np.unique(dur)
    info = np.zeros((1, 1))
    H0, G = 0.0, np.zeros(1)
    H0_at, G_at, xbar_at = {}, {}, {}
    for t_ in ts:
        at = dur >= t_
        S0 = r_[at].sum()
        S1 = (r_[at, None] * X[at]).sum(0)
        S2 = (r_[at, None, None] * X[at][:, :, None]
              * X[at][:, None, :]).sum(0)
        d = int(ev[dur == t_].sum())
        if d > 0:
            xb = S1 / S0
            info += d * (S2 / S0 - np.outer(xb, xb))
            H0 += d / S0
            G = G + d * S1 / S0 ** 2
        H0_at[t_], G_at[t_], xbar_at[t_] = H0, G.copy(), S1 / S0
    U = np.zeros((len(rows), 1))
    for i in range(len(rows)):
        U[i] = ev[i] * (X[i] - xbar_at[dur[i]]) - r_[i] * (
            X[i] * H0_at[dur[i]] - G_at[dur[i]]
        )
    if cluster:
        M = sum(
            np.outer(U[cl == c].sum(0), U[cl == c].sum(0))
            for c in np.unique(cl)
        )
    else:
        M = (U[:, :, None] * U[:, None, :]).sum(0)
    bread = np.linalg.inv(info)
    cov = bread @ M @ bread
    return np.sqrt(np.diag(bread)), np.sqrt(np.diag(cov))


def test_cox_ph_robust_matches_numpy_reference(spark):
    """Lin-Wei sandwich vs a direct per-subject NumPy twin — both the
    clustered (grouped) and independence meat; the model SE returned
    alongside must equal cox_ph's return_se (same lattice)."""
    from cancer_survival_etl_spark.operators.survival import (
        cox_ph,
        cox_ph_robust,
    )

    rows = _coxrob_rows()
    df = spark.createDataFrame(
        rows, "x1 double, duration double, event int, cl int"
    )
    beta, se_m, se_r = cox_ph_robust(df, ["x1"], cluster_col="cl")
    _, se_m_i, se_r_i = cox_ph_robust(df, ["x1"], cluster_col=None)
    b_ref, se_ref = cox_ph(df, ["x1"], return_se=True)
    assert beta == b_ref
    assert se_m == pytest.approx(se_ref, abs=1e-9)
    ref_model, ref_rob_cl = _coxrob_reference(rows, beta, cluster=True)
    _, ref_rob_ind = _coxrob_reference(rows, beta, cluster=False)
    assert se_m[0] == pytest.approx(float(ref_model[0]), abs=1e-6)
    assert se_r[0] == pytest.approx(float(ref_rob_cl[0]), abs=1e-6)
    assert se_r_i[0] == pytest.approx(float(ref_rob_ind[0]), abs=1e-6)
    # the planted shared-cluster shock inflates the clustered SE
    assert se_r[0] > se_m[0]


def test_cox_ph_robust_partitioning_independent(spark):
    """Bit-identical sandwich at 1 vs 32 partitions — every
    distributed sum is an exact long sum of per-cell nano-roundings."""
    from cancer_survival_etl_spark.operators.survival import cox_ph_robust

    rows = _coxrob_rows(n=200, n_cl=20)
    df = spark.createDataFrame(
        rows, "x1 double, duration double, event int, cl int"
    )
    a = cox_ph_robust(df.repartition(1), ["x1"], cluster_col="cl")
    b = cox_ph_robust(df.repartition(32), ["x1"], cluster_col="cl")
    assert a == b


def _fine_gray_reference_strat(X, dur, cause, strat, iters):
    """Stratified sequential Fine-Gray NR: per-stratum censoring KM,
    risk sets and weights; pooled gradient/information (the
    stratified weighted partial likelihood is a plain sum of
    per-stratum terms)."""
    import numpy as np

    X = np.asarray(X, float)
    dur = np.asarray(dur, float)
    cause = np.asarray(cause)
    strat = np.asarray(strat)
    n, p = X.shape
    per = {}
    for s in np.unique(strat):
        m = strat == s
        times = np.unique(dur[m])
        lng_left, acc = {}, 0
        for t in times:
            lng_left[t] = acc
            n_at = int((dur[m] >= t).sum())
            c = int(((dur[m] == t) & (cause[m] == 0)).sum())
            if 0 < c < n_at:
                acc += round(math.log(1.0 - c / n_at) * 1e6)
        per[s] = {t: math.exp(v / 1e6) for t, v in lng_left.items()}
    beta = np.zeros(p)
    for _ in range(iters):
        r = np.exp(X @ beta)
        g = np.zeros(p)
        info = np.zeros((p, p))
        for s in np.unique(strat):
            m = strat == s
            G_left = per[s]
            ev_times = np.unique(dur[m & (cause == 1)])
            for t in ev_times:
                tied = m & (dur == t) & (cause == 1)
                d = int(tied.sum())
                sv = X[tied].sum(axis=0)
                w = np.zeros(n)
                w[m & (dur >= t)] = 1.0
                cmp_in = m & (cause == 2) & (dur < t)
                w[cmp_in] = G_left[t] / np.array(
                    [G_left[ti] for ti in dur[cmp_in]]
                )
                rw = r * w
                S0 = rw.sum()
                S1 = (rw[:, None] * X).sum(axis=0)
                S2 = (rw[:, None, None] * X[:, :, None]
                      * X[:, None, :]).sum(axis=0)
                g += sv - d * S1 / S0
                info += d * (S2 / S0 - np.outer(S1 / S0, S1 / S0))
        beta = np.round(beta + np.linalg.solve(info, g), 9)
    return beta


def test_fine_gray_stratified(spark):
    """Stratified Fine-Gray: (a) a CONSTANT stratum is bit-equal to
    the unstratified fit (the single-stratum reduction); (b) a
    two-strata cohort with different baseline subdistribution hazards
    and censoring mixes matches the stratified sequential reference
    to 1e-4; (c) bit-identical under repartitioning."""
    import numpy as np

    from cancer_survival_etl_spark.operators.survival import fine_gray

    p_mix, b_true = 0.5, 0.8
    rows = []
    for i in range(600):
        s = i % 2  # stratum with its own baseline + censoring mix
        x = (i // 2) % 2
        eta = math.exp(b_true * x)
        scale = 1.0 if s == 0 else 2.5  # stratum baseline shift
        u1 = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        u2 = ((i * 40503 + 13) % 999979) / 999979.0 + 1e-9
        u3 = ((i * 69069 + 5) % 999961) / 999961.0
        p1 = 1.0 - (1.0 - p_mix) ** eta
        if u1 < p1:
            inner = (1.0 - (1.0 - u1) ** (1.0 / eta)) / p_mix
            t = -math.log(1.0 - inner) * scale
            c = 1
        else:
            t = -math.log(u2) * scale
            c = 2
        cen_rate = 0.25 if s == 0 else 0.4  # per-stratum censoring
        if u3 < cen_rate:
            t, c = t * u3 / cen_rate, 0
        rows.append((float(x), round(min(t, 4.0), 1),
                     c if t <= 4.0 else 0, s))
    df = spark.createDataFrame(
        rows, "x double, duration double, cause int, strat int"
    )
    # (a) constant stratum == unstratified, bit-equal
    const = df.withColumn("one", F.lit(1))
    assert fine_gray(const, ["x"], iters=4, strata_cols=["one"]) == \
        fine_gray(df, ["x"], iters=4)
    # (b) matches the stratified sequential reference
    got = fine_gray(df, ["x"], iters=5, strata_cols=["strat"])
    ref = _fine_gray_reference_strat(
        [[r[0]] for r in rows], [r[1] for r in rows],
        [r[2] for r in rows], [r[3] for r in rows], iters=5,
    )
    assert np.allclose(got, ref, atol=1e-4), (got, ref)
    assert got[0] > 0.3  # planted effect recovered
    # (c) partitioning invariance
    assert fine_gray(
        df.repartition(32), ["x"], iters=5, strata_cols=["strat"]
    ) == got


def _fg_robust_reference(rows, beta, cluster=None):
    """NumPy twin of the Fine-Gray weights-known sandwich: direct
    per-subject weighted score residuals U_i = δ1(x−x̄(T)) −
    Σ_t d_t·w_i(t)·r_i·(x−x̄(t))/S0(t) with the module's micro-lattice
    censoring KM; meat per subject or cluster-summed; I⁻¹MI⁻¹."""
    import numpy as np

    X = np.array([[r[0]] for r in rows])
    dur = np.array([r[1] for r in rows])
    cause = np.array([r[2] for r in rows])
    n = len(rows)
    times = np.unique(dur)
    lng_left, acc = {}, 0
    for t in times:
        lng_left[t] = acc
        n_at = int((dur >= t).sum())
        c = int(((dur == t) & (cause == 0)).sum())
        if 0 < c < n_at:
            acc += round(math.log(1.0 - c / n_at) * 1e6)
    G_left = {t: math.exp(v / 1e6) for t, v in lng_left.items()}
    r_ = np.exp(X @ np.array(beta))
    ev_times = np.unique(dur[cause == 1])
    U = np.zeros((n, 1))
    info = np.zeros((1, 1))
    for t in ev_times:
        tied = (dur == t) & (cause == 1)
        d = int(tied.sum())
        w = np.zeros(n)
        w[dur >= t] = 1.0
        cmp_in = (cause == 2) & (dur < t)
        w[cmp_in] = G_left[t] / np.array(
            [G_left[ti] for ti in dur[cmp_in]]
        )
        rw = r_ * w
        S0 = rw.sum()
        S1 = (rw[:, None] * X).sum(axis=0)
        S2 = (rw[:, None, None] * X[:, :, None]
              * X[:, None, :]).sum(axis=0)
        xbar = S1 / S0
        info += d * (S2 / S0 - np.outer(xbar, xbar))
        U[tied] += X[tied] - xbar
        U -= d * (rw[:, None] * (X - xbar)) / S0
    if cluster is not None:
        cl = np.array(cluster)
        M = sum(
            np.outer(U[cl == c_].sum(0), U[cl == c_].sum(0))
            for c_ in np.unique(cl)
        )
    else:
        M = (U[:, :, None] * U[:, None, :]).sum(0)
    bread = np.linalg.inv(info)
    cov = bread @ M @ bread
    return np.sqrt(np.diag(bread)), np.sqrt(np.diag(cov))


def _fgrob_rows(n=400, n_cl=40):
    """Clustered competing-risks cohort: cluster-level x1, shared
    cluster shock on the cause-1 rate, competing exponential,
    per-subject censoring."""
    rows, cl_of = [], []
    for i in range(n):
        cl = i % n_cl
        x = float((cl * 7919) % 2)
        shock = (((cl * 9176) % 1000) / 1000.0 - 0.5) * 1.2
        u1 = ((i * 2654435761) % 999983) / 999983.0 + 1e-9
        u2 = ((i * 40503 + 13) % 999979) / 999979.0 + 1e-9
        u3 = ((i * 69069 + 5) % 999961) / 999961.0
        t1 = -math.log(u1) / (0.10 * math.exp(0.8 * x + shock))
        t2 = -math.log(u2) / 0.06
        t, c = (t1, 1) if t1 <= t2 else (t2, 2)
        if u3 < 0.25:
            t, c = t * u3 / 0.25, 0
        dur = float(min(math.floor(t) + 1, 20))
        rows.append((x, dur, c if t < 20 else 0, cl))
        cl_of.append(cl)
    return rows, cl_of


def test_fine_gray_robust_matches_reference(spark):
    """fine_gray_robust vs the direct per-subject NumPy twin — both
    the clustered and independence meat; the cluster-level covariate
    plus shared cluster shock makes the clustered sandwich exceed the
    model SE."""
    from cancer_survival_etl_spark.operators.survival import (
        fine_gray_robust,
    )

    rows, cl_of = _fgrob_rows()
    df = spark.createDataFrame(
        rows, "x double, duration double, cause int, cl int"
    )
    beta, se_m, se_r = fine_gray_robust(df, ["x"], cluster_col="cl")
    _, _, se_r_i = fine_gray_robust(df, ["x"], cluster_col=None)
    ref_m, ref_cl = _fg_robust_reference(rows, beta, cluster=cl_of)
    _, ref_ind = _fg_robust_reference(rows, beta, cluster=None)
    assert se_m[0] == pytest.approx(float(ref_m[0]), abs=2e-5)
    assert se_r[0] == pytest.approx(float(ref_cl[0]), abs=2e-5)
    assert se_r_i[0] == pytest.approx(float(ref_ind[0]), abs=2e-5)
    assert se_r[0] > se_m[0]
    # partitioning invariance (bit-exact)
    assert fine_gray_robust(
        df.repartition(32), ["x"], cluster_col="cl"
    ) == (beta, se_m, se_r)


def test_fine_gray_robust_no_competing_equals_cox_robust(spark):
    """With no competing events the subdistribution score IS the Cox
    score — fine_gray_robust must reduce to cox_ph_robust bit-exactly
    (same lattice, gleft·0 tail)."""
    from cancer_survival_etl_spark.operators.survival import (
        cox_ph_robust,
        fine_gray_robust,
    )

    rows = _coxrob_rows(n=250, n_cl=25)
    df = spark.createDataFrame(
        rows, "x1 double, duration double, event int, cl int"
    )
    fg = fine_gray_robust(
        df.withColumnRenamed("event", "cause"), ["x1"],
        cause_col="cause", cluster_col="cl", iters=5,
    )
    cx = cox_ph_robust(df, ["x1"], cluster_col="cl", iters=5)
    assert fg == cx


def _coxrob_reference_strat(rows, beta, cluster=True):
    """Stratified Lin-Wei twin: per-stratum risk sets and curves,
    pooled information and (cluster-summed) meat."""
    import numpy as np

    X = np.array([[r[0]] for r in rows])
    dur = np.array([r[1] for r in rows])
    ev = np.array([r[2] for r in rows])
    cl = np.array([r[3] for r in rows])
    strat = np.array([r[4] for r in rows])
    n = len(rows)
    r_ = np.exp(X @ np.array(beta))
    U = np.zeros((n, 1))
    info = np.zeros((1, 1))
    for s in np.unique(strat):
        m = strat == s
        H0, G = 0.0, np.zeros(1)
        H0_at, G_at, xbar_at = {}, {}, {}
        for t_ in np.unique(dur[m]):
            at = m & (dur >= t_)
            S0 = r_[at].sum()
            S1 = (r_[at, None] * X[at]).sum(0)
            S2 = (r_[at, None, None] * X[at][:, :, None]
                  * X[at][:, None, :]).sum(0)
            d = int(ev[m & (dur == t_)].sum())
            if d > 0:
                xb = S1 / S0
                info += d * (S2 / S0 - np.outer(xb, xb))
                H0 += d / S0
                G = G + d * S1 / S0 ** 2
            H0_at[t_], G_at[t_], xbar_at[t_] = H0, G.copy(), S1 / S0
        for i in np.where(m)[0]:
            ti = dur[i]
            U[i] = ev[i] * (X[i] - xbar_at[ti]) - r_[i] * (
                X[i] * H0_at[ti] - G_at[ti]
            )
    M = sum(
        np.outer(U[cl == c].sum(0), U[cl == c].sum(0))
        for c in np.unique(cl)
    )
    bread = np.linalg.inv(info)
    return np.sqrt(np.diag(bread)), np.sqrt(np.diag(bread @ M @ bread))


def test_cox_ph_robust_stratified(spark):
    """Stratified Lin-Wei: constant stratum bit-equal to the
    unstratified sandwich; a two-strata cohort (own baselines)
    matches the stratified NumPy twin."""
    from cancer_survival_etl_spark.operators.survival import (
        cox_ph_robust,
    )

    base_rows = _coxrob_rows(n=300, n_cl=30)
    # stratum with its own baseline scale — derived so it is NOT
    # confounded with the cluster-level x1 (x1 varies within strata)
    rows = [
        (x, float(min(dur * (1.0 + (i % 4) // 2), 40.0)), e, cl,
         (i % 4) // 2)
        for i, (x, dur, e, cl) in enumerate(base_rows)
    ]
    df = spark.createDataFrame(
        rows, "x1 double, duration double, event int, cl int, strat int"
    )
    const = df.withColumn("one", F.lit(1))
    assert cox_ph_robust(
        const, ["x1"], cluster_col="cl", iters=5, strata_cols=["one"]
    ) == cox_ph_robust(df, ["x1"], cluster_col="cl", iters=5)
    beta, se_m, se_r = cox_ph_robust(
        df, ["x1"], cluster_col="cl", iters=5, strata_cols=["strat"]
    )
    ref_m, ref_r = _coxrob_reference_strat(rows, beta)
    assert se_m[0] == pytest.approx(float(ref_m[0]), abs=2e-5)
    assert se_r[0] == pytest.approx(float(ref_r[0]), abs=2e-5)


def test_mcf_curve_matches_hand_reference(spark):
    """Recurrent-event MCF: matches a pure-Python Nelson-Aalen /
    Lawless-Nadeau twin on the same micro/pico lattices; subjects
    with zero events still hold the at-risk count; an event after
    followup end raises in-plan; bit-identical under repartitioning."""
    import math
    from collections import defaultdict

    import pytest

    from cancer_survival_etl_spark.operators.survival import mcf_curve

    # subject -> (tau, [event times]); s4 has NO events but a long tau
    subjects = {
        "s1": (10.0, [2.0, 5.0, 5.0, 9.0]),
        "s2": (6.0, [1.0, 6.0]),
        "s3": (8.0, [2.0, 3.0]),
        "s4": (12.0, []),
        "s5": (4.0, [2.0]),
    }
    fu = spark.createDataFrame(
        [("G", s, tau) for s, (tau, _) in subjects.items()],
        "grp string, subject string, tau double",
    )
    ev = spark.createDataFrame(
        [("G", s, t) for s, (_, ts) in subjects.items() for t in ts],
        "grp string, subject string, time double",
    )
    got = {
        r.time: r
        for r in mcf_curve(ev, fu, ["grp"]).collect()
    }

    # pure-Python twin on the identical lattices
    di = defaultdict(lambda: defaultdict(int))
    for s, (_, ts) in subjects.items():
        for t in ts:
            di[t][s] += 1
    taus = [tau for tau, _ in subjects.values()]
    pm = pv = 0
    exp = {}
    for t in sorted(di):
        y = sum(1 for tau in taus if tau >= t)
        d = sum(di[t].values())
        d2 = sum(v * v for v in di[t].values())
        pm += round(d / y * 1e6)
        pv += round((d2 - d * d / y) / (y * y) * 1e12)
        exp[t] = (y, d, round(pm / 1e6, 6), round(math.sqrt(pv / 1e12), 6))
    assert set(got) == set(exp)
    for t, (y, d, m, se) in exp.items():
        r = got[t]
        assert (r.n_risk, r.n_events, r.mcf, r.se_mcf) == (y, d, m, se)

    # ties: two events by ONE subject at t=5 make d2 (=4) exceed d
    # (=2) there, so the within-subject clustering is exercised
    assert got[5.0].n_events == 2

    again = mcf_curve(
        ev.repartition(32), fu.repartition(7), ["grp"]
    ).collect()
    assert sorted(map(tuple, again)) == sorted(
        tuple(got[t]) for t in got
    )

    bad_ev = spark.createDataFrame(
        [("G", "s5", 4.5)], "grp string, subject string, time double"
    )
    with pytest.raises(Exception, match="event after followup end"):
        mcf_curve(ev.union(bad_ev), fu, ["grp"]).collect()


def test_population_attributable_fraction_closed_form(spark):
    """PAF: matches the hand formula on a fixed 2x2, equals Levin's
    p_e(RR-1)/(1+p_e(RR-1)) identity, CI brackets the point estimate,
    degenerate groups (no unexposed cases / no exposed cases) go
    NULL, and the result is repartition-invariant."""
    import math

    from cancer_survival_etl_spark.operators.survival import (
        population_attributable_fraction,
    )

    # a=30 exposed cases, b=70, c=20 unexposed cases, d=180
    rows = (
        [("G", 1, 1)] * 30 + [("G", 1, 0)] * 70
        + [("G", 0, 1)] * 20 + [("G", 0, 0)] * 180
    )
    df = spark.createDataFrame(rows, "grp string, exposed int, cs int")
    r = population_attributable_fraction(
        df, ["grp"], "exposed", "cs"
    ).collect()[0]
    a, b, c, d = 30.0, 70.0, 20.0, 180.0
    n1, n0, n = a + b, c + d, 300.0
    rr = (a / n1) / (c / n0)
    lnq = math.log(c) - math.log(n0) - math.log(a + c) + math.log(n)
    var = (1 / (a + c)) ** 2 * a * b / n1 + (
        a / (c * (a + c))
    ) ** 2 * c * d / n0
    z = 1.959963984540054
    assert (r.n, r.cases, r.exposed_cases) == (300, 50, 30)
    assert r.rr == round(rr, 6)
    assert r.paf == round(1 - math.exp(lnq), 6)
    assert r.paf_lo == round(1 - math.exp(lnq + z * math.sqrt(var)), 6)
    assert r.paf_hi == round(1 - math.exp(lnq - z * math.sqrt(var)), 6)
    assert r.paf_lo < r.paf < r.paf_hi
    # Levin identity: PAF = p_e(RR-1) / (1 + p_e(RR-1))
    pe = n1 / n
    levin = pe * (rr - 1) / (1 + pe * (rr - 1))
    assert abs(r.paf - levin) < 1e-9
    assert r.af_exposed == round((rr - 1) / rr, 6)

    again = population_attributable_fraction(
        df.repartition(32), ["grp"], "exposed", "cs"
    ).collect()[0]
    assert tuple(again) == tuple(r)

    deg = spark.createDataFrame(
        [("u0", 1, 1), ("u0", 0, 0), ("a0", 0, 1), ("a0", 1, 0)],
        "grp string, exposed int, cs int",
    )
    for row in population_attributable_fraction(
        deg, ["grp"], "exposed", "cs"
    ).collect():
        assert row.paf is None and row.rr is None


def _weibull_rows(n=400, mu=2.0, beta=-0.7, sigma=0.5, cens=20.0):
    """Deterministic Weibull AFT cohort: ln T = mu + beta*x + sigma*W,
    W = ln(-ln U) standard minimum extreme value, administrative
    censoring."""
    import hashlib
    import math

    rows = []
    for i in range(n):
        u = (
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            % 1000000
        ) / 1000000.0 + 1e-9
        x = float(i % 2)
        t = math.exp(mu + beta * x) * (-math.log(u)) ** sigma
        rows.append(
            (x, round(min(t, cens), 6), 1 if t < cens else 0)
        )
    return rows


def _weibull_twin(rows, iters=8):
    """Pure-Python twin of weibull_aft on the identical nano lattice:
    cell-collapse, weighted-mean-ln-t init, Newton over (mu, b, ln s)."""
    import math
    from collections import Counter

    import numpy as np

    cells = Counter()
    for x, t, d in rows:
        cells[(x, math.log(t), d)] += 1
    sy = sum(round(y * n * 1e9) for (_, y, _), n in cells.items())
    nn = sum(cells.values())
    theta = [round(sy / 1e9 / nn, 9), 0.0, 0.0]
    info = None
    for _ in range(iters):
        s = math.exp(theta[2])
        sums = Counter()
        for (x, y, d), n in cells.items():
            z = (y - theta[0] - theta[1] * x) / s
            w = math.exp(min(z, 15.0))
            xs = [1.0, x]
            for j in range(2):
                sums[f"g{j}"] += round(
                    (w - d) * xs[j] / s * n * 1e9
                )
            sums["g2"] += round(((w - d) * z - d) * n * 1e9)
            for j in range(2):
                for k in range(j, 2):
                    sums[f"h{j}_{k}"] += round(
                        -w * xs[j] * xs[k] / (s * s) * n * 1e9
                    )
            for j in range(2):
                sums[f"h{j}_2"] += round(
                    -xs[j] * (w * z + w - d) / s * n * 1e9
                )
            sums["h2_2"] += round((-w * z * z - (w - d) * z) * n * 1e9)
        g = np.array([sums[f"g{j}"] / 1e9 for j in range(3)])
        hess = np.zeros((3, 3))
        for j in range(3):
            for k in range(j, 3):
                hess[j, k] = hess[k, j] = sums[f"h{j}_{k}"] / 1e9
        info = -hess
        step = np.clip(np.linalg.solve(info, g), -1.0, 1.0)
        theta = [round(t + st, 9) for t, st in zip(theta, step)]
    cov = np.linalg.inv(info)
    se = [round(float(np.sqrt(cov[j, j])), 9) for j in range(3)]
    return theta[:2], round(math.exp(theta[2]), 9), se


def test_weibull_aft_matches_twin_and_recovers_plant(spark):
    """Weibull AFT: bit-equal to the pure-Python lattice twin,
    recovers the planted (mu, beta, sigma) under 35% censoring,
    partitioning-invariant, and ln t guards duration <= 0 in-plan."""
    import pytest

    from cancer_survival_etl_spark.operators.survival import weibull_aft

    rows = _weibull_rows()
    df = spark.createDataFrame(
        rows, "x double, duration double, event int"
    )
    beta, sigma, se = weibull_aft(df, ["x"], return_se=True)
    tb, ts, tse = _weibull_twin(rows)
    assert beta == tb and sigma == ts and se == tse
    assert abs(beta[0] - 2.0) < 0.2
    assert abs(beta[1] + 0.7) < 0.2
    assert abs(sigma - 0.5) < 0.1
    assert all(v > 0 for v in se)

    b2, s2 = weibull_aft(df.repartition(32), ["x"])
    assert b2 == beta and s2 == sigma

    bad = spark.createDataFrame(
        [(0.0, 0.0, 1)], "x double, duration double, event int"
    )
    with pytest.raises(Exception, match="duration must be > 0"):
        weibull_aft(df.union(bad), ["x"], iters=1)
    with pytest.raises(ValueError, match="iters"):
        weibull_aft(df, ["x"], iters=0)


def test_piecewise_exponential_ph(spark):
    """PWE regression: with no covariates the fitted baseline equals
    the occurrence/exposure rates (saturated-model identity); with a
    covariate it recovers the planted piecewise hazards and log-HR;
    bit-identical under repartitioning; bad breaks raise."""
    import hashlib
    import math

    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        piecewise_exponential_ph,
    )

    # lam = 0.2 on [0,5), 0.05 after; HR e^0.7 for x=1; censor at 20
    rows = []
    for i in range(600):
        u = (
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            % 1000000
        ) / 1000000.0 + 1e-9
        x = float(i % 2)
        r = math.exp(0.7 * x)
        e = -math.log(u)
        t = e / (0.2 * r) if e < 5 * 0.2 * r else 5 + (
            e - 5 * 0.2 * r
        ) / (0.05 * r)
        rows.append((x, round(min(t, 20.0), 6), 1 if t < 20 else 0))
    df = spark.createDataFrame(
        rows, "x double, duration double, event int"
    )

    curve0, _ = piecewise_exponential_ph(df, [], [5.0])
    for row in curve0.collect():
        assert abs(
            row.base_hazard - row.events / row.person_time
        ) < 1e-5, row

    curve, beta, se = piecewise_exponential_ph(
        df, ["x"], [5.0], return_se=True
    )
    got = {r.interval_start: r for r in curve.collect()}
    assert set(got) == {0.0, 5.0}
    assert abs(got[0.0].base_hazard - 0.2) < 0.05
    assert abs(got[5.0].base_hazard - 0.05) < 0.02
    assert abs(beta[2] - 0.7) < 0.25
    assert all(v > 0 for v in se)
    # person-time splits exactly: total equals sum of durations
    total_pt = sum(r.person_time for r in got.values())
    assert abs(total_pt - sum(t for _, t, _ in rows)) < 1e-3

    _, beta2 = piecewise_exponential_ph(
        df.repartition(32), ["x"], [5.0]
    )
    assert beta2 == beta

    with pytest.raises(ValueError, match="breaks"):
        piecewise_exponential_ph(df, ["x"], [5.0, 5.0])
    with pytest.raises(ValueError, match="breaks"):
        piecewise_exponential_ph(df, ["x"], [-1.0, 5.0])


def test_integrated_brier_equals_composed_horizons(spark):
    """IBS: bit-equal to averaging tau single-horizon
    brier_score_ipcw calls with the matching per-horizon prediction
    (same lattice, same 6dp rounding), better (lower) for the true
    model than for a constant predictor, and repartition-invariant."""
    import hashlib
    import math

    from cancer_survival_etl_spark.operators.survival import (
        brier_score_ipcw,
        integrated_brier_score,
    )

    rows = []
    for i in range(800):
        u1 = (
            int(hashlib.md5(f"t:{i}".encode()).hexdigest()[:8], 16)
            % 1000000
        ) / 1000000.0 + 1e-9
        u2 = (
            int(hashlib.md5(f"c:{i}".encode()).hexdigest()[:8], 16)
            % 1000000
        ) / 1000000.0 + 1e-9
        x = float(i % 2)
        h = 0.08 * math.exp(0.8 * x)
        t = -math.log(u1) / h
        c = -math.log(u2) / 0.03
        dur = min(int(min(t, c)) + 1, 25)
        evt = 1 if (t <= c and t < 25) else 0
        rows.append(tuple([x, float(dur), evt, h]))
    tau = 8
    df = spark.createDataFrame(
        rows, "x double, duration double, event int, h double"
    )
    for k in range(1, tau + 1):
        df = df.withColumn(f"p{k}", F.exp(-F.col("h") * k))
    preds = [f"p{k}" for k in range(1, tau + 1)]

    r = integrated_brier_score(df, preds).collect()[0]
    assert r.tau == tau and r.n == 800

    per = []
    for k in range(1, tau + 1):
        b = brier_score_ipcw(
            df.withColumnRenamed(f"p{k}", "pred"), "pred", [k]
        ).collect()[0]
        per.append(b.brier_ipcw)
    composed = round(
        sum(round(v * 1e6) for v in per) / 1e6 / tau, 6
    )
    assert r.ibs == composed

    # constant predictor 0.5 scores worse than the true model
    dfc = df
    for k in range(1, tau + 1):
        dfc = dfc.withColumn(f"c{k}", F.lit(0.5))
    rc = integrated_brier_score(
        dfc, [f"c{k}" for k in range(1, tau + 1)]
    ).collect()[0]
    assert r.ibs < rc.ibs

    again = integrated_brier_score(df.repartition(32), preds).collect()[
        0
    ]
    assert tuple(again) == tuple(r)


def test_loglogistic_aft_matches_twin_and_recovers_plant(spark):
    """Log-logistic AFT: bit-equal to the pure-Python lattice twin,
    recovers the planted (mu, beta, sigma) under censoring, exp(eta)
    is the median (uncensored no-covariate check), and the fit is
    partitioning-invariant."""
    import hashlib
    import math
    from collections import Counter

    import numpy as np

    from cancer_survival_etl_spark.operators.survival import (
        loglogistic_aft,
    )

    mu, beta, sig, cens = 1.8, -0.5, 0.4, 25.0
    rows = []
    for i in range(500):
        u = (
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            % 1000000
        ) / 1000000.0
        u = min(max(u, 1e-6), 1 - 1e-6)
        x = float(i % 2)
        w = math.log(u / (1 - u))
        t = math.exp(mu + beta * x + sig * w)
        rows.append((x, round(min(t, cens), 6), 1 if t < cens else 0))
    df = spark.createDataFrame(
        rows, "x double, duration double, event int"
    )
    got_b, got_s, got_se = loglogistic_aft(df, ["x"], return_se=True)

    # pure-Python twin on the identical lattice
    cells = Counter()
    for x, t, d in rows:
        cells[(x, math.log(t), d)] += 1
    sy = sum(round(y * n * 1e9) for (_, y, _), n in cells.items())
    nn = sum(cells.values())
    theta = [round(sy / 1e9 / nn, 9), 0.0, 0.0]
    info = None
    for _ in range(8):
        sg = math.exp(theta[2])
        sums = Counter()
        for (x, y, d), n in cells.items():
            z = (y - theta[0] - theta[1] * x) / sg
            zc = min(max(z, -30.0), 30.0)
            s = 1.0 / (1.0 + math.exp(-zc))
            gz = d - s * (1.0 + d)
            gzp = -s * (1.0 - s) * (1.0 + d)
            xs = [1.0, x]
            for j in range(2):
                sums[f"g{j}"] += round(-gz * xs[j] / sg * n * 1e9)
            sums["g2"] += round((-z * gz - d) * n * 1e9)
            for j in range(2):
                for k in range(j, 2):
                    sums[f"h{j}_{k}"] += round(
                        gzp * xs[j] * xs[k] / (sg * sg) * n * 1e9
                    )
            for j in range(2):
                sums[f"h{j}_2"] += round(
                    xs[j] * (z * gzp + gz) / sg * n * 1e9
                )
            sums["h2_2"] += round((z * z * gzp + z * gz) * n * 1e9)
        g = np.array([sums[f"g{j}"] / 1e9 for j in range(3)])
        hess = np.zeros((3, 3))
        for j in range(3):
            for k in range(j, 3):
                hess[j, k] = hess[k, j] = sums[f"h{j}_{k}"] / 1e9
        info = -hess
        step = np.clip(np.linalg.solve(info, g), -1.0, 1.0)
        theta = [round(t_, 9) for t_ in
                 (a + b for a, b in zip(theta, step))]
    cov = np.linalg.inv(info)
    tw_se = [round(float(np.sqrt(cov[j, j])), 9) for j in range(3)]
    assert got_b == theta[:2]
    assert got_s == round(math.exp(theta[2]), 9)
    assert got_se == tw_se
    assert abs(got_b[0] - mu) < 0.15
    assert abs(got_b[1] - beta) < 0.2
    assert abs(got_s - sig) < 0.1

    b2, s2 = loglogistic_aft(df.repartition(32), ["x"])
    assert b2 == got_b and s2 == got_s

    # exp(mu-hat) is the median: uncensored single-group cohort
    urows = [(0.0, t, 1) for _, t, _ in
             ((x, math.exp(1.8 + 0.4 * math.log(u / (1 - u))), 1)
              for x, u in ((0.0, (k + 0.5) / 400) for k in range(400)))]
    udf = spark.createDataFrame(
        urows, "x double, duration double, event int"
    )
    ub, us_ = loglogistic_aft(udf, [])
    med = sorted(t for _, t, _ in urows)[199]
    assert abs(math.exp(ub[0]) - med) / med < 0.02


def test_apc_drift_model_recovers_plant(spark):
    """Age-drift model: recovers the planted per-age rates and net
    drift on a clean tabulated grid; with zero drift the period
    coefficient vanishes; saturated-in-age identity (fitted age rates
    match the age-specific crude rates when drift is zero and rates
    are exact); guards raise; repartition-invariant."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        apc_drift_model,
    )

    rows = []
    for a in range(6):
        for p in range(10):
            y = 100000.0
            rate = 0.001 * math.exp(0.3 * a + 0.02 * (p - 4.5))
            rows.append((a, p, int(round(rate * y)), y))
    df = spark.createDataFrame(
        rows, "age int, period int, d int, y double"
    )
    curve, drift = apc_drift_model(df, "age", "period", "d", "y")
    assert abs(drift - 100 * (math.exp(0.02) - 1)) < 0.15
    got = {r.age: r for r in curve.collect()}
    for a in range(6):
        want = 0.001 * math.exp(0.3 * a)
        assert abs(got[a].fitted_rate_ref - want) / want < 0.02, a
        assert got[a].drift_pct == round(drift, 6)

    # zero drift: period coefficient ~0 and fitted == crude rates
    zrows = [
        (a, p, int(round(0.002 * math.exp(0.2 * a) * 50000)), 50000.0)
        for a in range(5)
        for p in range(8)
    ]
    zdf = spark.createDataFrame(
        zrows, "age int, period int, d int, y double"
    )
    zcurve, zdrift = apc_drift_model(zdf, "age", "period", "d", "y")
    assert abs(zdrift) < 0.05
    for r in zcurve.collect():
        crude = r.events / r.person_time
        assert abs(r.fitted_rate_ref - crude) / crude < 1e-3

    c2, d2 = apc_drift_model(
        df.repartition(16), "age", "period", "d", "y"
    )
    assert d2 == drift
    assert sorted(map(tuple, c2.collect())) == sorted(
        map(tuple, curve.collect())
    )

    with pytest.raises(ValueError, match=">= 2"):
        apc_drift_model(
            df.filter(F.col("age") == 0), "age", "period", "d", "y"
        )
    with pytest.raises(ValueError, match="max_ages"):
        apc_drift_model(
            df, "age", "period", "d", "y", max_ages=3
        )


def test_cox_ph_counting_reduction_truncation_and_ag(spark):
    """Counting-process Cox: with start==0 it is BIT-equal to cox_ph
    (shared lattice); under left truncation it recovers the planted
    log-HR where the machinery sees only the truncated risk sets;
    Andersen-Gill recurrent episodes recover a planted intensity
    ratio; start >= stop raises in-plan."""
    import hashlib
    import math

    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        cox_ph,
        cox_ph_counting,
    )

    def u(i, salt):
        return (
            int(
                hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16
            )
            % 1000000
        ) / 1000000.0 + 1e-9

    # reduction: plain right-censored cohort as (0, stop] episodes
    rows = []
    for i in range(400):
        x = float(i % 2)
        t = -math.log(u(i, "t")) / (0.08 * math.exp(0.7 * x))
        dur = min(float(int(t) + 1), 30.0)
        rows.append((x, 0.0, dur, 1 if t < 30 else 0))
    df = spark.createDataFrame(
        rows, "x double, start double, stop double, event int"
    )
    b_cnt, se_cnt = cox_ph_counting(df, ["x"], return_se=True)
    b_plain, se_plain = cox_ph(
        df.withColumnRenamed("stop", "duration"),
        ["x"],
        "duration",
        "event",
        return_se=True,
    )
    assert b_cnt == b_plain and se_cnt == se_plain
    assert abs(b_cnt[0] - 0.7) < 0.25

    # left truncation: subjects enter late but risk sets stay honest
    trows = []
    for i in range(2000):
        x = float(i % 2)
        t = -math.log(u(i, "lt")) / (0.08 * math.exp(0.6 * x))
        entry = 4.0 * u(i, "e")
        if t <= entry:
            continue  # never observed — the truncation
        dur = min(float(int(t) + 1), 40.0)
        trows.append((x, entry, dur, 1 if t < 40 else 0))
    tdf = spark.createDataFrame(
        trows, "x double, start double, stop double, event int"
    )
    b_lt = cox_ph_counting(tdf, ["x"])
    assert abs(b_lt[0] - 0.6) < 0.2

    # Andersen-Gill: recurrent Poisson events, intensity ratio e^0.8
    arows = []
    for i in range(300):
        x = float(i % 2)
        lam = 0.15 * math.exp(0.8 * x)
        t_cur, k = 0.0, 0
        while t_cur < 20 and k < 40:
            gap = -math.log(u(i * 100 + k, "g")) / lam
            nxt = t_cur + gap
            if nxt >= 20:
                arows.append((x, t_cur, 20.0, 0))
                break
            arows.append((x, t_cur, nxt, 1))
            t_cur = nxt
            k += 1
    adf = spark.createDataFrame(
        arows, "x double, start double, stop double, event int"
    )
    b_ag = cox_ph_counting(adf, ["x"])
    assert abs(b_ag[0] - 0.8) < 0.15

    bad = spark.createDataFrame(
        [(0.0, 5.0, 5.0, 1)],
        "x double, start double, stop double, event int",
    )
    with pytest.raises(Exception, match="start < stop"):
        cox_ph_counting(df.union(bad), ["x"], iters=1)
    with pytest.raises(ValueError, match="iters"):
        cox_ph_counting(df, ["x"], iters=0)


def test_gray_test_stratified_reduction_and_adjustment(spark):
    """Stratified Gray: one stratum reduces BIT-equal to gray_test;
    a confounded plant (stratum drives both group membership and
    CIF level, no within-stratum group effect) shows the UNstratified
    test firing while the stratified one stays calm; a real shared
    group effect fires both; guards raise."""
    import hashlib
    import math

    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        gray_test,
        gray_test_stratified,
    )

    def u(i, salt):
        return (
            int(
                hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16
            )
            % 1000000
        ) / 1000000.0 + 1e-9

    def cohort(n, lam1_fn, grp_fn, strat_fn):
        rows = []
        for i in range(n):
            s = strat_fn(i)
            g = grp_fn(i, s)
            l1 = lam1_fn(g, s)
            t1 = -math.log(u(i, "t1")) / l1
            t2 = -math.log(u(i, "t2")) / 0.05
            c = 6.0 + 18.0 * u(i, "c")
            t = min(t1, t2, c)
            cause = 0 if c <= min(t1, t2) else (1 if t1 <= t2 else 2)
            rows.append((g, s, float(int(t) + 1), cause))
        return spark.createDataFrame(
            rows, "grp string, strat string, duration double, cause int"
        )

    # single stratum: bit-equal reduction
    df1 = cohort(
        600,
        lambda g, s: 0.10 if g == "A" else 0.05,
        lambda i, s: "A" if i % 2 == 0 else "B",
        lambda i: "only",
    )
    rs = gray_test_stratified(df1, "grp", ["strat"]).collect()[0]
    rg = gray_test(df1, "grp").collect()[0]
    assert (rs.score, rs.information, rs.chi_square) == (
        rg.score, rg.information, rg.chi_square,
    )
    assert rs.n_strata == 1 and rs.events_1 == rg.events_1

    # confounding: stratum H has high CIF AND mostly group A; no
    # within-stratum group effect
    dfc = cohort(
        3000,
        lambda g, s: 0.18 if s == "H" else 0.04,
        lambda i, s: ("A" if u(i, "g") < (0.8 if s == "H" else 0.2)
                      else "B"),
        lambda i: "H" if i % 2 == 0 else "L",
    )
    crude = gray_test(dfc, "grp").collect()[0]
    adj = gray_test_stratified(dfc, "grp", ["strat"]).collect()[0]
    assert crude.chi_square > 15
    assert adj.chi_square < 4

    # shared effect fires both
    dfe = cohort(
        2000,
        lambda g, s: (0.14 if g == "A" else 0.05)
        * (1.5 if s == "H" else 1.0),
        lambda i, s: "A" if i % 2 == 0 else "B",
        lambda i: "H" if i % 3 == 0 else "L",
    )
    both = gray_test_stratified(dfe, "grp", ["strat"]).collect()[0]
    assert both.chi_square > 15

    with pytest.raises(ValueError, match="non-empty"):
        gray_test_stratified(df1, "grp", [])
    with pytest.raises(ValueError, match="exactly 2"):
        gray_test_stratified(
            df1.withColumn("grp", F.lit("Z")), "grp", ["strat"]
        )


def test_conditional_net_survival_reduction_ratio_and_guards(spark):
    """conditional_net_survival: (a) condition_hour=0 is BIT-EQUAL to
    net_survival_pohar_perme on every published column, plain AND CI
    (the lattice subtraction of an exactly-zero anchor); (b) for s>0
    the conditional curve equals the published-curve ratio
    NS(t)/NS(s) to publication rounding and dominates the
    unconditional curve; (c) the CI variance is the increment sum
    over (s, t] — se at the first conditional hour equals the
    unconditional per-hour increment, not the cumulative; (d) exact
    under repartitioning; (e) named error for s outside [0,
    horizon)."""
    import math

    import pytest

    from cancer_survival_etl_spark.operators.survival import (
        conditional_net_survival,
        net_survival_pohar_perme,
    )

    hz = {0: 2000, 1: 4000}
    rows = []
    for i in range(4000):
        g = i % 2
        band = (i // 2) % 2
        u1 = ((i * 2654435761) % 999983) / 999983.0 + 1e-6
        u2 = ((i * 69069 + 7) % 104729) / 104729.0 + 1e-6
        t_bg = -math.log(u1) / (hz[band] / 1e6)
        t_ex = -math.log(u2) / (0.04 * (1.5 if g else 1.0))
        t = min(t_bg, t_ex)
        rows.append(
            (f"g{g}", band, max(min(int(t), 29), 1), 1 if t < 30 else 0)
        )
    df = spark.createDataFrame(
        rows, "grp string, band int, duration long, event int"
    )

    # (a) s=0 reduction, plain + CI, bit-equal
    for ci in (False, True):
        un = net_survival_pohar_perme(
            df, ["grp"], "band", hz, 30, with_ci=ci
        ).orderBy("grp", "hour").collect()
        cn = conditional_net_survival(
            df, ["grp"], "band", hz, 30, 0, with_ci=ci
        ).orderBy("grp", "hour").collect()
        assert len(un) == len(cn) > 0
        for a, b in zip(un, cn):
            assert (a["hour"], a["n_risk"]) == (b["hour"], b["n_risk"])
            assert a["excess_cum_hazard"] == b["excess_cum_hazard_cond"]
            assert a["net_survival_pp"] == b["net_survival_cond"]
            if ci:
                assert a["se_net"] == b["se_cond"]
                assert a["lower_ci_net"] == b["lower_ci_cond"]
                assert a["upper_ci_net"] == b["upper_ci_cond"]

    # (b) ratio identity + dominance at s=5
    un = {
        (r["grp"], r["hour"]): r
        for r in net_survival_pohar_perme(
            df, ["grp"], "band", hz, 30
        ).collect()
    }
    cn = conditional_net_survival(df, ["grp"], "band", hz, 30, 5).collect()
    assert len(cn) == 2 * 25   # hours 6..30 per group
    for r in cn:
        ns_t = un[(r["grp"], r["hour"])]["net_survival_pp"]
        ns_s = un[(r["grp"], 5)]["net_survival_pp"]
        assert r["net_survival_cond"] == pytest.approx(
            ns_t / ns_s, abs=5e-6
        )
        assert r["net_survival_cond"] >= ns_t - 1e-9
        assert r["n_risk_at_condition"] == un[(r["grp"], 5)]["n_risk"]

    # (c) first conditional hour's variance = that hour's increment
    ci_un = {
        (r["grp"], r["hour"]): r
        for r in net_survival_pohar_perme(
            df, ["grp"], "band", hz, 30, with_ci=True
        ).collect()
    }
    ci_cn = conditional_net_survival(
        df, ["grp"], "band", hz, 30, 5, with_ci=True
    ).collect()
    for r in ci_cn:
        if r["hour"] != 6:
            continue
        sig_t = ci_un[(r["grp"], 6)]
        sig_s = ci_un[(r["grp"], 5)]
        var_inc = (
            (sig_t["se_net"] / sig_t["net_survival_pp"]) ** 2
            - (sig_s["se_net"] / sig_s["net_survival_pp"]) ** 2
        )
        got = (r["se_cond"] / r["net_survival_cond"]) ** 2
        assert got == pytest.approx(var_inc, abs=5e-8)

    # (d) partitioning invariance
    a = conditional_net_survival(
        df, ["grp"], "band", hz, 30, 5, with_ci=True
    ).orderBy("grp", "hour").collect()
    b = conditional_net_survival(
        df.repartition(32), ["grp"], "band", hz, 30, 5, with_ci=True
    ).orderBy("grp", "hour").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]

    # (e) guard
    with pytest.raises(ValueError, match="condition_hour"):
        conditional_net_survival(df, ["grp"], "band", hz, 30, 30)
    with pytest.raises(ValueError, match="condition_hour"):
        conditional_net_survival(df, ["grp"], "band", hz, 30, -1)


def _aj_illness_death_reference(subs, horizon):
    """Matrix product-integral twin of multistate_illness_death: walk
    the hour grid, build I + dA from the observed risk sets and
    transition counts, and accumulate the non-commutative product
    directly (no lattice, no ratio trick) — an independent route to
    the same estimand."""
    import numpy as np

    P = np.eye(3)
    out = {}
    for s in range(0, horizon + 1):
        n0 = sum(
            1 for (i, e, d) in subs
            if (i if i is not None else e) >= s
        )
        n1 = sum(1 for (i, e, d) in subs if i is not None and i < s <= e)
        d01 = sum(1 for (i, e, d) in subs if i == s)
        d02 = sum(
            1 for (i, e, d) in subs if i is None and e == s and d == 1
        )
        d12 = sum(
            1 for (i, e, d) in subs if i is not None and e == s and d == 1
        )
        A = np.zeros((3, 3))
        if n0 > 0:
            A[0, 1] = d01 / n0
            A[0, 2] = d02 / n0
            A[0, 0] = -(d01 + d02) / n0
        if n1 > 0:
            A[1, 2] = d12 / n1
            A[1, 1] = -d12 / n1
        P = P @ (np.eye(3) + A)
        out[s] = (P[0, 0], P[0, 1], P[0, 2])
    return out


def _msm_cohort(seed_mult, n, horizon):
    """Deterministic pseudo-random illness-death cohort on the integer
    hour grid: ~half progress through illness, paths censored at the
    horizon."""
    subs = []
    for k in range(n):
        h1 = (k * seed_mult + 17) % 97
        h2 = (k * 31 + seed_mult) % 89
        if h1 % 3 == 0:  # direct exit from state 0
            e = 1 + h2 % (horizon - 1)
            subs.append((None, e, 1 if h2 % 4 else 0))
        elif h1 % 3 == 1:  # ill, then dies or is censored
            i = h2 % (horizon - 2)
            gap = 1 + (h1 // 3) % 10
            e = i + gap
            if e >= horizon:
                subs.append((i, horizon, 0))
            else:
                subs.append((i, e, 1 if h1 % 5 else 0))
        else:  # never leaves state 0 before the horizon
            subs.append((None, horizon, 0))
    return subs


def test_illness_death_matches_matrix_product_integral(spark):
    from cancer_survival_etl_spark.operators.survival import (
        multistate_illness_death,
    )

    horizon = 24
    cohorts = {"A": _msm_cohort(7, 120, horizon),
               "B": _msm_cohort(13, 85, horizon)}
    rows = [
        (g, i, e, d)
        for g, subs in cohorts.items()
        for (i, e, d) in subs
    ]
    df = spark.createDataFrame(
        rows, "g string, t_ill long, t_exit long, death long"
    )
    got = {
        (r["g"], r["hour"]): r
        for r in multistate_illness_death(df, ["g"], horizon).collect()
    }
    assert len(got) == 2 * (horizon + 1)
    for gname, subs in cohorts.items():
        ref = _aj_illness_death_reference(subs, horizon)
        for s, (p00, p01, p02) in ref.items():
            r = got[(gname, s)]
            assert r["p00"] == pytest.approx(p00, abs=5e-5)
            assert r["p01"] == pytest.approx(p01, abs=5e-5)
            assert r["p02"] == pytest.approx(p02, abs=5e-5)
            # occupation probabilities partition to 1 at the published
            # rounding
            assert r["p00"] + r["p01"] + r["p02"] == pytest.approx(
                1.0, abs=3e-6
            )


def test_illness_death_no_illness_reduces_to_km(spark):
    """With no 0→1 transitions the model is two-state: p00 must be
    BIT-EQUAL to km_curve's survival at every event hour (identical
    cells, identical micro-lattice log products) and p01 ≡ 0."""
    from cancer_survival_etl_spark.operators.survival import (
        km_curve,
        multistate_illness_death,
    )

    horizon = 20
    subs = [
        (None, 1 + (k * 7 + 3) % (horizon - 1), 1 if k % 3 else 0)
        for k in range(60)
    ]
    df = spark.createDataFrame(
        [("A", i, e, d) for (i, e, d) in subs],
        "g string, t_ill long, t_exit long, death long",
    )
    msm = {
        r["hour"]: r
        for r in multistate_illness_death(df, ["g"], horizon).collect()
    }
    km = km_curve(
        df.selectExpr("g", "t_exit as duration", "death as event"),
        ["g"],
    ).collect()
    for r in km:
        m = msm[r["duration"]]
        assert m["p00"] == r["survival"]  # bit-equal, same lattice
        assert m["p01"] == 0.0
        assert m["n0_risk"] == r["n_risk"]
    assert all(m["n1_risk"] == 0 for m in msm.values())


def test_illness_death_state1_collapse_segments(spark):
    """A state-1 risk-set collapse (every ill subject dies) pins
    P11 = 0 across the collapse: illness mass accrued BEFORE it must
    not leak into p01 afterwards — later 0→1 entries restart the
    partial sums on a fresh validity segment."""
    from cancer_survival_etl_spark.operators.survival import (
        multistate_illness_death,
    )

    subs = [
        (1, 4, 1),   # ill at 1, dies at 4
        (2, 4, 1),   # ill at 2, dies at 4 — collapse: n1(4)=2=d12(4)
        (6, 9, 0),   # fresh segment: ill at 6, censored at 9
        (None, 10, 0),
        (None, 10, 0),
        (None, 10, 0),
    ]
    df = spark.createDataFrame(
        [("A", i, e, d) for (i, e, d) in subs],
        "g string, t_ill long, t_exit long, death long",
    )
    got = {
        r["hour"]: r
        for r in multistate_illness_death(df, ["g"], 10).collect()
    }
    ref = _aj_illness_death_reference(subs, 10)
    for s in range(0, 11):
        assert got[s]["p00"] == pytest.approx(ref[s][0], abs=5e-5)
        assert got[s]["p01"] == pytest.approx(ref[s][1], abs=5e-5)
        assert got[s]["p02"] == pytest.approx(ref[s][2], abs=5e-5)
    # after the hour-4 collapse and before the hour-6 re-entry the
    # ill-state mass is exactly zero
    assert got[5]["p01"] == 0.0
    # the hour-6 entry contributes again (fresh segment)
    assert got[7]["p01"] > 0.0


def test_illness_death_rejects_zero_length_state1_stay(spark):
    from cancer_survival_etl_spark.operators.survival import (
        multistate_illness_death,
    )

    df = spark.createDataFrame(
        [("A", 5, 5, 1), ("A", None, 8, 0)],
        "g string, t_ill long, t_exit long, death long",
    )
    with pytest.raises(Exception, match="t_ill must be < t_exit"):
        multistate_illness_death(df, ["g"], 10).collect()


def test_net_survival_gap_composition_plant_and_guards(spark):
    """gap = weighted cmp−ref mix of the per-(arm, class) PP curves
    with the delta-method variance — verified by composing the public
    PP estimator (with_ci) by hand; a planted excess-hazard gap comes
    out negative with a CI excluding 0; a missing arm raises."""
    import math

    from cancer_survival_etl_spark.operators.survival import (
        net_survival_gap,
        net_survival_pohar_perme,
    )

    hz = {0: 2000, 1: 6000}
    weights = {0: 60000, 1: 40000}
    rows = []
    for i in range(400):
        arm = "dep" if i % 2 else "aff"
        cls = i % 2
        band = (i // 2) % 2
        # plant: deprived arm dies faster
        if arm == "dep":
            d = (i * 7) % 8 + 1
            e = 1 if i % 3 else 0
        else:
            d = (i * 5) % 14 + 6
            e = 1 if i % 4 == 0 else 0
        rows.append((arm, cls, band, d, e))
    df = spark.createDataFrame(
        rows,
        "cohort string, agegrp int, band int, duration long, event int",
    )
    horizon = 16
    got = {
        r.hour: r
        for r in net_survival_gap(
            df, "cohort", "aff", "dep", "agegrp", weights, "band", hz,
            horizon,
        ).collect()
    }
    assert len(got) == horizon
    # compose by hand from the public per-(arm, class) PP estimator
    per = net_survival_pohar_perme(
        df, ["cohort", "agegrp"], "band", hz, horizon, with_ci=True
    ).collect()
    by = {}
    for r in per:
        by.setdefault((r.cohort, r.hour), []).append(
            (
                weights[r.agegrp],
                round(r.net_survival_pp * 1e6),
                round(r.se_net * 1e6),
                r.n_risk,
            )
        )
    for h in range(1, horizon + 1):
        exp_arm = {}
        for arm in ("aff", "dep"):
            parts = by[(arm, h)]
            wsum = sum(w for w, _, _, _ in parts)
            s_std = sum(w * s for w, s, _, _ in parts) / wsum / 1e6
            var = (
                sum(
                    round(
                        (w / wsum) * (w / wsum)
                        * (se / 1e6) * (se / 1e6) * 1e12
                    )
                    for w, _, se, _ in parts
                )
                / 1e12
            )
            exp_arm[arm] = (s_std, var, sum(n for *_, n in parts))
        r = got[h]
        gap = exp_arm["dep"][0] - exp_arm["aff"][0]
        se = math.sqrt(exp_arm["aff"][1] + exp_arm["dep"][1])
        assert r.net_std_ref == pytest.approx(
            round(exp_arm["aff"][0], 6), abs=1e-9
        )
        assert r.net_std_cmp == pytest.approx(
            round(exp_arm["dep"][0], 6), abs=1e-9
        )
        assert r.gap == pytest.approx(round(gap, 6), abs=1e-9)
        assert r.se_gap == pytest.approx(round(se, 6), abs=1e-9)
        assert r.n_risk_ref == exp_arm["aff"][2]
        assert r.n_risk_cmp == exp_arm["dep"][2]
    # the planted deprivation gap: negative and significant at the
    # mid-horizon
    mid = got[8]
    assert mid.gap < 0
    assert mid.upper_ci_gap < 0
    # 32-partition exactness
    got32 = {
        r.hour: r
        for r in net_survival_gap(
            df.repartition(32), "cohort", "aff", "dep", "agegrp",
            weights, "band", hz, horizon,
        ).collect()
    }
    for h, r in got.items():
        assert got32[h].gap == r.gap
        assert got32[h].se_gap == r.se_gap
    # guards: non-integer weights; missing arm raises in-plan
    with pytest.raises(ValueError):
        net_survival_gap(
            df, "cohort", "aff", "dep", "agegrp", {0: 0.5}, "band",
            hz, horizon,
        )
    with pytest.raises(Exception, match="both named arms"):
        net_survival_gap(
            df.filter(F.col("cohort") == "aff"),
            "cohort", "aff", "dep", "agegrp", weights, "band", hz,
            horizon,
        ).collect()


def _net_logrank_reference(subs, hz_micro, horizon):
    """Pico-lattice twin of net_survival_logrank: subs = (group, band,
    duration, event) with group ∈ {g1, g2}, g1 = lexicographic min."""
    import math

    g1 = min(g for g, *_ in subs)
    u_sum = v_sum = 0
    for s in range(1, horizon + 1):
        agg = {}
        for (g, b, d, e) in subs:
            lam = hz_micro.get(b, 0)
            w = (1.0 - lam / 1e6) ** (-s)
            at_risk = 1 if d >= s else 0
            died = 1 if (d == s and e) else 0
            k = "1" if g == g1 else "2"
            a = agg.setdefault(k, [0, 0, 0, 0])  # wd, wn, we, wwd
            a[0] += round(died * w * 1e6)
            a[1] += round(at_risk * w * 1e6)
            a[2] += round(at_risk * w * (lam / 1e6) * 1e12)
            a[3] += round(died * w * w * 1e6)
        a1 = agg.get("1", [0, 0, 0, 0])
        a2 = agg.get("2", [0, 0, 0, 0])
        if a1[1] + a2[1] <= 0:
            continue
        exc1 = a1[0] / 1e6 - a1[2] / 1e12
        exc2 = a2[0] / 1e6 - a2[2] / 1e12
        r1 = (a1[1] / 1e6) / ((a1[1] + a2[1]) / 1e6)
        u_sum += round((exc1 - r1 * (exc1 + exc2)) * 1e12)
        v_sum += round(
            (
                (1.0 - r1) * (1.0 - r1) * (a1[3] / 1e6)
                + r1 * r1 * (a2[3] / 1e6)
            )
            * 1e12
        )
    u = u_sum / 1e12
    v = v_sum / 1e12
    return (
        round(u, 6),
        round(v, 6),
        round(u * u / v, 6) if v > 0 else None,
    )


def test_net_survival_logrank_twin_reduction_and_cancellation(spark):
    import math

    from cancer_survival_etl_spark.operators.survival import (
        logrank_test,
        net_survival_logrank,
    )

    hz = {0: 1500, 1: 20000}
    horizon = 16

    # --- lattice-twin exactness on a mixed-band cohort ---
    subs = []
    for i in range(180):
        g = "A" if i % 2 else "B"
        b = (i // 2) % 2
        d = (i * 7 + 3) % horizon + 1
        e = 1 if i % 3 else 0
        subs.append((g, b, min(d, horizon), e))
    df = spark.createDataFrame(
        subs, "cohort string, band int, duration long, event int"
    )
    got = net_survival_logrank(
        df, "cohort", "band", hz, horizon
    ).collect()[0]
    u, v, chi = _net_logrank_reference(subs, hz, horizon)
    assert got["group_1"] == "A"
    assert got["n_subjects_1"] == 90 and got["n_subjects_2"] == 90
    assert got["u_score"] == pytest.approx(u, abs=2e-6)
    assert got["variance"] == pytest.approx(v, abs=2e-6)
    assert got["chi_square"] == pytest.approx(chi, abs=1e-4)

    # --- zero life table: U reduces to the plain log-rank O1−E1 ---
    got0 = net_survival_logrank(
        df, "cohort", "band", {0: 0, 1: 0}, horizon
    ).collect()[0]
    plain = logrank_test(df, "cohort").collect()[0]
    o_minus_e = plain["observed_1"] - plain["expected_1"]
    assert got0["u_score"] == pytest.approx(o_minus_e, abs=1e-4)

    # --- background-mortality cancellation: both arms share the SAME
    # excess process, but arm A sits in the high-background band; the
    # plain log-rank fires on the background difference, the net test
    # stays calm ---
    subs2 = []
    for i in range(300):
        g = "A" if i % 2 else "B"
        b = 1 if g == "A" else 0  # A = high background (λ=0.02/h)
        h1 = (i * 37 + 11) % 199
        h2 = (i * 53 + 29) % 211
        # shared excess: ~2%/h planted via h1; background via band
        t_exc = 1 + h1 % 60
        t_bg = 1 + h2 % 45 if b == 1 else horizon + 100
        d = min(t_exc, t_bg, horizon)
        e = 1 if min(t_exc, t_bg) <= horizon else 0
        subs2.append((g, b, d, e))
    df2 = spark.createDataFrame(
        subs2, "cohort string, band int, duration long, event int"
    )
    hz2 = {0: 0, 1: 22000}
    net = net_survival_logrank(
        df2, "cohort", "band", hz2, horizon
    ).collect()[0]
    pl = logrank_test(df2, "cohort").collect()[0]
    assert pl["chi_square"] > 3.84  # background difference fires
    assert net["chi_square"] < pl["chi_square"]

    # --- 32-partition exactness ---
    got32 = net_survival_logrank(
        df.repartition(32), "cohort", "band", hz, horizon
    ).collect()[0]
    assert got32["u_score"] == got["u_score"]
    assert got32["variance"] == got["variance"]

    # --- guards ---
    with pytest.raises(ValueError, match="exactly 2 groups"):
        net_survival_logrank(
            df.filter(F.col("cohort") == "A"), "cohort", "band", hz,
            horizon,
        )
    with pytest.raises(ValueError, match="integers"):
        net_survival_logrank(df, "cohort", "band", {0: 0.5}, horizon)


def test_nonmixture_cure_recovery_twin_and_guards(spark):
    """Promotion-time cure model: the 12-iteration contract value
    matches a pure-Python same-lattice twin exactly; a planted
    S(t)=exp(−θ(1−e^{−λt})) cohort recovers its cured fraction;
    zero events raise."""
    import math

    from cancer_survival_etl_spark.operators.survival import (
        nonmixture_cure_exponential,
    )

    # deterministic inverse-CDF plant: theta* = -ln 0.35, lam* = 0.4
    theta_s = -math.log(0.35)
    subs = []
    for i in range(3000):
        u = ((i * 2654435761) % 1000003) / 1000003.0
        z = -math.log(u + 1e-9)
        if z / theta_s >= 1.0:
            subs.append((30, 0))
        else:
            t = -math.log(1.0 - z / theta_s) / 0.4
            if t < 30:
                subs.append((int(t) + 1, 1))
            else:
                subs.append((30, 0))
    df = spark.createDataFrame(subs, "duration long, event int")
    got = nonmixture_cure_exponential(df, iters=12).collect()[0]

    # pure-Python twin on the identical lattice
    from collections import Counter

    cells = Counter(subs)
    d_ev = sum(c for (t, e), c in cells.items() if e)
    st_all = (
        sum(c * round(t * 1e6) for (t, e), c in cells.items()) / 1e6
    )
    st_ev = (
        sum(c * e * round(t * 1e6) for (t, e), c in cells.items())
        / 1e6
    )
    lam = round(d_ev / st_all, 9)
    theta = None
    for _ in range(12):
        sf = sum(
            c * round((1.0 - math.exp(-lam * t)) * 1e9)
            for (t, e), c in cells.items()
        )
        ste = sum(
            c * round(t * math.exp(-lam * t) * 1e9)
            for (t, e), c in cells.items()
        )
        st2e = sum(
            c * round(t * t * math.exp(-lam * t) * 1e9)
            for (t, e), c in cells.items()
        )
        theta = round(d_ev / (sf / 1e9), 9)
        g = d_ev / lam - st_ev - theta * (ste / 1e9)
        gp = -d_ev / (lam * lam) + theta * (st2e / 1e9)
        step = g / gp if gp < 0 else 0.0
        lam = round(min(max(lam - step, lam / 2), lam * 2), 9)
    assert got["theta"] == round(theta, 6)
    assert got["lambda_promotion"] == round(lam, 6)
    assert got["pi_cure"] == pytest.approx(
        round(math.exp(-theta), 6), abs=1e-9
    )
    # the planted 35% cured fraction is recovered
    assert got["pi_cure"] == pytest.approx(0.35, abs=0.03)
    assert got["n"] == 3000 and got["n_event"] == d_ev

    # 32-partition exactness
    got32 = nonmixture_cure_exponential(
        df.repartition(32), iters=12
    ).collect()[0]
    assert got32["theta"] == got["theta"]
    assert got32["lambda_promotion"] == got["lambda_promotion"]

    # guards
    allc = spark.createDataFrame([(5, 0), (7, 0)], "duration long, event int")
    with pytest.raises(ValueError, match="zero events"):
        nonmixture_cure_exponential(allc)
    with pytest.raises(ValueError, match="iters"):
        nonmixture_cure_exponential(df, iters=0)
