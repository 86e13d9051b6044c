"""Round-9 scaling probe: weibull_aft, cox_ph_counting (Andersen-
Gill episodes), tmle_ate, psm_att, and mcf_curve at 16x-amplified
planted cohorts (25k/100k/400k subjects), warm best-of-2 — the
flat-wall-time check that each operator's data-sized work is its one
cell collapse / carry pass (results pasted into SCALE.md, the
round-6/7/8 probe convention).

Usage: python tools/probe_round9.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from cancer_survival_etl_spark.operators.stats import (  # noqa: E402
    psm_att,
    tmle_ate,
)
from cancer_survival_etl_spark.operators.survival import (  # noqa: E402
    cox_ph_counting,
    mcf_curve,
    weibull_aft,
)
from cancer_survival_etl_spark.session import get_spark  # noqa: E402


def best_of(k, fn):
    best = None
    for _ in range(k):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best


def aft_cohort(spark, n):
    rows = []
    for i in range(n):
        u = ((i * 2654435761 + 7) % 999961) / 999961.0 + 1e-9
        x = float(i % 2)
        t = math.exp(1.5 - 0.6 * x) * (-math.log(u)) ** 0.7
        rows.append((x, round(min(t, 15.0), 4), 1 if t < 15 else 0))
    return spark.createDataFrame(
        rows, "x double, duration double, event int"
    ).repartition(32).localCheckpoint(eager=True)


def ag_cohort(spark, n):
    rows = []
    for i in range(n):
        x = float(i % 2)
        lam = 0.1 * math.exp(0.8 * x)
        u1 = ((i * 48271 + 3) % 999983) / 999983.0 + 1e-9
        u2 = ((i * 69069 + 11) % 999979) / 999979.0 + 1e-9
        t1 = -math.log(u1) / lam
        rows.append((x, 0.0, min(t1, 20.0), 1 if t1 < 20 else 0))
        if t1 < 20:
            t2 = t1 - math.log(u2) / lam
            rows.append((x, t1, min(t2, 20.0), 1 if t2 < 20 else 0))
    return spark.createDataFrame(
        rows, "x double, start double, stop double, event int"
    ).repartition(32).localCheckpoint(eager=True)


def causal_cohort(spark, n):
    rows = []
    for i in range(n):
        x = (i % 4) / 3.0
        u_a = ((i * 48271 + 3) % 999983) / 999983.0
        u_y = ((i * 69069 + 11) % 999979) / 999979.0
        pa = 1 / (1 + math.exp(-(-1.5 + 3.0 * x)))
        a = 1 if u_a < pa else 0
        py = 1 / (1 + math.exp(-(-1 + 0.9 * a + 1.5 * x)))
        y = 1 if u_y < py else 0
        rows.append((x, a, y))
    return spark.createDataFrame(
        rows, "x double, a int, y int"
    ).repartition(32).localCheckpoint(eager=True)


def mcf_frames(spark, n):
    ev, fu = [], []
    for i in range(n):
        g = "A" if i % 2 == 0 else "B"
        tau = 5.0 + (i * 7) % 20
        fu.append((g, f"s{i}", tau))
        k = i % 4
        for j in range(k):
            t = 1.0 + ((i * 31 + j * 17) % int(tau))
            ev.append((g, f"s{i}", min(t, tau)))
    e = spark.createDataFrame(
        ev, "grp string, subject string, time double"
    ).repartition(32).localCheckpoint(eager=True)
    f = spark.createDataFrame(
        fu, "grp string, subject string, tau double"
    ).repartition(32).localCheckpoint(eager=True)
    return e, f


def main() -> None:
    spark = get_spark("probe-round9")
    sizes = [25000, 100000, 400000]
    for label, mk, run in [
        (
            "weibull_aft",
            aft_cohort,
            lambda d: weibull_aft(d, ["x"], iters=8),
        ),
        (
            "cox_ph_counting(AG)",
            ag_cohort,
            lambda d: cox_ph_counting(d, ["x"], iters=8),
        ),
        (
            "tmle_ate",
            causal_cohort,
            lambda d: tmle_ate(d, ["x"], "a", "y"),
        ),
        (
            "psm_att",
            causal_cohort,
            lambda d: psm_att(d, ["x"], "a", "y").collect(),
        ),
    ]:
        for n in sizes:
            d = mk(spark, n)
            dt = best_of(2, lambda: run(d))
            print(f"{label:22s} n={n:7d}  best {dt:6.2f}s", flush=True)
            d.unpersist()
    for n in sizes:
        e, f = mcf_frames(spark, n)
        dt = best_of(
            2,
            lambda: mcf_curve(e, f, ["grp"]).agg(
                {"mcf": "max"}
            ).collect(),
        )
        print(f"{'mcf_curve':22s} n={n:7d}  best {dt:6.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
