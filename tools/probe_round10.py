"""Round-10 scaling probe: the multistate illness-death AJ, the
net-survival gap / Graffeo log-rank pair, period net survival, the
RP excess-hazard model, MI-Rubin pooled GLM, quantile regression and
the non-mixture cure model at 16x-amplified planted cohorts
(25k/100k/400k subjects), warm best-of-2 — the flat-wall-time check
that each operator's data-sized work is its one cell collapse
(results pasted into SCALE.md, the round-6..9 probe convention).

Usage: python tools/probe_round10.py
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
    mi_rubin_glm,
    quantile_regression,
)
from cancer_survival_etl_spark.operators.survival import (  # noqa: E402
    multistate_illness_death,
    net_survival_gap,
    net_survival_logrank,
    net_survival_period,
    nonmixture_cure_exponential,
    royston_parmar_excess_survival,
)
from cancer_survival_etl_spark.session import get_spark  # noqa: E402

HZ = {b: 1000 + 2500 * b for b in range(9)}
WTS = {0: 30000, 1: 45000, 2: 25000}
H = 48


def best_of(k, fn):
    best = None
    for _ in range(k):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best


def msm_cohort(spark, n):
    rows = []
    for i in range(n):
        g = "A" if i % 2 else "B"
        h1 = (i * 48271 + 3) % 97
        h2 = (i * 69069 + 11) % 89
        if h1 % 3 == 0:
            rows.append((g, None, 1 + h2 % (H - 1), 1 if h2 % 4 else 0))
        elif h1 % 3 == 1:
            t_ill = h2 % (H - 2)
            e = t_ill + 1 + (h1 // 3) % 10
            if e >= H:
                rows.append((g, t_ill, H, 0))
            else:
                rows.append((g, t_ill, e, 1 if h1 % 5 else 0))
        else:
            rows.append((g, None, H, 0))
    return spark.createDataFrame(
        rows, "g string, t_ill long, t_exit long, death long"
    ).repartition(32).localCheckpoint(eager=True)


def banded_cohort(spark, n, with_diag=False, with_class=False):
    rows = []
    for i in range(n):
        g = "A" if i % 2 else "B"
        band = i % 9
        d = (i * 7 + 3) % H + 1
        e = 1 if i % 3 else 0
        row = [g, band, d, e]
        if with_class:
            row.insert(2, band // 3)
        if with_diag:
            row.append((i * 13) % 200)
        rows.append(tuple(row))
    schema = "g string, band int"
    if with_class:
        schema += ", agegrp int"
    schema += ", duration long, event int"
    if with_diag:
        schema += ", diag_time long"
    return spark.createDataFrame(rows, schema).repartition(
        32
    ).localCheckpoint(eager=True)


def cure_cohort(spark, n):
    theta_s = -math.log(0.35)
    rows = []
    for i in range(n):
        u = ((i * 2654435761) % 1000003) / 1000003.0
        z = -math.log(u + 1e-9)
        if z / theta_s >= 1.0:
            rows.append((30, 0))
        else:
            t = -math.log(1.0 - z / theta_s) / 0.4
            rows.append((int(t) + 1, 1) if t < 30 else (30, 0))
    return spark.createDataFrame(
        rows, "duration long, event int"
    ).repartition(32).localCheckpoint(eager=True)


def glm_cohort(spark, n, missing=False):
    rows = []
    for i in range(n):
        x1 = (i % 10) / 10.0
        x2 = ((i * 7) % 13) / 13.0
        u = ((i * 48271 + 3) % 999983) / 999983.0
        p = 1 / (1 + math.exp(-(-0.5 + 1.2 * x1 - 0.8 * x2)))
        y = 1 if u < p else 0
        if missing and i % 7 == 0:
            rows.append((f"k{i}", None, x2, y))
        else:
            rows.append((f"k{i}", x1, x2, y))
    return spark.createDataFrame(
        rows, "key string, x1 double, x2 double, y int"
    ).repartition(32).localCheckpoint(eager=True)


def qr_cohort(spark, n):
    rows = []
    for i in range(n):
        x = (i % 100) / 25.0
        u = ((i * 69069 + 11) % 999979) / 999979.0 - 0.5
        rows.append((x, 2.0 + 3.0 * x + u * (1.0 + 2.0 * x)))
    return spark.createDataFrame(
        rows, "x double, y double"
    ).repartition(32).localCheckpoint(eager=True)


def main() -> None:
    spark = get_spark("probe-round10")
    sizes = [25000, 100000, 400000]
    probes = [
        (
            "illness_death",
            msm_cohort,
            lambda d: multistate_illness_death(d, ["g"], H).agg(
                {"p02": "max"}
            ).collect(),
        ),
        (
            "net_survival_gap",
            lambda s, n: banded_cohort(s, n, with_class=True),
            lambda d: net_survival_gap(
                d, "g", "A", "B", "agegrp", WTS, "band", HZ, H
            ).agg({"gap": "min"}).collect(),
        ),
        (
            "net_survival_logrank",
            banded_cohort,
            lambda d: net_survival_logrank(
                d, "g", "band", HZ, H
            ).collect(),
        ),
        (
            "net_survival_period",
            lambda s, n: banded_cohort(s, n, with_diag=True),
            lambda d: net_survival_period(
                d, ["g"], "band", HZ, H, 100, 200
            ).agg({"net_survival_pp": "min"}).collect(),
        ),
        (
            "rp_excess",
            banded_cohort,
            lambda d: royston_parmar_excess_survival(
                d.withColumn("x", (d.band % 2).cast("double")),
                "x", "band", HZ, 4, H, iters=20,
            ).collect(),
        ),
        (
            "mi_rubin_glm",
            lambda s, n: glm_cohort(s, n, missing=True),
            lambda d: mi_rubin_glm(
                d, "key", ["x1", "x2"], "y", m=3, iters=6
            ).collect(),
        ),
        (
            "quantile_reg",
            qr_cohort,
            lambda d: quantile_regression(
                d, ["x"], "y", tau=0.5, iters=10
            ).collect(),
        ),
        (
            "cure_nonmixture",
            cure_cohort,
            lambda d: nonmixture_cure_exponential(d, iters=12).collect(),
        ),
    ]
    for label, mk, run in probes:
        for n in sizes:
            d = mk(spark, n)
            dt = best_of(2, lambda: run(d))
            print(f"{label:22s} n={n:7d}  best {dt:6.2f}s", flush=True)
            d.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
