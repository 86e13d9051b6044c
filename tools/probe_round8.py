"""Round-8 scaling probe: aipw_survival_contrast, apc_joinpoint_k,
flexible_parametric_survival_td at 16x-amplified planted cohorts
(25k/100k/400k subjects), warm best-of-2 — the flat-wall-time check
that the new operators' data-sized work is the single cell collapse.

Results are pasted into SCALE.md (round-6/7 probe convention).

Usage: python tools/probe_round8.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cancer_survival_etl_spark.operators.survival import (  # noqa: E402
    aipw_survival_contrast,
    apc_joinpoint_k,
    flexible_parametric_survival_td,
)
from cancer_survival_etl_spark.session import get_spark  # noqa: E402


def simpson_cohort(spark, n):
    rows = []
    for i in range(n):
        u_x = ((i * 48271 + 3) % 999983) / 999983.0
        u_a = ((i * 69069 + 11) % 999979) / 999979.0
        u_t = ((i * 2654435761 + 7) % 999961) / 999961.0 + 1e-9
        x = 1.0 if u_x < 0.5 else 0.0
        a = 1 if u_a < (0.8 if x > 0 else 0.2) else 0
        haz = 0.15 if x > 0 else 0.04
        t = -math.log(u_t) / haz
        rows.append((a, x, min(int(t) + 1, 30), 1 if t < 30 else 0))
    return spark.createDataFrame(
        rows, "arm int, x double, duration long, event int"
    ).repartition(32).localCheckpoint(eager=True)


def rate_rows(spark, n):
    rows = [
        ("G" if i % 2 == 0 else "H", 1 + i % 30, 1 + (i % 7 == 0), 100)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "grp string, period long, cases long, person_time long"
    ).repartition(32).localCheckpoint(eager=True)


def td_cohort(spark, n):
    rows = []
    for i in range(n):
        x = float(i % 2)
        uu = ((i * 2654435761 + 19) % 999983) / 999983.0 + 1e-9
        t = -math.log(uu) / (0.04 * math.exp(0.7 * x))
        rows.append((x, min(int(t), 39), 1 if t < 40 else 0))
    return spark.createDataFrame(
        rows, "x double, duration long, event int"
    ).repartition(32).localCheckpoint(eager=True)


def best_of(k, fn):
    best = None
    for _ in range(k):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best


def firth_cohort(spark, n):
    rows = []
    for i in range(n):
        u_x = ((i * 48271 + 3) % 999983) / 999983.0
        u_y = ((i * 69069 + 11) % 999979) / 999979.0
        x = 1 if u_x < 0.5 else 0
        y = 1 if u_y < (0.03 if x else 0.006) else 0
        rows.append((x, y))
    return spark.createDataFrame(
        rows, "x int, y int"
    ).repartition(32).localCheckpoint(eager=True)


def cure_cohort(spark, n):
    rows = []
    for i in range(n):
        u1 = ((i * 48271 + 3) % 999983) / 999983.0
        u2 = ((i * 69069 + 11) % 999979) / 999979.0
        if u1 < 0.35:
            rows.append((25, 0))
        else:
            t = -math.log(u2 + 1e-9) / 0.25
            rows.append((min(int(t) + 1, 25), 1 if t < 25 else 0))
    return spark.createDataFrame(
        rows, "duration long, event int"
    ).repartition(32).localCheckpoint(eager=True)


def main2() -> None:
    """Second round-8 tranche: glm_logistic_firth,
    direct_adjusted_survival, concordance_index,
    mixture_cure_exponential."""
    from cancer_survival_etl_spark.operators.stats import (
        glm_logistic_firth,
    )
    from cancer_survival_etl_spark.operators.survival import (
        concordance_index,
        direct_adjusted_survival,
        mixture_cure_exponential,
    )

    spark = get_spark("probe_r08b")
    print("| subjects | firth | direct_adjusted | cindex | cure_em |")
    print("|---|---|---|---|---|")
    for n in (25000, 100000, 400000):
        co = simpson_cohort(spark, n)
        fi = firth_cohort(spark, n)
        cu = cure_cohort(spark, n)
        t_firth = best_of(
            2, lambda: glm_logistic_firth(fi, ["x"], "y", iters=8)
        )
        t_da = best_of(
            2,
            lambda: direct_adjusted_survival(
                co, "arm", ["x"], [0.0, 1.3217558399823195]
            ).collect(),
        )
        t_ci = best_of(
            2,
            lambda: concordance_index(
                co.withColumn("score", co.x), "score"
            ).collect(),
        )
        t_cure = best_of(
            2, lambda: mixture_cure_exponential(cu, iters=12).collect()
        )
        print(
            f"| {n // 1000}k | {t_firth:.2f} s | {t_da:.2f} s "
            f"| {t_ci:.2f} s | {t_cure:.2f} s |"
        )
        for d in (co, fi, cu):
            d.unpersist()


def main() -> None:
    spark = get_spark("probe_r08")
    print("| subjects | aipw_contrast | apc_joinpoint_k=2 | rp_td |")
    print("|---|---|---|---|")
    for n in (25000, 100000, 400000):
        co = simpson_cohort(spark, n)
        rr = rate_rows(spark, n)
        td = td_cohort(spark, n)
        t_aipw = best_of(
            2,
            lambda: aipw_survival_contrast(
                co, "arm", ["x"], [5, 15, 25]
            ).collect(),
        )
        t_jp = best_of(
            2,
            lambda: apc_joinpoint_k(
                rr, ["grp"], n_breaks=2
            ).collect(),
        )
        t_td = best_of(
            2,
            lambda: flexible_parametric_survival_td(
                td, "x", interval_width=4, horizon=40, iters=30
            )[0].collect(),
        )
        print(
            f"| {n // 1000}k | {t_aipw:.2f} s | {t_jp:.2f} s "
            f"| {t_td:.2f} s |"
        )
        for d in (co, rr, td):
            d.unpersist()


if __name__ == "__main__":
    if "--batch2" in sys.argv:
        main2()
    else:
        main()
