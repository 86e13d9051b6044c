"""Round-10 optimization probe: decompose the per-iteration cost of the
iterative-fit family (guide §1 — measure first).

Hypotheses to separate, on the negbin cohort (orders at sf0.1, 150k rows,
cohort localCheckpointed like the registry query does):

  H1 execution: each iteration's agg pass over 150k cached rows is slow.
  H2 codegen/planning: each iteration embeds fresh beta LITERALS, so the
     generated code differs per iteration -> codegen cache miss + Catalyst
     replan each job (~hundreds of ms of fixed driver-side cost).
  H3 scheduling/py4j: fixed per-job cost independent of plan or data.

Probes:
  A  same plan, same literals, run 10x      -> job cost with warm codegen
  B  fresh literals each run, 10x           -> adds replan+recompile
  C  beta via broadcast 1-row frame, 10x    -> same generated code every
     run (values flow as columns), data changes
  D  pattern-collapsed cells (groupBy x,y + cnt), fresh literals, 10x
  E  three independent fit loops in threads vs sequential
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cancer_survival_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cohort_df(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    key = F.col("o_orderkey")
    x = (key % 8) / 8.0
    mix = F.when(
        F.conv(F.substring(F.md5(key.cast("string")), 9, 8), 16, 10)
        .cast("long") % 2 == 0,
        F.lit(0.3),
    ).otherwise(F.lit(1.7))
    lam = F.exp(F.lit(1.5) + 0.9 * x) * mix
    jitter = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long") % 3 - 1
    ).cast("double")
    yv = F.greatest(F.round(lam, 0) + jitter, F.lit(0.0))
    return o.select(x.alias("x"), yv.alias("y")).localCheckpoint(eager=False)


def poisson_aggs(beta, xs, y, nano):
    eta = F.lit(beta[0])
    for j in range(1, len(xs)):
        eta = eta + F.lit(beta[j]) * xs[j]
    mu = F.exp(eta)
    aggs = []
    for j in range(len(xs)):
        aggs.append(
            F.sum(F.round((y - mu) * xs[j] * nano, 0).cast("long")).alias(f"g{j}")
        )
    for j in range(len(xs)):
        for k in range(j, len(xs)):
            aggs.append(
                F.sum(F.round(mu * xs[j] * xs[k] * nano, 0).cast("long")).alias(
                    f"i{j}_{k}"
                )
            )
    return aggs


def main():
    spark = get_spark("probe_r10_opt")
    sc = spark.sparkContext
    nano = F.lit(1000000000.0)
    df = cohort_df(spark)
    n = df.count()  # materialize the checkpoint
    print(f"cohort rows: {n}, partitions: {df.rdd.getNumPartitions()}")

    y = F.col("y").cast("double")
    xs = [F.lit(1.0), F.col("x").cast("double")]

    # ---- A: identical plan, identical literals, 10 runs
    beta = [0.1234, 0.5678]
    aggs = poisson_aggs(beta, xs, y, nano)
    times = []
    for i in range(10):
        t0 = time.time()
        df.agg(*aggs).collect()
        times.append(time.time() - t0)
    print("A same-literals   :", [round(t, 3) for t in times])

    # ---- B: fresh literals each run (the real Newton pattern)
    times = []
    for i in range(10):
        b = [0.1 + i * 0.0137, 0.5 + i * 0.0071]
        aggs = poisson_aggs(b, xs, y, nano)
        t0 = time.time()
        df.agg(*aggs).collect()
        times.append(time.time() - t0)
    print("B fresh-literals  :", [round(t, 3) for t in times])

    # ---- C: beta via broadcast 1-row frame, same generated code each run
    times = []
    for i in range(10):
        b = [0.1 + i * 0.0137, 0.5 + i * 0.0071]
        bdf = spark.createDataFrame([tuple(b)], "b0 double, b1 double")
        j = df.crossJoin(F.broadcast(bdf))
        eta = F.col("b0") + F.col("b1") * F.col("x").cast("double")
        mu = F.exp(eta)
        xs2 = [F.lit(1.0), F.col("x").cast("double")]
        aggs2 = []
        for jj in range(2):
            aggs2.append(
                F.sum(F.round((y - mu) * xs2[jj] * nano, 0).cast("long")).alias(
                    f"g{jj}"
                )
            )
        for jj in range(2):
            for k in range(jj, 2):
                aggs2.append(
                    F.sum(
                        F.round(mu * xs2[jj] * xs2[k] * nano, 0).cast("long")
                    ).alias(f"i{jj}_{k}")
                )
        t0 = time.time()
        j.agg(*aggs2).collect()
        times.append(time.time() - t0)
    print("C broadcast-beta  :", [round(t, 3) for t in times])

    # ---- D: pattern-collapsed cells, fresh literals
    cells = (
        df.groupBy("x", "y").agg(F.count(F.lit(1)).alias("_cnt"))
        .localCheckpoint(eager=True)
    )
    print("cells rows:", cells.count())
    cnt = F.col("_cnt")
    times = []
    for i in range(10):
        b = [0.1 + i * 0.0137, 0.5 + i * 0.0071]
        eta = F.lit(b[0]) + F.lit(b[1]) * F.col("x").cast("double")
        mu = F.exp(eta)
        aggs3 = []
        for jj in range(2):
            aggs3.append(
                F.sum(
                    cnt * F.round((y - mu) * xs[jj] * nano, 0).cast("long")
                ).alias(f"g{jj}")
            )
        for jj in range(2):
            for k in range(jj, 2):
                aggs3.append(
                    F.sum(
                        cnt * F.round(mu * xs[jj] * xs[k] * nano, 0).cast("long")
                    ).alias(f"i{jj}_{k}")
                )
        t0 = time.time()
        cells.agg(*aggs3).collect()
        times.append(time.time() - t0)
    print("D collapsed-cells :", [round(t, 3) for t in times])

    # ---- E: 3 independent 10-iteration loops, sequential vs threaded
    def loop(tag):
        b = [0.0, 0.0]
        for i in range(10):
            aggs4 = poisson_aggs(b, xs, y, nano)
            row = df.agg(*aggs4).collect()[0]
            b = [b[0] + 1e-6, b[1] + 1e-6]  # dummy update, fresh literals
        return tag

    t0 = time.time()
    for tag in range(3):
        loop(tag)
    seq = time.time() - t0
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=3) as pool:
        list(pool.map(loop, range(3)))
    thr = time.time() - t0
    print(f"E sequential 3x10 : {seq:.2f}s   threaded: {thr:.2f}s")

    # ---- F: cox-style iteration shapes on a 15k cohort --------------
    # current shape: cells -> global_prefix_sum (checkpoint + totals
    # collect) -> tot agg -> crossJoin broadcast -> fold collect
    # fused shape:   cells -> prefix via in-query two-phase (window over
    # pid totals, no driver collect, exchange reuse) -> fold collect
    from pyspark.sql import Window
    from cancer_survival_etl_spark.operators.windows import global_prefix_sum

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(15000)
    u = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000000
    ) / 1000000.0 + 1e-6
    x1 = (F.col("o_orderkey") % 12) / 12.0
    t_ = -F.log(u) / F.exp(1.2 * x1)
    coh = o.select(
        x1.alias("x1"),
        F.round(F.least(t_, F.lit(1.5)), 4).alias("duration"),
        (t_ <= 1.5).cast("int").alias("event"),
    ).localCheckpoint(eager=False)
    coh.count()

    def cox_cells(b):
        r = F.exp(F.lit(b) * F.col("x1"))
        ev = F.col("event").cast("long")
        return coh.groupBy("duration").agg(
            F.sum(ev).alias("d_t"),
            F.sum(F.round(r * nano, 0).cast("long")).alias("a0"),
            F.sum(ev * F.round(F.col("x1") * nano, 0).cast("long")).alias("s0"),
            F.sum(F.round(r * F.col("x1") * nano, 0).cast("long")).alias("a1"),
        )

    # F1: current shape
    times = []
    for i in range(6):
        b = 0.3 + i * 0.01
        cells = cox_cells(b)
        t0 = time.time()
        pre = global_prefix_sum(
            cells, "duration", ["a0", "a1"], ["_pre_a0", "_pre_a1"]
        )
        tot = cells.agg(
            F.sum("a0").alias("_tot_a0"), F.sum("a1").alias("_tot_a1")
        )
        pre = pre.crossJoin(F.broadcast(tot))
        s0 = F.col("_tot_a0") - F.col("_pre_a0")
        s1 = F.col("_tot_a1") - F.col("_pre_a1")
        term = F.col("s0") / nano - F.col("d_t") * (s1 / s0)
        pre.agg(
            F.sum(
                F.when(F.col("d_t") > 0, F.round(term * nano, 0).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("g")
        ).collect()
        times.append(time.time() - t0)
    print("F1 current shape  :", [round(t, 3) for t in times])

    # F2: fused single-action shape (no checkpoint, no totals collect)
    times = []
    for i in range(6):
        b = 0.3 + i * 0.01
        cells = cox_cells(b)
        t0 = time.time()
        K = 32
        ranged = (
            cells.repartitionByRange(K, F.col("duration"))
            .withColumn("_pid", F.spark_partition_id())
        )
        ptots = ranged.groupBy("_pid").agg(
            F.sum("a0").alias("_t0"), F.sum("a1").alias("_t1")
        )
        wc = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
        carries = ptots.select(
            "_pid",
            F.coalesce(F.sum("_t0").over(wc), F.lit(0)).alias("_c0"),
            F.coalesce(F.sum("_t1").over(wc), F.lit(0)).alias("_c1"),
            F.sum("_t0").over(
                Window.orderBy(F.lit(1)).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("_tot_a0"),
            F.sum("_t1").over(
                Window.orderBy(F.lit(1)).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("_tot_a1"),
        )
        wcell = Window.partitionBy("_pid").orderBy("duration").rowsBetween(
            Window.unboundedPreceding, -1
        )
        pre = (
            ranged.join(F.broadcast(carries), "_pid")
            .withColumn(
                "_pre_a0",
                F.coalesce(F.sum("a0").over(wcell), F.lit(0)) + F.col("_c0"),
            )
            .withColumn(
                "_pre_a1",
                F.coalesce(F.sum("a1").over(wcell), F.lit(0)) + F.col("_c1"),
            )
        )
        s0 = F.col("_tot_a0") - F.col("_pre_a0")
        s1 = F.col("_tot_a1") - F.col("_pre_a1")
        term = F.col("s0") / nano - F.col("d_t") * (s1 / s0)
        pre.agg(
            F.sum(
                F.when(F.col("d_t") > 0, F.round(term * nano, 0).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("g")
        ).collect()
        times.append(time.time() - t0)
    print("F2 fused one-job  :", [round(t, 3) for t in times])

    spark.stop()


if __name__ == "__main__":
    main()
