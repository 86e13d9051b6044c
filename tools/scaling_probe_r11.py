"""Round-11 scaling probe (VERDICT r10 item 9): run the heaviest
remaining queries at an AMPLIFIED scale (8× sf0.1 ≈ sf0.8 by the
established id-shift protocol) at 32 vs 8 cores, to show parallel
scaling exists beyond the job-overhead regime the sf0.1 bench sits in
(there, the 8-core full run beat the 32-core run).

Amplification: documents/embeddings/orders are unioned with k=0..7
id-shifted copies (ids shifted by k·2^40 — disjoint, deterministic).
Document TEXT gets a per-copy suffix token so exact-dedup does NOT
collapse the amplified corpus back to 1×; embeddings/orders rows are
verbatim copies (the md5-derived cohorts draw fresh randomness from
the shifted keys). Other tables symlink to sf0.1. Timing: warm best
of 2 noop-sink passes per query per core count, one spark-submit-less
process per core count (master local[N] via $SPARK_GRAFT_CPUS).

Usage:
  python tools/scaling_probe_r11.py build   # write /tmp/sf0.8amp
  SPARK_GRAFT_CPUS=32 python tools/scaling_probe_r11.py run
  SPARK_GRAFT_CPUS=8  python tools/scaling_probe_r11.py run
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AMP_DIR = os.environ.get("SPARK_GRAFT_AMP_DIR", "/tmp/sf0.8amp")
BASE = "/root/testdata/sf0.1"
K = int(os.environ.get("SPARK_GRAFT_AMP_K", "8"))
SHIFT = 1 << 40

QUERIES = [
    "corpus_curation",
    "dedup_keep_best",
    "dataset_leakage_safe_split",
    "graph_kcore",
    "graph_pagerank",
    "ann_opq_adc",
    "ann_ivf_kmeans",
    "survival_cox_td",
    "survival_cox_robust",
    "stats_quantile_reg",
]


def build() -> None:
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.session import get_spark
    from cancer_survival_etl_spark.sources.catalog import load_table

    spark = get_spark("amp-build")
    os.makedirs(AMP_DIR, exist_ok=True)

    def amp(table, id_col, text_col=None):
        df = load_table(spark, BASE, table)
        parts = []
        for k in range(K):
            c = df.withColumn(
                id_col, F.col(id_col) + F.lit(k * SHIFT).cast("long")
            )
            if text_col is not None and k > 0:
                # per-copy token prefix: copies are NOT near-dups of
                # each other (distinct vocabularies), so the pair
                # graph scales like a real K×-bigger corpus instead of
                # exploding K² cross-copy candidate pairs
                c = c.withColumn(
                    text_col,
                    F.array_join(
                        F.transform(
                            F.split(F.col(text_col), " "),
                            lambda x: F.concat(F.lit(f"{k}~"), x),
                        ),
                        " ",
                    ),
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{AMP_DIR}/{table}.parquet")
        print("amplified", table)

    amp("documents", "doc_id", "text")
    amp("embeddings", "vec_id")
    amp("orders", "o_orderkey")
    for t in (
        "lineitem", "customer", "supplier", "nation", "region",
        "part", "partsupp", "events",
    ):
        dst = f"{AMP_DIR}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    spark.stop()


def run() -> None:
    import __spark_entry__ as entrymod
    from cancer_survival_etl_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(f"amp-run-{cpus}")
    qs = entrymod.queries()
    spark.read.parquet(f"{AMP_DIR}/documents.parquet").count()  # warmup
    results = {}
    names = sys.argv[2:] or QUERIES
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, AMP_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        results[name] = round(best, 2)
        print(f"RESULT cpus={cpus} {name}: {best:.2f}s", flush=True)
    print(f"TOTAL cpus={cpus}: {round(sum(results.values()), 1)}s")
    spark.stop()


if __name__ == "__main__":
    {"build": build, "run": run}[sys.argv[1]]()
