"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1), local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation, no
driver collection). One warmup of a trivial action first so JVM/codegen
startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from cancer_survival_etl_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "supplier_rank_quartile",
    "a4_percentile_disc",
    "w1_rank_window",
    "r2_pivot_sum",
    "benchmark_standards",
    "events_tumbling",
    "dedup_exact",
    "dedup_minhash",
    "ngram_jaccard",
    "ann_brute_force",
    "text_quality",
    "lang_id",
    "win_running_sum",
    "skew_salted_agg",
    "dedup_embedding",
    "sketch_approx_distinct",
    "quality_profile",
    "events_asof",
    "events_range_join",
    "rollup_agg",
    "global_topk",
    "dataset_split",
    "dedup_lsh_pipeline",
    "text_decontaminate",
    "text_chunk",
    "text_pack_bins",
    "text_boilerplate",
    "text_tfidf",
    "events_rollup",
    "stats_zscore",
    "stats_corr",
    "quality_expectations",
    "win_distinct_count",
    "shipping_priority",
    "model_score",
    "events_json_props",
    "dataset_mixture",
    "zorder_values",
    "tokenizer_bpe",
    "custdist",
    "big_orders",
    "suppliers_kept_waiting",
    "sketch_kmv_distinct",
    "text_repetition",
    "order_priority_check",
    "forecast_revenue",
    "volume_shipping",
    "market_share",
    "returned_items",
    "shipmode_priority",
    "promo_revenue",
    "top_supplier",
    "small_qty_revenue",
    "disjunctive_brand_revenue",
    "events_gap_fill",
    "events_scd2",
    "dataset_stratified",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    qs = entrymod.queries()

    # warmup: touch the fact table so first-query numbers are query cost,
    # not JVM spin-up
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # Two passes, keep the per-query min: one-off JIT/GC/page-cache noise
    # on a shared machine otherwise dominates sub-second queries.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    timings: dict[str, float] = {}

    def drop_persisted() -> None:
        # several operators localCheckpoint narrow shared frames;
        # without explicit release the blocks accumulate across the 35
        # queries and storage-memory pressure bleeds into later timings
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    for _ in range(passes):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            took = round(time.time() - t0, 3)
            if name not in timings or took < timings[name]:
                timings[name] = took
            drop_persisted()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
