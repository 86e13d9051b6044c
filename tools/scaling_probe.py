"""Corpus-amplification scaling probe: time selected operators at 1x /
4x / 8x the sf0.01 documents table (id-shifted unioned copies, so
dedup-style ops see real extra cardinality, not repeated ids).

Marginal cost per additional document — not the absolute second count —
is the number that extrapolates to corpus scale; job overhead dominates
the absolute numbers at these sizes. Results are pasted into SCALE.md.

Usage: python tools/scaling_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cancer_survival_etl_spark.llm.curation import (
    chunk_documents,
    contamination,
    pack_bins,
)
from cancer_survival_etl_spark.operators.partitioning import fan_out
from cancer_survival_etl_spark.session import get_spark
from cancer_survival_etl_spark.sources.catalog import load_table


def amplify(docs, factor: int):
    out = docs
    n = docs.count()
    for i in range(1, factor):
        out = out.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n))
        )
    return fan_out(out).localCheckpoint(eager=True)


def best_of(k, fn):
    best = None
    for _ in range(k):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        t = time.time() - t0
        best = t if best is None or t < best else best
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("scaling_probe")
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 20 == 0)

    from cancer_survival_etl_spark.llm.dedup import (
        duplicate_spans,
        ngram_containment_pairs,
    )
    from cancer_survival_etl_spark.operators.diff import snapshot_diff

    def diff_modified(d):
        new = d.filter(F.col("doc_id") % 17 != 0).withColumn(
            "n_chars",
            F.when(
                F.col("doc_id") % 5 == 0, F.col("n_chars") + 1
            ).otherwise(F.col("n_chars")),
        )
        return snapshot_diff(d, new, ["doc_id"], ["n_chars", "lang"])

    from cancer_survival_etl_spark.llm.curation import bloom_decontaminate
    from cancer_survival_etl_spark.llm.retrieval import (
        bm25_topk,
        dsir_importance,
        ngram_lm_score,
    )

    bm25_queries = spark.createDataFrame(
        [(1, "spark query filter"), (2, "hash join merge"),
         (3, "window sort stream")],
        "query_id int, query_text string",
    )
    ops = {
        "chunk": lambda d: chunk_documents(d, chunk_size=32),
        "decontam": lambda d: contamination(d, ev, n=3),
        "pack_bins": lambda d: pack_bins(d, budget=512),
        "dup_spans": lambda d: duplicate_spans(d, k=8, min_docs=2),
        "snap_diff": diff_modified,
        "bm25": lambda d: bm25_topk(d, bm25_queries, k=10),
        "lm": lambda d: ngram_lm_score(d.filter("lang = 'en'"), d, n=2),
        "dsir": lambda d: dsir_importance(
            d, d.filter("lang = 'en'"), n_buckets=4096
        ),
        "bloom": lambda d: bloom_decontaminate(
            d.filter("doc_id % 10 != 0"), d.filter("doc_id % 10 = 0"),
            n=3, n_bits=1 << 18, k=4,
        ),
        "containment": lambda d: ngram_containment_pairs(
            d, "text", "doc_id", n=3, threshold=0.5, block_col="lang"
        ),
    }
    emb = load_table(spark, sf_dir, "embeddings")

    def amplify_emb(factor: int):
        out = emb
        n = emb.count()
        for i in range(1, factor):
            out = out.unionByName(
                emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * n))
            )
        return fan_out(out).localCheckpoint(eager=True)

    from cancer_survival_etl_spark.llm.similarity import (
        pq_encode,
        pq_train,
    )

    for factor in (1, 4, 8):
        e_amp = amplify_emb(factor)
        cb = pq_train(e_amp, m=16, sub_dim=4, k=16, iters=0)
        t = best_of(2, lambda: pq_encode(e_amp, cb, m=16, sub_dim=4))
        print(f"pq_encode {factor}x ({e_amp.count()} vecs): {t:.2f}s")
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    for factor in (1, 4, 8):
        d = amplify(docs, factor)
        n = d.count()
        row = [f"{factor}x ({n} docs)"]
        for name, op in ops.items():
            row.append(f"{name} {best_of(2, lambda: op(d)):.2f}s")
        print("  ".join(row))
        # release this factor's checkpointed corpus (and any frames the
        # ops materialized) before the next amplification — accumulated
        # blocks otherwise bleed storage pressure into later timings
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    # round-3 additions probe on the events table (kendall/cusum/
    # isotonic operate on event-shaped series; suffix/unigram on docs)
    from cancer_survival_etl_spark.llm.evals import isotonic_fit
    from cancer_survival_etl_spark.llm.textstats import (
        longest_internal_repeat,
    )
    from cancer_survival_etl_spark.llm.unigram import unigram_encode
    from cancer_survival_etl_spark.operators.stats import kendall_tau_by
    from cancer_survival_etl_spark.operators.timeseries import (
        cusum_changepoints,
    )

    events = load_table(spark, sf_dir, "events")

    def amplify_ev(factor: int):
        out = events
        n = events.count()
        for i in range(1, factor):
            out = out.unionByName(
                events.withColumn(
                    "event_id", F.col("event_id") + F.lit(i * n)
                )
            )
        return fan_out(out).localCheckpoint(eager=True)

    uni_scores = {c: 4000 for c in "abcdefghijklmnopqrstuvwxyz"}
    for factor in (1, 4, 8):
        e_amp = amplify_ev(factor)
        n = e_amp.count()
        feats = e_amp.select(
            "event_type",
            (F.round(F.col("value") * 100, 0).cast("long") % 1000).alias(
                "xb"
            ),
            F.col("user_id").alias("yv"),
        )
        iso = e_amp.select(
            ((F.col("event_id") % 499) / 499.0).alias("score"),
            (F.col("event_id") % 3 == 0).cast("int").alias("label"),
        )
        row = [f"{factor}x ({n} events)"]
        row.append(
            "kendall "
            f"{best_of(2, lambda: kendall_tau_by(feats, 'event_type', 'xb', 'yv')):.2f}s"
        )
        row.append(
            "cusum "
            f"{best_of(2, lambda: cusum_changepoints(e_amp, 'event_type', 'ts', 'value')):.2f}s"
        )
        row.append(
            "isotonic_unbinned "
            f"{best_of(2, lambda: isotonic_fit(iso, 'score', 'label')):.2f}s"
        )
        print("  ".join(row))
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    for factor in (1, 4, 8):
        d = amplify(docs, factor)
        n = d.count()
        row = [f"{factor}x ({n} docs)"]
        row.append(
            "suffix_repeat "
            f"{best_of(2, lambda: longest_internal_repeat(d)):.2f}s"
        )
        row.append(
            "unigram_encode "
            f"{best_of(2, lambda: unigram_encode(d, uni_scores)):.2f}s"
        )
        print("  ".join(row))
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()


if __name__ == "__main__":
    main()
