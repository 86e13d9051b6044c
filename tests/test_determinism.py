"""Partitioning-independence battery: the repo's core determinism
claim is that every oracle-checked query returns BIT-IDENTICAL results
regardless of physical layout. Run a representative set of the
late-round operators against the same data under three adversarial
layouts (1 partition, 64 partitions, range-partitioned by an unrelated
column) and require exact equality — floats included, because every
additive float path is micro-unit-exact by construction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cancer_survival_etl_spark.sources.catalog import load_table


def _layouts(df):
    return [
        df.coalesce(1),
        df.repartition(64),
        df.repartitionByRange(7, F.col(df.columns[-1])),
    ]


def _rows(df):
    return sorted(map(tuple, df.collect()))


OPS = {}


def _register(name):
    def deco(fn):
        OPS[name] = fn
        return fn
    return deco


@_register("bm25")
def _bm25(spark, docs):
    from cancer_survival_etl_spark.llm.retrieval import bm25_topk

    qs = spark.createDataFrame(
        [(1, "spark query filter"), (2, "hash join merge")],
        "query_id int, query_text string",
    )
    return bm25_topk(docs, qs, k=10)


@_register("dsir")
def _dsir(spark, docs):
    from cancer_survival_etl_spark.llm.retrieval import dsir_importance

    return dsir_importance(
        docs, docs.filter("lang = 'en'"), n_buckets=512
    )


@_register("lm_score")
def _lm(spark, docs):
    from cancer_survival_etl_spark.llm.retrieval import ngram_lm_score

    return ngram_lm_score(docs.filter("lang = 'en'"), docs, n=2)


@_register("ngram_jaccard_stopgram")
def _ngram(spark, docs):
    from cancer_survival_etl_spark.llm.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.05,
        block_col="lang", max_doc_freq=4,
    )


@_register("heavy_hitters")
def _hh(spark, docs):
    from cancer_survival_etl_spark.operators.sketches import heavy_hitters

    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    return heavy_hitters(toks, "tok", threshold_fraction=0.005)


@_register("symdelete_linkage")
def _link(spark, docs):
    from cancer_survival_etl_spark.operators.linkage import (
        symdelete_fuzzy_pairs,
    )

    named = docs.select(
        "doc_id", F.substring("text", 1, 12).alias("name"),
        "lang",
    )
    return symdelete_fuzzy_pairs(named, "doc_id", "name", ["lang"], 1)


@_register("unigram_encode")
def _uni(spark, docs):
    from cancer_survival_etl_spark.llm.unigram import unigram_encode

    scores = {c: 4000 for c in "abcdefghijklmnopqrstuvwxyz"}
    return unigram_encode(docs, scores).select(
        "doc_id", "n_words", "n_tokens"
    )


@_register("suffix_repeat")
def _suffix(spark, docs):
    from cancer_survival_etl_spark.llm.textstats import (
        longest_internal_repeat,
    )

    return longest_internal_repeat(docs)


@_register("wordpiece_encode")
def _wp(spark, docs):
    from cancer_survival_etl_spark.llm.wordpiece import wordpiece_encode

    vocab = ["[UNK]"] + [c for c in "abcdefghijklm"] + [
        "##" + c for c in "abcdefghijklmnopqrstuvwxyz"
    ]
    return wordpiece_encode(docs, vocab).select(
        "doc_id", "n_words", "n_tokens"
    )


@_register("km_curve")
def _km(spark, docs):
    from cancer_survival_etl_spark.operators.survival import km_curve

    subj = docs.select(
        "lang",
        (F.col("n_chars") % 50).alias("duration"),
        (F.col("doc_id") % 3 > 0).cast("int").alias("event"),
    )
    return km_curve(subj, ["lang"])


@_register("global_ntile")
def _gntile(spark, docs):
    from cancer_survival_etl_spark.operators.windows import global_ntile

    return global_ntile(
        docs.select("doc_id", F.length("text").alias("n")),
        ["n", "doc_id"],
        3,
        alias="tile",
    )


@_register("lsh_quality")
def _lshq(spark, docs):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.llm.dedup import lsh_quality_report

    return lsh_quality_report(
        docs.filter(F.col("doc_id") % 3 == 0), threshold=0.2
    )


@pytest.mark.parametrize("name", sorted(OPS))
def test_partitioning_independence(spark, sf_dir, name):
    docs = load_table(spark, sf_dir, "documents")
    results = [
        _rows(OPS[name](spark, layout)) for layout in _layouts(docs)
    ]
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 0, f"{name} vacuous at {sf_dir}"


EVENT_OPS = {}


def _eregister(name):
    def deco(fn):
        EVENT_OPS[name] = fn
        return fn
    return deco


@_eregister("anomaly_mad")
def _anom(spark, events):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.timeseries import anomaly_mad

    e = events.select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return anomaly_mad(e, "user_id", "ts", "cents", "event_id", 25, 3)


@_eregister("cohort")
def _coh(spark, events):
    from cancer_survival_etl_spark.operators.timeseries import (
        cohort_retention,
    )

    return cohort_retention(events, "user_id", "ts", "week")


@_eregister("attribution")
def _attr(spark, events):
    from cancer_survival_etl_spark.operators.timeseries import (
        touch_attribution,
    )

    return touch_attribution(events)


@_eregister("transitions")
def _trans(spark, events):
    from cancer_survival_etl_spark.operators.timeseries import (
        transition_matrix,
    )

    return transition_matrix(events)


@_eregister("pattern")
def _pat(spark, events):
    from cancer_survival_etl_spark.operators.timeseries import (
        pattern_matches,
    )

    return pattern_matches(
        events, ["view", "click", "purchase"], max_step_gap="2 days"
    )


@_eregister("winsorize")
def _wins(spark, events):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.stats import winsorize_by

    e = events.select(
        "event_id", "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return winsorize_by(e, "event_type", "cents", 0.05, 0.95)


@_eregister("robust_scale")
def _rscale(spark, events):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.stats import robust_scale_by

    e = events.select(
        "event_id", "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return robust_scale_by(e, "event_type", "cents", 0.05, 0.95)


@_eregister("auc")
def _auc(spark, events):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.stats import auc_by

    e = events.select(
        "event_type",
        F.col("value").alias("score"),
        (F.col("user_id") % 2 == 0).cast("int").alias("label"),
    )
    return auc_by(e, "event_type", "score", "label")


@_eregister("spearman")
def _spear(spark, events):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.stats import spearman_by

    e = events.select(
        "event_type",
        (F.round(F.col("value") * 100, 0).cast("long") % 1000).alias("xb"),
        F.col("user_id").alias("yv"),
    )
    return spearman_by(e, "event_type", "xb", "yv")


@_eregister("kendall")
def _kendall(spark, events):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.stats import kendall_tau_by

    e = events.select(
        "event_type",
        (F.round(F.col("value") * 100, 0).cast("long") % 1000).alias("xb"),
        F.col("user_id").alias("yv"),
    )
    return kendall_tau_by(e, "event_type", "xb", "yv")


@_eregister("ks")
def _ks(spark, events):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.stats import ks_test

    e = events.select(
        (F.col("user_id") % 2).cast("string").alias("variant"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return ks_test(e, "variant", "cents")


@_eregister("mutual_info")
def _mi(spark, events):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.stats import (
        mutual_information,
    )

    e = events.select(
        "event_type", (F.col("user_id") % 4).cast("string").alias("cohort")
    )
    return mutual_information(e, "event_type", "cohort")


@_eregister("pr_auc")
def _prauc(spark, events):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.stats import pr_auc

    e = events.select(
        F.col("value").alias("score"),
        (F.col("user_id") % 2 == 0).cast("int").alias("label"),
    )
    return pr_auc(e, "score", "label")


@_eregister("rank_sum")
def _ranksum(spark, events):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.stats import rank_sum_test

    e = events.select(
        (F.col("user_id") % 2).cast("string").alias("variant"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return rank_sum_test(e, "variant", "cents")


@_eregister("cusum")
def _cusum(spark, events):
    from cancer_survival_etl_spark.operators.timeseries import (
        cusum_changepoints,
    )

    return cusum_changepoints(events, "event_type", "ts", "value",
                              k_slack_cents=25, h_cents=2000)


@_eregister("isotonic_unbinned")
def _iso(spark, events):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.llm.evals import isotonic_fit

    e = events.select(
        ((F.col("event_id") % 499) / 499.0).alias("score"),
        (F.col("event_id") % 3 == 0).cast("int").alias("label"),
    )
    return isotonic_fit(e, "score", "label")


@pytest.mark.parametrize("name", sorted(EVENT_OPS))
def test_event_ops_partitioning_independence(spark, sf_dir, name):
    events = load_table(spark, sf_dir, "events")
    results = [
        _rows(EVENT_OPS[name](spark, layout))
        for layout in (
            events.coalesce(1),
            events.repartition(64),
            events.repartitionByRange(7, F.col("event_id")),
        )
    ]
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 0, f"{name} vacuous at {sf_dir}"
