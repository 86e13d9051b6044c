"""Driver-contract robustness: the external harness calls queries()
with its own session and its own sf_dir string — probe the edges the
harness can legitimately produce (trailing slash, repeated invocation
in one session, a different sf than the query was developed on)."""

from __future__ import annotations

import __spark_entry__ as entrymod

PROBES = ["pricing_summary", "text_chunk", "events_rollup", "dedup_exact"]


def test_trailing_slash_sf_dir(spark, sf_dir):
    qs = entrymod.queries()
    for name in PROBES:
        assert qs[name](spark, sf_dir + "/").count() == qs[name](
            spark, sf_dir
        ).count(), name


def test_repeat_invocation_same_session(spark, sf_dir):
    qs = entrymod.queries()
    for name in PROBES:
        a = qs[name](spark, sf_dir).count()
        b = qs[name](spark, sf_dir).count()
        assert a == b, name


def test_entry_stable_schema_across_sf(spark, sf_dir):
    df1 = entrymod.entry(spark)
    cols = df1.columns
    qs = entrymod.queries()
    for name in PROBES:
        s1 = qs[name](spark, "/root/testdata/sf0.001").schema
        s2 = qs[name](spark, "/root/testdata/sf0.01").schema
        assert s1 == s2, name
    assert len(cols) > 0


def test_oracle_column_alignment_full_surface(spark):
    """The t2 gate hashes values under SORTED COLUMN NAMES — a Spark
    alias that drifts from its oracle's AS name fails even with
    identical values. This meta-test checks name alignment for EVERY
    oracle-checked query without executing values: DuckDB plans the
    oracle (LIMIT 0), Spark only builds the plan."""
    import duckdb

    from cancer_survival_etl_spark.sources.catalog import TPCH_TABLES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs = entrymod.queries()
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        duck_cols = sorted(
            con.sql(f"SELECT * FROM ({sql}) q LIMIT 0").columns
        )
        spark_cols = sorted(qs[name](spark, sf).columns)
        if duck_cols != spark_cols:
            bad.append((name, spark_cols, duck_cols))
    assert not bad, bad


def test_correctness_window_composition():
    """The driver adjudicates the FIRST 50 queries() entries. Round-3
    policy: every window slot must be oracle-checked (no rows-only
    entries — those were adjudicated in r02), and the window must
    cover the VERDICT r2 item-1 priority tranche: TPC-H, retrieval,
    linkage, incremental_agg, dedup_semantic, ann_pq_adc,
    corpus_curation, evals, stats."""
    qs = list(entrymod.queries())
    osql = entrymod.oracle_sql()
    window = qs[:50]
    missing = [k for k in window if k not in osql]
    assert not missing, missing
    # the judge-named priority queries must sit inside the window
    for must in ["custdist", "excess_suppliers", "bm25_topk",
                 "retrieval_mmr", "record_linkage", "linkage_golden",
                 "incremental_agg", "dedup_semantic", "ann_pq_adc",
                 "corpus_curation", "eval_rouge", "eval_bleu",
                 "stats_kendall", "sketch_hll_rollup",
                 "tokenizer_bpe_encode"]:
        assert must in window, must
    # nothing already driver-green may occupy a window slot
    already_green = {"conditional_agg", "volume_shipping",
                     "pricing_summary", "dedup_exact", "ann_ivf",
                     "events_funnel", "p1_filter_disjunctive"}
    assert not (set(window) & already_green)
