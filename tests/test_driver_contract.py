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
    """The driver adjudicates the FIRST 50 queries() entries. Round-4
    policy (VERDICT r3 items 1-2): every window slot oracle-checked,
    the window holds shipmode_priority (its oracle's BIGINT-cast fix
    needs adjudication — the round's only red row) plus the
    never-driver-adjudicated tranche; nothing already driver-GREEN
    occupies a slot."""
    import json
    import os

    qs = list(entrymod.queries())
    osql = entrymod.oracle_sql()
    window = qs[:50]
    missing = [k for k in window if k not in osql]
    assert not missing, missing
    assert "shipmode_priority" in window
    # judge-named round-4 priority queries must sit inside the window
    for must in ["graph_pagerank", "multimodal_pcm",
                 "multimodal_bmp", "bloom_decontaminate",
                 "hierarchy_closure", "heavy_hitters",
                 "ann_ivf_kmeans", "ann_hard_negatives",
                 "stats_kendall_weighted", "text_suffix_repeat",
                 "tokenizer_unigram_encode"]:
        assert must in window, must
    # nothing already driver-green may occupy a window slot (the one
    # exception is shipmode_priority, red in r03)
    green = set()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rnd in ("01", "02", "03"):
        p = os.path.join(here, f"CORRECTNESS_r{rnd}.json")
        with open(p) as fh:
            for name, row in json.load(fh).items():
                if row.get("hash_match"):
                    green.add(name)
    overlap = set(window) & green
    assert overlap <= {"shipmode_priority"}, overlap
