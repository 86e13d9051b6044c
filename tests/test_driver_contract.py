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
    """The driver adjudicates the FIRST 50 queries() entries. Round-5
    policy (VERDICT r04 items 1 and 3): slots 1-2 are the two r04 red
    rows re-staged with the percentile_disc dtype fix; the remaining
    48 slots hold only never-driver-adjudicated queries (survival
    family first); every slot is oracle-checked; nothing already
    driver-GREEN occupies a slot."""
    import json
    import os

    qs = list(entrymod.queries())
    osql = entrymod.oracle_sql()
    window = qs[:50]
    missing = [k for k in window if k not in osql]
    assert not missing, missing
    # the r04 red rows lead the window so the fix gets adjudicated
    assert window[:2] == ["stats_winsorize", "stats_robust_scale"]
    # judge-named round-5 priority queries must sit inside the window
    for must in ["survival_km", "survival_cox", "survival_net_pp",
                 "survival_rmst", "survival_relative",
                 "embedding_pca", "ann_pca_topk", "ann_binary_hamming",
                 "ann_ivfpq_percell", "tokenizer_wordpiece_encode",
                 "tokenizer_bpe_bytes_encode", "multimodal_gif",
                 "multimodal_ppm"]:
        assert must in window, must
    # nothing already driver-green may occupy a window slot except the
    # two re-staged r04 reds
    green = set()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rnd in ("01", "02", "03", "04"):
        p = os.path.join(here, f"CORRECTNESS_r{rnd}.json")
        with open(p) as fh:
            for name, row in json.load(fh).items():
                if row.get("hash_match"):
                    green.add(name)
    overlap = set(window) & green
    assert overlap == set(), overlap
