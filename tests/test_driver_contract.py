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
    """The driver adjudicates the FIRST 50 queries() entries. Round-6
    policy (VERDICT r05 item 1): slots 1-34 are the 34 queries never
    driver-adjudicated through r05 (the survival/GLM/ALS/OPQ/PMI
    tranche); slots 35-50 re-stage 16 §2 core queries untouched since
    their r01 green as a free drift re-check. Every slot is
    oracle-checked, and with this window every r05-registry query has
    been driver-adjudicated at least once."""
    import json
    import os

    qs = list(entrymod.queries())
    osql = entrymod.oracle_sql()
    window = qs[:50]
    missing = [k for k in window if k not in osql]
    assert not missing, missing
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    for rnd in ("01", "02", "03", "04", "05"):
        p = os.path.join(here, f"CORRECTNESS_r{rnd}.json")
        with open(p) as fh:
            for name, row in json.load(fh).items():
                if row.get("hash_match"):
                    green.add(name)
    # slots 1-34: never adjudicated before round 6
    never = set(window[:34])
    assert never & green == set(), never & green
    # judge-named round-6 priority queries must sit in those slots
    for must in ["survival_flexible_model", "survival_fine_gray",
                 "survival_cox_hr", "survival_period", "survival_smr",
                 "survival_index_net", "model_train_als", "stats_msprt",
                 "stats_poisson_glm", "embedding_procrustes",
                 "ann_opq_adc", "text_pmi_pairs", "stats_did",
                 "sketch_countmin", "dataset_temperature",
                 "events_cdc_apply"]:
        assert must in never, must
    # slots 35-50: §2 core drift re-checks — all r01-green by design
    core = window[34:]
    assert set(core) <= green, set(core) - green
    for must in ["p1_filter_disjunctive", "supplier_rank_quartile",
                 "benchmark_standards", "r2_pivot_sum"]:
        assert must in core, must
