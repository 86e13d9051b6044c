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
    """The driver adjudicates the FIRST 50 queries() entries. Round-9
    policy (VERDICT r08 item 1): slots 1-7 are the 7 r02 deferrals;
    slots 8-31 are the 24 round-8 queries never driver-adjudicated
    (judge parity-verified green in VERDICT r08); slot 32 is
    multimodal_decode (the final r02-vintage row, rows-only by
    declared contract); slots 33-50 are 18 r03-vintage stale
    re-checks including all three driver-bench-flagged queries.
    After this window NO r02-vintage adjudication remains."""
    import json
    import os

    qs = list(entrymod.queries())
    osql = entrymod.oracle_sql()
    window = qs[:50]
    # every window slot is oracle-checked except the one declared
    # rows-only query (multimodal_decode — Python decode kernel, no
    # SQL equivalent; driver records a rows-only check as in r02)
    missing = [k for k in window if k not in osql]
    assert missing in ([], ["multimodal_decode"]), missing
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, str] = {}
    for rnd in ("01", "02", "03", "04", "05", "06", "07", "08"):
        p = os.path.join(here, f"CORRECTNESS_r{rnd}.json")
        with open(p) as fh:
            for name, row in json.load(fh).items():
                if row.get("hash_match") or (
                    row.get("err") == "no_oracle"
                    and row.get("spark_rows")
                ):
                    latest[name] = rnd
    # slots 1-7: the r02 deferrals — every remaining r02 oracle row
    deferrals = window[:7]
    assert set(deferrals) == {
        "sketch_sample_quantiles", "text_chunk", "text_pack_bins",
        "dataset_mixture", "model_score", "stats_zscore",
        "stats_histogram"}, deferrals
    assert all(latest.get(n) == "02" for n in deferrals), [
        (n, latest.get(n)) for n in deferrals]
    # slots 8-31: the round-8 tranche — never driver-adjudicated
    never = window[7:31]
    adjudicated = [n for n in never if n in latest]
    assert not adjudicated, adjudicated
    for must in ["rates_joinpoint_k", "survival_aipw_contrast",
                 "survival_relative_lt", "survival_rp_td",
                 "survival_ipcw_km", "survival_aipcw_contrast",
                 "stats_firth_logistic", "survival_direct_adjusted",
                 "survival_cindex", "survival_cure_mixture",
                 "survival_km_band", "stats_zip", "survival_cindex_uno",
                 "survival_brier", "survival_rmst_ci",
                 "survival_logrank_renyi", "survival_rmtl", "stats_gee",
                 "survival_auc_td", "survival_calibration",
                 "demography_life_table", "stats_meta_dl",
                 "survival_frailty", "rates_cumulative_risk"]:
        assert must in never, must
    # slot 32: the last r02-vintage row (rows-only)
    assert window[31] == "multimodal_decode"
    assert latest.get("multimodal_decode") == "02"
    # slots 33-50: r03-vintage drift re-checks, bench-flagged first
    r03 = window[32:]
    assert len(r03) == 18
    assert all(latest.get(n) == "03" for n in r03), [
        (n, latest.get(n)) for n in r03 if latest.get(n) != "03"]
    for flagged in ("stats_rank_sum", "stats_spearman", "stats_kendall"):
        assert flagged in r03, flagged
    # the r02 staleness tail is now fully inside the window: no
    # registry query's latest adjudication is r02-vintage outside it
    r02_all = {n for n, r in latest.items() if r == "02" and n in qs}
    assert r02_all <= set(window), r02_all - set(window)


def test_plans_md_covers_every_registry_query():
    """PLANS.md is the physical-plan audit trail: every queries()
    entry must have its `## <name>` section. This pins the
    registration workflow — regenerate PLANS.md (tools/
    explain_audit.py) in the same commit that registers a query, so
    the trail can never lag the registry again (VERDICT r05+r06)."""
    import os
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "PLANS.md")) as fh:
        secs = set(re.findall(r"^## ([a-z0-9_]+)$", fh.read(), re.M))
    missing = [n for n in entrymod.queries() if n not in secs]
    assert not missing, missing
