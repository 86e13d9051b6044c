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
    # DuckDB planning first (the connection is not thread-safe, and
    # LIMIT 0 planning is cheap); the Spark side is the slow half —
    # many query fns run their bounded fit collects at CONSTRUCTION,
    # so building all 360+ serially paid each one's job latency
    # end-to-end. Spark job submission is thread-safe: overlap the
    # constructions in a small driver pool (guide §2.6) — ~6× less
    # wall-clock for this test, identical assertions.
    duck = {
        name: sorted(con.sql(f"SELECT * FROM ({sql}) q LIMIT 0").columns)
        for name, sql in entrymod.oracle_sql().items()
    }
    from concurrent.futures import ThreadPoolExecutor

    def spark_cols(name):
        return name, sorted(qs[name](spark, sf).columns)

    with ThreadPoolExecutor(max_workers=8) as pool:
        got = dict(pool.map(spark_cols, duck))
    bad = [
        (name, got[name], duck_cols)
        for name, duck_cols in duck.items()
        if got[name] != duck_cols
    ]
    assert not bad, bad


def test_correctness_window_composition():
    """The driver adjudicates the FIRST 50 queries() entries. Round-10
    policy (VERDICT r09 item 1): slots 1-26 are the 26 round-9 queries
    never driver-adjudicated (judge parity-verified green in VERDICT
    r09); slot 27 is corpus_ccnet_buckets (the r09 rotation nit — a
    classified bench flag whose last hash adjudication is r04-vintage);
    slots 28-50 are the 23 longest-stale r03-vintage re-checks. After
    this window the never-adjudicated set is EMPTY and the staleness
    tail is 8 r03-vintage rows (pinned below for the r11 rotation)."""
    import json
    import os

    qs = list(entrymod.queries())
    osql = entrymod.oracle_sql()
    window = qs[:50]
    # every r10 window slot is oracle-checked (the two declared
    # rows-only queries, tokenizer_bpe and multimodal_decode, were
    # re-pinned in r08/r09 and sit outside this window)
    missing = [k for k in window if k not in osql]
    assert missing == [], missing
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, str] = {}
    for rnd in ("01", "02", "03", "04", "05", "06", "07", "08", "09"):
        p = os.path.join(here, f"CORRECTNESS_r{rnd}.json")
        with open(p) as fh:
            for name, row in json.load(fh).items():
                if row.get("hash_match") or (
                    row.get("err") == "no_oracle"
                    and row.get("spark_rows")
                ):
                    latest[name] = rnd
    # slots 1-26: the round-9 tranche — never driver-adjudicated
    never = window[:26]
    adjudicated = [n for n in never if n in latest]
    assert not adjudicated, adjudicated
    for must in ["survival_cox_robust", "survival_fine_gray_strat",
                 "survival_fine_gray_robust", "survival_mcf",
                 "rates_paf", "survival_weibull_aft", "survival_pwe",
                 "stats_ordinal", "stats_tmle", "stats_fisher_exact",
                 "stats_bayes_ab", "stats_tost", "eval_qini",
                 "stats_cronbach", "stats_psm", "stats_multinomial",
                 "survival_ibs", "quality_funnel", "events_asof_nearest",
                 "survival_loglogistic_aft", "survival_gray_strat",
                 "survival_cox_ag", "events_absorbing",
                 "rates_apc_drift", "stats_signed_rank",
                 "stats_friedman"]:
        assert must in never, must
    # the never-adjudicated set is exactly the 26 in slots 1-26 plus
    # the round-10 tranche (registered AFTER the pinned window, so by
    # definition no driver record exists yet — they head the r11
    # window together with the 8 deferred r03 rows below): no OTHER
    # registry query lacks an adjudication record
    r10_new = {
        "survival_net_period", "survival_rp_excess", "stats_mi_rubin",
        "survival_net_cond_ci", "stats_quantile_reg",
        # the later round-10 build commits (91de36f..bca3ce2) extended
        # the tranche after this set was first pinned:
        "stats_cochran_q", "stats_evalue", "survival_illness_death",
        "survival_net_gap", "survival_net_logrank",
        "survival_cure_nonmix",
    }
    never_all = {n for n in qs if n not in latest}
    assert never_all == set(never) | r10_new, (
        never_all ^ (set(never) | r10_new)
    )
    # slot 27: the rotation nit (VERDICT r09 "What's missing" item 3)
    assert window[26] == "corpus_ccnet_buckets"
    # slots 28-50: the longest-stale rows — all r03-vintage
    r03 = window[27:]
    assert len(r03) == 23
    assert all(latest.get(n) == "03" for n in r03), [
        (n, latest.get(n)) for n in r03 if latest.get(n) != "03"]
    # the staleness tail outside the window is exactly the 8 r03 rows
    # deferred to r11 — nothing older than r03 remains anywhere
    outside_r03 = {n for n in qs[50:] if latest.get(n) == "03"}
    assert outside_r03 == {
        "stats_chi_square", "stats_cuped", "stats_js_divergence",
        "stats_ols_multi", "stats_psi_drift", "stats_welch",
        "supplier_part_counts", "top_supplier"}, outside_r03
    assert not any(
        latest.get(n) in ("01", "02") for n in qs if n in latest)


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
