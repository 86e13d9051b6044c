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
    """The driver adjudicates the FIRST 50 queries() entries. Round-8
    policy (VERDICT r07 item 1): slots 1-13 are the 13 round-7 queries
    never driver-adjudicated (judge parity-verified green in VERDICT
    r07); slots 14-50 are 37 of the 44 r02-vintage stale adjudications
    — every r02-vintage row EXCEPT the 7 declared deferrals, which sit
    at positions 51-57 for the r09 rotation. Every window slot is
    oracle-checked."""
    import json
    import os

    qs = list(entrymod.queries())
    osql = entrymod.oracle_sql()
    window = qs[:50]
    # every window slot is oracle-checked, except the one declared
    # rows-only query (tokenizer_bpe — driver records a rows-only
    # check for it, as it did in r02)
    missing = [k for k in window if k not in osql]
    assert missing in ([], ["tokenizer_bpe"]), missing
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, str] = {}
    for rnd in ("01", "02", "03", "04", "05", "06", "07"):
        p = os.path.join(here, f"CORRECTNESS_r{rnd}.json")
        with open(p) as fh:
            for name, row in json.load(fh).items():
                if row.get("hash_match") or (
                    row.get("err") == "no_oracle"
                    and row.get("spark_rows")
                ):
                    latest[name] = rnd
    # slots 1-13: the round-7 tranche — never driver-adjudicated
    never = window[:13]
    adjudicated = [n for n in never if n in latest]
    assert not adjudicated, adjudicated
    for must in ["survival_km_turnbull", "survival_aalen_additive",
                 "survival_fine_gray_ci", "survival_cox_spline",
                 "rates_apc", "survival_lexis", "stats_cuzick",
                 "survival_prevalence", "survival_ipw_km",
                 "stats_conditional_logistic", "rates_joinpoint",
                 "survival_flexible_allcause", "stats_mcnemar"]:
        assert must in never, must
    # slots 14-50: r02-vintage drift re-checks — green-adjudicated in
    # r02 and untouched since; together with the 7 deferrals at 51-57
    # they exhaust the r02 staleness tail.
    stale = window[13:]
    assert all(latest.get(n) == "02" for n in stale), [
        (n, latest.get(n)) for n in stale if latest.get(n) != "02"]
    deferred = qs[50:57]
    assert all(latest.get(n) == "02" for n in deferred), deferred
    r02_all = {n for n, r in latest.items() if r == "02" and n in qs}
    assert r02_all == set(stale) | set(deferred), (
        r02_all - set(stale) - set(deferred))


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
