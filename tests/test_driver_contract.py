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
