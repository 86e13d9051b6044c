"""Physical-plan regression tests — the scale contract.

These pin the properties that make the queries viable at 100 TB:
filters reach the parquet scan, projection prunes columns, small dims
broadcast (no sort-merge shuffle of the fact table), and AQE is on.
A refactor that silently loses one of these still passes correctness
tests — this file is what catches it.
"""

from __future__ import annotations

import contextlib
import io
import re

import __spark_entry__ as entrymod


def _plan(spark, sf_dir, name: str) -> str:
    df = entrymod.queries()[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    p = _plan(spark, sf_dir, "pricing_summary")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("l_shipdate" in f for f in pushed), pushed
    schemas = re.findall(r"ReadSchema: (\S+)", p)
    li = [s for s in schemas if "l_quantity" in s]
    assert li, schemas
    # 16-column table pruned to the 6 referenced columns
    assert li[0].count(":") == 6, li[0]


def test_star_joins_broadcast(spark, sf_dir):
    for q in ["revenue_by_nation", "supplier_rank_quartile", "j1_left_join_const"]:
        p = _plan(spark, sf_dir, q)
        assert "SortMergeJoin" not in p, f"{q} fell back to sort-merge"
        assert "BroadcastHashJoin" in p, f"{q} lost its broadcast"


def test_filter_pushdown_on_disjunction(spark, sf_dir):
    p = _plan(spark, sf_dir, "p1_filter_disjunctive")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    assert any("c_mktsegment" in f and "c_nationkey" in f for f in pushed), pushed


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
    )


def test_unpivot_is_narrow(spark, sf_dir):
    # melt must not introduce a shuffle before the aggregation
    from cancer_survival_etl_spark.operators.reshape import melt
    from cancer_survival_etl_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    long = melt(
        li, ["l_orderkey"], ["l_quantity", "l_discount"], "metric", "val"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        long.explain("formatted")
    assert "Exchange" not in buf.getvalue()
