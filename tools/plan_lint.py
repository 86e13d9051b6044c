"""Plan lint: automated scale-discipline audit over the ENTIRE query
registry.

For every ``queries()`` entry, build the DataFrame and walk its
formatted physical plan for the anti-patterns that kill 100 TB runs:

  SP-WINDOW   a Window fed by an Exchange SinglePartition whose input
              is NOT a pre-aggregated frame (raw rows moving to one
              task — the rank_sum_test defect class, VERDICT r3 #2)
  SP-SORT     a global Sort on a SinglePartition exchange that is not
              part of a bounded top-k/limit (TakeOrderedAndProject is
              fine; a full global sort is not)
  CARTESIAN   CartesianProduct between two scans (never correct here;
              broadcast-nested-loop against a one-row frame is fine)

Bounded-by-construction frames are recognized structurally: an input
that passes through ANY aggregate (HashAggregate/SortAggregate/
ObjectHashAggregate) or a one-row scalar subquery before the exchange
is post-aggregation (its row count is #groups, not corpus) and a
single partition is legitimate — bh_adjust's #hypotheses frame,
quality_profile's top-n, temperature_weights' #sources.

Exit code 1 if any non-whitelisted violation is found; the report is
pasted into SCALE.md per round.

Usage: python tools/plan_lint.py [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cancer_survival_etl_spark.session import get_spark

# documented-benign exceptions: (query, rule) -> reason
WHITELIST: dict[tuple[str, str], str] = {}


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _subtree_has_agg_before_exchange(tree: list[str], idx: int) -> bool:
    """From tree position idx (an Exchange), scan DOWN the subtree: if
    an aggregate or a ReusedExchange/Subquery appears before any scan,
    the exchanged frame is post-aggregation (bounded)."""
    base_indent = len(tree[idx]) - len(tree[idx].lstrip(" *+-:"))
    for ln in tree[idx + 1:]:
        indent = len(ln) - len(ln.lstrip(" *+-:"))
        if indent <= base_indent:
            break
        if re.search(
            r"(HashAggregate|SortAggregate|ObjectHashAggregate|"
            r"ReusedExchange|Subquery|LocalTableScan|mapInPandas|"
            r"FlatMapGroupsInPandas)",
            ln,
        ):
            return True
        if re.search(r"Scan (parquet|ExistingRDD)", ln):
            return False
    return True  # nothing scanned below: bounded


def lint_query(name: str, plan: str) -> list[tuple[str, str, str]]:
    out = []
    tree = [
        ln
        for ln in plan.splitlines()
        if re.search(r"\w+\s+\(\d+\)", ln)
        and not re.match(r"\(\d+\)", ln.strip())
    ]
    for i, ln in enumerate(tree):
        if "Exchange" not in ln:
            continue
        # find the Exchange's Arguments via its node id
        m = re.search(r"Exchange \((\d+)\)", ln)
        if not m:
            continue
        nid = m.group(1)
        arg = re.search(
            rf"^\({nid}\) Exchange\n(?:.*\n)*?Arguments: ([^\n]*)",
            plan,
            re.M,
        )
        args = arg.group(1) if arg else ""
        if "SinglePartition" not in args:
            continue
        # consumer CHAIN: walk UP through strictly-shallower nodes
        # (the window-sort pattern is Window <- Sort <- Exchange)
        indent = len(ln) - len(ln.lstrip(" *+-:"))
        chain, cur = [], indent
        for up in range(i - 1, -1, -1):
            up_indent = len(tree[up]) - len(tree[up].lstrip(" *+-:"))
            if up_indent < cur:
                chain.append(tree[up].strip())
                cur = up_indent
        bounded = _subtree_has_agg_before_exchange(tree, i)
        if bounded or not chain:
            continue
        head = chain[0]
        above = chain[1] if len(chain) > 1 else ""
        if "Window" in head or (
            re.search(r"\bSort\b", head) and "Window" in above
        ):
            out.append((name, "SP-WINDOW", f"{above or head}"))
        elif re.search(r"\bSort\b", head) and "TakeOrdered" not in head:
            out.append((name, "SP-SORT", head))
    if re.search(r"CartesianProduct", plan):
        # cartesian between two multi-row sides; one-row scalar frames
        # arrive as BroadcastNestedLoopJoin, not CartesianProduct
        out.append((name, "CARTESIAN", "CartesianProduct in plan"))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("plan_lint")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    violations, checked = [], 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            plan = formatted_plan(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"error {name}: {type(e).__name__}: {e}", flush=True)
            continue
        checked += 1
        for v in lint_query(name, plan):
            if (v[0], v[1]) in WHITELIST:
                continue
            violations.append(v)
            print(f"VIOLATION {v[0]} [{v[1]}] {v[2]}", flush=True)
    print(f"\nchecked {checked} queries, {len(violations)} violations")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
