"""Dump per-query formatted plans to plans/<round>/<query>_<tag>.txt (round from $SPARK_GRAFT_PLANS_ROUND, default r11).

Usage: python tools/dump_plans.py <before|after> [sf_dir] query...

For iterative fits the returned DataFrame is the published summary
frame; the Newton/EM iterations run eagerly inside fn() and their
per-iteration plans do not appear here — iteration-shape claims are
evidenced in OPTIMIZATION_r10.md (job counts, bench seconds) and the
operator source. The dump still pins the query's contract plan: scan
pushdown, join strategies, exchange count of the declared output.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cancer_survival_etl_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    rest = sys.argv[2:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.001", rest
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"))
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(f"# {name} [{tag}] at {sf_dir}\n")
            fh.write(buf.getvalue())
        print("dumped", name)
    spark.stop()


if __name__ == "__main__":
    main()
