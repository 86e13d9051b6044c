"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry through Spark AND its ``oracle_sql()``
through DuckDB at the given sf dir, canonicalizes (columns sorted by
name, rows sorted by all columns), and compares row counts, column-name
sets, and exact values. Floats must match bit-exactly — the whole point
of the exact-cents / round-before-rank idioms.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # normalize bytes / lists for sorting
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _family(s: pd.Series) -> str:
    """Coarse dtype family for render-hash parity: int / float / bool /
    datetime / other. Nullable-int columns widen to float64 identically
    in both Spark's toPandas and DuckDB's df(), so null-widening does
    not false-positive this check."""
    k = s.dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in ("M", "m"):
        return "datetime"
    return "other"


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    a, b = canon(spark_df), canon(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        # Dtype-FAMILY gate (VERDICT r04 item 2): the driver hashes
        # RENDERED values, so a Spark DOUBLE 1234.0 vs an oracle
        # BIGINT 1234 is a red row even though the float compare
        # below passes. Flag any numeric-family mismatch (int vs
        # float vs bool) before coercing — this is the class that
        # shipped shipmode_priority (r03) and winsorize (r04) red.
        fam_a = _family(av)
        fam_b = _family(bv)
        if (
            fam_a != fam_b
            and fam_a in ("int", "float", "bool")
            and fam_b in ("int", "float", "bool")
        ):
            problems.append(
                f"col {c}: dtype family spark={fam_a}({av.dtype}) "
                f"duck={fam_b}({bv.dtype}) — driver render-hash would differ"
            )
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                bad = (~eq).sum()
                diff = (av - bv).abs().max()
                problems.append(f"col {c}: {bad} mismatches, maxdiff={diff}")
        else:
            avs = av.astype(str)
            bvs = bv.astype(str)
            if not (avs == bvs).all():
                bad = (avs != bvs).sum()
                idx = (avs != bvs).idxmax()
                problems.append(
                    f"col {c}: {bad} mismatches, e.g. spark={av[idx]!r} duck={bv[idx]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from cancer_survival_etl_spark.session import get_spark
    from cancer_survival_etl_spark.sources.catalog import TPCH_TABLES

    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            print(f"ok    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
