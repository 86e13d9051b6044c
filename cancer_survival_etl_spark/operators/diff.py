"""Snapshot reconciliation: keyed diff of two table versions.

The audit primitive every pipeline needs the day a backfill disagrees
with production: which keys were added, removed, or changed between
snapshot A and snapshot B, and which columns moved. One full-outer
join on the key — the same shuffle a MERGE would pay — with pure
expression column comparison (null-safe), no collect, no per-row
Python.

At 100 TB: the join shuffles both snapshots once on the key; with
both sides bucketed/partitioned on the key it degrades to a zipper
join with no exchange. The unchanged majority is dropped BEFORE any
further processing, so downstream (reports, CDC emit) sees only the
delta — output size tracks the change rate, not the table size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Keyed diff → (keys..., status, changed_cols).

    ``status`` ∈ {'added', 'removed', 'changed', 'unchanged'};
    ``changed_cols`` is a comma-joined, schema-ordered list of compare
    columns whose values differ null-safely (empty for non-'changed'
    rows). Column comparison is IS DISTINCT FROM semantics: NULL→value
    and value→NULL count as changes, NULL→NULL does not.

    By default the unchanged majority is filtered out — pass
    ``include_unchanged=True`` for a full accounting (e.g. to feed a
    row-count reconciliation report).
    """
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    cmp_cols = list(compare_cols)

    o = old.select(
        *[F.col(k).alias(f"_ko_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in cmp_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_kn_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in cmp_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"_ko_{k}") == F.col(f"_kn_{k}")
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")

    changed_any = None
    for c in cmp_cols:
        d = ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        changed_any = d if changed_any is None else (changed_any | d)
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(changed_any, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    # concat_ws skips NULLs (Spark and DuckDB agree), so unchanged
    # columns vanish from the list without an array_compact step
    changed_cols = F.when(
        status == "changed",
        F.concat_ws(
            ",",
            *[
                F.when(
                    ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")),
                    F.lit(c),
                )
                for c in cmp_cols
            ],
        ),
    ).otherwise(F.lit(""))
    out = j.select(
        *[
            F.coalesce(F.col(f"_ko_{k}"), F.col(f"_kn_{k}")).alias(k)
            for k in keys
        ],
        status.alias("status"),
        changed_cols.alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out
