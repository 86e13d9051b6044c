"""Z-order layout: correctness of the interleave and the pruning
benefit it exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from cancer_survival_etl_spark.operators.layout import (
    layout_stats,
    zorder_layout,
    zvalue,
)


def _morton(x: int, y: int, b: int) -> int:
    return sum(
        (((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))
        for i in range(b)
    )


def test_zvalue_matches_reference_morton(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    rows = df.select("x", "y", zvalue(["x", "y"], bits=4).alias("z")).collect()
    assert all(r["z"] == _morton(r["x"], r["y"], 4) for r in rows)
    # order-preserving per dimension at fixed other-dimension
    zs = {(r["x"], r["y"]): r["z"] for r in rows}
    assert all(zs[(x, 0)] < zs[(x + 1, 0)] for x in range(15))


def test_zorder_layout_prunes_boxes_better_than_linear(spark):
    """For a y-only box predicate, an x-sorted layout must touch every
    partition while the z-ordered layout touches a strict subset — the
    min/max pruning this operator exists to enable."""
    grid = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x long, y long"
    )
    n_parts = 16

    zed = zorder_layout(grid, ["x", "y"], bits=6, num_partitions=n_parts)
    z_stats = layout_stats(zed, ["x", "y"]).collect()
    z_touched = sum(
        1 for r in z_stats if r["min_y"] <= 7 and r["max_y"] >= 0
    )

    linear = grid.repartitionByRange(n_parts, F.col("x")).sortWithinPartitions("x")
    l_stats = layout_stats(linear, ["x", "y"]).collect()
    l_touched = sum(
        1 for r in l_stats if r["min_y"] <= 7 and r["max_y"] >= 0
    )

    assert l_touched == len(l_stats)  # x-sort can't prune on y
    assert z_touched < l_touched / 2  # z-order prunes most partitions
