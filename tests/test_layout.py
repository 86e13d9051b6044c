"""Z-order layout: correctness of the interleave and the pruning
benefit it exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from cancer_survival_etl_spark.operators.layout import (
    layout_stats,
    quantile_bucketize,
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


def test_quantile_bucketize_equidepth_and_monotone(spark):
    """Skewed doubles land in near-equal-depth buckets; bucket ids are
    monotone in the raw value; bucketized z-order feeds zvalue."""
    import random

    rnd = random.Random(7)
    rows = [(i, rnd.random() ** 4 * 1000.0, float(rnd.randint(0, 10))) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, skewed double, coarse double")
    b = quantile_bucketize(df, ["skewed"], bits=3)  # 8 buckets
    counts = [
        r["n"]
        for r in b.groupBy("skewed_bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert len(counts) == 8
    assert max(counts) < 2 * min(counts)  # near-equal depth despite skew
    # monotone: sort by value, bucket ids must be non-decreasing
    ordered = [r["skewed_bkt"] for r in b.orderBy("skewed").collect()]
    assert ordered == sorted(ordered)
    # composes with zvalue
    z = b.select(zvalue(["skewed_bkt", "skewed_bkt"], bits=3).alias("z")).collect()
    assert all(r["z"] >= 0 for r in z)


def test_zvalue_rejects_bit_overflow(spark):
    import pytest

    with pytest.raises(ValueError, match="bits"):
        zvalue(["a", "b", "c", "d"], bits=16)  # 64 bits > 63


def test_bucketed_join_needs_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts
    must join with ZERO shuffle exchanges — the write-once/join-free
    contract bucketing exists for. (Broadcast disabled so the test
    can't pass via the broadcast path.)"""
    from cancer_survival_etl_spark.sources.catalog import load_table
    from cancer_survival_etl_spark.sources.sinks import write_bucketed

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "bt_orders", "o_orderkey", n_buckets=4,
                   sort_cols="o_orderkey")
    write_bucketed(lineitem, "bt_lineitem", "l_orderkey", n_buckets=4,
                   sort_cols="l_orderkey")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bt_orders").join(
            spark.table("bt_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        ).groupBy("o_orderstatus").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        n_rows = j.count()
        assert n_rows > 0
        # join itself introduces no exchange; the only exchange allowed
        # is the one for the final groupBy aggregation
        join_section = plan.split("HashAggregate")[-1]
        assert "Exchange" not in join_section, join_section[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_lineitem")
