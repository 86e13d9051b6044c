"""Tests for sources: catalog, sinks, file routing, excel shim."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cancer_survival_etl_spark.sources.catalog import (
    TPCH_TABLES,
    load_table,
    load_tables,
    register_views,
)
from cancer_survival_etl_spark.sources.excel import pandas_to_df
from cancer_survival_etl_spark.sources.files import list_data_files, route_by_prefix
from cancer_survival_etl_spark.sources.sinks import overwrite_table, stamp_audit


def test_load_tables_all_present(spark, sf_dir):
    tables = load_tables(spark, sf_dir)
    assert set(tables) == set(TPCH_TABLES)
    for name, df in tables.items():
        assert df.count() > 0, name


def test_events_nanos_to_timestamp(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    assert dict(e.dtypes)["ts"].startswith("timestamp")


def test_register_views_sql_surface(spark, sf_dir):
    register_views(spark, sf_dir)
    n = spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0].n
    assert n > 0


def test_overwrite_table_stamps_and_partitions(spark, sf_dir, tmp_path):
    """S9 truncate-and-replace sink + S11 audit stamp + partition layout."""
    out = str(tmp_path / "dest")
    src = load_table(spark, sf_dir, "nation")
    overwrite_table(src, out, partition_by=["n_regionkey"])
    back = spark.read.parquet(out)
    assert back.count() == src.count()
    assert "_TIMESTAMP" in back.columns
    assert back.filter(F.col("_TIMESTAMP").isNull()).count() == 0
    # hive-style partition dirs on the analytical key
    assert any(d.startswith("n_regionkey=") for d in os.listdir(out))
    # truncate-and-replace: second write replaces, not appends
    overwrite_table(src.limit(3), out)
    assert spark.read.parquet(out).count() == 3


def test_pandas_to_df_nan_becomes_null(spark):
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame({"a": [1.0, np.nan], "b": ["x", None]})
    df = pandas_to_df(spark, pdf)
    rows = df.orderBy("b").collect()
    # NaN/None → real Spark NULLs, never the string "null"
    # (reference: src/utils/database_util.py:30)
    assert rows[0].a is None or rows[1].a is None
    assert {r.b for r in rows} == {"x", None}


def test_list_and_route_files(tmp_path):
    for name in ["Index_2020.xlsx", "adult_2016_2020.xlsx", "readme.txt", "other.xlsx"]:
        (tmp_path / name).write_text("x")
    files = list_data_files(str(tmp_path))
    assert [os.path.basename(f) for f in files] == [
        "Index_2020.xlsx",
        "adult_2016_2020.xlsx",
        "other.xlsx",
    ]
    skipped = []
    routed = route_by_prefix(
        files,
        {"Index": lambda p: "index", "adult": lambda p: "adult"},
        on_unmatched=skipped.append,
    )
    assert [(os.path.basename(p), r) for p, r in routed] == [
        ("Index_2020.xlsx", "index"),
        ("adult_2016_2020.xlsx", "adult"),
    ]
    assert [os.path.basename(s) for s in skipped] == ["other.xlsx"]


def test_excel_shim_without_engine(spark, tmp_path):
    """Without an Excel engine the shim must fail with the documented
    NotImplementedError, not an obscure pandas ImportError."""
    from cancer_survival_etl_spark.sources.excel import excel_sheet_to_df

    fake = tmp_path / "book.xlsx"
    fake.write_bytes(b"not really a workbook")
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl available; shim exercises the real path")
    except ImportError:
        pass
    with pytest.raises((NotImplementedError, ValueError)):
        excel_sheet_to_df(spark, str(fake), "Table 5", skiprows=10)


def test_read_source_csv_json_roundtrip(spark, sf_dir, tmp_path):
    """Format breadth: the same table written as csv and json reads back
    value-identical through read_source (explicit schema)."""
    from cancer_survival_etl_spark.sources.catalog import load_table, read_source

    n = load_table(spark, sf_dir, "nation")
    n.write.mode("overwrite").option("header", "true").csv(str(tmp_path / "csv"))
    n.write.mode("overwrite").json(str(tmp_path / "json"))

    expected = {tuple(r) for r in n.collect()}
    for fmt in ["csv", "json"]:
        back = read_source(
            spark, str(tmp_path / fmt), fmt=fmt, schema=n.schema
        )
        assert {tuple(r) for r in back.select(n.columns).collect()} == expected


def test_merge_upsert_last_writer_wins(spark, tmp_path):
    from cancer_survival_etl_spark.sources.sinks import merge_upsert

    path = str(tmp_path / "merged")
    v1 = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)],
        "id long, payload string, version long",
    )
    merge_upsert(spark, v1, path, key_cols=["id"], version_col="version")
    assert spark.read.parquet(path).count() == 3

    v2 = spark.createDataFrame(
        [(2, "b2", 2), (4, "d", 2)],  # update key 2, insert key 4
        "id long, payload string, version long",
    )
    merge_upsert(spark, v2, path, key_cols=["id"], version_col="version")
    got = {
        r["id"]: (r["payload"], r["version"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {1: ("a", 1), 2: ("b2", 2), 3: ("c", 1), 4: ("d", 2)}

    # stale update must NOT win
    v0 = spark.createDataFrame(
        [(2, "old", 0)], "id long, payload string, version long"
    )
    merge_upsert(spark, v0, path, key_cols=["id"], version_col="version")
    assert spark.read.parquet(path).filter("id = 2").collect()[0]["payload"] == "b2"


def test_compact_parquet_reduces_files_and_keeps_rows(spark, tmp_path):
    from cancer_survival_etl_spark.sources.sinks import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") % 97)
    df.repartition(64).write.parquet(path)  # 64 tiny files
    import glob

    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 32
    n = compact_parquet(spark, path, target_file_mb=128, sort_within_by=["id"])
    after = len(glob.glob(f"{path}/*.parquet"))
    assert n == 1 and after <= 2
    out = spark.read.parquet(path)
    assert out.count() == 10_000
    assert out.agg(F.sum("v")).collect()[0][0] == sum(i % 97 for i in range(10_000))


def test_custom_datasource_partitioned_and_deterministic(spark):
    from cancer_survival_etl_spark.sources.custom_datasource import (
        SyntheticEventsDataSource,
    )

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (
        spark.read.format("synthetic_events")
        .option("rows_per_partition", 250)
        .option("num_partitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # one task per InputPartition
    assert df.count() == 1000
    assert df.select("event_id").distinct().count() == 1000
    assert df.schema.fieldNames() == [
        "event_id", "ts", "user_id", "event_type", "value",
    ]
    # deterministic across reads: same seed → identical content hash
    a = df.agg(F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)"))).collect()[0][0]
    b = (
        spark.read.format("synthetic_events")
        .option("rows_per_partition", 250)
        .option("num_partitions", 4)
        .load()
        .agg(F.sum(F.xxhash64("event_id", "ts", "user_id", "event_type", "value").cast("decimal(38,0)")))
        .collect()[0][0]
    )
    assert a == b
    # composes with the engine's operators like any native source
    from cancer_survival_etl_spark.operators.timeseries import cascading_rollup

    day = cascading_rollup(df, levels=("1 day",))[0]
    assert day.agg(F.sum("n_events")).collect()[0][0] == 1000
