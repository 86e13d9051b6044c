"""Parquet table catalog for the engine's test/bench star schema.

At cluster scale the same helpers point at a lake path; locally they
point at /root/testdata/sf*/. Scans stay lazy: column pruning and filter
pushdown reach the parquet reader (check ``.explain`` → ReadSchema /
PushedFilters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at ANY scale factor (they
# grow sub-linearly or are fixed): always hint broadcast in joins.
BROADCAST_DIMS = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Defensive for externally-created sessions (driver harness):
        # events.ts is TIMESTAMP(NANOS), illegal for Spark's reader
        # unless the legacy nanos-as-long conf is on (runtime-settable).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) — read as long nanos
        # (spark.sql.legacy.parquet.nanosAsLong) and truncate to
        # microsecond timestamps, matching DuckDB's ns→us cast.
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TPCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the Spark SQL surface."""
    for t in TPCH_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Generic lake-source reader: parquet (default), csv, json, orc —
    one entry for format breadth. Explicit schema recommended for
    csv/json at scale (schema inference reads the data twice)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
