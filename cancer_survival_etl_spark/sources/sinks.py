"""Table sinks (SURVEY §2.1 S9-S11).

The reference's truncate → bulk-append → rollback-on-failure dance
(reference: src/utils/database_util.py:9-61) collapses to Spark's atomic
per-table overwrite. The audit ``_TIMESTAMP`` (DDL default,
docs/create_index.sql:19) is stamped at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stamp_audit(df: DataFrame, col: str = "_TIMESTAMP") -> DataFrame:
    """Add the load-audit timestamp column (CURRENT_TIMESTAMP() default)."""
    return df.withColumn(col, F.current_timestamp())


def overwrite_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Truncate-and-replace load (S9), scale-ready.

    ``partition_by`` chooses the lake layout: for the survival tables the
    natural key prefix (e.g. CANCER_SITE) keeps each reporting query's
    scan partition-pruned; for big fact tables partition by a low-
    cardinality column and rely on AQE for the rest.
    """
    writer = stamp_audit(df).write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def overwrite_as_table(df: DataFrame, table: str, bucket_by: tuple[int, list[str]] | None = None) -> None:
    """saveAsTable variant; ``bucket_by=(n, cols)`` co-locates later joins
    and aggregations on ``cols`` without a shuffle (hive-style bucketing).
    """
    writer = stamp_audit(df).write.mode("overwrite")
    if bucket_by:
        n, cols = bucket_by
        writer = writer.bucketBy(n, *cols).sortBy(*cols)
    writer.saveAsTable(table)
