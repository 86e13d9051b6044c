"""Table sinks (SURVEY §2.1 S9-S11).

The reference's truncate → bulk-append → rollback-on-failure dance
(reference: src/utils/database_util.py:9-61) maps onto a staging-then-
swap overwrite here: Spark's plain ``mode("overwrite")`` on an existing
table/path DELETES the old data before computing the new (a mid-write
failure leaves the destination dropped or empty — verified, round-2),
so both sinks first materialize the full result into a staging
table/directory and only then swap it in with metadata/rename ops.
A compute or write failure therefore leaves the previous contents
readable — the reference's ROLLBACK contract. (The swap itself is two
catalog/rename steps, not one atomic op; a process crash exactly
between them can leave the new data under the staging name, never
both-halves-lost. For stronger guarantees use a lakehouse format.)

The audit ``_TIMESTAMP`` (DDL default, docs/create_index.sql:19) is
stamped at write time.
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
    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    dest = jvm.org.apache.hadoop.fs.Path(path)
    fs = dest.getFileSystem(hconf)

    def write_to(target: str) -> None:
        writer = stamp_audit(df).write.mode("overwrite").format(fmt)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(target)

    if not fs.exists(dest):
        write_to(path)
        return
    staging = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__staging")
    fs.delete(staging, True)
    try:
        write_to(staging.toString())
    except Exception:
        fs.delete(staging, True)
        raise
    fs.delete(dest, True)
    fs.rename(staging, dest)


def _table_location(spark, table: str) -> str:
    """Resolve the filesystem location a managed table HAS (catalog
    lookup) or WOULD get (database location + lowercased name). Needed
    because an aborted ``saveAsTable`` can leave an orphaned data
    directory with NO catalog entry — ``DROP TABLE IF EXISTS`` is a
    no-op on it, and the next write to the same name fails with
    LOCATION_ALREADY_EXISTS."""
    if spark.catalog.tableExists(table):
        for row in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
            if row.col_name == "Location":
                return row.data_type
    name = table.split(".")[-1].lower()
    db = (
        table.split(".")[0]
        if "." in table
        else spark.catalog.currentDatabase()
    )
    db_loc = spark.catalog.getDatabase(db).locationUri
    return db_loc.rstrip("/") + "/" + name


def _delete_location(spark, location: str) -> None:
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(location)
    p.getFileSystem(hconf).delete(p, True)


def overwrite_as_table(df: DataFrame, table: str, bucket_by: tuple[int, list[str]] | None = None) -> None:
    """saveAsTable variant; ``bucket_by=(n, cols)`` co-locates later joins
    and aggregations on ``cols`` without a shuffle (hive-style bucketing).

    Staging cleanup is LOCATION-level, not just catalog-level: a failed
    ``saveAsTable`` never commits the staging table to the catalog, so
    the rollback must delete the orphaned staging *directory* too —
    otherwise every retry of the same replace fails with
    LOCATION_ALREADY_EXISTS (mirrors ``overwrite_table``'s
    ``fs.delete(staging, True)``).
    """
    spark = df.sparkSession

    def write_to(target: str) -> None:
        writer = stamp_audit(df).write.mode("overwrite")
        if bucket_by:
            n, cols = bucket_by
            writer = writer.bucketBy(n, *cols).sortBy(*cols)
        writer.saveAsTable(target)

    if not spark.catalog.tableExists(table):
        _delete_location(spark, _table_location(spark, table))
        write_to(table)
        return
    staging = f"{table}__staging"
    staging_loc = _table_location(spark, staging)
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    _delete_location(spark, staging_loc)
    try:
        write_to(staging)
    except Exception:
        spark.sql(f"DROP TABLE IF EXISTS {staging}")
        _delete_location(spark, staging_loc)
        raise
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")


def merge_upsert(
    spark,
    updates: DataFrame,
    path: str,
    key_cols: list[str],
    version_col: str,
    partition_by: list[str] | None = None,
) -> None:
    """Keyed MERGE (upsert) into a parquet table without a lakehouse
    format: latest ``version_col`` per ``key_cols`` wins across
    (existing ∪ updates); result rewrites the table.

    Semantics match ``MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED
    INSERT`` for last-writer-wins tables (SCD type 1). Implementation
    is read → union → one window row_number per key → overwrite:

    - The window shuffle is keyed on ``key_cols`` — the same cost as
      the join a MERGE would do, one pass, no driver involvement.
    - ``partition_by`` matters at scale: with a partitioned table and
      partition-complete updates, rewrite only the touched partitions
      (dynamic partition overwrite) instead of the full table; this
      helper keeps the simple whole-table form and documents the knob.
    - Atomicity is per-write (staged to a temp location by Spark's
      commit protocol). True snapshot isolation/time travel is what
      Delta/Iceberg add; the query-side semantics here are identical.
    """
    from pyspark.sql import Window
    from pyspark.sql.utils import AnalysisException

    try:
        existing = spark.read.parquet(path)
        base = existing.select(*updates.columns).unionByName(updates)
    except AnalysisException:
        base = updates  # first load: nothing to merge

    w = Window.partitionBy(*key_cols).orderBy(F.col(version_col).desc())
    latest = (
        base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # materialize before overwriting the path we just read (Spark would
    # otherwise clobber its own input mid-plan)
    latest = latest.localCheckpoint(eager=True)
    writer = latest.write.mode("overwrite").format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 128,
    sort_within_by: list[str] | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ~``target_file_mb`` files (the lake-maintenance pass that keeps
    scan parallelism sane — thousands of KB-files cost a task each and
    drown the driver in listing/metadata; row-group statistics also
    improve when rows consolidate).

    File count = ceil(bytes / target); ``sort_within_by`` optionally
    re-sorts rows inside each output file so min/max pruning stays
    tight after compaction (pair with operators/layout.zorder_layout
    for the multi-column case). Returns the number of output files.
    Uses coalesce (no shuffle) when shrinking; repartition when the
    input has too FEW partitions to reach the target.
    """
    import math
    import os

    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    shaped = (
        df.coalesce(n_files)
        if df.rdd.getNumPartitions() >= n_files
        else df.repartition(n_files)
    )
    if sort_within_by:
        shaped = shaped.sortWithinPartitions(*sort_within_by)
    shaped = shaped.localCheckpoint(eager=True)  # read before overwrite
    shaped.write.mode("overwrite").parquet(path)
    return n_files


def write_bucketed(
    df,
    table: str,
    bucket_cols,
    n_buckets: int = 8,
    sort_cols=None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table write — the lake-side half of co-located joins.

    Both sides of a recurring fact-fact join written with the SAME
    (bucket columns, bucket count) join WITHOUT any runtime exchange:
    Spark matches bucket files one-to-one, so the shuffle is paid once
    at write time instead of on every query — at 100 TB the recurring
    join is the dominant cost and this is the standard cure (pinned by
    `test_layout.py::test_bucketed_join_needs_no_exchange`).
    ``sort_cols`` additionally sorts within buckets, upgrading the
    join's local strategy to a zipper merge and keeping min/max file
    stats tight.

    Bucketed tables must go through ``saveAsTable`` (the bucket
    metadata lives in the session catalog, not the parquet files).
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, cols[0], *cols[1:])
    )
    if sort_cols:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(s[0], *s[1:])
    w.saveAsTable(table)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
) -> None:
    """INCREMENTAL truncate-and-replace: overwrite ONLY the
    partitions present in ``df``, leaving every other partition's
    data untouched — the nightly-reload shape a 100 TB lake actually
    uses (reloading one DATE_DIAGNOSIS_WINDOW batch must not rewrite
    the table; ``overwrite_table`` replaces the whole thing by
    design).

    Implemented with the PER-WRITE DataFrameWriter option
    ``.option("partitionOverwriteMode", "dynamic")``, which takes
    precedence over the session conf and touches no shared state — a
    session-conf mutation would leak dynamic-overwrite semantics into
    any concurrent write on the same session for the duration of this
    write (ADVICE r09). The session/default mode (static) would
    silently DELETE the untouched partitions, the classic footgun
    this wrapper exists to fence off. First-write on a fresh path
    degenerates to a plain partitioned write.

    Unlike the staged S9 sinks there is no whole-table rollback: a
    mid-write failure can leave the TOUCHED partitions' commit
    incomplete while untouched partitions stay intact (Spark's
    committer handles per-partition atomicity for the usual cases) —
    the blast radius is the reloaded slice, documented. For stronger
    guarantees use a lakehouse format.

    ``partition_by`` must be non-empty (named error — dynamic
    overwrite without partitions is just ``overwrite_table``).
    """
    if not partition_by:
        raise ValueError(
            "overwrite_partitions: partition_by must be non-empty "
            "(use overwrite_table for whole-table replace)"
        )
    (
        stamp_audit(df)
        .write.mode("overwrite")
        .format(fmt)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .save(path)
    )
