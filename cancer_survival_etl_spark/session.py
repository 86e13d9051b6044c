"""SparkSession factory.

One place to encode the engine's execution posture:

- AQE on (runtime partition coalescing, skew-join splitting) — at 100 TB
  the static shuffle-partition guess is always wrong; AQE re-plans from
  actual map-output sizes.
- ``spark.sql.shuffle.partitions`` set from the machine (local) — on a
  real cluster you would size it to ~2-3× total cores and let AQE
  coalesce down.
- Arrow enabled — every pandas boundary (createDataFrame, toPandas,
  pandas UDFs) moves columnar batches, not pickled rows.
- UTC session timezone — timestamp semantics stable across driver/executor
  locales and across oracle engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "cancer_survival_etl_spark",
    master: str | None = None,
    shuffle_partitions: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    On a cluster, ``master`` comes from spark-submit; locally we default to
    ``local[N]`` with N from $SPARK_GRAFT_CPUS (default 32).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Spark 3.4+ getOrCreate() APPLIES builder SQL confs to an already-
    # running session — so a library entry point calling get_spark()
    # inside a host process (tests, notebooks) would silently stomp the
    # host's shuffle partitioning and feature flags. Reuse an active
    # session untouched; the full config applies only when this call
    # actually creates the session.
    active = SparkSession.getActiveSession()
    if active is not None:
        # ...but a caller that EXPLICITLY asked for a specific config
        # must not get the host session's settings silently: apply the
        # runtime-safe SQL confs they passed, and warn about the rest.
        if shuffle_partitions is not None:
            active.conf.set(
                "spark.sql.shuffle.partitions", str(shuffle_partitions)
            )
        for k, v in (extra_conf or {}).items():
            try:
                active.conf.set(k, v)
            except Exception:
                import warnings

                warnings.warn(
                    f"get_spark(): active session reused; static conf "
                    f"{k!r} cannot be applied at runtime",
                    stacklevel=2,
                )
        return active
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet scans: vectorized reader + pushdown are defaults; pin
        # anyway so a misconfigured cluster profile can't silently regress.
        .config("spark.sql.parquet.filterPushdown", "true")
        # Parquet TIMESTAMP(NANOS) is not a legal Spark type; read as long
        # and convert at the source shim (catalog.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
        )
        # long-lived sessions compile thousands of whole-stage-codegen
        # classes (one per plan stage); JDK17's default 240 MB code
        # cache fills, the JIT stops compiling, and late queries run
        # interpreted 1.5-2x slower — the classic codegen-heavy
        # workload tuning (Spark docs recommend raising it)
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
