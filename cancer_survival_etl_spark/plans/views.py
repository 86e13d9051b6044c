"""The reporting stacks as a registered Spark SQL view layer.

The reference deploys its analytics as layered Snowflake views
(MODELLING → REPORTING → PUBLISHED; reference: docs/reporting_*.sql) so
dashboards query plain SQL names. This module gives the engine the same
surface: register the modelled tables plus every reporting/published
stack as temp views, after which the entire query layer is reachable
through ``spark.sql`` — and because views are lazy plan aliases,
Catalyst still optimizes each dashboard query end-to-end (pushdown
through the view stack, shared subplans, broadcast selection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .reporting import (
    benchmarking_rank,
    benchmarking_standards,
    ca_comparison,
    index_best_ca,
    index_report,
    processed_adult4,
)


def register_reporting_views(
    spark: SparkSession, index: DataFrame, adult4: DataFrame
) -> list[str]:
    """Register the full view stack over the two modelled tables.

    Returns the registered view names. Mirrors the reference's layer
    naming: modelling_* (base tables), reporting_* (analytics),
    published_* (display renames).
    """
    views: dict[str, DataFrame] = {
        "modelling_index": index,
        "modelling_adult4": adult4,
        "reporting_index_best_ca": index_best_ca(index),
        "reporting_index": index_report(index),
        "reporting_adult4": processed_adult4(adult4),
        "published_adult4": processed_adult4(adult4, published=True),
        "reporting_ca_comparison": ca_comparison(adult4),
        "published_ca_comparison": ca_comparison(adult4, published=True),
        "reporting_rank": benchmarking_rank(adult4),
        "published_rank": benchmarking_rank(adult4, published=True),
        "reporting_benchmarking_standard": benchmarking_standards(adult4),
        "published_benchmarking_standard": benchmarking_standards(
            adult4, published=True
        ),
    }
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return list(views)
