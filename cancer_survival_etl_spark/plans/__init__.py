"""End-to-end recipes (SURVEY §2.11): the two ETL pipelines and the five
reporting view stacks, as lazy Spark plans."""

from .process_adult4 import process_adult4
from .process_index import process_index
from .reporting import (
    benchmarking_rank,
    benchmarking_standards,
    ca_comparison,
    index_best_ca,
    index_report,
    processed_adult4,
)

__all__ = [
    "benchmarking_rank",
    "benchmarking_standards",
    "ca_comparison",
    "index_best_ca",
    "index_report",
    "process_adult4",
    "process_index",
    "processed_adult4",
]
