"""cancer_survival_etl_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of
the reference ETL + SQL reporting stack (``ncl-cancer-alliance/
cancer_survival_etl``, surveyed in SURVEY.md), extended with
large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Layout
------
- ``session``    : SparkSession factory (AQE on, tuned for local + cluster).
- ``schemas``    : explicit StructTypes for the two destination tables.
- ``functions``  : scalar-expression library (string surgery, keys, CASE
                   buckets) — SURVEY §2.8.
- ``operators``  : composable DataFrame→DataFrame transforms (filters,
                   unions/row-duplication, reshape, rank/quartile,
                   percentiles) — SURVEY §2.2-2.9.
- ``sources``    : ingestion shims (Excel via pandas, parquet catalogs).
- ``plans``      : end-to-end recipes — the two ETL pipelines and the five
                   reporting view stacks — SURVEY §2.11.
- ``streaming``  : event-time windowed aggregates, batch- and
                   stream-shaped (Structured Streaming).
- ``llm``        : beyond-reference operators for LLM data pipelines:
                   dedup (exact/minhash/simhash/ngram), ANN similarity
                   search, text stats, multimodal binary plumbing.

Everything is lazy DataFrame logic: Catalyst owns optimization; we only
pick partitioning, broadcast hints and algorithms.
"""

__version__ = "0.1.0"
