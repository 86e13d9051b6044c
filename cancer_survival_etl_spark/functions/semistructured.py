"""Semi-structured (JSON) column handling.

The events feed carries a ``props`` JSON string per row (the classic
"properties bag" of telemetry pipelines). Two extraction shapes exist
in Spark; the difference matters at scale:

- ``from_json`` with an explicit schema: one parse per row into a
  struct, every field then a plain column — vectorized, codegen'd,
  null on malformed input. This is the 100 TB path and what
  ``parse_json_props`` uses.
- ``get_json_object`` / JSON-path per field: re-parses the string for
  EVERY path expression — fine for one ad-hoc field, quadratic in
  field count for wide extractions. Avoided here.

Schema-on-read discipline: pass the narrowest schema you need
(column pruning cannot reach inside an unparsed JSON string; the
schema IS the pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_json_props(
    df: DataFrame,
    json_col: str = "props",
    schema: str = "k long",
    out_prefix: str = "",
) -> DataFrame:
    """Parse a JSON-string column into typed top-level columns via a
    single schema'd ``from_json``; malformed rows yield NULLs (the
    PERMISSIVE contract). Original columns are kept; the JSON string is
    dropped (re-add it upstream if you need the raw payload)."""
    parsed = df.withColumn("_j", F.from_json(F.col(json_col), schema))
    fields = parsed.select("_j.*").columns
    out = parsed.select(
        *[c for c in df.columns if c != json_col],
        *[F.col(f"_j.{f}").alias(f"{out_prefix}{f}") for f in fields],
    )
    return out
