"""External life-table source for the net-survival family.

What a registry user actually brings to Ederer/Hakulinen/net-survival
runs is a published background-mortality life table (ONS/HMD-style:
demographic band keys → expected mortality rate), not a Python dict.
This module makes that a FIRST-CLASS source with an explicit schema,
validation, and join contract:

* canonical schema: one row per band-key tuple, plus ``hazard_micro``
  — the expected hazard per engine time unit as an INTEGER in 1e-6
  units (the exact-sum contract every net-survival operator rides:
  band at-risk counts × integer micro-hazards are exact longs, so
  distributed sums are order-independent and tables adjudicate
  bit-exact; see ``relative_survival_ederer2``).
* validation (``validate_life_table``): required columns present,
  non-null band keys, integral micro-hazards in [0, 1e6), UNIQUE band
  keys. Violations are named errors, never silent.
* join contract: the net-survival operators broadcast the table and
  FAIL on a cohort band with no life-table row (a missing band would
  otherwise silently contribute zero expected hazard and inflate net
  survival).

Life tables are dimension-sized by nature (bands × periods, thousands
of rows at most), so the validator may run small eager aggregates and
the consumers always broadcast — never a data-sized shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HAZARD_MICRO_COL = "hazard_micro"


def validate_life_table(
    lt: DataFrame,
    band_cols: Sequence[str],
    hazard_col: str = HAZARD_MICRO_COL,
) -> DataFrame:
    """Validate and canonicalize a life table: returns a frame with
    exactly ``band_cols`` + ``hazard_micro`` (long). Named errors for
    a missing column, NULL band keys, non-integral or out-of-range
    hazards, and duplicate band keys."""
    bands = list(band_cols)
    missing = [c for c in bands + [hazard_col] if c not in lt.columns]
    if missing:
        raise ValueError(
            f"life table is missing required column(s) {missing}; "
            f"have {lt.columns}"
        )
    h = F.col(hazard_col).cast("double")
    bad_key = None
    for c in bands:
        isnull = F.col(c).isNull()
        bad_key = isnull if bad_key is None else (bad_key | isnull)
    bad_haz = (
        h.isNull()
        | (h != F.round(h, 0))
        | (h < 0)
        | (h >= 1000000)
    )
    checked = F.when(
        bad_key,
        F.raise_error(
            F.lit("life table: NULL band key (every row must carry "
                  "a complete band-key tuple)")
        ).cast("long"),
    ).when(
        bad_haz,
        F.raise_error(
            F.lit(
                f"life table: {hazard_col} must be an integral "
                "micro-hazard in [0, 1000000) — convert published "
                "rates with life_table_from_rates first"
            )
        ).cast("long"),
    ).otherwise(h.cast("long"))
    out = lt.select(*bands, checked.alias(HAZARD_MICRO_COL))
    # uniqueness: life tables are dimension-sized, the eager check is
    # bounded by construction
    dups = (
        out.groupBy(*bands)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .limit(1)
        .collect()
    )
    if dups:
        key = {c: dups[0][c] for c in bands}
        raise ValueError(
            f"life table: duplicate band key {key} — one row per "
            "band-key tuple"
        )
    return out


def life_table_from_rates(
    rates: DataFrame,
    band_cols: Sequence[str],
    rate_col: str,
    per: float = 100000.0,
) -> DataFrame:
    """Convert a published-rate table (e.g. deaths per ``per``
    person-time-units) to the canonical integer micro-hazard form:
    ``hazard_micro = round(rate / per * 1e6)`` — the one explicit
    rounding step, after which everything downstream is exact. Runs
    the full validation."""
    bands = list(band_cols)
    if rate_col not in rates.columns:
        raise ValueError(
            f"life_table_from_rates: no column {rate_col!r} in "
            f"{rates.columns}"
        )
    r = F.col(rate_col).cast("double")
    conv = F.when(
        r.isNull() | (r < 0),
        F.raise_error(
            F.lit(
                f"life_table_from_rates: {rate_col} must be a "
                "non-negative rate"
            )
        ).cast("double"),
    ).otherwise(F.round(r / F.lit(float(per)) * F.lit(1000000.0), 0))
    return validate_life_table(
        rates.select(*bands, conv.alias(HAZARD_MICRO_COL)),
        bands,
    )


def load_life_table(
    spark: SparkSession,
    path: str,
    band_cols: Sequence[str] = ("band",),
    hazard_col: str = HAZARD_MICRO_COL,
) -> DataFrame:
    """Read a life-table parquet and validate it into the canonical
    form. The file carries the band-key columns plus either the
    canonical ``hazard_micro`` or any integral micro-hazard column
    named by ``hazard_col``."""
    return validate_life_table(
        spark.read.parquet(path), band_cols, hazard_col
    )
