"""Data-quality checks: grain uniqueness and column profiling.

The reference's only machine-checkable correctness contracts are the
archive DDL's composite PRIMARY KEYs (reference:
docs/archive/create_index.sql:20-21, docs/archive/create_adult4.sql:
19-21) — Snowflake doesn't enforce them and Spark has no PK either, so
the engine exposes them as executable assertions instead.

Both helpers are single-aggregation plans: one shuffle on the grain
(uniqueness), or one shuffle-free partial-agg pass (profile) — safe to
run inline at the end of a 100 TB load job.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class GrainViolation(AssertionError):
    pass


def duplicate_grains(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Grain cells with more than one row — empty iff ``keys`` is a key."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def assert_unique_grain(
    df: DataFrame, keys: Sequence[str], sample: int = 5
) -> None:
    """Raise GrainViolation (with example cells) if ``keys`` doesn't
    uniquely identify rows."""
    dups = duplicate_grains(df, keys).limit(sample).collect()
    if dups:
        raise GrainViolation(
            f"grain {list(keys)} violated; examples: "
            + "; ".join(str(r.asDict()) for r in dups)
        )


def profile_columns(
    df: DataFrame, cols: Sequence[str] | None = None
) -> DataFrame:
    """Per-column profile: null count/rate, approx distinct, min/max.

    One aggregation over the data (all columns in a single pass — NOT a
    loop of per-column jobs); returns one row per column. min/max are
    cast to string so heterogeneous column types fit one schema.
    """
    cols = list(cols or df.columns)
    total = F.count(F.lit(1))
    aggs = [total.alias("_total")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"),
            F.approx_count_distinct(c).alias(f"_dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    # unpivot the single wide row into one row per column
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_nulls_{c}").alias("n_null"),
                (F.col(f"_nulls_{c}") / F.col("_total")).alias("null_rate"),
                F.col(f"_dist_{c}").alias("approx_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
                F.col("_total").alias("n_rows"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(structs).alias("p")).select("p.*")


def expect_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Declarative data expectations (the Deequ / dbt-tests shape): each
    rule is a boolean Column that must hold per row; returns one row
    per rule — (rule, n_rows, n_violations, pass_rate) — computed in a
    SINGLE aggregation pass (each rule is a conditional count, so 50
    rules still cost one scan and a 1-row-per-group shuffle).

    NULL rule results count as violations (unknown is not a pass) —
    write rules null-safely (`isNotNull() & ...`) when nulls are legal.

    Usage:
        expect_rules(li, {
            "qty_positive": F.col("l_quantity") > 0,
            "date_ordered": F.col("l_shipdate") <= F.col("l_receiptdate"),
        })
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in rules.items():
        aggs.append(
            F.count(F.when(~F.coalesce(cond, F.lit(False)), 1)).alias(
                f"_v_{name}"
            )
        )
    # checkpoint the 1-row moment frame: each per-rule select below is a
    # union branch, and without a leaf here the full-table aggregate
    # would re-execute once PER RULE
    row = df.agg(*aggs).localCheckpoint(eager=False)
    per_rule = None
    for name in rules:
        one = row.select(
            F.lit(name).alias("rule"),
            F.col("_n").alias("n_rows"),
            F.col(f"_v_{name}").alias("n_violations"),
            F.round(
                (F.col("_n") - F.col(f"_v_{name}"))
                / F.col("_n").cast("double"),
                6,
            ).alias("pass_rate"),
        )
        per_rule = one if per_rule is None else per_rule.unionByName(one)
    return per_rule


def key_skew_profile(
    df: DataFrame,
    key_cols,
    top_n: int = 20,
) -> DataFrame:
    """Pre-shuffle skew diagnosis for a prospective join/agg key: the
    ``top_n`` hottest key values with their share of all rows and the
    multiple of a perfectly uniform key's load. A top key carrying
    1000× the mean is the one that stalls a 1000-executor stage at
    99 % complete — find it BEFORE the shuffle, then reach for
    ``operators/skew.py`` salting or AQE skew-join.

    One groupBy on the key (the histogram you were about to shuffle
    anyway, minus the payload), margins from the histogram itself.
    Deterministic: ties in the ranking break by key value. The top-n
    cut is ``orderBy().limit()`` — Spark's TakeOrderedAndProject
    (per-partition heads merged on the driver), NOT a global
    row_number window, so the profile works on key spaces of any
    cardinality; only the ≤ top_n survivors see a window.
    """
    from pyspark.sql import Window

    cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    hist = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .localCheckpoint(eager=False)
    )
    totals = hist.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    order = [F.desc("n_rows"), *[F.asc(c) for c in cols]]
    top = (
        hist.crossJoin(F.broadcast(totals))
        .orderBy(*order)
        .limit(top_n)
    )
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank_val", F.row_number().over(w))
        .select(
            *cols,
            "rank_val",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias(
                "row_share"
            ),
            F.round(
                F.col("n_rows")
                / (F.col("_total") / F.col("_n_keys")),
                6,
            ).alias("x_uniform"),
        )
    )


def benford_report(
    df: DataFrame,
    value_col: str,
    key_cols=(),
) -> DataFrame:
    """Benford's-law first-digit screen — the classic fabricated-data /
    broken-feed detector for naturally scaled quantities: the observed
    first-significant-digit distribution vs the Benford expectation
    p(d) = log10(1 + 1/d), plus the chi-square distance carried on
    every row (one number per key, duplicated per digit row for a
    flat, oracle-friendly shape).

    Digit extraction is string-based and exact (first char of the
    absolute value's digits — no float log in the grouping); counts
    are map-combined integers; shares and chi² are single mirrored
    double expressions. Zero values carry no first digit and are
    excluded. Returns (key..., digit, n_obs, obs_share,
    benford_share, chi2)."""
    import math

    from pyspark.sql import Window

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    digits = F.regexp_replace(
        F.abs(F.col(value_col)).cast("decimal(38,6)").cast("string"),
        r"[.\-0]*",
        "",
    )
    first = F.substring(digits, 1, 1)
    base = df.select(*keys, first.alias("digit")).filter(
        F.col("digit") != ""
    )
    hist = base.groupBy(*keys, "digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    w = Window.partitionBy(*keys) if keys else Window.partitionBy()
    total = F.sum("n_obs").over(w)
    benford = F.element_at(
        F.array(*[
            F.lit(math.log10(1 + 1 / d)) for d in range(1, 10)
        ]),
        F.col("digit").cast("int"),
    )
    expected = total.cast("double") * benford
    chi2 = F.sum(
        (F.col("n_obs").cast("double") - expected) ** 2 / expected
    ).over(w)
    return hist.select(
        *keys,
        F.col("digit").cast("int").alias("digit"),
        "n_obs",
        F.round(F.col("n_obs") / total.cast("double"), 6).alias(
            "obs_share"
        ),
        F.round(benford, 6).alias("benford_share"),
        F.round(chi2, 6).alias("chi2"),
    )


def funnel_control(
    df: DataFrame,
    unit_cols: Sequence[str],
    case_col: str,
    z95: float = 1.959963984540054,
    z998: float = 3.090232306167813,
) -> DataFrame:
    """Spiegelhalter funnel plot with winsorized overdispersion
    (Spiegelhalter 2005, Stat Med — the institutional-comparison
    chart every cancer alliance / NHS performance report draws):
    per-unit proportions against volume, with control limits that
    widen for small units instead of a dishonest league-table rank.

      target   p̄ = Σ cases / Σ n           (exact long ratio)
      score    z_u = (p_u − p̄) / √(p̄(1−p̄)/n_u)
      φ        mean of squared 10%/90%-WINSORIZED z over units
               (shrinks the limits' sensitivity to a few true
               outliers; φ ≤ 1 → no inflation, the additive-random-
               effects convention clips at 1)
      limits   p̄ ± z_α·√(φ·p̄(1−p̄)/n_u)   at 95% and 99.8%

    Winsorization cuts are the exact ``percentile_disc`` 10th/90th
    over the UNIT frame (the house A4 aggregate — oracle-matched
    semantics). A DEGENERATE pooled rate (all cases or no cases,
    p̄ ∈ {0, 1}) has zero binomial variance, so z, φ, and every limit
    column publish NULL (the km_curve NULL-SE convention) instead of
    propagating a division-by-zero NaN/Inf through the chart
    (ADVICE r09). Scale shape: one map-side collapse to per-unit
    (n, cases) cells; every later pass (pooled scalar, z quantiles,
    φ) is an aggregate over the bounded unit frame joined back by
    broadcast. Returns one row per unit: (unit…, n, cases,
    proportion, z, phi, lo95, hi95, lo998, hi998, outside95,
    outside998), 6 dp.
    """
    u = list(unit_cols)
    cs = F.col(case_col).cast("long")
    units = df.groupBy(*u).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cs).alias("cases"),
    )
    units = units.localCheckpoint(eager=False)
    pooled = units.agg(
        F.sum("cases").alias("_sy"), F.sum("n").alias("_sn")
    )
    units = units.crossJoin(F.broadcast(pooled))
    pbar = F.col("_sy") / F.col("_sn")
    # degenerate pooled target (p̄ = 0 or 1): binomial variance is 0,
    # so every variance-derived column is NULL-gated below
    ok = (F.col("_sy") > 0) & (F.col("_sy") < F.col("_sn"))
    se_u = F.sqrt(pbar * (F.lit(1.0) - pbar) / F.col("n"))
    z = F.when(ok, (F.col("cases") / F.col("n") - pbar) / se_u)
    units = units.withColumn("_z", z)
    qs = units.agg(
        F.expr(
            "percentile_disc(0.1) WITHIN GROUP (ORDER BY _z)"
        ).alias("_q10"),
        F.expr(
            "percentile_disc(0.9) WITHIN GROUP (ORDER BY _z)"
        ).alias("_q90"),
    )
    units = units.crossJoin(F.broadcast(qs))
    zw = F.least(F.greatest(F.col("_z"), F.col("_q10")), F.col("_q90"))
    units = units.withColumn("_zw2", zw * zw)
    ph = units.agg(
        (F.sum(F.round(F.col("_zw2") * F.lit(1000000.0), 0).cast(
            "long"
        )) / F.lit(1000000.0) / F.count(F.lit(1))).alias("_phi_raw")
    )
    units = units.crossJoin(F.broadcast(ph))
    # gated on ok: with a degenerate p̄ every _z (hence _zw2) is NULL,
    # F.sum returns NULL, and greatest() would quietly coerce φ to 1.0
    # — keep the whole chart NULL instead
    phi = F.when(ok, F.greatest(F.col("_phi_raw"), F.lit(1.0)))
    half95 = F.lit(z95) * F.sqrt(
        phi * pbar * (F.lit(1.0) - pbar) / F.col("n")
    )
    half998 = F.lit(z998) * F.sqrt(
        phi * pbar * (F.lit(1.0) - pbar) / F.col("n")
    )
    prop = F.col("cases") / F.col("n")
    return units.select(
        *u,
        "n",
        "cases",
        F.round(prop, 6).alias("proportion"),
        F.round(F.col("_z"), 6).alias("z"),
        F.round(phi, 6).alias("phi"),
        F.round(pbar - half95, 6).alias("lo95"),
        F.round(pbar + half95, 6).alias("hi95"),
        F.round(pbar - half998, 6).alias("lo998"),
        F.round(pbar + half998, 6).alias("hi998"),
        (
            (prop < pbar - half95) | (prop > pbar + half95)
        ).alias("outside95"),
        (
            (prop < pbar - half998) | (prop > pbar + half998)
        ).alias("outside998"),
    )
