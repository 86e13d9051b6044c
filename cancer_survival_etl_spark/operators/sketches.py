"""Sketch-based approximate aggregations.

At 100 TB, exact DISTINCT and exact quantiles are shuffle-bound: every
distinct value (or every row, for percentile_disc) crosses the wire.
Sketches cap the per-group shuffle payload at the sketch size —
constant, not data-proportional:

- HyperLogLog++ (``approx_count_distinct``): ~1.5 KB per group at 5%
  rsd, mergeable map-side.
- Greenwald-Khanna (``percentile_approx``): bounded-error quantiles,
  one pass.
- Count-min sketch (``count_min_sketch``): frequency estimates for
  heavy-hitter detection without a per-value groupBy.

All are Spark built-ins running in the JVM with partial aggregation;
results are approximate by contract, so driver checks are rows-only and
the pytest suite pins error bounds against exact answers instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    rsd: float = 0.05,
    alias: str = "approx_distinct",
) -> DataFrame:
    """HLL++ distinct count per group. ``rsd`` trades sketch size for
    relative error (0.05 → ±5% typical)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias(alias)
    )


def approx_quantiles_by(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10_000,
) -> DataFrame:
    """Greenwald-Khanna approximate quantiles per group; error ≤
    1/accuracy of rank. One pass, mergeable — unlike exact
    percentile_disc this never buffers a group's full value set."""
    aggs = [
        F.percentile_approx(value_col, p, accuracy).alias(
            f"p{int(p * 100):02d}"
        )
        for p in probabilities
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def kmv_distinct_by(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    alias: str = "kmv_distinct",
) -> DataFrame:
    """K-minimum-values distinct sketch — the DETERMINISTIC sibling of
    HLL++ (``approx_distinct_by``), reproducible across engines and
    therefore oracle-checkable bit-exactly.

    Hash each distinct value to a 60-bit uniform via md5 (content-
    derived — the same digest on any engine), keep the k smallest per
    group, and estimate ``|distinct| ≈ (k-1) / h_(k)`` where ``h_(k)``
    is the k-th order statistic normalized to (0, 1].  Groups with
    fewer than k distinct hashes report the exact count (the sketch IS
    the full distinct set there).  Expected relative error
    ``≈ 1/sqrt(k-2)`` (~13% at k=64).

    Scale shape: one exchange for the distinct (map-side combine — a
    partition's duplicate values collapse before the wire), then a
    per-group sort whose output partitioning the final aggregate
    reuses.  At 100 TB the refinement is an object-style KMV aggregator
    keeping only k minima per partition; the md5→rank formulation here
    keeps the result engine-portable, which HLL registers can never be.
    """
    hv = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    pairs = df.select(*group_cols, hv.alias("_hv")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_hv")
    ranked = pairs.withColumn("_rn", F.row_number().over(w))
    # (k-1) * 2^60: ≤6 significant bits — exact as a double, so the
    # single division below is the only rounding (mirrors the oracle).
    scale = float(k - 1) * float(1 << 60)
    est = F.when(
        F.col("_n") < k, F.col("_n").cast("double")
    ).otherwise(F.lit(scale) / F.col("_hk"))
    return (
        ranked.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.max(F.when(F.col("_rn") == k, F.col("_hv"))).alias("_hk"),
        )
        .select(*group_cols, F.round(est, 6).alias(alias))
    )


def hash_sample_quantiles_by(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    key_col: str,
    k: int = 256,
    percentiles: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Quantiles over a DETERMINISTIC uniform sample: the k rows whose
    ``md5(key)`` sorts lowest per group (md5 of a unique key is a
    uniform draw, so bottom-k-by-hash IS a simple random sample — but
    unlike ``TABLESAMPLE`` it is identical on every engine, run, and
    partitioning), then exact PERCENTILE_DISC over the sample.

    Rank error ~ O(1/sqrt(k)); the answer is always a real data value.
    Scale shape: one window sort per group over a narrow (hash, value)
    projection; rows beyond rank k are dropped before the percentile
    aggregate, capping its per-group buffer at k regardless of data
    size — the property that makes exact percentile_disc viable again
    at 100 TB.
    """
    from cancer_survival_etl_spark.operators.percentile import (
        percentile_disc_by,
    )

    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    sampled = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    return percentile_disc_by(sampled, group_cols, value_col, percentiles)


def frequent_items(
    df: DataFrame,
    value_col: str,
    candidates: list,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Heavy-hitter frequency estimates via a count-min sketch.

    Builds ONE fixed-size sketch over the whole column with the
    ``count_min_sketch`` aggregate (a single all-reduce — the only
    distributed work, with no per-value shuffle), then probes the
    KB-sized binary on the driver through Spark's own
    ``org.apache.spark.util.sketch.CountMinSketch`` reader for each
    candidate value. Estimates overcount by at most eps·N with the
    given confidence, never undercount.

    ``candidates`` is an explicit small value list (heavy-hitter
    suspects, e.g. from a sample) — probing is O(len(candidates)) on
    the driver, independent of data size.
    """
    spark = df.sparkSession
    row = df.select(
        F.expr(
            f"count_min_sketch({value_col}, {eps}d, {confidence}d, {seed})"
        ).alias("_sk")
    ).first()
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(row["_sk"]))
    )

    def probe(v):
        if isinstance(v, int):
            return cms.estimateCount(jvm.java.lang.Long(v))
        return cms.estimateCount(v)

    return spark.createDataFrame(
        [(v, int(probe(v))) for v in candidates],
        schema=f"value {'bigint' if isinstance(candidates[0], int) else 'string'}, est_count bigint",
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold_fraction: float = 0.001,
    summary_size: int | None = None,
) -> DataFrame:
    """All values occurring in more than ``threshold_fraction`` of rows,
    with their EXACT counts — without ever shuffling the full value
    histogram.

    Two passes, same discipline as the Bloom decontaminator
    (approximate candidate generation + exact verify = deterministic,
    oracle-checkable output):

    1. Per-partition Misra-Gries summaries of ``summary_size``
       (default 2/threshold) counters, merged on the driver. The MG
       guarantee survives merging: any value with global frequency >
       threshold appears in the merged summary, so candidates ⊇ true
       heavy hitters (plus some near-misses). The summary is
       O(partitions × summary_size) — never vocabulary-sized, never a
       shuffle.
    2. Candidates (a tiny set) broadcast back; the corpus streams
       through a map-side semi-join filter and ONE small groupBy
       computes exact counts; the threshold filter on exact counts
       makes the output independent of partitioning and of MG's
       arbitrary evictions.

    Returns (value, n_rows_total, exact_count) for values with
    exact_count > threshold_fraction × n_rows_total. ``vocab_topk``
    (full histogram) is the small-vocab sibling; this is the path when
    the value space itself is too wide to shuffle.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    k = summary_size or max(8, int(2.0 / threshold_fraction))
    if k < 1.0 / threshold_fraction:
        # below this the MG retention guarantee (freq > n/k survives)
        # no longer covers the threshold — candidates could miss a true
        # heavy hitter and the exact verify can't resurrect them
        raise ValueError(
            f"summary_size={k} < 1/threshold_fraction="
            f"{1.0 / threshold_fraction:.0f}: MG guarantee would not "
            "cover the threshold"
        )
    src = df.select(F.col(value_col).cast("string").alias("_v")).filter(
        F.col("_v").isNotNull()
    )

    def mg_partition(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for v, c in pdf["_v"].value_counts().items():
                c = int(c)
                if v in counters:
                    counters[v] += c
                elif len(counters) < k:
                    counters[v] = c
                else:
                    # decrement-all by the min surplus, vectorized over
                    # the batch's whole residual is overkill here: the
                    # classic one-at-a-time decrement amortizes fine
                    # because value_counts already collapsed the batch
                    dec = min(c, min(counters.values()))
                    counters = {
                        key: cnt - dec
                        for key, cnt in counters.items()
                        if cnt - dec > 0
                    }
                    if c - dec > 0:
                        counters[v] = c - dec
        yield pd.DataFrame(
            {"_v": list(counters), "_c": list(counters.values())}
        )

    summaries = src.mapInPandas(mg_partition, "_v string, _c long")
    # merged summary is O(partitions × k) rows; it never leaves the
    # cluster — candidates go back as a broadcast semi-join, and the
    # total row count rides along as a lazy one-row cross join
    cand = summaries.groupBy("_v").agg(F.sum("_c").alias("_mg")).select(
        "_v"
    ).localCheckpoint(eager=False)
    totals = src.agg(F.count(F.lit(1)).alias("n_rows_total"))
    exact = (
        src.join(F.broadcast(cand), "_v", "left_semi")
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .crossJoin(F.broadcast(totals))
        .filter(
            F.col("exact_count")
            > F.lit(float(threshold_fraction)) * F.col("n_rows_total")
        )
    )
    return exact.select(
        F.col("_v").alias("value"), "n_rows_total", "exact_count"
    )


def hll_rollup(
    df: DataFrame,
    group_cols,
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable distinct-count rollup: per group, a Datasketches HLL
    sketch of ``value_col`` (``hll_sketch_agg``) — the persistable
    building block of the lakehouse "distinct users per (day, dim)"
    table. Unlike a count-distinct column, sketches RE-AGGREGATE:
    coarser rollups union the fine sketches (``hll_rollup_merge``)
    without touching raw data — the same cascade contract as
    ``timeseries.cascading_rollup``, for the one aggregate that
    doesn't cascade exactly.

    Register maxima are order-independent, so the estimate is stable
    under any partitioning (pinned in tests). Returns group cols +
    (hll_sketch binary, n_rows)."""
    g = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return df.groupBy(*g).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll_sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_rollup_merge(
    sketches: DataFrame,
    group_cols,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Re-aggregate a sketch rollup to a coarser grain: union the
    sketches per coarser group and estimate. Input is the (tiny)
    sketch table, never raw data. Returns group cols +
    (distinct_estimate, n_rows)."""
    g = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return sketches.groupBy(*g).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(
            "distinct_estimate"
        ),
        F.sum("n_rows").alias("n_rows"),
    )


def kll_rollup(
    df: DataFrame,
    group_cols,
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """Mergeable quantile rollup: per group, a Datasketches KLL sketch
    of a bigint column — quantiles join distinct counts
    (``hll_rollup``) in the set of aggregates that can live in a
    materialized rollup table and RE-AGGREGATE to coarser grains
    (exact percentiles can't: they need the raw data every time).
    Returns group cols + (kll_sketch, n_rows)."""
    g = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return df.groupBy(*g).agg(
        F.kll_sketch_agg_bigint(value_col, F.lit(k)).alias("kll_sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def kll_rollup_quantile(
    sketches: DataFrame,
    group_cols,
    quantile: float = 0.5,
    sketch_col: str = "kll_sketch",
) -> DataFrame:
    """Merge a KLL rollup to a coarser grain and read a quantile off
    the merged sketch — touches only the sketch table. KLL's guarantee
    is on RANK error (~1.7% at k=200, two-sided), not value error; the
    verdict queries check exactly that. Returns group cols +
    (q_estimate, n_rows)."""
    g = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return sketches.groupBy(*g).agg(
        F.kll_sketch_get_quantile_bigint(
            F.kll_merge_agg_bigint(sketch_col), F.lit(quantile)
        ).alias("q_estimate"),
        F.sum("n_rows").alias("n_rows"),
    )


def theta_overlap(
    df: DataFrame,
    set_col: str,
    value_col: str,
    set_a: str,
    set_b: str,
) -> DataFrame:
    """Set-intersection estimate via Theta sketches: |values(set_a) ∩
    values(set_b)| without materializing either set — the audience-
    overlap question ("users who did A and also B") that exact
    COUNT(DISTINCT) answers only with a full self-join or two scans +
    an exact intersect. Sketch per side from ONE scan, then
    ``theta_intersection`` on the two 4KB summaries. Returns one row
    (n_a_est, n_b_est, overlap_est) as doubles (Datasketches
    estimates)."""
    a = df.filter(F.col(set_col) == set_a).agg(
        F.theta_sketch_agg(value_col).alias("_sa")
    )
    b = df.filter(F.col(set_col) == set_b).agg(
        F.theta_sketch_agg(value_col).alias("_sb")
    )
    return a.crossJoin(b).select(
        F.theta_sketch_estimate(F.col("_sa")).alias("n_a_est"),
        F.theta_sketch_estimate(F.col("_sb")).alias("n_b_est"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("_sa"), F.col("_sb"))
        ).alias("overlap_est"),
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
) -> DataFrame:
    """Pre-join cardinality estimate WITHOUT running the join: for an
    equi-join on ``key_col``, |A ⋈ B| = Σ_k m_A(k)·m_B(k) over shared
    keys. Estimated here as (theta-estimated shared-key count) ×
    (avg multiplicity per side over shared keys ≈ avg over all keys)
    — the planner-style sanity check that catches a fan-out join
    (many-to-many key explosion) BEFORE it runs for an hour.

    Two one-scan aggregates per side (theta sketch + exact row/key
    counts); the intersection estimate comes from the two 4KB
    summaries. The estimate is exact when key sets fit the sketch's
    retention and multiplicities are uniform; a planted 10×10 fan-out
    key moves the estimate by its true contribution only to the
    extent multiplicity skew violates the uniformity assumption —
    pair with ``key_skew_profile`` when that matters. Returns one row
    (n_left, n_right, shared_keys_est, est_join_rows)."""
    la = left.agg(
        F.theta_sketch_agg(key_col).alias("_sk"),
        F.count(F.lit(1)).alias("n_left"),
        F.countDistinct(key_col).alias("_ka"),
    )
    rb = right.agg(
        F.theta_sketch_agg(key_col).alias("_sk2"),
        F.count(F.lit(1)).alias("n_right"),
        F.countDistinct(key_col).alias("_kb"),
    )
    j = la.crossJoin(rb)
    shared = F.theta_sketch_estimate(
        F.theta_intersection(F.col("_sk"), F.col("_sk2"))
    )
    mult_a = F.col("n_left") / F.col("_ka")
    mult_b = F.col("n_right") / F.col("_kb")
    return j.select(
        "n_left",
        "n_right",
        F.round(shared, 6).alias("shared_keys_est"),
        F.round(shared * mult_a * mult_b, 6).alias("est_join_rows"),
    )


def rolling_distinct(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window_days: int = 7,
    lg_k: int = 12,
) -> DataFrame:
    """Rolling N-day distinct count (the "7-day active users" metric)
    from MERGED DAILY SKETCHES: one day-level HLL aggregate over the
    raw data, then each day unions its trailing window's sketches —
    the raw table is scanned once regardless of window length, and
    the rolling frame is #days × window rows of 4KB summaries.

    Exact windowed COUNT(DISTINCT) cannot reuse daily partials
    (distinct doesn't decompose); the classic exact alternative
    rescans the fact table once per window position. Sketch register
    maxima are order-independent, so the rolling estimate is stable
    under any partitioning. Returns (day, distinct_est, n_rows) per
    day with a FULL trailing window only after day ``window_days``
    (leading days merge what exists — same convention as a rows
    window)."""
    daily = df.groupBy(
        F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("_sk"),
        F.count(F.lit(1)).alias("_n"),
    )
    a = daily.select(F.col("day").alias("_d"), "_sk", "_n")
    joined = daily.select("day").join(
        a,
        (F.col("_d") <= F.col("day"))
        & (
            F.col("_d")
            > F.col("day") - F.expr(f"interval {window_days} days")
        ),
    )
    return joined.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias(
            "distinct_est"
        ),
        F.sum("_n").alias("n_rows"),
    )


def countmin_hash(key: "F.Column", j: int, width: int) -> "F.Column":
    """Row j's Count-Min bucket for a key: the top 48 bits of
    md5("<j>:<key>") mod width — content-derived, engine-portable
    (DuckDB computes the identical bucket from the identical string),
    and uniform per row because the row index is INSIDE the hash
    input."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{j}:"), key.cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("long")
        % int(width)
    )


def countmin_rollup(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch as a mergeable rollup table: ``depth`` rows of
    ``width`` counters; every input row adds its weight to one bucket
    per row. Point estimate = min over rows (``countmin_estimate``) —
    never an underestimate, over by at most ~N/width per row with
    independent hashing (Cormode-Muthukrishnan bounds).

    Unlike the repo's HLL/KLL/Theta rollups (binary Datasketches blobs,
    rows-only adjudication), the CM table is PLAIN INTEGERS under
    content-derived md5 hashing — the whole sketch, and every estimate
    read from it, adjudicates bit-exact against a SQL oracle.

    Scale shape: one hash aggregate over (row_index, bucket) — the ×
    ``depth`` row expansion happens map-side via an inline explode and
    combines into at most depth × width cells per partition before the
    shuffle, so shuffle payload is sketch-sized, not data-sized. The
    cell table re-aggregates: shard sketches merge by summing cells
    on (j, bucket) — the same cascade contract as ``hll_rollup``.

    Returns (j, bucket, cnt) — depth × width rows at most (empty
    buckets are implicit zeros).
    """
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast(
        "long"
    )
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                countmin_hash(key, j, width).alias("bucket"),
            )
            for j in range(int(depth))
        ]
    )
    return (
        df.select(w.alias("_w"), F.explode(pairs).alias("_c"))
        .groupBy(F.col("_c.j").alias("j"), F.col("_c.bucket").alias("bucket"))
        .agg(F.sum("_w").alias("cnt"))
    )


def countmin_estimate(
    cm: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-query a ``countmin_rollup`` table: for each probe key,
    the estimate is min over sketch rows of that row's bucket counter
    (0 if the bucket is empty — the key was never inserted and nothing
    collided into its cell).

    The sketch is depth × width cells — broadcast it; each probe
    expands to ``depth`` (j, bucket) lookups map-side, left-joins the
    broadcast cells, and a min-aggregate per key folds them back. Work
    ∝ #probes × depth with no shuffle of the probe side beyond the
    final per-key min.

    Returns (key, cm_estimate).
    """
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                countmin_hash(key, j, width).alias("bucket"),
            )
            for j in range(int(depth))
        ]
    )
    exploded = probes.select(
        key.alias(key_col), F.explode(pairs).alias("_c")
    ).select(key_col, F.col("_c.j").alias("j"), F.col("_c.bucket").alias("bucket"))
    joined = exploded.join(F.broadcast(cm), ["j", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(
            "cm_estimate"
        )
    )
