"""General window analytics (beyond the reference's single RANK — the
rest of the standard analytic-function surface an engine user expects).

All are thin Window-spec builders; one shuffle on the partition key,
then sort-based evaluation within partitions — the same physical shape
at any scale, provided the partition key is well-distributed (for a hot
key, pre-aggregate or salt first; see operators/skew.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lag_delta(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alias: str = "delta",
) -> DataFrame:
    """Per-partition change vs the previous row (LAG): NULL for the first
    row of each partition. ``order_cols`` must be a total order (include
    a unique tie-breaker) or the result is nondeterministic."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.select(
        "*",
        (F.col(value_col) - F.lag(value_col).over(w)).alias(alias),
    )


def running_sum(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alias: str = "running_total",
) -> DataFrame:
    """Cumulative sum: rowsBetween(unboundedPreceding, currentRow).
    ``order_cols`` must be a total order for determinism."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select("*", F.sum(value_col).over(w).alias(alias))


def topk_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order: Column | Sequence[Column],
    k: int,
    rank_fn=F.dense_rank,
    alias: str = "rank_val",
) -> DataFrame:
    """Top-k rows per group (dense_rank keeps ties; row_number for exact
    k — then ``order`` must be a total order). This is the scalable
    'ORDER BY + LIMIT per group': one shuffle, no global sort."""
    order_cols = [order] if isinstance(order, Column) else list(order)
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn(alias, rank_fn().over(w))
        .filter(F.col(alias) <= k)
    )


def ntile_bucket(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    n: int,
    alias: str = "bucket",
) -> DataFrame:
    """NTILE(n) — the built-in sibling of the reference's hand-rolled
    rank/denominator quartile CASE (functions.keys.quartile_bucket).
    ``order_cols`` must be a total order (unique tie-breaker last) or
    bucket assignment at the tile edges is nondeterministic."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.select("*", F.ntile(n).over(w).alias(alias))


def global_ntile(
    df: DataFrame,
    order_cols: Sequence[str],
    n_tiles: int,
    alias: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """``NTILE(n) OVER (ORDER BY order_cols)`` — corpus-wide tercile/
    decile bucketing (e.g. CCNet head/middle/tail) — WITHOUT the
    single-task global window that form compiles to: on a per-document
    frame the unpartitioned window moves the whole corpus to one core.

    Each row's 1-based global rank comes from the two-phase
    distributed prefix sum over a count-1 column (one range shuffle +
    per-partition Arrow cumsum + one offset row per partition; see
    ``global_prefix_sum``). The tile is then a pure expression of
    (rank, total): with n rows and k tiles SQL NTILE gives the first
    ``n % k`` tiles ``ceil(n/k)`` rows and the rest ``floor(n/k)`` —
    reproduced exactly in integer arithmetic below. The total row
    count rides the prefix scan itself (``totals_alias``), so the plan
    stays lazy, adds no data-sized shuffle beyond the range partition,
    and never re-derives the upstream plan for a separate COUNT(*).

    ``order_cols`` must be a total order (unique tie-breaker last) or
    tile assignment at the edges is nondeterministic."""
    ocols = list(order_cols)
    # r10 (guide §2.4): the row total rides the SAME prefix scan via
    # totals_alias — the former separate df.agg(count) + broadcast
    # crossJoin re-derived the whole upstream plan once per ntile call
    # (three extra upstream passes in rfm_segmentation alone). Exact
    # long sum of the count-1 column ≡ COUNT(*), bit-identical.
    ranked = global_prefix_sum(
        df.withColumn("_nt_ord", F.struct(*[F.col(c) for c in ocols]))
        .withColumn("_nt_one", F.lit(1)),
        "_nt_ord",
        "_nt_one",
        "_nt_rank0",
        num_partitions=num_partitions,
        totals_alias="_nt_n",
    )
    return (
        ranked
        .withColumn("_nt_r", F.col("_nt_rank0") + F.lit(1))
        .withColumn("_nt_base", F.expr(f"_nt_n DIV {int(n_tiles)}"))
        .withColumn("_nt_rem", F.expr(f"_nt_n % {int(n_tiles)}"))
        .withColumn(
            alias,
            F.when(
                F.col("_nt_r")
                <= F.col("_nt_rem") * (F.col("_nt_base") + F.lit(1)),
                F.expr("(_nt_r - 1) DIV (_nt_base + 1) + 1"),
            )
            .otherwise(
                # greatest() guards the DIV when n < k (base = 0);
                # that branch is unreachable then (cutoff = n >= r)
                # but ANSI mode would still evaluate the division
                F.expr(
                    "_nt_rem + (_nt_r - 1 - _nt_rem * (_nt_base + 1))"
                    " DIV greatest(_nt_base, 1) + 1"
                )
            )
            .cast("int"),
        )
        .drop(
            "_nt_ord", "_nt_one", "_nt_rank0", "_nt_r",
            "_nt_n", "_nt_base", "_nt_rem",
        )
    )


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str | Sequence[str],
    alias: str | Sequence[str] = "prefix_sum",
    num_partitions: int | None = None,
    totals_alias: str | Sequence[str] | None = None,
) -> DataFrame:
    """EXCLUSIVE global running sum of ``value_col`` in ``order_col``
    order (the SQL ``SUM(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``, 0 for the first row) — WITHOUT the
    single-task global window that form compiles to.

    Two-phase distributed prefix sum:
      1. range-partition on ``order_col`` (partition i holds keys below
         partition i+1 — Spark's RangePartitioner orders partitions),
         then a per-partition cumulative window keyed on
         ``spark_partition_id()`` — fully parallel;
      2. per-partition totals (one row per partition) get their own
         exclusive cumsum on the driver-sized side and broadcast-join
         back as offsets.

    ``order_col`` must be unique (it is the total order). Data moves
    through exactly ONE shuffle (the range partition); the checkpoint
    lets the totals pass and the cumsum pass share it instead of
    re-deriving the upstream plan twice (Spark's exchange reuse does
    not fire across the two branches). The offset table is one row per
    partition — bounded by cluster size, not data size — so the
    driver-side exclusive scan over it is O(#partitions).

    The per-partition cumulative sum runs as a vectorized
    ``mapInPandas`` pass rather than a ``Window.partitionBy(pid)``:
    the window form would add a second full hash shuffle (Spark cannot
    see that range partitions already align with pid), while the Arrow
    pass preserves partitioning and order and does the cumsum in one
    ``numpy.cumsum`` per batch.

    ``value_col``/``alias`` accept lists to scan SEVERAL columns in the
    same single shuffle + single Arrow pass (e.g. both variants' counts
    for a KS statistic) — the carry table carries a tuple per partition
    instead of a scalar.

    ``totals_alias`` (r10 optimization): when given (same shape as
    ``alias``), the output ALSO carries the grand total of each value
    column as a constant column — computed from the same per-partition
    totals frame the carries come from, so callers that need
    ``suffix = total − prefix`` (the whole cox/Fine-Gray family, one
    per Newton iteration) skip their separate full aggregation pass +
    broadcast crossJoin. The totals are exact long sums — bit-identical
    to the ``df.agg(F.sum(v))`` they replace.

    r10 shape change (guide §2.4/§5): the carry offsets used to be a
    driver ``collect`` into the mapInPandas closure behind an EAGER
    localCheckpoint — two extra Spark actions per call before the
    caller's own action. Now the per-partition totals become a tiny
    carries frame (exclusive running sum via a window over ≤ n_parts
    post-aggregate rows — bounded by cluster width, not data) that is
    broadcast-joined back on ``_pid``, and the checkpoint is LAZY: the
    caller's first action materializes the ranged frame once and every
    branch (carries build, cumsum pass) reads the pinned RDD. Zero
    extra actions, same single data shuffle, bit-identical output.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    vcols = [value_col] if isinstance(value_col, str) else list(value_col)
    aliases = [alias] if isinstance(alias, str) else list(alias)
    if len(vcols) != len(aliases):
        raise ValueError("value_col and alias lists must align")
    tcols = (
        [totals_alias]
        if isinstance(totals_alias, str)
        else list(totals_alias) if totals_alias else []
    )
    if tcols and len(tcols) != len(vcols):
        raise ValueError("totals_alias must align with value_col")

    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    ptots = ranged.groupBy("_pid").agg(
        *[F.sum(v).alias(f"_t{i}") for i, v in enumerate(vcols)]
    )
    w_carry = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sel = [F.col("_pid").alias("_cpid")] + [
        F.coalesce(F.sum(f"_t{i}").over(w_carry), F.lit(0)).alias(
            f"_carry{i}"
        )
        for i in range(len(vcols))
    ]
    if tcols:
        w_all = Window.orderBy("_pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        sel += [
            F.coalesce(F.sum(f"_t{i}").over(w_all), F.lit(0)).alias(
                f"_tt{i}"
            )
            for i in range(len(vcols))
        ]
    carries = ptots.select(*sel)
    joined = ranged.join(
        F.broadcast(carries), F.col("_pid") == F.col("_cpid")
    )

    out_schema = StructType(
        [f for f in ranged.schema.fields if f.name != "_pid"]
        + [StructField(a, LongType()) for a in aliases]
        + [StructField(t, LongType()) for t in tcols]
    )
    cols = [f.name for f in ranged.schema.fields if f.name != "_pid"]

    def cumsum(batches):
        carry = None
        tots = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if carry is None:
                carry = [
                    int(pdf[f"_carry{i}"].iloc[0])
                    for i in range(len(vcols))
                ]
                if tcols:
                    tots = [
                        int(pdf[f"_tt{i}"].iloc[0])
                        for i in range(len(vcols))
                    ]
            out = pdf[cols].copy()
            for i, (v, a) in enumerate(zip(vcols, aliases)):
                vals = pdf[v].to_numpy()
                out[a] = vals.cumsum() - vals + carry[i]
                carry[i] += int(vals.sum())
            for i, t in enumerate(tcols):
                out[t] = tots[i]
            yield out

    return joined.mapInPandas(cumsum, out_schema)


def grouped_prefix_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str | Sequence[str],
    alias: str | Sequence[str] = "prefix_sum",
    num_partitions: int | None = None,
    totals_alias: str | Sequence[str] | None = None,
) -> DataFrame:
    """EXCLUSIVE per-group running sum of ``value_col`` in ``order_col``
    order (``SUM(v) OVER (PARTITION BY g ORDER BY k ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)``, 0 for each group's first
    row) — WITHOUT the hot-group-on-one-task window that form compiles
    to: a group 100× bigger than the rest would serialize its whole
    scan onto a single core.

    Three-phase, fully distributed (no driver collect at all — the
    sibling ``global_prefix_sum`` collects one row per partition; here
    even that is replaced by a window over per-partition totals):

      1. range-partition on ``(group..., order_col)`` — a hot group
         SPANS many consecutive partitions instead of landing on one
         task — then tag rows with ``spark_partition_id()``;
      2. per-(partition, group) totals (≤ #groups + #partitions rows,
         since each group occupies a contiguous partition span) get
         their exclusive cross-partition carry from a window over
         ``Window.partitionBy(group).orderBy(pid)`` — at most
         #partitions rows per group, trivially small and itself spread
         across groups;
      3. join carries back on ``(pid, group)`` and finish with a
         within-cell cumulative window over ``(pid, group)`` — each
         window cell is bounded by a range-partition's share of the
         group, never the whole group.

    ``(group..., order_col)`` must be unique (it is the total order
    within the group). Σ value per group must fit a long.

    ``value_col``/``alias`` accept lists to scan several columns in
    the same shuffle + window passes (the ``global_prefix_sum``
    multi-column contract).

    ``totals_alias``: when given, the output also carries each value
    column's PER-GROUP grand total as a constant-within-group column,
    computed from the same tiny per-(partition, group) totals frame the
    carries come from (one more window over ≤ #groups + #partitions
    rows) — callers needing ``suffix = group total − prefix`` skip
    their separate full aggregation + broadcast join. Exact long sums,
    bit-identical to the ``groupBy(g).agg(F.sum(v))`` they replace.

    r10: the internal checkpoint is LAZY — the caller's first action
    materializes the ranged frame once and the carries/join branches
    share the pinned RDD; no standalone materialization job."""
    g = list(group_cols)
    vcols = [value_col] if isinstance(value_col, str) else list(value_col)
    aliases = [alias] if isinstance(alias, str) else list(alias)
    if len(vcols) != len(aliases):
        raise ValueError("value_col and alias lists must align")
    tcols = (
        [totals_alias]
        if isinstance(totals_alias, str)
        else list(totals_alias) if totals_alias else []
    )
    if tcols and len(tcols) != len(vcols):
        raise ValueError("totals_alias must align with value_col")

    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in g + [order_col]])
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_carry = (
        Window.partitionBy(*g)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = ranged.groupBy("_pid", *g).agg(
        *[F.sum(v).alias(f"_ct_{i}") for i, v in enumerate(vcols)]
    )
    for i in range(len(vcols)):
        carries = carries.withColumn(
            f"_carry_{i}",
            F.coalesce(F.sum(f"_ct_{i}").over(w_carry), F.lit(0)),
        )
    if tcols:
        w_all = (
            Window.partitionBy(*g)
            .orderBy("_pid")
            .rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        for i in range(len(vcols)):
            carries = carries.withColumn(
                f"_gtot_{i}",
                F.coalesce(F.sum(f"_ct_{i}").over(w_all), F.lit(0)),
            )
    carries = carries.drop(*[f"_ct_{i}" for i in range(len(vcols))])
    w_cell = (
        Window.partitionBy("_pid", *g)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # null-safe join: a NULL group key is a real group to window
    # partitioning and groupBy, so the carry join must not drop it
    c = carries.select(
        F.col("_pid").alias("_cpid"),
        *[F.col(k).alias(f"_cg_{i}") for i, k in enumerate(g)],
        *[f"_carry_{i}" for i in range(len(vcols))],
        *[f"_gtot_{i}" for i in range(len(vcols)) if tcols],
    )
    cond = F.col("_pid") == F.col("_cpid")
    for i, k in enumerate(g):
        cond = cond & F.col(k).eqNullSafe(F.col(f"_cg_{i}"))
    out = ranged.join(c, cond)
    for i, (v, a) in enumerate(zip(vcols, aliases)):
        out = out.withColumn(
            a,
            F.coalesce(F.sum(v).over(w_cell), F.lit(0))
            + F.col(f"_carry_{i}"),
        )
    for i, t in enumerate(tcols):
        out = out.withColumn(t, F.col(f"_gtot_{i}"))
    return out.drop(
        "_pid",
        "_cpid",
        *[f"_carry_{i}" for i in range(len(vcols))],
        *[f"_gtot_{i}" for i in range(len(vcols)) if tcols],
        *[f"_cg_{i}" for i in range(len(g))],
    )


def global_last_carry(
    df: DataFrame,
    order_cols: Sequence[str],
    value_cols: Sequence[str],
    aliases: Sequence[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """GLOBAL forward-fill: for every row, the most recent non-null
    ``value_cols`` in ``order_cols`` order (the SQL ``LAST_VALUE(v
    IGNORE NULLS) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)``) —
    WITHOUT the single-task global window that form compiles to.
    The as-of primitive behind 1-NN matching on a score axis and
    un-keyed gap-filling.

    Same two-phase shape as ``global_prefix_sum``: range-partition on
    ``order_cols`` (one shuffle), per-partition LAST non-null values
    (one row per partition) collect to the driver where an exclusive
    forward scan yields each partition's carry-in seed, then one
    Arrow ``mapInPandas`` pass does the within-partition ffill.

    ``order_cols`` must be a strict total order (the determinism
    contract). ``value_cols`` are filled INDEPENDENTLY — when they
    come from one logical side (e.g. a control row's score and
    outcome), their null patterns coincide row-wise and the fills
    stay mutually consistent; mixing columns with different null
    patterns fills each on its own history.
    """
    from pyspark.sql.types import StructField, StructType

    ocols = list(order_cols)
    vcols = list(value_cols)
    als = list(aliases)
    if len(vcols) != len(als):
        raise ValueError("value_cols and aliases must align")

    n_parts = (
        num_partitions
        or df.sparkSession.sparkContext.defaultParallelism
    )
    ranged = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in ocols])
        .sortWithinPartitions(*ocols)
        .withColumn("_pid", F.spark_partition_id())
        # lazy: the one-row-per-partition seed collect below is the
        # first action and pins the ranged frame (r10 — the eager form
        # was one standalone job per call)
        .localCheckpoint(eager=False)
    )
    lasts = ranged.groupBy("_pid").agg(
        *[
            F.last(v, ignorenulls=True).alias(f"_l{i}")
            for i, v in enumerate(vcols)
        ]
    ).collect()
    seeds: dict[int, tuple] = {}
    acc: list = [None] * len(vcols)
    for r in sorted(lasts, key=lambda r: r["_pid"]):
        seeds[r["_pid"]] = tuple(acc)
        for i in range(len(vcols)):
            if r[f"_l{i}"] is not None:
                acc[i] = r[f"_l{i}"]

    fields = {f.name: f for f in ranged.schema.fields}
    out_schema = StructType(
        [f for f in ranged.schema.fields if f.name != "_pid"]
        + [
            StructField(a, fields[v].dataType)
            for v, a in zip(vcols, als)
        ]
    )
    cols = [f.name for f in ranged.schema.fields if f.name != "_pid"]

    def ffill(batches):
        import pandas as pd

        seed = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if seed is None:
                seed = list(
                    seeds.get(
                        int(pdf["_pid"].iloc[0]), (None,) * len(vcols)
                    )
                )
            out = pdf[cols].copy()
            for i, (v, a) in enumerate(zip(vcols, als)):
                s = pdf[v]
                if seed[i] is not None:
                    s = pd.concat(
                        [pd.Series([seed[i]], dtype=s.dtype), s],
                        ignore_index=True,
                    ).ffill()[1:].reset_index(drop=True)
                    out[a] = s.values
                else:
                    out[a] = s.ffill().values
                last = out[a].iloc[-1] if len(out) else None
                if last is not None and not pd.isna(last):
                    seed[i] = last
            yield out

    return ranged.mapInPandas(ffill, out_schema)
