"""Hypertable-style cascading rollups: multi-resolution time-series
aggregates where each coarser level re-aggregates the next finer
level's PARTIALS instead of rescanning raw events — the TimescaleDB
continuous-aggregate / OLAP-cube-cascade shape, expressed as plain
DataFrame plans.

Why it matters at 100 TB: the raw table is touched ONCE (for the
finest level); every coarser resolution aggregates a table that is
orders of magnitude smaller (minute partials ≈ #minutes × #groups
rows). Day-level dashboards never pay the raw-scan cost, and all
partials are themselves persistable as materialized rollup tables.

Only decomposable aggregates cascade losslessly: count and sum re-sum,
min/max re-min/re-max. Averages are derived (sum/count) at read time;
never cascade an avg of avgs. Currency-like doubles are carried as
integer cents through every level (order-independent exact sums — see
__spark_entry__._money_sum) and divided once at the end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cascading_rollup(
    events: DataFrame,
    levels: Sequence[str] = ("1 minute", "1 hour", "1 day"),
    ts_col: str = "ts",
    value_col: str = "value",
    group_cols: Sequence[str] = ("event_type",),
) -> list[DataFrame]:
    """Build the rollup cascade; returns one DataFrame per level, finest
    first, each with columns (window_start, *group_cols, n_events,
    sum_cents, min_value, max_value).

    ``levels`` must nest (each duration an integer multiple of the
    previous) — window starts then align exactly, so re-windowing a
    partial's ``window_start`` is lossless. ``sum_cents`` stays a long
    throughout; render as money via ``finish_rollup``.
    """
    gcols = list(group_cols)
    finest = (
        events.groupBy(F.window(ts_col, levels[0]).alias("w"), *gcols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias(
                "sum_cents"
            ),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(F.col("w.start").alias("window_start"), "*")
        .drop("w")
    )
    out = [finest]
    for duration in levels[1:]:
        prev = out[-1]
        out.append(
            prev.groupBy(
                F.window("window_start", duration).alias("w"), *gcols
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_cents").alias("sum_cents"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
            .select(F.col("w.start").alias("window_start"), "*")
            .drop("w")
        )
    return out


def finish_rollup(level: DataFrame) -> DataFrame:
    """Read-time projection of a rollup level: cents → money sum, plus
    the derived average (sum/count — the only safe way to average
    across partials)."""
    return level.select(
        "*",
        (F.col("sum_cents") / F.lit(100.0)).alias("sum_value"),
        F.round(
            F.col("sum_cents") / F.lit(100.0) / F.col("n_events"), 6
        ).alias("avg_value"),
    ).drop("sum_cents")


def gap_fill_ffill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Regularize an irregular series onto a fixed grid and forward-fill
    the holes (the TimescaleDB ``time_bucket_gapfill`` + ``locf``
    shape): one row per ``key`` per ``step`` between that key's first
    and last observation, carrying the most recent observed value.
    Returns (key, bucket_ts, value, is_observed).

    Within a bucket the surviving observation is the LAST by (ts,
    tie-breaker id) — ``max_by`` over a struct, deterministic under any
    partitioning. The grid is generated per key from its own bounds
    (``sequence`` + ``explode`` — narrow after the bounds aggregate,
    never a global calendar cross-join), so a key active for a day
    costs 24 rows, not the corpus's full span. The forward fill is
    ``last(value, ignorenulls)`` over the per-key window — state stays
    inside one partition; no global scan order is assumed.

    Scale: two shuffles (bounds agg + the grid⋈observed join; the fill
    window reuses the join's (key) clustering at most one more
    exchange). Grid size is Σ_key span/step — bounded by wall-clock
    span, not event count, so a 100× event scale-up with the same time
    span grows only the observed side.

    ``step`` must be a single whole unit ('1 minute', '1 hour',
    '1 day', '1 week') — the observed-side bucket is ``date_trunc`` of
    the SAME unit the grid steps by; a fractional step (e.g.
    '15 minutes') would need a modular bucket expression and is
    rejected rather than silently day-truncated.
    """
    step_trunc = {
        "1 minute": "minute",
        "1 hour": "hour",
        "1 day": "day",
        "1 week": "week",
    }
    if step not in step_trunc:
        raise ValueError(
            f"gap_fill_ffill: unsupported step {step!r}; "
            f"expected one of {sorted(step_trunc)}"
        )
    bucket = F.date_trunc(step_trunc[step], F.col(ts_col))
    observed = (
        df.select(
            key_col,
            bucket.alias("bucket_ts"),
            F.struct(ts_col, tiebreak_col, value_col).alias("_tv"),
        )
        .groupBy(key_col, "bucket_ts")
        .agg(F.max("_tv").alias("_last"))
        .select(key_col, "bucket_ts", F.col(f"_last.{value_col}").alias("_obs"))
    )
    grid = (
        df.groupBy(key_col)
        .agg(
            F.min(bucket).alias("_lo"),
            F.max(bucket).alias("_hi"),
        )
        .select(
            key_col,
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"interval {step}"))
            ).alias("bucket_ts"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(observed, [key_col, "bucket_ts"], "left")
        .select(
            key_col,
            "bucket_ts",
            F.last("_obs", ignorenulls=True).over(w).alias(value_col),
            F.col("_obs").isNotNull().alias("is_observed"),
        )
    )


def scd2_history(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Collapse an event stream into a type-2 slowly-changing-dimension
    history: one row per RUN of consecutive equal ``attr`` values per
    key — (key, attr, valid_from, valid_to, n_events), ``valid_to``
    NULL on the current (open) row. The gaps-and-islands build every
    warehouse dimension-load performs.

    Three windows over ONE partitioning (key, ordered by ts then the
    unique tie-breaker — a total order, so run boundaries are
    deterministic): lag to flag changes, running sum of flags to number
    the runs, then a per-run aggregate and a lead for the close-out
    timestamp. One shuffle; run state never leaves its key partition.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    chg = (
        F.lag(attr_col).over(w).isNull()
        | (F.lag(attr_col).over(w) != F.col(attr_col))
    ).cast("int")
    runs = df.select(
        key_col,
        ts_col,
        attr_col,
        F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_run"),
    )
    # every attr value in a run is equal by construction; min() is the
    # engine-portable way to say "the value" (first() is order-dependent)
    hist = runs.groupBy(key_col, "_run").agg(
        F.min(attr_col).alias(attr_col),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    # _run as tie-breaker: two runs can share valid_from when an attr
    # change lands on an identical timestamp (run detection broke the
    # tie by the unique tiebreak_col, so _run preserves true event
    # order); without it the lead() assignment is nondeterministic.
    w2 = Window.partitionBy(key_col).orderBy("valid_from", "_run")
    return hist.select(
        key_col,
        attr_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )


def funnel_stages(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    stages: Sequence[str] = ("view", "click", "purchase"),
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Ordered funnel per key: the timestamp at which each stage was
    first reached, where stage i+1 must occur STRICTLY after stage i —
    (key, t_<stage1>, ..., t_<stageN>). NULL from the first unreached
    stage onward. count(t_<stage>) downstream gives the classic funnel
    drop-off chart.

    One shuffle: collect each key's events, sort by (ts, tie-breaker)
    — a total order, so the fold is deterministic — and run the stage
    machine as a JVM-side ``aggregate`` over the sorted array (state =
    one timestamp per stage; no Python UDF, no per-stage re-scan of
    the fact table — the textbook k-stage formulation is k joins of
    conditional-min aggregates, k passes over events).

    Skew note: per-key event counts bound the collected array — fine
    for user-activity data (10³-10⁴ events/user); for keys with
    unbounded streams, pre-aggregate to (key, stage, candidate-ts
    runs) first.
    """
    ts_type = dict(df.dtypes)[ts_col]
    evs = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(tiebreak_col).alias("k"),
                F.col(type_col).alias("y"),
            )
        )
    )
    names = [f"t_{s}" for s in stages]
    zero = F.struct(
        *[F.lit(None).cast(ts_type).alias(nm) for nm in names]
    )

    def step(acc, e):
        fields = []
        for i, (s, nm) in enumerate(zip(stages, names)):
            cur = acc[nm]
            if i == 0:
                hit = (e["y"] == s) & cur.isNull()
            else:
                prev = acc[names[i - 1]]
                hit = (
                    (e["y"] == s)
                    & cur.isNull()
                    & prev.isNotNull()
                    & (e["t"] > prev)
                )
            fields.append(F.when(hit, e["t"]).otherwise(cur).alias(nm))
        return F.struct(*fields)

    folded = F.aggregate(evs, zero, step)
    return df.groupBy(key_col).agg(folded.alias("_f")).select(
        key_col, *[F.col(f"_f.{nm}").alias(nm) for nm in names]
    )


def anomaly_mad(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak_col: str,
    window_size: int = 25,
    k: int = 3,
) -> DataFrame:
    """Robust rolling-window anomaly detection: flag a point when its
    deviation from the rolling MEDIAN exceeds ``k`` × the rolling MAD
    (median absolute deviation) — the standard outlier rule that, unlike
    mean/stddev z-scores, is not itself dragged by the outliers it is
    trying to find.

    EXACT integer arithmetic end-to-end (``value_col`` must be integral,
    e.g. cents): med2 = sum of the two middle order statistics
    (= 2·median exactly, odd or even n), dev2 = |2·value − med2|
    (= 2·|value − median|), mad4 = med2 of the dev2 array (= 4·MAD).
    The flag is ``2·dev2 > k·mad4`` ⇔ |value − median| > k·MAD — all
    bigint compares, bit-identical on any engine, no float epsilon.

    Scale: one window per key ordered by (ts, tiebreak); the collected
    window is ``window_size`` values (a constant), so per-row state is
    bounded and the whole operator is one shuffle on the key. Rows with
    fewer than ``window_size`` points so far (warm-up) are never
    flagged (``is_anomaly`` false; ``n_window`` tells you why).
    Returns input keys plus (n_window, med2, dev2, mad4, is_anomaly).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(order_tiebreak_col))
        .rowsBetween(-(window_size - 1), 0)
    )
    arr = F.array_sort(F.collect_list(F.col(value_col)).over(w))

    def med2(a):
        n = F.size(a)
        lo = F.element_at(a, ((n + 1) / 2).cast("int"))
        hi = F.element_at(a, ((n + 2) / 2).cast("int"))
        return lo + hi

    out = df.select(
        key_col,
        ts_col,
        order_tiebreak_col,
        value_col,
        arr.alias("_arr"),
    )
    out = out.select(
        key_col,
        ts_col,
        order_tiebreak_col,
        value_col,
        F.size("_arr").alias("n_window"),
        med2(F.col("_arr")).alias("med2"),
        F.col("_arr").alias("_arr"),
    )
    dev_arr = F.array_sort(
        F.transform(
            F.col("_arr"),
            lambda x: F.abs(x * 2 - F.col("med2")),
        )
    )
    out = out.select(
        key_col,
        ts_col,
        order_tiebreak_col,
        value_col,
        "n_window",
        "med2",
        med2(dev_arr).alias("mad4"),
        (F.abs(F.col(value_col) * 2 - F.col("med2")) ).alias("dev2"),
    )
    flag = (F.col("n_window") >= window_size) & (
        (F.col("dev2") * 2) > (F.lit(k) * F.col("mad4"))
    )
    return out.select(
        key_col,
        ts_col,
        order_tiebreak_col,
        value_col,
        "n_window",
        "med2",
        "dev2",
        "mad4",
        flag.alias("is_anomaly"),
    )


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity period
    (their cohort), tracked by how many are still active N periods
    later — the standard product-analytics table.

    Returns (cohort_period, period_offset, n_active, cohort_size,
    retention_ratio): of the ``cohort_size`` users whose first activity
    fell in ``cohort_period``, ``n_active`` were active again exactly
    ``period_offset`` periods later (offset 0 = the cohort period
    itself, ratio 1.0 by construction). Ratio rounded to 6 dp.

    Scale: first-activity is one groupBy(key); activity periods dedupe
    to one row per (key, period); the matrix agg groups a frame whose
    size is at most (#users × active periods) — all narrow fixed-width
    rows, shuffles keyed on user id. ``date_trunc`` gives calendar
    periods, so cohorts are stable across runs and engines.
    """
    trunc = F.date_trunc(period, F.col(ts_col))
    active = (
        df.select(F.col(key_col).alias("_k"), trunc.alias("_p"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    first = active.groupBy("_k").agg(F.min("_p").alias("_cohort"))
    sizes = first.groupBy("_cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    # offset in whole periods: for week, integer days/7 of the gap
    per_days = {"week": 7, "day": 1, "month": None}[period]
    if per_days is None:
        offset = (
            (F.year("_p") - F.year("_cohort")) * 12
            + (F.month("_p") - F.month("_cohort"))
        ).cast("long")
    else:
        offset = (
            F.datediff(F.col("_p"), F.col("_cohort")) / per_days
        ).cast("long")
    matrix = (
        active.join(first, "_k")
        .select("_cohort", offset.alias("period_offset"), "_k")
        .groupBy("_cohort", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(sizes, "_cohort")
    )
    return matrix.select(
        F.col("_cohort").alias("cohort_period"),
        "period_offset",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active") / F.col("cohort_size"), 6
        ).alias("retention_ratio"),
    )


def touch_attribution(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    conversion_type: str = "purchase",
) -> DataFrame:
    """First-touch / last-touch attribution: for every conversion
    event, which touchpoint type opened the journey and which one
    closed it — the two standard marketing-credit rules, in ONE window
    pass.

    Each key's events are scanned in (ts, tiebreak) order; non-
    conversion events are the touches. A conversion row reports
    ``first_touch`` (first touch ever before or at it) and
    ``last_touch`` (most recent touch before or at it); both NULL for
    a conversion with no preceding touch. Total order via the unique
    tie-breaker makes same-timestamp behaviour deterministic and
    engine-portable.

    Scale: one shuffle on the key, running state is two values per
    row — no conversions×touches join, no per-key quadratic surface.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(F.col(type_col) != conversion_type, F.col(type_col))
    return (
        df.select(
            key_col,
            ts_col,
            tiebreak_col,
            type_col,
            F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
            F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
        )
        .filter(F.col(type_col) == conversion_type)
        .drop(type_col)
    )


def transition_matrix(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of an event stream: for
    every observed (from_type → to_type) step within a key's timeline,
    the count and the conditional probability P(to | from) — the
    navigation/behavior model behind next-step prediction and funnel
    drop-off analysis.

    One lead() window per key in deterministic (ts, tiebreak) order,
    one groupBy on the (from, to) pair, margins derived from the pair
    counts themselves (no second scan). Probabilities are exact
    count ratios rounded to 6 dp. Terminal events (no successor) drop
    out of the matrix; they are the row margin minus outgoing count.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), F.col(tiebreak_col)
    )
    steps = (
        df.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_steps"))
        .localCheckpoint(eager=False)
    )
    margins = steps.groupBy("from_type").agg(
        F.sum("n_steps").alias("_out_total")
    )
    return (
        steps.join(F.broadcast(margins), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_steps",
            F.round(
                F.col("n_steps") / F.col("_out_total"), 6
            ).alias("prob"),
        )
    )


def pattern_matches(
    df: DataFrame,
    pattern: Sequence[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    max_step_gap: str | None = None,
) -> DataFrame:
    """Event-sequence pattern detection (the MATCH_RECOGNIZE /
    complex-event-processing shape): every occurrence of
    ``pattern = [t1, t2, ..., tk]`` as CONSECUTIVE events in a key's
    timeline, optionally requiring each step to follow within
    ``max_step_gap`` (e.g. ``'30 minutes'``).

    Matches are CONTIGUOUS: the k events are adjacent in the stream
    (no other event interleaves) — the strict CEP match, expressed as
    k−1 chained ``lead()`` columns over one (ts, tiebreak)-ordered
    window: one shuffle on the key, no self-joins, no quadratic
    surface; pattern length is a static plan property, not data.
    (For the skip-till-next-match semantics over non-adjacent events,
    compose ``funnel_stages`` — first completion — or filter the
    stream to the pattern's types first and run this on the remnant.)

    Returns (key, match_start_ts, match_end_ts, start_id) — one row
    per match; overlapping matches all reported.
    """
    k = len(pattern)
    if k < 2:
        raise ValueError("pattern needs at least 2 steps")
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), F.col(tiebreak_col)
    )
    cols = [
        df[c] for c in (key_col, ts_col, tiebreak_col, type_col)
    ]
    steps = df.select(
        *cols,
        *[
            F.lead(type_col, i).over(w).alias(f"_t{i}")
            for i in range(1, k)
        ],
        *[
            F.lead(ts_col, i).over(w).alias(f"_ts{i}")
            for i in range(1, k)
        ],
    )
    cond = F.col(type_col) == pattern[0]
    for i in range(1, k):
        cond = cond & (F.col(f"_t{i}") == pattern[i])
        if max_step_gap is not None:
            prev = F.col(ts_col) if i == 1 else F.col(f"_ts{i-1}")
            cond = cond & (
                F.col(f"_ts{i}")
                <= prev + F.expr(f"interval {max_step_gap}")
            )
    return steps.filter(cond).select(
        key_col,
        F.col(ts_col).alias("match_start_ts"),
        F.col(f"_ts{k-1}").alias("match_end_ts"),
        F.col(tiebreak_col).alias("start_id"),
    )


def journey_matches(
    df: DataFrame,
    pattern: Sequence[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Skip-till-next-match CEP: ALL non-overlapping completions of
    ``pattern`` per key, unrelated events skipped — the greedy journey
    semantics ("every view→…→purchase conversion, however much noise
    sits between the steps"). ``pattern_matches`` is the strict
    contiguous sibling; ``funnel_stages`` reports only the FIRST
    completion.

    Same single-shuffle sorted-array fold as the funnel: collect each
    key's events in (ts, tiebreak) total order and run the stage
    machine once in a JVM-side ``aggregate`` — state is (stage,
    journey start, completed list). A completion resets the machine,
    which is exactly the non-overlapping guarantee. Per-key event
    counts bound the array (same caveat as funnel_stages).

    Returns one row per completed journey: (key, match_start_ts,
    start_id, match_end_ts).
    """
    k = len(pattern)
    if k < 2:
        raise ValueError("pattern needs at least 2 steps")
    ts_type = dict(df.dtypes)[ts_col]
    id_type = dict(df.dtypes)[tiebreak_col]
    evs = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(tiebreak_col).alias("k"),
                F.col(type_col).alias("y"),
            )
        )
    )
    zero = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast(ts_type).alias("start_t"),
        F.lit(None).cast(id_type).alias("start_k"),
        F.array().cast(
            f"array<struct<st:{ts_type},sk:{id_type},en:{ts_type}>>"
        ).alias("done"),
    )

    def step(acc, e):
        # one WHEN-chain per stage value — pattern length is a static
        # plan property, so this unrolls to k branches
        advance = F.lit(False)
        for i, p in enumerate(pattern):
            advance = F.when(
                (acc["stage"] == i) & (e["y"] == p), F.lit(True)
            ).otherwise(advance)
        new_stage = F.when(
            advance, (acc["stage"] + 1) % k
        ).otherwise(acc["stage"])
        starting = advance & (acc["stage"] == 0)
        completing = advance & (acc["stage"] == k - 1)
        new_start_t = F.when(starting, e["t"]).otherwise(
            F.when(completing, F.lit(None).cast(ts_type)).otherwise(
                acc["start_t"]
            )
        )
        new_start_k = F.when(starting, e["k"]).otherwise(
            F.when(completing, F.lit(None).cast(id_type)).otherwise(
                acc["start_k"]
            )
        )
        new_done = F.when(
            completing,
            F.concat(
                acc["done"],
                F.array(
                    F.struct(
                        acc["start_t"].alias("st"),
                        acc["start_k"].alias("sk"),
                        e["t"].alias("en"),
                    )
                ),
            ),
        ).otherwise(acc["done"])
        return F.struct(
            new_stage.alias("stage"),
            new_start_t.alias("start_t"),
            new_start_k.alias("start_k"),
            new_done.alias("done"),
        )

    folded = (
        df.groupBy(key_col)
        .agg(F.aggregate(evs, zero, step).alias("_m"))
        .select(key_col, F.explode("_m.done").alias("_j"))
    )
    return folded.select(
        key_col,
        F.col("_j.st").alias("match_start_ts"),
        F.col("_j.sk").alias("start_id"),
        F.col("_j.en").alias("match_end_ts"),
    )


def cusum_changepoints(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    k_slack_cents: int = 0,
    h_cents: int = 500,
) -> DataFrame:
    """Two-sided CUSUM mean-shift detection per key over a daily
    series (Page 1954 — the classic sequential changepoint chart):
    alarm when the cumulative deviation from the key's own mean drifts
    past ``h`` in either direction, with per-step slack ``k``
    absorbing in-control noise.

    The textbook recursion S_t = max(0, S_{t-1} + y_t) looks
    inherently sequential, but it has a closed window form: with
    P_t = Σ_{j≤t} y_j, S_t = P_t − min_{j≤t} P_j — a running sum and
    a running min, two frames over ONE sort. Both CUSUM sides and the
    alarms are therefore pure window expressions (WholeStageCodegen,
    no UDF), and the whole operator is one shuffle on the key with an
    oracle that mirrors it verbatim.

    EXACT integer arithmetic: the day's value sums to cents; the
    key's reference is floor(total_cents / n_days) — one double
    division per key over exact integer inputs, mirrored verbatim by
    the oracle (bit-identical below 2⁵³ cents per key; past that,
    switch the accumulators to decimal as in ``operators/stats.py``).
    Deviations, slack, and the threshold comparisons are all bigint —
    no float ever decides an alarm. Returns one row per (key, day):
    (key, day, day_cents, cusum_pos, cusum_neg, alarm_pos,
    alarm_neg) where cusum_* are the chart statistics in cents.

    Scale: the daily collapse is a map-combined aggregate; the series
    per key is #days rows (bounded by calendar, not corpus), so the
    per-key window is small by construction — same shape as
    ``events_rollup``."""
    daily = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
        )
        .agg(
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias(
                "day_cents"
            )
        )
    )
    per_key = Window.partitionBy("key")
    n_days = F.count(F.lit(1)).over(per_key)
    total = F.sum("day_cents").over(per_key)
    # exact per-key reference: floor of the mean in cents (integer)
    mean_c = F.floor(total / n_days).cast("long")
    stat = daily.select(
        "key",
        "day",
        "day_cents",
        (F.col("day_cents") - mean_c - F.lit(k_slack_cents)).alias("_yp"),
        (F.col("day_cents") - mean_c + F.lit(k_slack_cents)).alias("_yn"),
    )
    w_cum = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = stat.select(
        "key",
        "day",
        "day_cents",
        F.sum("_yp").over(w_cum).alias("_pp"),
        F.sum("_yn").over(w_cum).alias("_pn"),
    )
    cusum_pos = F.col("_pp") - F.least(
        F.min("_pp").over(w_cum), F.lit(0).cast("long")
    )
    cusum_neg = (
        F.greatest(F.max("_pn").over(w_cum), F.lit(0).cast("long"))
        - F.col("_pn")
    )
    return stepped.select(
        "key",
        "day",
        "day_cents",
        cusum_pos.alias("cusum_pos"),
        cusum_neg.alias("cusum_neg"),
        (cusum_pos > h_cents).alias("alarm_pos"),
        (cusum_neg > h_cents).alias("alarm_neg"),
    )


def seasonal_decompose(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition per key (the
    moving-average STL-lite: value = trend + seasonal + remainder)
    with a FIXED period — the events-family readout for "is this
    weekly pattern or real drift?" feeding ``anomaly_mad``/``cusum``.

    Exactness discipline: all aggregated evidence stays INTEGER so the
    result is bit-stable at any parallelism — trend is the centered
    ``period``-day sum (not mean) of day-cents, the seasonal index
    per (key, phase) is the integer sum of (period·x − trend_sum)
    over complete windows with its own integer count, and only ONE
    final double expression combines them:
        remainder = x − trend_sum/p − s_num/(p·s_cnt)
    mirrored verbatim by the oracle. Odd ``period`` required (the
    centered window is ±(p−1)/2); days whose window is incomplete get
    NULL trend/remainder and contribute nothing to the seasonal
    index. Returns (key, day, phase, day_cents, trend, seasonal,
    remainder) rounded to 6.
    """
    if period % 2 == 0:
        raise ValueError("period must be odd (centered window)")
    half = period // 2
    daily = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
        )
        .agg(
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias(
                "day_cents"
            )
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(-half, half)
    )
    # dayofweek is locale-stable in Spark (1=Sunday); phase only needs
    # to be a deterministic [0, period) bucket shared with the oracle
    phase = (
        F.floor(
            F.unix_timestamp("day") / F.lit(86400)
        ).cast("long") % period
    ).alias("phase")
    trended = daily.select(
        "key",
        "day",
        phase,
        "day_cents",
        F.when(
            F.count(F.lit(1)).over(w) == period,
            F.sum("day_cents").over(w),
        ).alias("trend_sum"),
    )
    trended = trended.localCheckpoint(eager=False)
    seasonal = (
        trended.filter(F.col("trend_sum").isNotNull())
        .groupBy("key", "phase")
        .agg(
            F.sum(
                F.lit(period) * F.col("day_cents") - F.col("trend_sum")
            ).alias("s_num"),
            F.count(F.lit(1)).alias("s_cnt"),
        )
    )
    p = float(period)
    trend = F.col("trend_sum").cast("double") / p / 100.0
    seas = (
        F.col("s_num").cast("double")
        / (p * F.col("s_cnt").cast("double"))
        / 100.0
    )
    x = F.col("day_cents").cast("double") / 100.0
    return (
        trended.join(F.broadcast(seasonal), ["key", "phase"], "left")
        .select(
            "key",
            "day",
            "phase",
            "day_cents",
            F.round(trend, 6).alias("trend"),
            F.when(
                F.col("s_cnt").isNotNull(), F.round(seas, 6)
            ).alias("seasonal"),
            F.when(
                F.col("trend_sum").isNotNull() & F.col("s_cnt").isNotNull(),
                F.round(x - trend - seas, 6),
            ).alias("remainder"),
        )
    )


def rfm_segmentation(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    n_tiles: int = 5,
) -> DataFrame:
    """RFM segmentation — the classic product-analytics customer
    grading: per user, Recency (days since their last event, against
    the corpus's last day), Frequency (#events) and Monetary (exact
    cents), each quintile-scored 1..n_tiles corpus-wide, emitted as
    one segment row per (r, f, m) cell with user counts and monetary
    mass.

    Scoring uses the repo's DISTRIBUTED ntile (``global_ntile``: the
    two-phase prefix-sum rank, never the single-task NTILE window the
    SQL form compiles to — the ccnet-buckets defect class). Recency
    scores high = recent (descending recency order), F/M high = big —
    ties broken by user id, so every tile edge is deterministic and
    the oracle's SQL NTILE reproduces the identical assignment.

    Scale shape: one hash aggregate to per-user rows (the only
    data-sized step), three ntile passes over the user frame (range
    shuffle each), one aggregate to the ≤ n_tiles³ segment cells.
    """
    per = events.groupBy(F.col(user_col).alias("user_key")).agg(
        F.max(ts_col).alias("_last"),
        F.count(F.lit(1)).alias("_freq"),
        F.sum(
            F.round(F.col(value_col) * 100, 0).cast("long")
        ).alias("_cents"),
    # lazy-pin the per-user collapse: the anchor branch below and the
    # main scoring path would otherwise each re-run the events scan +
    # hash aggregate (r10)
    ).localCheckpoint(eager=False)
    # r10: the corpus's last day is derivable from the per-user frame —
    # max over users of (max ts per user) IS the global max, and
    # to_date commutes with max — so the anchor aggregates the tiny
    # per-user frame instead of re-scanning the raw events (one full
    # data pass removed; identical date).
    anchor = per.agg(F.max(F.to_date("_last")).alias("_day_max"))
    per = per.crossJoin(F.broadcast(anchor)).withColumn(
        "_rec_days",
        F.datediff(F.col("_day_max"), F.to_date("_last")).cast("long"),
    )
    from .windows import global_ntile

    per = global_ntile(
        per, ["_rec_days", "user_key"], n_tiles, alias="_r_inv"
    )
    per = per.withColumn(
        "r_score", (F.lit(n_tiles + 1) - F.col("_r_inv")).cast("int")
    )
    per = global_ntile(per, ["_freq", "user_key"], n_tiles, alias="_f")
    per = global_ntile(per, ["_cents", "user_key"], n_tiles, alias="_m")
    return (
        per.groupBy(
            "r_score",
            F.col("_f").cast("int").alias("f_score"),
            F.col("_m").cast("int").alias("m_score"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("_cents").alias("total_cents"),
        )
    )


def absorbing_chain(
    df: DataFrame,
    subject_col: str,
    ts_col: str,
    state_col: str,
    absorbing_states: Sequence[str],
    tiebreak_col: str | None = None,
    max_states: int = 50,
) -> DataFrame:
    """Absorbing Markov-chain summary from observed event sequences
    (Kemeny & Snell's fundamental matrix N = (I−Q)⁻¹) — the
    'expected touches before purchase/churn' analytics layer on top
    of the raw ``transition_matrix`` counts: per transient state,
    the expected number of steps to absorption t = N·1 and the
    absorption probability split B = N·R.

    Transitions come from each subject's time-ordered state sequence
    (a keyed lag window — a subject's span is its own event count,
    never the corpus; the ``events_transitions`` shape). A subject's
    sequence STOPS at its first absorbing state (post-absorption
    events are dropped — an absorbing state that re-emits would make
    the chain non-absorbing); rows after the last observed
    transition simply end (right-censored walks contribute the
    transitions they showed). Transient rows whose outgoing row sum
    is zero (a state seen only as a terminal observation) are
    dropped from Q with their flag published — they have no
    estimated dynamics.

    The count matrix collapses to ≤ S² cells (``max_states`` guard,
    named error) and the (I−Q) solve is driver-side numpy on that
    bounded grid — the shared_gamma_frailty driver-solve convention.
    Returns one row per (transient state, absorbing state):
    (from_state, n_out, expected_steps, absorbing_state, p_absorb),
    6 dp; expected_steps repeats per absorbing split of the same
    from_state.
    """
    import numpy as np

    absorbing = list(dict.fromkeys(absorbing_states))
    if not absorbing:
        raise ValueError(
            "absorbing_chain: absorbing_states must be non-empty"
        )
    order = [F.col(ts_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy("_s").orderBy(*order)
    seq = df.select(
        F.col(subject_col).alias("_s"),
        F.col(state_col).alias("_st"),
        *([F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col
                             else [])),
    )
    seq = seq.withColumn(
        "_seen_abs",
        F.coalesce(
            F.sum(
                F.col("_st").isin(absorbing).cast("long")
            ).over(
                Window.partitionBy("_s")
                .orderBy(*order)
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).filter(F.col("_seen_abs") == 0)
    seq = seq.withColumn("_next", F.lead("_st").over(w))
    trans = (
        seq.filter(F.col("_next").isNotNull())
        .groupBy(F.col("_st").alias("_from"),
                 F.col("_next").alias("_to"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # bounded collect: fetch at most max_states^2 + 1 cells so an
    # unbounded state column cannot flood the driver — the limit is
    # only reached when we are about to raise anyway
    cap = max_states * max_states
    rows = trans.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"absorbing_chain: transition cells exceed max_states^2="
            f"{cap} (state cardinality too high)"
        )
    states = sorted(
        {r["_from"] for r in rows} | {r["_to"] for r in rows}
        | set(absorbing)
    )
    if len(states) > max_states:
        raise ValueError(
            f"absorbing_chain: {len(states)} states exceeds "
            f"max_states={max_states}"
        )
    trans_states = [s for s in states if s not in set(absorbing)]
    counts = {(r["_from"], r["_to"]): r["_c"] for r in rows}
    out_sum = {
        s: sum(counts.get((s, t), 0) for t in states)
        for s in trans_states
    }
    live = [s for s in trans_states if out_sum[s] > 0]
    qn = len(live)
    qm = np.zeros((qn, qn))
    rm = np.zeros((qn, len(absorbing)))
    for i, s in enumerate(live):
        tot = float(out_sum[s])
        for j, t in enumerate(live):
            qm[i, j] = counts.get((s, t), 0) / tot
        for j, t in enumerate(absorbing):
            rm[i, j] = counts.get((s, t), 0) / tot
    # (I − Q) is singular exactly when some transient subchain has no
    # observed path to absorption (e.g. two states cycling into each
    # other with every walk censored) — surface the repo's named-error
    # convention instead of an opaque numpy LinAlgError (ADVICE r09)
    try:
        n_mat = np.linalg.inv(np.eye(qn) - qm)
    except np.linalg.LinAlgError:
        raise ValueError(
            "absorbing_chain: transient states with no observed path "
            "to absorption (I - Q is singular); every transient state "
            "must reach an absorbing state in the observed transitions"
        ) from None
    t_vec = n_mat @ np.ones(qn)
    b_mat = n_mat @ rm
    out = []
    for i, s in enumerate(live):
        for j, a in enumerate(absorbing):
            out.append(
                (
                    s,
                    int(out_sum[s]),
                    round(float(t_vec[i]), 6),
                    a,
                    round(float(b_mat[i, j]), 6),
                )
            )
    spark = df.sparkSession
    return spark.createDataFrame(
        out,
        "from_state string, n_out long, expected_steps double, "
        "absorbing_state string, p_absorb double",
    )
