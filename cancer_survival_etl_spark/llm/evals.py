"""Model- and data-evaluation metrics, exact and engine-portable.

Every metric here reduces to integer counts or deterministic rank
positions plus ONE mirrored final double expression — the same
exactness discipline as ``operators/stats.py`` — so evaluation runs
distributed over the full corpus (no sampling, no sklearn on a
driver-collected frame) and hash-matches an independent SQL engine.

At 100 TB these are the metrics a training pipeline computes where
the data lives: calibration of a quality/classifier score against
observed labels, ranking quality of a retrieval stage, agreement
between two annotator/model label columns, and n-gram overlap between
generated and reference text. Each is one or two aggregates; nothing
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table + expected calibration error inputs: scores in
    [0, 1] cut into ``n_bins`` equal-width bins; per bin the count, the
    mean score (rounded 6) and the observed positive rate (rounded 6).
    |mean_score − frac_pos| weighted by n/total is ECE — derivable
    downstream, kept un-aggregated here so the reliability DIAGRAM is
    the output. Score exactly 1.0 lands in the top bin (the standard
    clamp). One aggregate; bins are integers so bucketing is exact."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        df.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.col(score_col)), 6).alias("mean_score"),
            F.round(
                F.avg(F.col(label_col).cast("int").cast("double")), 6
            ).alias("frac_pos"),
        )
    )


def ndcg_at_k(
    ranked: DataFrame,
    k: int = 5,
    query_col: str = "query_id",
    rank_col: str = "rank_val",
    rel_col: str = "rel",
) -> DataFrame:
    """NDCG@k per query from an already-ranked result list with graded
    relevance: DCG = Σ_{pos≤k} (2^rel − 1)/log2(pos+1), IDCG = the
    same over the query's relevances sorted descending (ideal order),
    NDCG = DCG/IDCG (NULL when IDCG = 0 — no relevant item).

    The gain term is integer (2^rel − 1 for small integer grades); the
    only float is the final division and log2, mirrored verbatim by
    the oracle and rounded to 6. Two windows over one (query)
    clustering: the given rank order and the ideal (rel desc, rank
    asc) order. Returns (query, dcg, idcg, ndcg) with dcg/idcg rounded
    to 6."""
    gain = F.pow(F.lit(2.0), F.col(rel_col).cast("double")) - 1
    disc = F.log2(F.col(rank_col).cast("double") + 1)
    ideal_pos = F.row_number().over(
        Window.partitionBy(query_col).orderBy(
            F.col(rel_col).desc(), F.col(rank_col)
        )
    )
    per_row = ranked.select(
        query_col,
        F.when(F.col(rank_col) <= k, gain / disc)
        .otherwise(F.lit(0.0))
        .alias("_dcg_term"),
        ideal_pos.alias("_ipos"),
        F.col(rel_col).cast("double").alias("_rel"),
    ).select(
        query_col,
        "_dcg_term",
        F.when(
            F.col("_ipos") <= k,
            (F.pow(F.lit(2.0), F.col("_rel")) - 1)
            / F.log2(F.col("_ipos").cast("double") + 1),
        )
        .otherwise(F.lit(0.0))
        .alias("_idcg_term"),
    )
    agg = per_row.groupBy(query_col).agg(
        F.round(F.sum("_dcg_term"), 6).alias("dcg"),
        F.round(F.sum("_idcg_term"), 6).alias("idcg"),
    )
    return agg.select(
        query_col,
        "dcg",
        "idcg",
        F.when(
            F.col("idcg") > 0, F.round(F.col("dcg") / F.col("idcg"), 6)
        ).alias("ndcg"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
    group_cols=(),
) -> DataFrame:
    """Inter-annotator agreement: Cohen's κ between two categorical
    label columns — (p_o − p_e)/(1 − p_e) with observed agreement p_o
    and chance agreement p_e = Σ_c P_a(c)·P_b(c). The data-quality
    gate before trusting crowd/model labels.

    Exact integer counts end-to-end: n, agreements, and per-class
    marginals; the κ arithmetic is one mirrored double expression.
    Two aggregates over one scan shape (total + per-class marginal),
    joined on the (optional) group. κ is NULL when p_e = 1 (both
    raters constant — agreement is undefined, not perfect). Returns
    (group..., n_items, p_observed, p_expected, kappa), all rounded
    to 6."""
    g = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    a, b = F.col(rater_a_col), F.col(rater_b_col)
    tot = df.groupBy(*g).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum((a == b).cast("long")).alias("_agree"),
    )
    marg = (
        df.select(*g, a.alias("_c"), F.lit(1).alias("_is_a"))
        .unionByName(df.select(*g, b.alias("_c"), F.lit(0).alias("_is_a")))
        .groupBy(*g, "_c")
        .agg(
            F.sum(F.col("_is_a").cast("long")).alias("_na"),
            F.sum((1 - F.col("_is_a")).cast("long")).alias("_nb"),
        )
        .groupBy(*g)
        .agg(F.sum(F.col("_na") * F.col("_nb")).alias("_cross"))
    )
    joined = tot.join(marg, g) if g else tot.crossJoin(marg)
    n = F.col("_n").cast("double")
    po = F.col("_agree").cast("double") / n
    pe = F.col("_cross").cast("double") / (n * n)
    return joined.select(
        *g,
        F.col("_n").alias("n_items"),
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        F.when(pe < 1, F.round((po - pe) / (1 - pe), 6)).alias("kappa"),
    )


def _gram_count_pass(
    pairs: DataFrame,
    cand_col: str,
    ref_col: str,
    id_col: str,
    ns,
    ov_names,
    tot_names,
    ref_count: bool = False,
    lens: bool = False,
) -> DataFrame:
    """Shared Arrow pass of ``rouge_n``/``bleu_n`` (r11, guide §4.2):
    ONE ``mapInPandas`` over the Spark-tokenized (id, cand_tokens,
    ref_tokens) projection computes, per pair row, the clipped n-gram
    overlap and candidate totals for every ``n`` (exact longs), plus
    optionally the reference gram total and the token lengths — the
    quantities the former 2·len(ns) explode→groupBy→full-join passes
    shuffled the whole gram table for. Tokenization semantics are
    UNCHANGED (the identical ``split(trim(col), '\\s+')`` Catalyst
    expression produces the arrays; empty text still yields the ['']
    single empty token, NULL text a NULL array ≡ no grams and NULL
    length)."""
    from collections import Counter

    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    def toks(col):
        return F.split(F.trim(F.col(col)), r"\s+")

    src = pairs.select(
        F.col(id_col), toks(cand_col).alias("_ct"), toks(ref_col).alias("_rt")
    )
    fields = [src.schema.fields[0]]
    if lens:
        fields += [
            StructField("cand_len", IntegerType()),
            StructField("ref_len", IntegerType()),
        ]
    for i in range(len(ns)):
        fields += [
            StructField(ov_names[i], LongType()),
            StructField(tot_names[i], LongType()),
        ]
    if ref_count:
        fields.append(StructField("n_ref", LongType()))
    schema = StructType(fields)
    ns_ = [int(v) for v in ns]

    id_field = src.schema.fields[0].name

    def count_batches(it):
        def grams(tl, n):
            if tl is None or len(tl) < n:
                return Counter()
            if n == 1:
                return Counter(tl)
            return Counter(
                tuple(tl[i : i + n]) for i in range(len(tl) - n + 1)
            )

        for pdf in it:
            out = {id_field: pdf.iloc[:, 0]}
            cl = [
                None if t is None else list(t) for t in pdf.iloc[:, 1]
            ]
            rl = [
                None if t is None else list(t) for t in pdf.iloc[:, 2]
            ]
            if lens:
                out["cand_len"] = pd.array(
                    [None if t is None else len(t) for t in cl],
                    dtype="Int32",
                )
                out["ref_len"] = pd.array(
                    [None if t is None else len(t) for t in rl],
                    dtype="Int32",
                )
            refs = []
            for i, n in enumerate(ns_):
                ovs, tots = [], []
                for ct, rt in zip(cl, rl):
                    cg = grams(ct, n)
                    rg = grams(rt, n)
                    ovs.append(
                        sum(
                            min(c, rg[g])
                            for g, c in cg.items()
                            if g in rg
                        )
                    )
                    tots.append(sum(cg.values()))
                    if ref_count and i == 0:
                        refs.append(sum(rg.values()))
                out[ov_names[i]] = pd.array(ovs, dtype="int64")
                out[tot_names[i]] = pd.array(tots, dtype="int64")
            if ref_count:
                out["n_ref"] = pd.array(refs, dtype="int64")
            yield pd.DataFrame(out)

    return src.mapInPandas(count_batches, schema)


def rouge_n(
    pairs: DataFrame,
    cand_col: str = "candidate",
    ref_col: str = "reference",
    id_col: str = "pair_id",
    n: int = 2,
) -> DataFrame:
    """ROUGE-N between candidate and reference text columns: n-gram
    overlap recall/precision/F1 with CLIPPED counts (an n-gram matches
    at most as often as it appears in the reference — the official
    definition, not set intersection).

    Token n-grams from whitespace tokenization; counts are exact
    integers. Returns (pair_id, n_overlap, n_cand, n_ref, rouge_p,
    rouge_r, rouge_f1) — ratios rounded to 6, NULL when a side has no
    n-grams; a pair with no n-grams on EITHER side emits no row (the
    historical full-join shape). ``id_col`` identifies one row per
    pair (every caller's contract).

    r11 shape (guide §4.2): the metric is PER-PAIR ROW-LOCAL, so the
    clipped counts come from ONE Arrow ``mapInPandas`` pass over the
    Spark-tokenized arrays — no explode, no (pair, gram) shuffles, no
    full join, no re-derivation of the upstream pair plan per side.
    Tokens are still produced by the identical Spark ``split(trim())``
    expression (Java regex semantics preserved); Python only counts
    grams into exact longs, and the ratio tail below is the same
    expression as before — bit-identical rows (oracle-pinned)."""
    per = _gram_count_pass(
        pairs, cand_col, ref_col, id_col, [n],
        ov_names=["n_overlap"], tot_names=["n_cand"], ref_count=True,
    ).filter((F.col("n_cand") > 0) | (F.col("n_ref") > 0))
    p = F.col("n_overlap") / F.col("n_cand")
    rr = F.col("n_overlap") / F.col("n_ref")
    return per.select(
        id_col,
        "n_overlap",
        "n_cand",
        "n_ref",
        F.when(F.col("n_cand") > 0, F.round(p, 6)).alias("rouge_p"),
        F.when(F.col("n_ref") > 0, F.round(rr, 6)).alias("rouge_r"),
        F.when(
            (F.col("n_cand") > 0) & (F.col("n_ref") > 0),
            F.when(
                F.col("n_overlap") > 0,
                F.round(2 * p * rr / (p + rr), 6),
            ).otherwise(F.lit(0.0)),
        ).alias("rouge_f1"),
    )


def bleu_n(
    pairs: DataFrame,
    cand_col: str = "candidate",
    ref_col: str = "reference",
    id_col: str = "pair_id",
    max_n: int = 2,
) -> DataFrame:
    """Sentence-level BLEU-N: geometric mean of clipped n-gram
    precisions for n = 1..``max_n``, times the brevity penalty
    BP = min(1, exp(1 − ref_len/cand_len)) — the Papineni et al.
    definition with the standard "zero if any precision is zero"
    smoothing-free convention (report the zero; smoothing variants
    belong upstream of the metric, not silently inside it).

    Counts are the same clipped integers as ``rouge_n``; lengths are
    token counts. The only floats are exp/log in one mirrored final
    expression, rounded to 6. Returns (pair_id, cand_len, ref_len,
    p1..p{max_n}, bleu). ``id_col`` identifies one row per pair.

    r11 shape (guide §4.2): all max_n clipped-precision numerators and
    denominators plus both lengths come from the ONE shared Arrow pass
    (``_gram_count_pass``) instead of 2·max_n explode→groupBy→full-join
    passes plus a lens scan, each re-deriving the upstream pair plan;
    the precision/BP/geomean tail below is the unchanged expression
    over the identical exact longs — bit-identical rows."""
    ns = list(range(1, max_n + 1))
    out = _gram_count_pass(
        pairs, cand_col, ref_col, id_col, ns,
        ov_names=[f"_ov{n}" for n in ns],
        tot_names=[f"_tot{n}" for n in ns],
        lens=True,
    )
    pcols = []
    for n in ns:
        pcols.append(
            F.when(
                F.coalesce(F.col(f"_tot{n}"), F.lit(0)) > 0,
                F.round(
                    F.coalesce(F.col(f"_ov{n}"), F.lit(0))
                    / F.col(f"_tot{n}").cast("double"),
                    6,
                ),
            ).alias(f"p{n}")
        )
    out = out.select(id_col, "cand_len", "ref_len", *pcols)
    prod = F.lit(1.0)
    allpos = F.lit(True)
    for n in range(1, max_n + 1):
        prod = prod * F.col(f"p{n}")
        allpos = allpos & (F.coalesce(F.col(f"p{n}"), F.lit(0.0)) > 0)
    bp = F.least(
        F.lit(1.0),
        F.exp(
            F.lit(1.0)
            - F.col("ref_len").cast("double")
            / F.col("cand_len").cast("double")
        ),
    )
    bleu = F.when(
        (F.col("cand_len") > 0) & (F.col("ref_len") > 0),
        F.when(
            allpos,
            F.round(
                bp * F.pow(prod, F.lit(1.0 / max_n)),
                6,
            ),
        ).otherwise(F.lit(0.0)),
    )
    return out.select(
        id_col, "cand_len", "ref_len", *[f"p{n}" for n in range(1, max_n + 1)],
        bleu.alias("bleu"),
    )


def confusion_stats(
    df: DataFrame,
    actual_col: str,
    predicted_col: str,
) -> DataFrame:
    """Per-class precision / recall / F1 from exact confusion counts —
    the multi-class classifier report, computed corpus-wide in two
    aggregates (true-positive counts per class + the two marginals)
    with one mirrored ratio expression. Classes appearing only in
    actuals or only in predictions still get a row (the other side's
    marginal is 0 → NULL precision or recall; F1 NULL unless both
    defined). Returns (label, n_actual, n_predicted, n_correct,
    precision, recall, f1), ratios rounded to 6."""
    a, p = F.col(actual_col), F.col(predicted_col)
    tp = (
        df.filter(a == p)
        .groupBy(a.alias("label"))
        .agg(F.count(F.lit(1)).alias("n_correct"))
    )
    na = df.groupBy(a.alias("label")).agg(
        F.count(F.lit(1)).alias("n_actual")
    )
    np_ = df.groupBy(p.alias("label")).agg(
        F.count(F.lit(1)).alias("n_predicted")
    )
    j = (
        na.join(np_, "label", "full")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("n_actual", F.lit(0)).alias("n_actual"),
            F.coalesce("n_predicted", F.lit(0)).alias("n_predicted"),
            F.coalesce("n_correct", F.lit(0)).alias("n_correct"),
        )
    )
    prec = F.col("n_correct") / F.col("n_predicted").cast("double")
    rec = F.col("n_correct") / F.col("n_actual").cast("double")
    return j.select(
        "label",
        "n_actual",
        "n_predicted",
        "n_correct",
        F.when(F.col("n_predicted") > 0, F.round(prec, 6)).alias("precision"),
        F.when(F.col("n_actual") > 0, F.round(rec, 6)).alias("recall"),
        F.when(
            (F.col("n_predicted") > 0)
            & (F.col("n_actual") > 0),
            F.when(
                F.col("n_correct") > 0,
                F.round(2 * prec * rec / (prec + rec), 6),
            ).otherwise(F.lit(0.0)),
        ).alias("f1"),
    )


def group_kfold(
    df: DataFrame,
    group_col: str,
    n_folds: int = 5,
    fold_col: str = "fold",
) -> DataFrame:
    """Leakage-safe k-fold assignment: every row of a GROUP lands in
    the same fold (fold = md5(group) mod k via the first 8 hex chars —
    deterministic, engine-portable, no shuffle beyond a projection),
    so group-correlated rows can never straddle train/validation — the
    GroupKFold discipline that prevents the classic
    duplicated-entity leak in CV estimates."""
    h = F.conv(
        F.substring(F.md5(F.col(group_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return df.withColumn(fold_col, (h % n_folds).cast("int"))


def isotonic_calibrate(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 100,
) -> DataFrame:
    """Isotonic calibration: fit the best monotone-non-decreasing map
    from score to observed positive rate (pool-adjacent-violators) —
    the non-parametric recalibration step when the reliability diagram
    (``calibration_bins``) shows a miscalibrated but rank-faithful
    scorer.

    Distributed shape: the corpus collapses to ``n_bins`` exact
    (n, n_pos) pairs in ONE aggregate; PAVA then runs driver-side on
    that bounded frame (the algorithm is inherently sequential, but
    its input is #bins rows by construction — never raw data) and the
    fitted step function returns as a broadcastable frame. All pool
    arithmetic is exact integers until the final ratio; equal-rate
    plateaus merge deterministically. Returns (bin, n, n_pos,
    calibrated) with calibrated rounded to 6, monotone by
    construction.
    """
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    bins = (
        df.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(label_col).cast("long")).alias("n_pos"),
        )
        .orderBy("bin")
        .collect()
    )
    # PAVA: pools of (n, n_pos); merge while a pool's rate drops below
    # its predecessor's (compare cross-multiplied integers — no float
    # in the merge decision)
    pools: list[list[int]] = []  # [bin_lo, bin_hi, n, n_pos]
    for r in bins:
        pools.append([r["bin"], r["bin"], r["n"], r["n_pos"]])
        while len(pools) > 1 and (
            pools[-2][3] * pools[-1][2] >= pools[-1][3] * pools[-2][2]
        ):
            lo, _, n1, p1 = pools[-2]
            _, hi, n2, p2 = pools[-1]
            pools[-2:] = [[lo, hi, n1 + n2, p1 + p2]]
    out = []
    for lo, hi, n, p in pools:
        for r in bins:
            if lo <= r["bin"] <= hi:
                out.append((r["bin"], r["n"], r["n_pos"], round(p / n, 6)))
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "bin int, n bigint, n_pos bigint, calibrated double"
    )


def isotonic_fit(
    df: DataFrame,
    score_col: str,
    label_col: str,
    precision: int = 6,
    start_buckets: int = 64,
    fan_in: int = 8,
) -> DataFrame:
    """UNBINNED isotonic regression — PAVA over every distinct
    (quantized) score, not a fixed bin grid — fully distributed: no
    driver-side pool loop, no single task holding the raw data
    (the handoff item behind ``isotonic_calibrate``'s bounded-bins
    design; VERDICT r2 §next/5-6 lineage).

    Why this distributes: PAVA's pooling decisions are FORCED — any
    adjacent violator pair must share a pool in the optimum — so
    pooling a contiguous score range locally and re-merging the
    surviving pool boundaries later reaches the same unique fixed
    point as one sequential pass. The cascade:

    1. collapse to exact integer cells per quantized score (one
       map-combined aggregate; 10^precision bounds the state — 6 dp
       scores give ≤ ~2M cells at ANY corpus size);
    2. rounds of bucketed PAVA: range-bucket pools by score
       (``width_bucket`` over the once-computed global bounds), run
       the stack merge per bucket inside ``applyInPandas``, divide
       the bucket count by ``fan_in``; after the 1-bucket round the
       pools are the global optimum. Each round only ever SHRINKS the
       frame, and the final single task scans surviving pools, not
       raw rows. Merge decisions compare cross-multiplied integers —
       no float ever decides a pool.

    Returns one row per quantized score: (score, n, n_pos,
    calibrated), calibrated = its pool's exact rate rounded to 6,
    monotone non-decreasing by construction."""
    import pandas as pd

    cells = (
        df.groupBy(F.round(F.col(score_col), precision).alias("score"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(label_col).cast("long")).alias("n_pos"),
        )
    )
    cells = cells.localCheckpoint(eager=False)
    bounds = cells.agg(
        F.min("score").alias("_lo"), F.max("score").alias("_hi")
    )

    def pava(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("lo")
        pools: list[list] = []  # [lo, hi, n, p]
        for lo, hi, n, p in zip(pdf["lo"], pdf["hi"], pdf["n"],
                                pdf["n_pos"]):
            pools.append([lo, hi, int(n), int(p)])
            while len(pools) > 1 and (
                pools[-2][3] * pools[-1][2]
                >= pools[-1][3] * pools[-2][2]
            ):
                a, b = pools[-2], pools[-1]
                pools[-2:] = [[a[0], b[1], a[2] + b[2], a[3] + b[3]]]
        return pd.DataFrame(
            pools, columns=["lo", "hi", "n", "n_pos"]
        )

    pools = cells.select(
        F.col("score").alias("lo"),
        F.col("score").alias("hi"),
        "n",
        "n_pos",
    )
    schema = "lo double, hi double, n long, n_pos long"
    p = start_buckets
    while True:
        bucketed = pools.join(F.broadcast(bounds)).withColumn(
            "_b",
            F.width_bucket(
                "lo", "_lo", F.col("_hi") + F.lit(1e-9), F.lit(p)
            ),
        )
        pools = (
            bucketed.groupBy("_b")
            .applyInPandas(
                lambda pdf: pava(pdf[["lo", "hi", "n", "n_pos"]]), schema
            )
        )
        if p == 1:
            break
        p = max(1, p // fan_in)

    rate = F.round(
        F.col("n_pos_pool").cast("double") / F.col("n_pool"), 6
    )
    seg = pools.select(
        "lo",
        "hi",
        F.col("n").alias("n_pool"),
        F.col("n_pos").alias("n_pos_pool"),
    )
    return (
        cells.join(
            F.broadcast(seg),
            (F.col("score") >= F.col("lo"))
            & (F.col("score") <= F.col("hi")),
        )
        .select("score", "n", "n_pos", rate.alias("calibrated"))
    )
