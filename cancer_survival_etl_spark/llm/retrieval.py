"""Sparse retrieval and corpus-fit scoring for training-data pipelines:
BM25 top-k search, add-alpha n-gram language-model scoring (CCNet-style
quality signal), and DSIR hashed-n-gram importance weighting.

Beyond-reference extensions (the reference — a small NHS ETL stack, see
SURVEY.md — has no retrieval operators; these follow published public
designs: Robertson/Sparck-Jones BM25 with Lucene's non-negative idf,
CCNet's LM-perplexity bucketing [Wenzek et al. 2020], and DSIR
[Xie et al. 2023] hashed-n-gram importance resampling).

Scale notes
-----------
- BM25: the corpus side is reduced to term-frequency postings
  (doc, token, tf) — ONE shuffle of the corpus tokens, reused for both
  document length and document frequency. The query set is tiny by
  definition (a retrieval batch), so its distinct terms are broadcast
  and the postings stream through a map-side semi-join BEFORE the
  document-frequency aggregate: df is computed only for terms some
  query mentions, never for the full vocabulary. Per-query top-k is a
  window over (query_id), which AQE splits per query key — no global
  sort.
- LM scoring: the model is (n-1-gram, n-gram) count tables from the
  reference corpus. Natural-language vocabularies are Heaps-bounded, so
  both tables broadcast (a 10^5-vocab bigram table observed in real
  corpora is ~10^7 rows max, far under executor memory); flip
  ``broadcast_model=False`` and the same plan runs as shuffle joins.
  Scoring streams the corpus once: explode positional n-grams, two
  hash joins, one groupBy(doc).
- DSIR: feature space is HASHED to ``n_buckets`` (the whole point of
  the published design — the model is a fixed-width vector independent
  of vocabulary size). Bucket stats for target and source are two
  tiny aggregates (≤ n_buckets rows) joined into one broadcast
  log-ratio table; per-doc weights are one groupBy(doc) over bucket
  counts. Nothing in the plan grows with vocabulary.

Float determinism (the repo's oracle contract): every per-term /
per-gram partial is rounded to 6 decimals and widened to an exact
integer micro-unit (×10^6, bigint) BEFORE the additive aggregate, so
sums are order-free and bit-identical across engines and partitionings
— same idiom as the exact-cents money sums. Logs are taken on
identically-constructed expressions and rounded before the widening.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _micro(x: Column) -> Column:
    """Exact order-free additive unit: round to 6 dp, widen to bigint."""
    return F.round(x * F.lit(1000000.0), 0).cast("long")


def _portable_bucket(token: Column, n_buckets: int) -> Column:
    """Engine-portable stable hash bucket: first 8 hex chars of md5 →
    32-bit int → mod. Mirrors the DuckDB idiom
    ``CAST(concat('0x', substring(md5(t),1,8)) AS BIGINT) % B``."""
    return (
        F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def _positional_ngrams(text_col: str, n: int) -> Column:
    """ALL token n-grams in order (duplicates kept — this is a language
    model's event stream, not a dedup set). Empty array for docs with
    fewer than ``n`` tokens."""
    toks = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    # sequence(1, 0) counts DOWN in Spark — guard short docs explicitly.
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-``k`` documents per query.

    Lucene's non-negative idf ``ln(1 + (N - df + 0.5)/(df + 0.5))`` and
    the standard tf saturation ``tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))``.
    Repeated query terms count once (bag-of-words query, set semantics —
    the common search-engine contract). Returns
    (query_id, doc_id, score, rank_val), rank ties broken by doc_id.

    Determinism: each term's contribution is rounded to 6 dp and summed
    in exact integer micro-units, so the score is independent of join
    order and partitioning; ranking happens on the exact sum.
    """
    toks = docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("_tok")
    )
    # (doc, token, tf) postings: the single corpus-wide shuffle, reused
    # for dl, df, and the probe side. Checkpoint so the three consumers
    # read materialized partials instead of re-running scan+explode.
    tf = (
        toks.groupBy(id_col, "_tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl")).localCheckpoint(
        eager=False
    )
    # corpus stats stay a LAZY one-row frame cross-joined broadcast —
    # no driver collect, no extra pass over the postings
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    qterms = queries.select(
        query_id_col,
        F.explode(
            F.array_distinct(F.split(F.col(query_text_col), " "))
        ).alias("_tok"),
    )
    # df only for terms some query mentions: semi-join postings against
    # the broadcast query-term set BEFORE the df aggregate.
    qvocab = F.broadcast(qterms.select("_tok").distinct())
    dfreq = (
        tf.join(qvocab, "_tok", "left_semi")
        .groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tfnorm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    hits = (
        tf.join(F.broadcast(qterms), "_tok")
        .join(F.broadcast(dfreq), "_tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            query_id_col, id_col, _micro(idf * tfnorm).alias("_term_micro")
        )
    )
    from pyspark.sql import Window

    scored = hits.groupBy(query_id_col, id_col).agg(
        F.sum("_term_micro").alias("_score_micro")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("_score_micro"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank_val", F.row_number().over(w))
        .filter(F.col("rank_val") <= k)
        .select(
            query_id_col,
            id_col,
            (F.col("_score_micro") / F.lit(1000000.0)).alias("score"),
            "rank_val",
        )
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    query_vec_col: str = "query_vec",
    k: int = 10,
    n_candidates: int = 100,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid sparse+dense retrieval: BM25 candidate generation, dense
    cosine re-rank over the candidates only, reciprocal-rank fusion
    (RRF, Cormack et al. 2009: score = 1/(rrf_k + sparse_rank) +
    1/(rrf_k + dense_rank)).

    RRF is the fusion rule precisely BECAUSE it is rank-based: the two
    retrieval scores live on incomparable scales, and ranks are exact
    integers, so the fused score is two IEEE divisions and one add —
    bit-identical across engines, no weight tuning, no float-sum
    ordering concerns. Final ties broken by doc id.

    Scale: BM25 narrows the corpus to ``n_candidates`` docs per query
    BEFORE any dense work, so the embedding join touches only
    |queries|·n_candidates rows — the standard two-stage
    retrieve-then-rerank architecture; the dense side never scans the
    full embedding table.

    ``queries`` must carry (query_id, query_text, query_vec).
    Returns (query_id, doc_id, bm25_rank, dense_rank, rrf_score,
    rank_val).
    """
    from pyspark.sql import Window

    sparse = bm25_topk(
        docs,
        queries,
        text_col=text_col,
        id_col=id_col,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
        k=n_candidates,
    ).select(
        query_id_col, id_col, F.col("rank_val").alias("bm25_rank")
    )
    emb = embeddings.select(
        F.col(vec_id_col).alias(id_col),
        F.col(vec_col).cast("array<double>").alias("_dv"),
    )
    qv = queries.select(
        query_id_col, F.col(query_vec_col).cast("array<double>").alias("_qv")
    )
    cand = sparse.join(emb, id_col).join(F.broadcast(qv), query_id_col)
    dot = F.aggregate(
        F.zip_with("_dv", "_qv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cosine = F.round(dot / (norm(F.col("_dv")) * norm(F.col("_qv"))), 6)
    wd = Window.partitionBy(query_id_col).orderBy(
        F.desc("_cos"), F.asc(id_col)
    )
    ranked = (
        cand.withColumn("_cos", cosine)
        .withColumn("dense_rank", F.row_number().over(wd))
        .select(query_id_col, id_col, "bm25_rank", "dense_rank")
    )
    rrf = F.round(
        F.lit(1.0) / (F.lit(rrf_k) + F.col("bm25_rank"))
        + F.lit(1.0) / (F.lit(rrf_k) + F.col("dense_rank")),
        9,
    )
    wf = Window.partitionBy(query_id_col).orderBy(
        F.desc("rrf_score"), F.asc(id_col)
    )
    return (
        ranked.withColumn("rrf_score", rrf)
        .withColumn("rank_val", F.row_number().over(wf))
        .filter(F.col("rank_val") <= k)
    )


def ngram_lm_score(
    docs: DataFrame,
    lm_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    alpha: float = 1.0,
    broadcast_model: bool = True,
) -> DataFrame:
    """CCNet-style corpus-fit scoring: train an add-``alpha`` smoothed
    token ``n``-gram LM on ``lm_docs`` (the reference corpus) and score
    every document in ``docs`` by average negative log-likelihood per
    n-gram — low = in-domain fluent text, high = noise/outliers.
    Perplexity is ``exp(avg_nll)``, monotone in the returned score.

    p(w_n | w_1..w_{n-1}) = (c(gram) + α) / (c(context) + α·V), with
    V = distinct context count in the LM corpus (+1 for unseen). Unseen
    contexts back off to the uniform α/(α·V) floor.

    Returns (id, n_ngrams, avg_nll); docs shorter than ``n`` tokens get
    n_ngrams = 0 and NULL avg_nll.
    """
    grams_lm = lm_docs.select(
        F.explode(_positional_ngrams(text_col, n)).alias("_gram")
    )
    # ONE pass over the LM corpus: the gram histogram. Context counts
    # and vocabulary both derive from it (Heaps-bounded rows), so
    # training never re-scans the corpus.
    gram_counts = (
        grams_lm.groupBy("_gram")
        .agg(F.count(F.lit(1)).alias("_cg"))
        .localCheckpoint(eager=False)
    )
    ctx_of = (
        F.substring_index(F.col("_gram"), " ", n - 1) if n > 1 else F.lit("")
    )
    ctx_counts = gram_counts.groupBy(ctx_of.alias("_ctx")).agg(
        F.sum("_cg").alias("_cc")
    )
    # +1 for the unseen-token mass; stays a lazy one-row frame
    vsize = (
        gram_counts.select(
            F.substring_index(F.col("_gram"), " ", -1).alias("_w")
        )
        .distinct()
        .agg((F.count(F.lit(1)) + F.lit(1)).alias("_v"))
    )

    gmodel = F.broadcast(gram_counts) if broadcast_model else gram_counts
    cmodel = F.broadcast(ctx_counts) if broadcast_model else ctx_counts

    ev = docs.select(
        id_col, F.explode(_positional_ngrams(text_col, n)).alias("_gram")
    ).withColumn(
        "_ctx", F.substring_index(F.col("_gram"), " ", n - 1) if n > 1 else F.lit("")
    )
    nll = -F.log(
        (F.coalesce(F.col("_cg"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("_cc"), F.lit(0)) + F.lit(alpha) * F.col("_v"))
    )
    scored = (
        ev.join(gmodel, "_gram", "left")
        .join(cmodel, "_ctx", "left")
        .crossJoin(F.broadcast(vsize))
        .select(id_col, _micro(nll).alias("_nll_micro"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum("_nll_micro").alias("_sum_micro"),
        )
    )
    base = docs.select(id_col).join(scored, id_col, "left")
    return base.select(
        id_col,
        F.coalesce(F.col("n_ngrams"), F.lit(0)).alias("n_ngrams"),
        F.when(
            F.coalesce(F.col("n_ngrams"), F.lit(0)) > 0,
            F.round(
                F.col("_sum_micro")
                / F.lit(1000000.0)
                / F.col("n_ngrams"),
                6,
            ),
        ).alias("avg_nll"),
    )


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR (Data Selection via Importance Resampling, Xie et al. 2023)
    importance weights: hash every token of ``docs`` (the raw pool) and
    ``target`` (the wanted distribution, e.g. curated text) into
    ``n_buckets``, fit add-``alpha`` smoothed bucket distributions
    p_target and p_source, and weight each raw document by its
    log-likelihood ratio  Σ_b c_doc[b]·ln(p_target[b]/p_source[b]).

    High weight = looks like the target. Compose with
    ``weighted_hash_sample`` (Gumbel-style deterministic resampling) to
    realize the published resampling step.

    Returns (id, n_feats, weight): weight is the per-doc log-ratio sum
    in exact micro-units / 10^6; n_feats the token count.
    """
    def buckets(df: DataFrame) -> DataFrame:
        return df.select(
            F.explode(F.split(F.col(text_col), " ")).alias("_tok")
        ).select(_portable_bucket(F.col("_tok"), n_buckets).alias("_b"))

    # Bucket histograms are ≤ n_buckets rows; totals derive from them
    # as lazy one-row frames — no driver collect, each corpus scanned
    # exactly once.
    tgt = (
        buckets(target)
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_ct"))
        .localCheckpoint(eager=False)
    )
    src = (
        buckets(docs)
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_cs"))
        .localCheckpoint(eager=False)
    )
    nt = tgt.agg(F.coalesce(F.sum("_ct"), F.lit(0)).alias("_nt"))
    ns = src.agg(F.coalesce(F.sum("_cs"), F.lit(0)).alias("_ns"))

    # One broadcast log-ratio table, λ[b] rounded to 6 dp (micro-exact
    # downstream). Buckets unseen on a side get the smoothing floor.
    lam = (
        src.join(tgt, "_b", "full")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(ns))
        .select(
            "_b",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(alpha))
                        / (F.col("_nt") + F.lit(alpha * n_buckets))
                    )
                    / (
                        (F.coalesce(F.col("_cs"), F.lit(0)) + F.lit(alpha))
                        / (F.col("_ns") + F.lit(alpha * n_buckets))
                    )
                ),
                6,
            ).alias("_lam"),
        )
    )
    doc_feats = docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("_tok")
    ).select(id_col, _portable_bucket(F.col("_tok"), n_buckets).alias("_b"))
    return (
        doc_feats.join(F.broadcast(lam), "_b", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(
                F.round(F.col("_lam") * F.lit(1000000.0), 0).cast("long")
            ).alias("_w_micro"),
        )
        .select(
            id_col,
            "n_feats",
            (F.col("_w_micro") / F.lit(1000000.0)).alias("weight"),
        )
    )


def diversify_topk_cap(
    scored: DataFrame,
    k: int = 5,
    cap: int = 2,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    score_col: str = "score",
    category_col: str = "category",
) -> DataFrame:
    """Category-capped result diversification: the top-``k`` items per
    query by score, but never more than ``cap`` from one category —
    the search-engine "at most two results per site" rule, and the
    cheap high-recall sibling of MMR re-ranking.

    Two stacked row_numbers over the same (query) clustering: rank
    within (query, category) to apply the cap, then rank the
    survivors. Both orderings carry the item id as a total-order
    tie-break, so the selection is deterministic and engine-portable.
    One shuffle; candidate lists are already per-query small (an ANN
    shortlist), so the windows are cheap.

    Returns (query, item, category, score, rank_val).
    """
    wc = Window.partitionBy(query_col, category_col).orderBy(
        F.col(score_col).desc(), F.col(item_col)
    )
    wq = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(item_col)
    )
    return (
        scored.withColumn("_cat_rn", F.row_number().over(wc))
        .filter(F.col("_cat_rn") <= cap)
        .withColumn("rank_val", F.row_number().over(wq))
        .filter(F.col("rank_val") <= k)
        .select(query_col, item_col, category_col, score_col, "rank_val")
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rel_col: str = "cosine",
    vec_col: str = "vec",
) -> DataFrame:
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein '98):
    greedily build the result list by picking, at each step, the
    candidate maximizing λ·relevance − (1−λ)·max-similarity-to-already-
    selected — relevance tempered by redundancy, the classic
    diversified retrieval re-rank.

    The greedy loop runs AT RUNTIME as one ``F.aggregate`` fold over
    ``sequence(1, k)`` with state (selected list) — a constant-size
    expression regardless of k. (The tempting alternative — unrolling
    k chained selects — is a trap: CollapseProject inlines the
    selection expression ~8× per step and the plan grows
    exponentially; measured 2.3 MB of task binary by k=3.) Each step
    filters chosen ids, scores the remainder with higher-order array
    functions, and argmaxes on (round(score, 6), lowest id) via
    array_sort — fully deterministic. One shuffle: the per-query
    collect of an already-bounded ANN shortlist.

    Scoring is MICRO-UNIT EXACT: λ is quantized to tenths and the
    step score is the INTEGER 10λ·rel_µ − (10−10λ)·sim_µ (µ = value
    ×10⁶, already-rounded inputs are exact on that lattice) — no float
    round of a product like 0.7×(6-dp value), which lands on decimal
    half-way points ~10% of the time and splits engines that round
    binary doubles (DuckDB) from engines that round the decimal
    rendering (Spark's HALF_UP). Candidate vectors must be
    pre-normalized if ``rel_col``/pairwise dot are to be cosines.
    Returns (query, item, mmr_score_micro, rank_val); divide by 10⁷
    for the conventional λ-weighted value.
    """
    evs = F.collect_list(
        F.struct(
            F.col(item_col).alias("id"),
            F.col(rel_col).cast("double").alias("rel"),
            F.col(vec_col).alias("v"),
        )
    )
    g = candidates.groupBy(query_col).agg(evs.alias("_cand"))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    lam10 = round(lam * 10)
    zero = F.array().cast(
        "array<struct<id:long,score:bigint,v:array<double>>>"
    )

    def step(sel, _i):
        remaining = F.filter(
            F.col("_cand"),
            lambda c: ~F.exists(sel, lambda s: s["id"] == c["id"]),
        )
        scored = F.transform(
            remaining,
            lambda c: F.struct(
                (
                    F.lit(lam10)
                    * F.round(c["rel"] * 1e6).cast("bigint")
                    - F.coalesce(
                        F.when(
                            F.size(sel) > 0,
                            F.lit(10 - lam10)
                            * F.array_max(
                                F.transform(
                                    sel,
                                    lambda s: F.round(
                                        dot(c["v"], s["v"]) * 1e6
                                    ).cast("bigint"),
                                )
                            ),
                        ),
                        F.lit(0).cast("bigint"),
                    )
                ).alias("score"),
                (-c["id"]).alias("negid"),
                c["id"].alias("id"),
                c["v"].alias("v"),
            ),
        )
        # argmax on (score, then LOWEST id): sort ascending and take last
        best = F.element_at(F.array_sort(scored), -1)
        return F.when(
            F.size(remaining) > 0,
            F.concat(
                sel,
                F.array(
                    F.struct(
                        best["id"].alias("id"),
                        best["score"].alias("score"),
                        best["v"].alias("v"),
                    )
                ),
            ),
        ).otherwise(sel)

    folded = F.aggregate(F.sequence(F.lit(1), F.lit(k)), zero, step)
    return (
        g.select(query_col, folded.alias("_sel"))
        .select(query_col, F.posexplode("_sel").alias("_i", "_s"))
        .select(
            query_col,
            F.col("_s.id").alias(item_col),
            F.col("_s.score").alias("mmr_score_micro"),
            (F.col("_i") + 1).alias("rank_val"),
        )
    )
