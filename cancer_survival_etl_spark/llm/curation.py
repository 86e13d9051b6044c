"""Corpus curation for training-data pipelines: benchmark
decontamination, context-window chunking, and sequence packing.

Beyond-reference extensions (the reference — a small NHS ETL stack,
see SURVEY.md — has no corpus operators; these follow the shapes a
pretraining data pipeline needs at 100 TB).

Scale notes
-----------
- Decontamination joins the corpus's exploded n-grams against the
  *benchmark* gram set. Benchmarks are small (thousands of docs), so
  the eval side is distinct-ed and broadcast: the big side streams
  through a map-side hash join with zero shuffle of the corpus grams.
- Grams are joined on ``xxhash64`` of the gram string (8 bytes instead
  of a variable-length shuffle key); the hash never reaches output.
- Chunking is a pure narrow transform (split → sequence → explode):
  no shuffle at all; parallelism is whatever the scan provides (callers
  on few-partition inputs should ``fan_out`` first).
- Packing needs a *global* prefix sum, which a naive
  ``Window.orderBy`` computes on ONE task. ``global_prefix_sum`` in
  operators/windows.py does it in two phases (range partition → local
  cumsum + tiny per-partition offset broadcast), so packing scales to
  any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cancer_survival_etl_spark.llm.dedup import (
    _token_ngrams,
    band_keys_long,
    minhash_signatures,
)
from cancer_survival_etl_spark.operators.partitioning import fan_out
from cancer_survival_etl_spark.operators.windows import global_prefix_sum


def contamination(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: per training document, how many of its
    distinct token ``n``-grams also occur anywhere in ``eval_df`` (the
    benchmark/eval corpus).

    Returns (id, n_grams, n_contaminated, contamination_ratio,
    is_contaminated); the downstream filter is
    ``filter(~is_contaminated)`` (strict) or a ratio threshold (loose).

    Documents shorter than ``n`` tokens contribute one truncated gram
    (their full text), matching ``_token_ngrams``'s floor of 1 — a
    short doc identical to a benchmark string is still contamination.
    """
    grams = train.select(
        id_col, F.explode(_token_ngrams(text_col, n)).alias("_gram")
    ).select(id_col, F.xxhash64("_gram").alias("_gk"))
    ev = (
        eval_df.select(F.explode(_token_ngrams(text_col, n)).alias("_gram"))
        .select(F.xxhash64("_gram").alias("_gk"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    hits = grams.join(F.broadcast(ev), "_gk", "left")
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_contaminated"),
        )
        .select(
            id_col,
            "n_grams",
            "n_contaminated",
            F.round(
                F.col("n_contaminated") / F.col("n_grams"), 6
            ).alias("contamination_ratio"),
            (F.col("n_contaminated") > 0).alias("is_contaminated"),
        )
    )


def bloom_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """``contamination`` for eval sets too large to broadcast exactly:
    a Bloom-filter prefilter built in PURE DataFrame ops, followed by an
    exact verify — output is IDENTICAL to ``contamination`` (the filter
    only prunes; no false negatives by construction), which is what the
    oracle checks.

    Build: each eval gram sets ``k`` bit positions (independent
    xxhash64 seeds); the filter is the ``bit_or`` aggregate of 64-bit
    words keyed by word index — ≤ n_bits/64 rows total (a 1-Gbit
    filter is 16M rows ≈ 256 MB, broadcastable where the raw gram set
    is not; the gram set itself would be TBs at that point). Probe:
    corpus grams explode their k (word, mask) probes, hash-join the
    broadcast word table, and survive only if ALL k bits are set.
    Exact verify: only the bloom-positive grams (true matches +
    ~(1−e^{−kn/m})^k false-positive rate of the corpus gram volume)
    enter the shuffle join against the deduped 8-byte eval hash set.
    The corpus never shuffles its raw grams anywhere.
    """
    n_words = n_bits // 64

    def positions(grams: DataFrame) -> DataFrame:
        probes = F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(k)),
                lambda i: F.pmod(F.xxhash64("_gk", i), F.lit(n_bits)),
            )
        )
        return grams.select("*", probes.alias("_pos")).select(
            "*",
            (F.col("_pos") / 64).cast("long").alias("_word"),
            # pyspark's shiftleft() only takes a literal shift — the
            # column-shift form needs the SQL expression
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"
            ).alias("_mask"),
        )

    ev = eval_df.select(
        F.explode(_token_ngrams(text_col, n)).alias("_gram")
    ).select(F.xxhash64("_gram").alias("_gk"))
    ev_hashes = ev.distinct().localCheckpoint(eager=False)
    bloom = (
        positions(ev_hashes)
        .groupBy("_word")
        .agg(F.bit_or("_mask").alias("_bits"))
        .localCheckpoint(eager=False)
    )

    grams = train.select(
        id_col, F.explode(_token_ngrams(text_col, n)).alias("_gram")
    ).select(id_col, F.xxhash64("_gram").alias("_gk"))
    probed = (
        positions(grams)
        .join(F.broadcast(bloom), "_word", "left")
        .select(
            id_col,
            "_gk",
            (
                F.col("_bits").isNotNull()
                & (
                    F.col("_bits").bitwiseAND(F.col("_mask"))
                    == F.col("_mask")
                )
            ).cast("int").alias("_hit"),
        )
        .groupBy(id_col, "_gk")
        .agg(F.sum("_hit").alias("_hits"))
    )
    candidates = probed.filter(F.col("_hits") == k).select(id_col, "_gk")
    verified = candidates.join(
        ev_hashes.withColumn("_match", F.lit(1)), "_gk", "left"
    )
    per_doc_matches = verified.groupBy(id_col).agg(
        F.count("_match").alias("n_contaminated")
    )
    totals = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        totals.join(per_doc_matches, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.round(
                F.coalesce("n_contaminated", F.lit(0)) / F.col("n_grams"), 6
            ).alias("contamination_ratio"),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).alias(
                "is_contaminated"
            ),
        )
    )


def fuzzy_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 5,
    bands: int = 2,
    rows_per_band: int = 4,
    ngram_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """FUZZY benchmark decontamination: near-duplicate matches BETWEEN
    the training corpus and the eval/benchmark corpus — catches
    paraphrased or lightly-edited benchmark leakage that the exact
    n-gram ``contamination`` check misses.

    MinHash-LSH cross-banding generates candidates (train docs whose
    signature agrees with some eval doc on all hashes of any band),
    then exact token-n-gram Jaccard verifies each candidate pair.
    Returns (train_id, eval_id, jaccard) for pairs ≥ threshold; the
    downstream filter is an anti-join of the corpus against the
    distinct train_ids.

    Scale shape: the corpus side streams through signature computation
    (pure expressions, no shuffle) and ONE equi-join on (band,
    band_key). The eval side is small by definition (benchmarks are
    thousands of docs), so its band keys and verification grams are
    broadcast — the 100 TB side is never shuffled and never quadratic:
    verification work is O(candidate pairs), bounded by the LSH catch
    curve (s* ≈ (1/bands)^(1/rows_per_band) ≈ 0.84 at the default
    2×4 — matching ``near_dup_pipeline``; a looser 2×2 floods
    verification on shingle-correlated corpora: measured 113× the
    candidate count on the synthetic docs table at sf0.1).
    """
    sig_t = minhash_signatures(train, text_col, id_col, num_hashes, shingle_k)
    sig_e = minhash_signatures(
        eval_df, text_col, id_col, num_hashes, shingle_k
    )
    bt = band_keys_long(sig_t, id_col, bands, rows_per_band).withColumnRenamed(
        id_col, "train_id"
    )
    be = band_keys_long(sig_e, id_col, bands, rows_per_band).withColumnRenamed(
        id_col, "eval_id"
    )
    # the same pair can agree on several bands → distinct; checkpoint:
    # the candidate list feeds the needed-id set and the verify probe,
    # and its md5-heavy subtree must not re-run per consumer
    cand = (
        bt.join(F.broadcast(be), ["band", "band_key"])
        .select("train_id", "eval_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # verification grams only for documents that appear in a candidate
    # pair — O(candidates) gram work on BOTH sides, not O(corpus)
    needed_t = cand.select(F.col("train_id").alias("_gid")).distinct()
    grams_t = (
        fan_out(train)
        .select(F.col(id_col).alias("_gid"), F.col(text_col).alias("_t"))
        .join(needed_t, "_gid")
        .select(
            F.col("_gid").alias("train_id"),
            _token_ngrams("_t", ngram_n).alias("_ga"),
        )
    )
    needed_e = cand.select(F.col("eval_id").alias("_gid")).distinct()
    grams_e = (
        eval_df.select(F.col(id_col).alias("_gid"), F.col(text_col).alias("_e"))
        .join(needed_e, "_gid")
        .select(
            F.col("_gid").alias("eval_id"),
            _token_ngrams("_e", ngram_n).alias("_gb"),
        )
    )
    joined = cand.join(grams_t, "train_id").join(
        F.broadcast(grams_e), "eval_id"
    )
    inter = F.size(F.array_intersect("_ga", "_gb"))
    union = F.size(F.array_union("_ga", "_gb"))
    jac = F.round(inter.cast("double") / union.cast("double"), 6)
    return joined.select("train_id", "eval_id", jac.alias("jaccard")).filter(
        F.col("jaccard") >= jaccard_threshold
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    stride: int | None = None,
) -> DataFrame:
    """Split each document's whitespace tokens into ``chunk_size``-token
    chunks: (id, chunk_id, chunk_text, n_tokens). ``stride`` (default =
    ``chunk_size``, i.e. non-overlapping) sets the hop between chunk
    starts — stride < chunk_size gives the overlapping windows
    retrieval indexes use so no answer span straddles a boundary.

    The context-window shaping step of a pretraining pipeline. Pure
    narrow transform — tokens never leave their partition; the last
    chunk of each document is short (no padding here; see
    ``pack_bins`` for budget-packing whole documents instead).
    """
    hop = stride or chunk_size
    if not 1 <= hop <= chunk_size:
        raise ValueError("stride must be in [1, chunk_size]")
    toks = F.split(F.col(text_col), " ")
    s = F.lit(hop)
    with_chunks = df.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.floor((F.size(toks) - 1) / s))
        ).alias("chunk_id"),
        toks.alias("_toks"),
    )
    piece = F.slice(
        F.col("_toks"), (F.col("chunk_id") * s + 1).cast("int"), chunk_size
    )
    return with_chunks.select(
        id_col,
        "chunk_id",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


def pack_bins(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
) -> DataFrame:
    """Sequence packing: concatenate documents in ``id_col`` order and
    assign each to the ``budget``-token bin where it *starts* —
    (id, n_tokens, start_offset, bin_id).

    This is the streaming-concatenation packing used to fill fixed-size
    training contexts (a doc may straddle a boundary; the chunker above
    handles intra-doc splitting). The global running offset comes from
    ``global_prefix_sum`` — two-phase, no single-task window — so the
    plan survives a 100× scale-up where ``Window.orderBy()`` (no
    partitionBy) would serialize the whole corpus through one core.
    """
    sized = df.select(
        id_col,
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    with_off = global_prefix_sum(
        sized, order_col=id_col, value_col="n_tokens", alias="start_offset"
    )
    return with_off.select(
        id_col,
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / F.lit(budget)).alias("bin_id"),
    )


def boilerplate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    min_docs: int = 3,
) -> DataFrame:
    """Corpus-level boilerplate mining (the C4/RefinedWeb cleaning
    step): token ``n``-grams that occur in at least ``min_docs``
    DISTINCT documents — headers, footers, license blurbs, navigation
    chrome. Returns (span, n_docs); downstream cleaners strip or
    down-weight documents dominated by blocklisted spans (feed this to
    ``contamination`` as the eval side to score coverage per doc).

    One explode + one count per distinct (doc, span) — ``_token_ngrams``
    already dedups within a document, so ``count(*)`` IS the document
    frequency. Map-side partial aggregation collapses the popular spans
    (the ones we're after) before the shuffle.
    """
    grams = df.select(
        F.explode(_token_ngrams(text_col, n)).alias("span")
    )
    return (
        grams.groupBy("span")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document top-``k`` keywords by tf-idf:
    score = tf × ln(N / df), round(6) BEFORE ranking (ln differs in the
    last ulp across engines; ranking on the rounded score is what makes
    the result deterministic and oracle-checkable), ties broken by
    token. Returns (id, token, tf, df, tfidf, rank_val).

    ``broadcast_vocab`` ships the document-frequency table map-side —
    right for natural-language vocabularies (Heaps' law keeps distinct
    tokens millions, not billions, even at corpus scale); flip it off
    for token-id spaces wider than executor memory and the same plan
    runs as a shuffle join.
    """
    from pyspark.sql import Window

    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    # tf is one row per doc×token — orders of magnitude below the raw
    # postings. Checkpointing it makes BOTH consumers (the probe side
    # and the document-frequency aggregate) read the materialized
    # partials instead of re-running scan+explode+shuffle; Catalyst's
    # exchange reuse can't be relied on here because per-side
    # join-null filters get pushed to different depths.
    tf = (
        toks.groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    n_docs = df.count()
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    vocab = F.broadcast(dfreq) if broadcast_vocab else dfreq
    scored = tf.join(vocab, "token").select(
        id_col,
        "token",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return scored.withColumn(
        "rank_val", F.row_number().over(w)
    ).filter(F.col("rank_val") <= k)


def readability_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per document — the
    classic curation signal for audience targeting and quality
    bucketing (pairs with ``llm/textstats``' length/stopword ratios):

        ease  = 206.835 − 1.015·(words/sentences) − 84.6·(syll/words)
        grade = 0.39·(words/sentences) + 11.8·(syll/words) − 15.59

    Counts are REGEX-DEFINED so the scores are engine-portable (the
    oracle reproduces them exactly): words = `[a-z]+` runs of the
    lowercased text, sentences = `[.!?]+` runs (min 1 — a fragment is
    one sentence), syllables = `[aeiouy]+` vowel groups (min 1 per
    word enforced globally, the standard heuristic's floor). Pure
    JVM expressions — no UDF, shuffle-free, scales with the scan.
    NULL scores for wordless documents.
    """
    low = F.lower(F.col(text_col))
    words = F.regexp_count(low, F.lit("[a-z]+"))
    sents = F.greatest(
        F.regexp_count(F.col(text_col), F.lit("[.!?]+")), F.lit(1)
    )
    syll = F.greatest(
        F.regexp_count(low, F.lit("[aeiouy]+")), words
    )
    wps = words.cast("double") / sents
    spw = syll.cast("double") / words
    has = words > 0
    return df.select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        F.when(has, syll).cast("long").alias("n_syllables"),
        F.when(
            has,
            F.round(
                F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw,
                4,
            ),
        ).alias("flesch_ease"),
        F.when(
            has,
            F.round(
                F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4
            ),
        ).alias("fk_grade"),
    )
