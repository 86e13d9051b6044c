"""End-to-end corpus curation: the ``main()`` of a training-data run,
composed from the operators in this package as ONE lazy chain per
stage — the Spark analog of a Dolma/RefinedWeb/FineWeb-style recipe.

Stage order follows practice (cheap row-local filters first, corpus
joins later, so expensive stages see the smallest surviving corpus):

  1. exact dedup            (hash groupBy — removes byte-identical)
  2. quality + repetition   (row-local expressions, no shuffle)
  3. near-dup clustering    (SimHash pairs → connected components →
                             keep canonical docs)
  4. decontamination        (drop docs overlapping the eval set)
  5. mixture reweighting    (per-source down/up-sampling)
  6. train/val/test split   (hash threshold, row-stable)

Every stage is also independently available; this function is the
composition contract plus per-stage survivor accounting (the numbers a
data card reports).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cancer_survival_etl_spark.llm.curation import contamination
from cancer_survival_etl_spark.llm.dedup import (
    dedup_clusters,
    exact_dedup,
    simhash,
    simhash_near_dups,
)
from cancer_survival_etl_spark.llm.sampling import hash_split, mixture_sample
from cancer_survival_etl_spark.llm.textstats import (
    quality_score,
    repetition_stats,
)


def curate_corpus(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    max_top_token_frac: float = 0.5,
    max_hamming: int = 3,
    decontam_n: int = 3,
    mixture: dict[str, float] | None = None,
    source_col: str = "source",
    salt: str = "",
) -> tuple[DataFrame, list[tuple[str, DataFrame]]]:
    """Run the full curation recipe; returns (curated, stages) where
    ``stages`` is [(stage_name, surviving DataFrame)] for accounting
    (count each lazily — or just the final one — as the caller
    chooses; nothing here forces a job).

    The output carries the split assignment and, when ``mixture`` is
    given, the repeat index of upsampled copies.
    """
    stages: list[tuple[str, DataFrame]] = [("input", docs)]

    # exact_dedup returns only (fingerprint, id, dupe_count); join the
    # surviving ids back to carry full rows forward
    keep = exact_dedup(docs, text_col, id_col).select(id_col)
    d = docs.join(keep, id_col)
    stages.append(("exact_dedup", d))

    q = quality_score(d, text_col)
    r = repetition_stats(q, text_col)
    d = (
        r.filter(
            (F.col("quality") >= min_quality)
            & (F.col("top_token_frac") <= max_top_token_frac)
        )
        .select(*d.columns)
        # r11 (guide §5): the surviving corpus feeds FOUR consumers
        # (SimHash pair mining, the canonical join, decontamination
        # grams, the final split) — without a pin each re-derives the
        # exact-dedup join + the regex-heavy quality/repetition
        # expressions. Lazy localCheckpoint: the near-dup collect
        # materializes it once, every later stage reads the pinned
        # blocks. Fault-tolerance trade documented in SCALE.md (the
        # engine-wide localCheckpoint posture).
        .localCheckpoint(eager=False)
    )
    stages.append(("quality_filter", d))

    sigs = simhash(d, text_col, id_col, bits=32)
    pairs = simhash_near_dups(sigs, id_col, max_hamming=max_hamming)
    clusters = dedup_clusters(d, pairs, id_col)
    d = d.join(
        clusters.filter(F.col("is_canonical")).select(id_col), id_col
    )
    stages.append(("near_dedup", d))

    if eval_docs is not None:
        contam = contamination(d, eval_docs, text_col, id_col, n=decontam_n)
        clean_ids = contam.filter(~F.col("is_contaminated")).select(id_col)
        d = d.join(clean_ids, id_col)
        stages.append(("decontaminated", d))

    if mixture:
        d = mixture_sample(d, source_col, mixture, id_col, salt=salt)
        stages.append(("mixture", d))

    d = hash_split(d, id_col, salt=salt)
    stages.append(("split", d))
    return d, stages


def stage_counts(stages: list[tuple[str, DataFrame]]) -> DataFrame:
    """Survivor accounting as one unioned plan: (stage, n_rows) in a
    single job submission. Stage N's subtree contains stage N-1's, so
    counting every stage re-executes shared prefixes — fine for a
    data-card report run once; for routine monitoring count only the
    final stage, or checkpoint intermediate stages first."""
    spark = stages[0][1].sparkSession
    counts = None
    for name, df in stages:
        c = df.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(name).alias("stage"), "n_rows"
        )
        counts = c if counts is None else counts.unionByName(c)
    return counts


def materialize_epochs(
    docs: DataFrame,
    path: str,
    n_epochs: int = 2,
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Write the actual training shards: for each epoch, a fresh
    deterministic global permutation of the corpus (``corpus_shuffle``
    with an epoch salt), sequence-packed into fixed ``seq_len`` bins
    in that order (``pack_bins``'s two-phase global prefix sum over
    the shuffled positions), landed as parquet partitioned by
    ``epoch`` — the `epoch=N/` directory IS the trainer's read unit,
    and re-running the job reproduces byte-identical shard contents
    (every stage is a pure function of (salt, id)).

    Returns the manifest DataFrame (epoch, bin_id, n_docs, n_tokens)
    read back from the written shards — the data card's shard table.

    Scale: per epoch one range-partition shuffle (the permutation/
    prefix sum) + one write; epochs are independent (loop is driver-
    side orchestration only, not a growing plan).
    """
    from cancer_survival_etl_spark.llm.curation import pack_bins
    from cancer_survival_etl_spark.llm.sampling import corpus_shuffle

    spark = docs.sparkSession
    for epoch in range(n_epochs):
        shuffled = corpus_shuffle(
            docs, id_col, salt=f"{salt}epoch{epoch}"
        )
        packed = pack_bins(
            shuffled,
            text_col=text_col,
            id_col="shuffle_pos",
            budget=seq_len,
        )
        (
            packed.withColumn("epoch", F.lit(epoch))
            .write.mode("append" if epoch else "overwrite")
            .partitionBy("epoch")
            .parquet(path)
        )
    shards = spark.read.parquet(path)
    return (
        shards.groupBy("epoch", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
