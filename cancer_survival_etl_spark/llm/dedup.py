"""Deduplication operators: exact, MinHash/LSH, SimHash, n-gram Jaccard.

Scale shapes:
- exact:   one hash-shuffle on a 16-byte digest (never on the raw text).
- minhash: signatures are per-row expressions (no shuffle); banding turns
  the quadratic pair problem into a groupBy on band keys — only
  same-bucket candidates ever meet.
- simhash: per-row 64-bit fingerprint; near-dup = same fingerprint (or
  small Hamming distance within buckets).
- n-gram Jaccard: exact verification for candidate pairs out of LSH —
  array intersection/union, JVM-side.

Determinism: every hash is md5 (content-derived) — reproducible across
runs, partitionings, and engines (DuckDB md5 matches for oracles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cancer_survival_etl_spark.operators.partitioning import fan_out


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per exact text — hash-groupBy dedup.

    The shuffle key is md5(text): constant-width, skew-free, and the
    comparison never moves full documents. Returns (id, fingerprint,
    dupe_count) for the kept representative of every distinct text.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dupe_count"),
        )
    )


def char_shingles(text_col: str, k: int = 5) -> Column:
    """All k-char shingles of a string as an array (positional, overlapping)."""
    c = F.col(text_col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1))),
        lambda i: c.substr(i, F.lit(k)),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """Per-document MinHash signature over character shingles.

    hash_i(doc) = min over shingles of an 8-hex-char slice of
    md5(seed ∥ shingle): one md5 digest yields FOUR independent 32-bit
    hash functions (hex slices), so ``num_hashes`` hashes cost
    ``ceil(num_hashes / 4)`` digests per shingle — the md5 is the hot
    loop at corpus scale. All pure expressions (no UDF, no shuffle);
    docs agreeing on hash_i share a uniformly-random shingle ⇒
    P(match) ≈ Jaccard similarity.
    """
    shingles = char_shingles(text_col, shingle_k)

    # Materialize one md5 array per seed group as a named intermediate
    # column, then slice it four ways. The multi-referenced non-cheap
    # alias stops Catalyst's CollapseProject from inlining (and hence
    # re-evaluating) the digest array per signature column.
    # nb: unary lambdas required — a second (defaulted) parameter would be
    # bound to F.transform's array-index argument.
    def digest_array(seed: int):
        if seed == 0:
            return F.transform(shingles, lambda s: F.md5(s))
        return F.transform(
            shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s))
        )

    def hex_slice(part: int):
        return lambda h: F.substring(h, part * 8 + 1, 8)

    n_groups = (num_hashes + 3) // 4
    staged = fan_out(df).select(
        F.col(id_col),
        *[digest_array(g).alias(f"_digests_{g}") for g in range(n_groups)],
    )
    sig_cols = [
        F.array_min(
            F.transform(F.col(f"_digests_{i // 4}"), hex_slice(i % 4))
        ).alias(f"minhash_{i}")
        for i in range(num_hashes)
    ]
    return staged.select(F.col(id_col), *sig_cols)


def near_dup_buckets(
    sigs: DataFrame,
    id_col: str,
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """LSH banding: group docs whose signature agrees on ALL hashes of any
    band. Returns (band, band_key, ids, bucket_size) for buckets with >1 doc
    — the candidate near-duplicate sets.

    Scale: one shuffle keyed on (band, 16-byte band digest); bucket sizes
    are the only quadratic surface and are bounded by tuning bands×rows.
    """
    # One struct per band, exploded from a single pass — a per-band
    # union would re-evaluate the md5-heavy signature subtree once per
    # band (measured 4x the cost at bands=4).
    stacked = band_keys_long(sigs, id_col, bands, rows_per_band)
    return (
        stacked.groupBy("band", "band_key")
        .agg(
            F.sort_array(F.collect_list(id_col)).alias("ids"),
            F.count(F.lit(1)).alias("bucket_size"),
        )
        .filter(F.col("bucket_size") > 1)
    )


def band_keys_long(
    sigs: DataFrame,
    id_col: str,
    bands: int = 2,
    rows_per_band: int = 2,
) -> DataFrame:
    """Long-format LSH band keys: (id, band, band_key), one row per
    document per band. The join-ready shape for CROSS-corpus banding —
    ``near_dup_buckets`` groups buckets within ONE corpus; matching two
    corpora (train vs benchmark) instead equi-joins each side's band
    keys, so the keys must be rows, not collected buckets.

    Same single-pass explode as ``near_dup_buckets`` (one evaluation of
    the md5-heavy signature subtree regardless of band count).
    """
    hash_cols = [c for c in sigs.columns if c.startswith("minhash_")]
    assert len(hash_cols) >= bands * rows_per_band, "not enough hashes for banding"
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *hash_cols[b * rows_per_band : (b + 1) * rows_per_band],
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select(
        F.col(id_col), F.explode(band_structs).alias("_b")
    ).select(
        F.col("_b.band").alias("band"),
        F.col("_b.band_key").alias("band_key"),
        F.col(id_col),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    block_col: str | None = None,
    hash_grams: bool = True,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact token-n-gram Jaccard similarity for document pairs.

    Inverted-index plan (the scalable shape): explode distinct n-grams,
    self-equi-join on (block, gram) so only pairs sharing ≥1 gram are ever
    materialized, count shared grams per pair, then
    ``J = shared / (|A| + |B| - shared)``. Identical results to all-pairs
    Jaccard for any threshold > 0 (zero-overlap pairs have J = 0), but the
    work is proportional to posting-list sizes, not block².

    ``block_col`` (e.g. lang/source) additionally partitions the join key
    — at corpus scale combine with a stopgram cut (drop ultra-frequent
    grams) to bound the hottest posting lists.

    ``hash_grams`` replaces the variable-length gram string with its
    xxhash64 before the shuffle — constant 8-byte join keys instead of
    full n-gram text. A collision inflates one pair's shared-gram count
    by 1; P(any collision) ≈ G²/2⁶⁵ for G distinct grams — negligible
    below ~10⁹ grams per block; set False for the exact-string join.

    ``max_doc_freq`` is the stopgram cut: grams occurring in more than
    that many documents (per block) are dropped before the join —
    bounding every posting list, hence the worst-case pair fan-out, at
    corpus scale. Dropped grams still count toward |A| and |B| but not
    toward shared, so reported Jaccard is a conservative UNDER-estimate
    for affected pairs (near-dup recall at a given threshold can only
    shrink, never produce false positives).
    """
    toks = F.split(F.col(text_col), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))
            ),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    block = F.col(block_col) if block_col else F.lit(1)
    base = fan_out(df).select(
        block.alias("_block"),
        F.col(id_col),
        grams.alias("_grams"),
        F.size(grams).alias("_ng"),
    )
    postings = base.select(
        "_block", id_col, "_ng", F.explode("_grams").alias("_gram")
    )
    if hash_grams:
        postings = postings.select(
            "_block", id_col, "_ng", F.xxhash64("_gram").alias("_gram")
        )
    if max_doc_freq is not None:
        # With the stopgram cut every surviving posting list is ≤
        # max_doc_freq entries, so pairs can be generated IN-ARRAY from
        # one groupBy — no doc-freq join-back, no posting self-join, no
        # second shuffle. Lists of 1 produce no pairs and are dropped
        # with the over-frequent ones in the same filter. One shuffle
        # (the gram groupBy) replaces the self-join plan's three.
        lists = (
            postings.groupBy("_block", "_gram")
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(id_col).alias("_id"),
                            F.col("_ng").alias("_n"),
                        )
                    )
                ).alias("_l")
            )
            .filter(
                (F.size("_l") >= 2) & (F.size("_l") <= max_doc_freq)
            )
        )
        sz = F.size("_l")
        combos = F.flatten(
            F.transform(
                F.sequence(F.lit(1), sz - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, sz),
                    lambda j: F.struct(
                        F.element_at(F.col("_l"), i)["_id"].alias("id_a"),
                        F.element_at(F.col("_l"), j)["_id"].alias("id_b"),
                        F.element_at(F.col("_l"), i)["_n"].alias("_na"),
                        F.element_at(F.col("_l"), j)["_n"].alias("_nb"),
                    ),
                ),
            )
        )
        shared = (
            lists.select(F.explode(combos).alias("_p"))
            .select("_p.id_a", "_p.id_b", "_p._na", "_p._nb")
            .groupBy("id_a", "id_b", "_na", "_nb")
            .agg(F.count(F.lit(1)).alias("_shared"))
        )
        jaccard = F.col("_shared").cast("double") / (
            F.col("_na") + F.col("_nb") - F.col("_shared")
        ).cast("double")
        return (
            shared.select(
                "id_a", "id_b", F.round(jaccard, 6).alias("jaccard")
            )
            .filter(F.col("jaccard") >= threshold)
        )
    # materialize the narrow postings once: the self-join below would
    # otherwise evaluate scan → n-gram transform → explode → hash TWICE
    # (exchange reuse can't be relied on across the two sides' differing
    # pushed null-filters), and the per-row gram transform dominates the
    # cost. Postings are 4 fixed-width columns — tiny next to documents.
    postings = postings.localCheckpoint(eager=False)
    a = postings.select(
        "_block",
        "_gram",
        F.col(id_col).alias("id_a"),
        F.col("_ng").alias("_na"),
    )
    b = postings.select(
        "_block",
        "_gram",
        F.col(id_col).alias("id_b"),
        F.col("_ng").alias("_nb"),
    )
    shared = (
        a.join(b, ["_block", "_gram"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "_na", "_nb")
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    jaccard = F.col("_shared").cast("double") / (
        F.col("_na") + F.col("_nb") - F.col("_shared")
    ).cast("double")
    return (
        shared.select("id_a", "id_b", F.round(jaccard, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(
    df: DataFrame, text_col: str, id_col: str, bits: int = 32
) -> DataFrame:
    """Per-document SimHash fingerprint from whitespace tokens.

    Each token votes ±1 on ``bits`` positions using bits of
    md5(token); the fingerprint's bit b is 1 iff the sum is positive.
    Near-duplicates share fingerprints (or differ in few bits). Pure
    expressions: explode → two shuffle-free maps + one groupBy(id).

    32 bits keeps the bit-extraction in cheap integer ops (md5 prefix →
    conv to bigint); extendable by fingerprinting two md5 halves.
    """
    tokens = fan_out(df).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("_tok"),
    )
    # 32-bit token hash from the md5 hex prefix.
    h = F.conv(F.substring(F.md5(F.col("_tok")), 1, 8), 16, 10).cast("long")
    votes = tokens.select(
        F.col(id_col),
        *[
            (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"_b{b}")
            for b in range(bits)
        ],
    )
    sums = votes.groupBy(id_col).agg(
        *[F.sum(f"_b{b}").alias(f"_s{b}") for b in range(bits)]
    )
    fingerprint = None
    for b in range(bits):
        bit = F.when(F.col(f"_s{b}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = bit * F.lit(2**b).cast("long")
        fingerprint = term if fingerprint is None else fingerprint + term
    return sums.select(F.col(id_col), fingerprint.alias("simhash"))


def embedding_cosine_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) for
    every pair with round(cosine, 6) >= threshold and id_a < id_b.

    JVM-side arithmetic throughout (zip_with + aggregate folds — no
    Python in the hot path). Rounded to 6 decimals BEFORE thresholding
    so cross-engine float noise can't flip a pair in or out.

    Scale path: the bare form is a quadratic self-join — fine for a
    blocked partition, wrong for a whole 100 TB corpus. Pass
    ``block_col`` (e.g. an LSH hyperplane bucket from
    similarity.hyperplane_bucket, an IVF cell, or a shard key) to make
    the join equi- on the block, which Spark executes as a shuffle
    hash/sort-merge join per block instead of a broadcast-nested-loop
    over everything.
    """
    from cancer_survival_etl_spark.llm.similarity import _dot, _norm

    blocks = [block_col] if block_col else []
    # L2-normalize ONCE per row (O(n·d)) so the pairwise step is a bare
    # dot product — naively putting norms in the pair expression costs
    # O(n²·d) extra and dominates the whole operator.
    v = F.col(vec_col).cast("array<double>")
    nv = _norm(v)
    normed = fan_out(df).select(
        *blocks,
        F.col(id_col).alias("_id"),
        F.transform(v, lambda x: x / nv).alias("_v"),
    )
    a = normed.select(
        *blocks, F.col("_id").alias("id_a"), F.col("_v").alias("_va")
    )
    b = normed.select(
        *blocks, F.col("_id").alias("id_b"), F.col("_v").alias("_vb")
    )
    cond = F.col("id_a") < F.col("id_b")
    pairs = a.join(b, on=blocks, how="inner").filter(cond) if blocks else a.join(b, cond)
    cosine = F.round(_dot(F.col("_va"), F.col("_vb")), 6)
    return (
        pairs.select("id_a", "id_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_cosine_pairs_matmul(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via blocked numpy matmul — same
    contract as ``embedding_cosine_pairs``, different physical strategy.

    The corpus is split into ``n_blocks`` bundles (collect_list per
    block); every block *pair* (upper triangle incl. diagonal) becomes
    one task whose Python worker runs a single BLAS matmul over the two
    bundles and emits only pairs over threshold. Arrow moves O(n·d)
    vector data per block pair; the O(n²·d) arithmetic runs at matmul
    speed instead of per-element expression interpretation — the
    vectorized-Pandas-UDF path for when the expression form is the
    bottleneck.

    Scale: choose n_blocks so a bundle (~n/B vectors × d doubles) fits
    worker memory; B(B+1)/2 tasks spread across the cluster. Cosine is
    rounded to 6 decimals before thresholding (same determinism contract
    as the expression form; float64 matmul vs sequential fold differ
    ~1e-15, far inside the rounding).
    """
    import pandas as pd

    from cancer_survival_etl_spark.llm.similarity import _norm

    v = F.col(vec_col).cast("array<double>")
    nrm = _norm(v)
    normed = fan_out(df).select(
        (F.crc32(F.col(id_col).cast("string")) % n_blocks).alias("_blk"),
        F.col(id_col).alias("_id"),
        F.transform(v, lambda x: x / nrm).alias("_v"),
    )
    bundles = normed.groupBy("_blk").agg(
        F.collect_list("_id").alias("_ids"),
        F.collect_list("_v").alias("_vs"),
    )
    left = bundles.select(
        F.col("_blk").alias("_bi"),
        F.col("_ids").alias("_ids_a"),
        F.col("_vs").alias("_vs_a"),
    )
    right = bundles.select(
        F.col("_blk").alias("_bj"),
        F.col("_ids").alias("_ids_b"),
        F.col("_vs").alias("_vs_b"),
    )
    grid = left.join(right, F.col("_bi") <= F.col("_bj"))

    def score(batches):
        import numpy as np

        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            for bi, bj, raw_ids_a, raw_vs_a, raw_ids_b, raw_vs_b in zip(
                pdf["_bi"], pdf["_bj"],
                pdf["_ids_a"], pdf["_vs_a"], pdf["_ids_b"], pdf["_vs_b"],
            ):
                ids_a = np.asarray(raw_ids_a, dtype=np.int64)
                ids_b = np.asarray(raw_ids_b, dtype=np.int64)
                va = np.array([np.asarray(x) for x in raw_vs_a])
                vb = np.array([np.asarray(x) for x in raw_vs_b])
                sims = np.round(va @ vb.T, 6)
                ia, ib = np.nonzero(sims >= threshold)
                ka, kb = ids_a[ia], ids_b[ib]
                if bi == bj:
                    # diagonal block: every pair appears twice — keep one
                    keep = ka < kb
                    ka, kb = ka[keep], kb[keep]
                    cos = sims[ia, ib][keep]
                else:
                    # cross block: each pair appears once — orient only
                    cos = sims[ia, ib]
                    swap = ka > kb
                    ka, kb = np.where(swap, kb, ka), np.where(swap, ka, kb)
                out_a.append(ka)
                out_b.append(kb)
                out_c.append(cos)
            if out_a:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(out_a),
                        "id_b": np.concatenate(out_b),
                        "cosine": np.concatenate(out_c),
                    }
                )

    return grid.mapInPandas(score, schema="id_a long, id_b long, cosine double")


def _token_ngrams(text_col: str, n: int) -> Column:
    """Distinct whitespace-token n-grams of a string as an array."""
    toks = F.split(F.col(text_col), " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def near_dup_pipeline(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    shingle_k: int = 5,
    bands: int = 2,
    rows_per_band: int = 4,
    ngram_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-duplicate detection: MinHash signatures → LSH
    banding → candidate pairs → exact n-gram-Jaccard verification.

    The composed shape that scales: candidate generation is the banding
    groupBy (work ∝ corpus size), and the exact quadratic verification
    runs ONLY inside buckets (work ∝ Σ bucket²). bands × rows_per_band
    sets the similarity floor: the LSH catch curve crosses ~50% at
    s* ≈ (1/bands)^(1/rows_per_band) — the default (2, 4) targets
    true near-dups (s* ≈ 0.84); (4, 2) lowers the floor to s* = 0.5
    but on shingle-correlated corpora floods verification with
    low-similarity candidates (measured 150× the pair count on the
    synthetic docs table). Returns (id_a, id_b, jaccard).
    """
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    buckets = near_dup_buckets(sigs, id_col, bands, rows_per_band)
    ids = F.col("ids")
    pair_arr = F.flatten(
        F.transform(
            ids,
            lambda x: F.filter(
                F.transform(
                    ids, lambda y: F.struct(x.alias("id_a"), y.alias("id_b"))
                ),
                lambda s: s.getField("id_a") < s.getField("id_b"),
            ),
        )
    )
    # checkpoint the (small) candidate list: it feeds three consumers
    # below (the id set and both join probes) and its minhash+banding
    # subtree must not re-run per consumer
    cand = (
        buckets.select(F.explode(pair_arr).alias("_p"))
        .select("_p.id_a", "_p.id_b")
        .distinct()  # the same pair can surface from several bands
        .localCheckpoint(eager=False)
    )
    # verification grams are computed ONLY for documents that appear in
    # some candidate pair — O(candidates), not O(corpus): join the raw
    # text to the needed-id set BEFORE the n-gram transform, then
    # materialize the small gram table once for both pair sides.
    needed = (
        cand.select(F.col("id_a").alias("_gid"))
        .unionByName(cand.select(F.col("id_b").alias("_gid")))
        .distinct()
    )
    grams = (
        fan_out(df)
        .select(F.col(id_col).alias("_gid"), F.col(text_col).alias("_vtext"))
        .join(needed, "_gid")
        .select("_gid", _token_ngrams("_vtext", ngram_n).alias("_g"))
        .localCheckpoint(eager=False)
    )
    a = grams.select(F.col("_gid").alias("id_a"), F.col("_g").alias("_ga"))
    b = grams.select(F.col("_gid").alias("id_b"), F.col("_g").alias("_gb"))
    joined = cand.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("_ga", "_gb"))
    union = F.size(F.array_union("_ga", "_gb"))
    jac = F.round(inter.cast("double") / union.cast("double"), 6)
    return (
        joined.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


def simhash_near_dups(
    sigs: DataFrame,
    id_col: str,
    fingerprint_col: str = "simhash",
    max_hamming: int = 3,
    bits: int = 32,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance, without any
    all-pairs comparison.

    Pigeonhole blocking: split the ``bits``-bit fingerprint into
    ``max_hamming + 1`` chunks — two fingerprints within Hamming
    distance ``max_hamming`` MUST agree exactly on at least one chunk.
    Candidates come from an equi-join on (chunk index, chunk value);
    verification is one ``bit_count(a XOR b)`` per candidate. Both
    sides are JVM integer ops; the shuffle key is a (int, int) pair.

    Returns (id_a, id_b, hamming) with id_a < id_b.
    """
    n_chunks = max_hamming + 1
    chunk_bits = (bits + n_chunks - 1) // n_chunks
    # r11 (guide §2.4/§5): the chunk stack below unions n_chunks
    # projections of sigs and self-joins the stack — without a pin the
    # whole fingerprint plan (explode + 32-way vote aggregate + its
    # upstream corpus) is re-derived once per chunk per side. Lazy
    # localCheckpoint: the first action materializes the narrow
    # (id, fingerprint) frame once; every chunk projection reads it.
    sigs = sigs.localCheckpoint(eager=False)
    fp = F.col(fingerprint_col)
    chunked = sigs.select(
        F.col(id_col),
        fp,
        *[
            (
                F.shiftright(fp, i * chunk_bits)
                .bitwiseAND(F.lit((1 << chunk_bits) - 1))
            ).alias(f"_chunk_{i}")
            for i in range(n_chunks)
        ],
    )
    frames = [
        chunked.select(
            F.lit(i).alias("_ci"),
            F.col(f"_chunk_{i}").alias("_cv"),
            F.col(id_col),
            fp.alias("_fp"),
        )
        for i in range(n_chunks)
    ]
    stacked = frames[0]
    for fr in frames[1:]:
        stacked = stacked.unionByName(fr)
    a = stacked.select(
        "_ci", "_cv", F.col(id_col).alias("id_a"), F.col("_fp").alias("_fa")
    )
    b = stacked.select(
        "_ci", "_cv", F.col(id_col).alias("id_b"), F.col("_fp").alias("_fb")
    )
    hamming = F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb")))
    return (
        a.join(b, ["_ci", "_cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a pair can agree on several chunks
    )


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup clustering: close the pair graph into components and
    elect one canonical document (min id) per cluster — the decision
    step that pair-producing detectors (LSH verify, SimHash Hamming,
    embedding cosine) feed at the end of every dedup pipeline.

    ``pairs`` carries (id_a, id_b) near-dup edges; ``docs`` supplies the
    full corpus so untouched documents come back as their own singleton
    cluster. Returns (id, cluster_id, is_canonical); downstream dedup is
    ``filter(is_canonical)``.
    """
    from cancer_survival_etl_spark.operators.graph import connected_components

    comps = connected_components(
        pairs,
        "id_a",
        "id_b",
        nodes=docs.select(F.col(id_col).alias("id_a")),
    )
    return comps.select(
        F.col("node").alias(id_col),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
    hash_shingles: bool = True,
) -> DataFrame:
    """Span-level (substring) duplicate detection: maximal runs of
    k-token shingles that occur in ≥ ``min_docs`` distinct documents —
    the train-set dedup granularity of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better", public arXiv
    2107.06499): document-level dedup misses the boilerplate paragraph
    pasted into thousands of otherwise-unique pages; span-level finds
    exactly the repeated region, so the cut can excise it (or drop the
    doc) without discarding unique text.

    Plan (all built-ins): posexplode k-shingles → distinct-doc count
    per shingle (one groupBy on the hashed shingle) → keep duplicated
    shingles → gaps-and-islands merge of consecutive duplicated
    positions per doc (pos − row_number() island key, one window over
    the doc partition). Returns (id, span_start, span_end, n_shingles)
    with token positions, span_end inclusive of the shingle tail.

    Scale: the shingle posting table is the only wide object — with
    ``hash_shingles`` each posting is (8-byte hash, id, pos); the
    duplicated-shingle filter drops the unique tail (the overwhelming
    majority of a natural corpus) BEFORE the window, so the island
    merge touches only rows that are already evidence of duplication.
    The paper's suffix-array formulation is a global sort the cluster
    can't partition cleanly; the shingle formulation is
    embarrassingly parallel and finds every duplicated span of length
    ≥ k (shorter overlaps are below the resolution — the standard
    recall/size trade).
    """
    toks = F.split(F.col(text_col), " ")
    n_sh = F.size(toks) - (k - 1)
    # sequence(1, 0) would yield a DESCENDING [1, 0] — docs shorter than
    # k tokens must produce an empty shingle array, not bogus grams
    grams = F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = fan_out(df).select(
        F.col(id_col), F.posexplode(grams).alias("pos", "_g")
    )
    if hash_shingles:
        base = base.withColumn("_g", F.xxhash64("_g"))
    dup = (
        base.groupBy("_g")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_g")
    )
    marked = base.join(dup, "_g").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = marked.withColumn(
        "_grp", F.col("pos") - F.row_number().over(w)
    )
    return (
        runs.groupBy(id_col, "_grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_shingles"),
        )
        .drop("_grp")
    )


def build_band_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 4,
    shingle_k: int = 5,
    bands: int = 2,
    rows_per_band: int = 2,
    mode: str = "overwrite",
) -> None:
    """Materialize the corpus's MinHash-LSH band keys as a parquet
    index — the piece that makes dedup INCREMENTAL: once the corpus's
    (band, band_key, id) rows are on disk, a new ingest batch is
    checked by probing the index, never by re-mining the corpus.

    Index size is #docs × bands fixed-width rows (hashes, no text).
    ``mode='append'`` is the ingest loop: probe the delta, then append
    its keys so the next batch sees it.
    """
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    keys = band_keys_long(sigs, id_col, bands, rows_per_band)
    keys.write.mode(mode).parquet(path)


def probe_band_index(
    spark,
    path: str,
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 4,
    shingle_k: int = 5,
    bands: int = 2,
    rows_per_band: int = 2,
    ngram_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicates of an ingest batch against the INDEXED corpus:
    the delta's band keys equi-join the persisted index (work ∝ delta
    size + bucket collisions — the corpus is touched only to fetch the
    TEXT of candidate partners), candidates are verified with exact
    token-n-gram Jaccard, pairs ≥ ``threshold`` survive.

    Returns (new_id, corpus_id, jaccard). Self-matches (a delta doc
    already indexed under the same id) are excluded. This is the
    standard streaming-corpus dedup loop: probe → decide →
    ``build_band_index(mode='append')`` the keepers.
    """
    idx = spark.read.parquet(path).select(
        "band", "band_key", F.col(id_col).alias("_old_id")
    )
    sigs = minhash_signatures(
        new_docs, text_col, id_col, num_hashes, shingle_k
    )
    probe = band_keys_long(sigs, id_col, bands, rows_per_band).select(
        "band", "band_key", F.col(id_col).alias("_new_id")
    )
    cand = (
        probe.join(idx, ["band", "band_key"])
        .filter(F.col("_new_id") != F.col("_old_id"))
        .select("_new_id", "_old_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # fetch gram sets ONLY for docs that appear in some candidate pair
    new_grams = (
        new_docs.join(
            cand.select(F.col("_new_id").alias(id_col)).distinct(),
            id_col,
            "left_semi",
        )
        .select(
            F.col(id_col).alias("_new_id"),
            _token_ngrams(text_col, ngram_n).alias("_ga"),
        )
    )
    old_grams = (
        corpus.join(
            F.broadcast(
                cand.select(F.col("_old_id").alias(id_col)).distinct()
            ),
            id_col,
            "left_semi",
        )
        .select(
            F.col(id_col).alias("_old_id"),
            _token_ngrams(text_col, ngram_n).alias("_gb"),
        )
    )
    inter = F.size(F.array_intersect("_ga", "_gb"))
    union = F.size("_ga") + F.size("_gb") - inter
    jac = F.round(inter.cast("double") / union.cast("double"), 6)
    return (
        cand.join(new_grams, "_new_id")
        .join(old_grams, "_old_id")
        .select(
            F.col("_new_id").alias("new_id"),
            F.col("_old_id").alias("corpus_id"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def semantic_dedup(
    embeddings: DataFrame,
    n_centroids: int = 8,
    threshold: float = 0.35,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by embedding — cluster the corpus, compare pairs ONLY
    within a cluster, drop all but one of each cosine-connected group.
    The cluster blocking is what makes semantic dedup tractable: the
    quadratic surface is Σ cell², not corpus², and cells shrink as
    k grows (the paper runs k≈50k on LAION-scale corpora; cosine
    thresholds there sit near 0.95+ — on synthetic near-orthogonal
    vectors the interesting mass is much lower, so the threshold is a
    parameter, not a constant).

    Deterministic end-to-end with ``iters=0`` (seed centroids = first
    ``n_centroids`` vectors, assignment by round-6 cosine argmax, ties
    by centroid id) — the whole pipeline is oracle-checkable;
    ``iters>0`` upgrades the blocking to trained Lloyd cells without
    touching the downstream semantics.

    Pipeline: assign → within-cell pairs ≥ threshold
    (``embedding_cosine_pairs`` with the cell as ``block_col``) →
    connected components (pointer doubling) → keep min id per group.
    Returns (id, cell, dup_group, is_kept); dedup downstream is
    ``filter(is_kept)``.
    """
    from cancer_survival_etl_spark.llm.similarity import (
        _dot,
        _norm,
        kmeans_centroids,
    )
    from cancer_survival_etl_spark.operators.graph import (
        connected_components,
    )

    if iters:
        cen = kmeans_centroids(
            embeddings, k=n_centroids, iters=iters,
            id_col=id_col, vec_col=vec_col,
        )
    else:
        cen = embeddings.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("_cenv"),
        )
    v = F.col(vec_col).cast("array<double>")
    # r10 (guide §2.4 remove shuffles): the argmax over ≤ n_centroids
    # candidates used to be a broadcast crossJoin (n_centroids× row
    # fan-out of the vector payload) plus a Window.partitionBy(id) —
    # a full hash exchange AND sort of the fanned-out rows. The
    # centroid table is bounded by contract (n_centroids rows), so it
    # collects to the driver (one tiny job) and the argmax becomes a
    # pure PROJECTION fused into the embedding scan: per row, an
    # array_max over n_centroids (cos, −centroid_id) structs — max
    # cos first, ties to the SMALLEST centroid id, and Spark's
    # NaN-greatest double ordering matched exactly, i.e. the same
    # (cos DESC, centroid_id ASC) row the window picked, with zero
    # exchange. The cosine expression is unchanged term-for-term, so
    # every rounded value is bit-identical.
    cen_rows = sorted(
        cen.collect(), key=lambda r: int(r["centroid_id"])
    )
    scored = F.array(
        *[
            F.struct(
                F.round(
                    _dot(F.col("_v"), F.array(*[F.lit(float(x)) for x in r["_cenv"]]))
                    / (
                        _norm(F.col("_v"))
                        * _norm(F.array(*[F.lit(float(x)) for x in r["_cenv"]]))
                    ),
                    6,
                ).alias("_cos"),
                F.lit(-int(r["centroid_id"])).cast("long").alias("_ncid"),
            )
            for r in cen_rows
        ]
    )
    assigned = (
        fan_out(embeddings)
        .select(F.col(id_col).alias("_id"), v.alias("_v"))
        .withColumn("_cell", -F.array_max(scored).getField("_ncid"))
        .select(
            F.col("_id").alias(id_col),
            F.col("_v").alias(vec_col),
            F.col("_cell"),
        )
        # three consumers (pair join, CC vertex set, final join-back)
        # would each re-run the argmax projection — checkpoint the
        # narrow assignment once (repo convention, SCALE.md)
        .localCheckpoint(eager=False)
    )
    # the pair step re-normalizes once per row; candidate surface is
    # within-cell only (equi-join on _cell)
    pairs = embedding_cosine_pairs(
        assigned, vec_col=vec_col, id_col=id_col,
        threshold=threshold, block_col="_cell",
    )
    comps = connected_components(
        pairs, "id_a", "id_b",
        nodes=assigned.select(F.col(id_col).alias("id_a")),
    )
    return (
        assigned.select(id_col, F.col("_cell").alias("cell"))
        .join(
            comps.select(
                F.col("node").alias(id_col),
                F.col("component").alias("dup_group"),
            ),
            id_col,
        )
        .select(
            id_col,
            "cell",
            "dup_group",
            (F.col(id_col) == F.col("dup_group")).alias("is_kept"),
        )
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    block_col: str | None = None,
) -> DataFrame:
    """N-gram CONTAINMENT for document pairs — the asymmetric sibling
    of ``ngram_jaccard_pairs``: c(A→B) = |grams(A) ∩ grams(B)| /
    |grams(A)|. Jaccard misses a short document quoted inside a long
    one (the union dilutes it); containment is exactly the
    quote/sub-document detector. A pair is reported when EITHER
    direction reaches ``threshold``.

    Same inverted-index plan as the Jaccard operator (distinct grams →
    posting join on (block, gram) → per-pair shared count → sizes from
    the pair itself): work tracks posting-list sizes, never block².
    Returns (id_a, id_b, shared, n_a, n_b, contain_ab, contain_ba)
    with id_a < id_b and ratios rounded to 6.
    """
    toks = F.split(F.col(text_col), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))
            ),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    block = F.col(block_col) if block_col else F.lit(1)
    base = fan_out(df).select(
        block.alias("_block"),
        F.col(id_col),
        grams.alias("_grams"),
        F.size(grams).alias("_ng"),
    )
    postings = base.select(
        "_block", id_col, "_ng", F.explode("_grams").alias("_gram")
    )
    a = postings.select(
        "_block",
        F.col(id_col).alias("id_a"),
        F.col("_ng").alias("n_a"),
        "_gram",
    )
    b = postings.select(
        "_block",
        F.col(id_col).alias("id_b"),
        F.col("_ng").alias("n_b"),
        "_gram",
    )
    pairs = (
        a.join(b, ["_block", "_gram"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    cab = F.round(F.col("shared") / F.col("n_a"), 6)
    cba = F.round(F.col("shared") / F.col("n_b"), 6)
    return pairs.select(
        "id_a",
        "id_b",
        "shared",
        "n_a",
        "n_b",
        cab.alias("contain_ab"),
        cba.alias("contain_ba"),
    ).filter(
        (F.col("contain_ab") >= threshold)
        | (F.col("contain_ba") >= threshold)
    )


def lsh_quality_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 5,
    bands: int = 2,
    rows_per_band: int = 4,
    ngram_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Measure, don't guess: the 2×2 confusion of the MinHash-LSH
    candidate generator against exact n-gram-Jaccard ground truth —
    (is_candidate, is_duplicate, n_pairs) over EVERY pair of the
    input. Recall = cand∧dup / dup is the number that justifies a
    banding configuration before a 100 TB run; precision bounds the
    verify-stage bill.

    This is an EVALUATION operator: ground truth needs all O(n²)
    pairs, so run it on a documented sample of the corpus (the
    tuning-run contract — same reason ``hard negatives`` and
    ``ann_ivf`` carry recall verdicts). The candidate side is the
    production banding (`band_keys_long`) unchanged; the truth side
    computes exact token-n-gram Jaccard per pair with plain string
    grams (no hashing) so an oracle can mirror it verbatim."""
    toks = F.split(F.col(text_col), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(toks) - (ngram_n - 1), F.lit(1))
            ),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(ngram_n)]
            ),
        )
    )
    gsets = df.select(F.col(id_col).alias("_id"), grams.alias("_g"))
    a = gsets.select(F.col("_id").alias("id_a"), F.col("_g").alias("_ga"))
    b = gsets.select(F.col("_id").alias("id_b"), F.col("_g").alias("_gb"))
    inter = F.size(F.array_intersect("_ga", "_gb"))
    union = F.size("_ga") + F.size("_gb") - inter
    jac = F.round(inter.cast("double") / union.cast("double"), 6)
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (jac >= threshold).alias("is_duplicate"))
    )
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    keys = band_keys_long(sigs, id_col, bands, rows_per_band)
    cand = (
        keys.select("band", "band_key", F.col(id_col).alias("id_a"))
        .join(
            keys.select("band", "band_key", F.col(id_col).alias("id_b")),
            ["band", "band_key"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .withColumn("_c", F.lit(True))
    )
    return (
        pairs.join(cand, ["id_a", "id_b"], "left")
        .groupBy(
            F.coalesce(F.col("_c"), F.lit(False)).alias("is_candidate"),
            "is_duplicate",
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def source_overlap_matrix(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n: int = 3,
) -> DataFrame:
    """Pairwise content overlap BETWEEN SOURCES: for every source pair,
    the Jaccard and containment of their distinct token-n-gram sets —
    the corpus-composition diagnostic that tells you two "different"
    crawls are actually the same feed (dedup them jointly, or one is
    redundant) before you spend an epoch on both.

    SCALE SHAPE: per-source gram sets collapse doc-level volume to
    (source, gram) DISTINCT rows in one map-combined aggregate — gram
    cardinality, not corpus size. The pair join is a self-equi-join on
    gram with source_a < source_b: per-gram fan-out is bounded by
    #sources² (sources are a handful by construction — this is a
    SOURCE-level matrix, not a doc-level one), so the join output is
    ≤ grams · S². Sizes broadcast back. Returns (source_a, source_b,
    n_grams_a, n_grams_b, n_shared, jaccard, containment) rounded 6.
    """
    toks = F.split(F.col(text_col), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))
            ),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    gsets = (
        fan_out(df)
        .select(F.col(group_col).alias("_g"), F.explode(grams).alias("_gram"))
        .distinct()
    )
    sizes = gsets.groupBy("_g").agg(F.count(F.lit(1)).alias("_sz"))
    a = gsets.select(F.col("_g").alias("source_a"), "_gram")
    b = gsets.select(F.col("_g").alias("source_b"), "_gram")
    inter = (
        a.join(b, "_gram")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(
        F.col("_g").alias("source_a"), F.col("_sz").alias("n_grams_a")
    )
    sb = sizes.select(
        F.col("_g").alias("source_b"), F.col("_sz").alias("n_grams_b")
    )
    shared = F.col("n_shared").cast("double")
    union = (
        F.col("n_grams_a") + F.col("n_grams_b") - F.col("n_shared")
    ).cast("double")
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_grams_a",
            "n_grams_b",
            "n_shared",
            F.round(shared / union, 6).alias("jaccard"),
            F.round(
                shared
                / F.least(F.col("n_grams_a"), F.col("n_grams_b")).cast(
                    "double"
                ),
                6,
            ).alias("containment"),
        )
    )


def cluster_representatives(
    docs: DataFrame,
    clusters: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep-BEST dedup decision: per near-dup cluster, elect the
    highest-quality document (ties → lowest id) instead of
    ``dedup_clusters``'s min-id canonical — the curation step that
    keeps the cleanest copy of each duplicated page rather than an
    arbitrary one.

    SCALE SHAPE: one aggregate of ``max(struct(quality, -id))`` per
    cluster — map-side combined, no per-cluster sort window, so a
    mega-cluster (the viral page duplicated everywhere) reduces in
    parallel instead of serializing one task. Returns (cluster_id,
    rep_id, rep_quality, cluster_size)."""
    joined = clusters.join(
        docs.select(F.col(id_col), F.col(quality_col)), id_col
    )
    best = F.max(
        F.struct(
            F.col(quality_col).alias("q"),
            (-F.col(id_col)).alias("negid"),
        )
    )
    return (
        joined.groupBy("cluster_id")
        .agg(best.alias("_best"), F.count(F.lit(1)).alias("cluster_size"))
        .select(
            "cluster_id",
            (-F.col("_best.negid")).alias("rep_id"),
            F.col("_best.q").alias("rep_quality"),
            "cluster_size",
        )
    )
