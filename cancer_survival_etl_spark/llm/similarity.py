"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, one broadcast join, dot
products as JVM expressions (F.zip_with + F.aggregate), no Python in the
hot path.

Scale path: LSH bucketing via random-hyperplane sign bits. Hyperplane
components are deterministic pseudo-randoms derived from md5(plane, dim)
— reproducible with no stored model. Candidates = same-bucket vectors;
probing multiple tables recovers recall. At 100 TB an IVF layout
(k-means partitions written as parquet partitions, probe nearest
centroids) is the natural next step; bucketing here demonstrates the
partition-pruned shape with zero ML dependencies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cancer_survival_etl_spark.operators.partitioning import fan_out


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def normalize_embeddings(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """L2-normalize once up front so cosine becomes a plain dot product —
    halves the arithmetic in every subsequent comparison."""
    v = F.col(vec_col).cast("array<double>")
    n = _norm(v)
    return df.withColumn(
        vec_col, F.transform(v, lambda x: x / n)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, rank per query, keep k.

    Returns (query_id, neighbor_id, cosine, rank_val). Excludes
    self-matches. Ties broken by neighbor id for determinism.
    """
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    cos = _dot(F.col("_cv"), F.col("_qv")) / (
        _norm(F.col("_cv")) * _norm(F.col("_qv"))
    )
    scored = scored.select(
        "query_id", "neighbor_id", F.round(cos, 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank_val", F.row_number().over(w))
        .filter(F.col("rank_val") <= k)
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic distributed k-means (Lloyd) for the IVF cell layout.

    Init = the first ``k`` vectors by id (deterministic, reproducible).
    Per iteration: assign every vector to its max-cosine centroid
    (broadcast join + row_number argmax — one shuffle), then recompute
    each centroid as the element-wise mean of its members via
    posexplode → groupBy (centroid, dim) → avg → rebuild array. The
    per-iteration shuffle is O(n·d) rows of (id, dim, value) — the
    standard distributed Lloyd shape; centroids stay tiny and broadcast.

    Returns (centroid_id, _cenv) ready for ``ivf_topk(centroids=...)``.
    """
    cen = corpus.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).cast("array<double>").alias("_cenv"),
    )
    vecs = fan_out(corpus).select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).cast("array<double>").alias("_vv"),
    )
    for _ in range(iters):
        cos = F.round(
            _dot(F.col("_vv"), F.col("_cenv"))
            / (_norm(F.col("_vv")) * _norm(F.col("_cenv"))),
            6,
        )
        # argmax as a map-side-combinable max(struct) aggregate (the
        # pq_train pattern, r10): max cos first, ties to the SMALLEST
        # centroid id via the negated id — identical to the former
        # (cos DESC, centroid_id ASC) row_number window, including
        # Spark's NaN-greatest double ordering, without hash-exchanging
        # and sorting the k-times-fanned-out vector payload.
        assigned = (
            vecs.join(F.broadcast(cen), how="cross")
            .groupBy("_vid")
            .agg(
                F.max(
                    F.struct(
                        cos.alias("_c"),
                        (-F.col("centroid_id")).alias("_ncid"),
                    )
                ).alias("_best"),
                F.first("_vv").alias("_vv"),
            )
            .select(
                (-F.col("_best._ncid")).alias("centroid_id"), "_vv"
            )
        )
        cen = (
            assigned.select(
                "centroid_id", F.posexplode("_vv").alias("_dim", "_x")
            )
            .groupBy("centroid_id", "_dim")
            .agg(F.avg("_x").alias("_m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("_dim", "_m"))
                ).alias("_pairs")
            )
            .select(
                "centroid_id",
                F.transform(F.col("_pairs"), lambda p: p.getField("_m")).alias(
                    "_cenv"
                ),
            )
        )
    return cen


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    ``n_centroids`` cells by nearest centroid, probe only the query's
    ``nprobe`` nearest cells.

    Default centroid choice is deterministic (the first ``n_centroids``
    vectors by id) so results are reproducible and oracle-checkable;
    pass ``centroids=kmeans_centroids(corpus, ...)`` for trained cells
    — the *query* path (assign → probe → cell-pruned scan) is identical
    either way. At 100 TB the cell id becomes a parquet partition
    column: probing = partition pruning, and each query touches
    nprobe/n_centroids of the data.

    Scores are rounded to 6 decimals before every argmax/rank so
    tie-breaks are engine-stable.
    """
    if centroids is None:
        centroids = corpus.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("_cenv"),
        )

    def assign(df: DataFrame, prefix: str, keep: int) -> DataFrame:
        """Rank ``df``'s vectors against all centroids, keep the top
        ``keep`` cells per vector."""
        scored = df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).cast("array<double>").alias(f"_{prefix}v"),
        ).join(F.broadcast(centroids), how="cross")
        cos = F.round(
            _dot(F.col(f"_{prefix}v"), F.col("_cenv"))
            / (_norm(F.col(f"_{prefix}v")) * _norm(F.col("_cenv"))),
            6,
        )
        w = Window.partitionBy(f"{prefix}_id").orderBy(
            cos.desc(), F.col("centroid_id")
        )
        return (
            scored.withColumn("_crank", F.row_number().over(w))
            .filter(F.col("_crank") <= keep)
            .select(f"{prefix}_id", f"_{prefix}v", "centroid_id")
        )

    cells = assign(fan_out(corpus), "neighbor", 1)
    probes = assign(queries, "query", nprobe)
    cand = cells.join(F.broadcast(probes), "centroid_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = _dot(F.col("_neighborv"), F.col("_queryv")) / (
        _norm(F.col("_neighborv")) * _norm(F.col("_queryv"))
    )
    scored = cand.select(
        "query_id", "neighbor_id", F.round(cos, 6).alias("cosine")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank_val", F.row_number().over(w))
        .filter(F.col("rank_val") <= k)
    )


def hyperplane_bucket(
    vec_col: str, num_planes: int = 8, table: int = 0
) -> Column:
    """LSH bucket id: sign bits of ``num_planes`` deterministic random
    hyperplanes. Component r(p, d) = md5-derived uniform in [-1, 1).
    """
    v = F.col(vec_col).cast("array<double>")
    bits = []
    for p in range(num_planes):
        # r(p, d): hash the (table, plane, dim) triple into [-1, 1).
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, d: x
                * (
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("_", F.lit(table), F.lit(p), d)), 1, 8
                        ),
                        16,
                        10,
                    ).cast("double")
                    / F.lit(2147483648.0)
                    - 1.0
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    num_tables: int = 2,
) -> DataFrame:
    """Approximate cosine top-k: compare only vectors sharing an LSH
    bucket in ANY of ``num_tables`` tables.

    The join key is (table, bucket) — at scale this is a co-partitioned
    equi-join touching a tiny candidate fraction, vs the full cross
    product of brute force.
    """
    def with_buckets(df: DataFrame, prefix: str) -> DataFrame:
        frames = []
        for t in range(num_tables):
            frames.append(
                df.select(
                    F.col(id_col).alias(f"{prefix}_id"),
                    F.col(vec_col).cast("array<double>").alias(f"_{prefix}v"),
                    F.lit(t).alias("table_id"),
                    hyperplane_bucket(vec_col, num_planes, t).alias("bucket"),
                )
            )
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionByName(fr)
        return out

    cb = with_buckets(fan_out(corpus), "neighbor")
    qb = with_buckets(queries, "query")
    cand = cb.join(F.broadcast(qb), ["table_id", "bucket"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = _dot(F.col("_neighborv"), F.col("_queryv")) / (
        _norm(F.col("_neighborv")) * _norm(F.col("_queryv"))
    )
    scored = (
        cand.select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank_val", F.row_number().over(w))
        .filter(F.col("rank_val") <= k)
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Scalar int8 quantization of an embedding column: per-dimension
    global [min, max] → each component mapped to an integer code in
    [-127, 127] (``round((v-lo)/(hi-lo)*254) - 127``; degenerate
    dimensions code to 0). The standard 4× memory/IO shrink applied
    before ANN index build or shipping vectors to a training job —
    recall loss is negligible for cosine at 8 bits (public result,
    e.g. Faiss SQ8).

    Plan: one explode to (id, dim, value), one dim-level aggregate
    (#dims rows — broadcast back), pure-arithmetic code map. Returns
    (id, dim, code) long-form so the result is engine-portable and
    oracle-checkable scalar-by-scalar; reassemble with
    ``groupBy(id).agg(array_sort(collect_list(struct(dim, code))))``
    when a packed array column is needed.

    Scale: the explode is dims × rows but fixed-width; the aggregate
    is map-side combined to #dims cells per partition. The quantized
    codes shuffle at 1 byte of payload per component instead of 4 —
    the point of the exercise.
    """
    flat = df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "dim", "_v"
        ),
    )
    stats = flat.groupBy("dim").agg(
        F.min("_v").alias("_lo"), F.max("_v").alias("_hi")
    )
    code = F.when(
        F.col("_hi") > F.col("_lo"),
        F.round(
            (F.col("_v") - F.col("_lo"))
            / (F.col("_hi") - F.col("_lo"))
            * F.lit(254)
        ).cast("int")
        - F.lit(127),
    ).otherwise(F.lit(0))
    return flat.join(F.broadcast(stats), "dim").select(
        id_col, "dim", code.alias("code")
    )


def binary_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """1-bit binary quantization: per-dimension mid-range threshold
    ((min+max)/2 — min/max are exact and deterministic, unlike a
    distributed float mean), bit = component > threshold, packed 64
    dimensions per long word → (id, bits array<long>). 32× smaller
    than float32 — the memory-bandwidth-bound scan format behind
    modern binary-quantization ANN (RaBitQ/BQ family): Hamming
    distance on packed words approximates angular order well enough
    to shortlist, exact cosine reranks (``binary_hamming_topk``).

    Plan: one explode to (id, dim, value), one #dims-row aggregate
    broadcast back (the ``quantize_embeddings`` shape), then a
    bit_or aggregate packs words — bit_or, not sum, so bit 63 never
    overflows the long. Scale: everything map-side combined; the
    packed index is #rows × (dims/64) longs.
    """
    flat = df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "dim", "_v"
        ),
    )
    stats = flat.groupBy("dim").agg(
        ((F.min("_v") + F.max("_v")) / F.lit(2.0)).alias("_thr")
    )
    words = (
        flat.join(F.broadcast(stats), "dim")
        .select(
            id_col,
            F.expr("dim DIV 64").alias("_w"),
            F.expr(
                "shiftleft(CAST(_v > _thr AS BIGINT),"
                " CAST(dim % 64 AS INT))"
            ).alias("_bitval"),
        )
        .groupBy(id_col, "_w")
        .agg(F.expr("bit_or(_bitval)").alias("_word"))
    )
    return words.groupBy(id_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("_w"), F.col("_word")))
            ),
            lambda s: s.getField("_word"),
        ).alias("bits")
    )


def binary_hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-quantization ANN: SCAN on packed sign bits (Hamming
    distance = Σ bit_count(xor(word_a, word_b)) — whole-stage-codegen
    integer ops over 64× fewer bytes than the float scan), shortlist
    ``rerank`` per query (ties by neighbor id), then exact-cosine
    VERIFY on the shortlist only, top ``k``.

    Both sides quantize against the same corpus-derived thresholds
    (queries drawn from the corpus id space are excluded from their
    own result). Returns (query_id, neighbor_id, hamming, cosine,
    rank_val).

    Scale: the scan is a broadcast nested loop over Q × N packed
    rows — the format exists precisely to make that scan cheap; the
    rerank joins fetch only rerank × Q float vectors. At larger Q,
    bucket the bit index (e.g. by leading word) exactly like the LSH
    path.
    """
    bits = binary_quantize(
        corpus.unionByName(queries).dropDuplicates([id_col]),
        vec_col,
        id_col,
    )
    qb = queries.select(F.col(id_col).alias("query_id")).join(
        bits.select(
            F.col(id_col).alias("query_id"), F.col("bits").alias("_qb")
        ),
        "query_id",
    )
    nb = corpus.select(F.col(id_col).alias("neighbor_id")).join(
        bits.select(
            F.col(id_col).alias("neighbor_id"), F.col("bits").alias("_nb")
        ),
        "neighbor_id",
    )
    hd = F.aggregate(
        F.zip_with(
            F.col("_nb"),
            F.col("_qb"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        nb.join(
            F.broadcast(qb), F.col("query_id") != F.col("neighbor_id")
        )
        .select("query_id", "neighbor_id", hd.alias("hamming"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id")
    )
    shortlist = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= rerank)
        .drop("_r")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    cos = _dot(F.col("_cv"), F.col("_qv")) / (
        _norm(F.col("_cv")) * _norm(F.col("_qv"))
    )
    reranked = (
        shortlist.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "hamming",
            F.round(cos, 6).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        reranked.withColumn("rank_val", F.row_number().over(w2))
        .filter(F.col("rank_val") <= k)
    )


def _dist2(a: Column, b: Column) -> Column:
    """Squared L2 distance between two equal-length arrays, as a
    sequential JVM fold (deterministic addend order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dist2_n(a: Column, b: Column, n: int) -> Column:
    """``_dist2`` with a STATICALLY KNOWN length ``n`` (r11, guide
    §1.2 step 2): the same left-associated addend order expanded to
    plain element_at arithmetic, which whole-stage codegen compiles —
    the higher-order-function fold stays interpreted (the r10
    tranche-2 lesson was about HOFs, measured 3-5× slower in the PQ
    hot loops). Bit-identical to ``_dist2`` for the length-``n``
    arrays every PQ call site produces (0.0 + t₁ ≡ t₁; + is
    left-associative in both forms)."""
    total = None
    for i in range(1, n + 1):
        d = F.element_at(a, i) - F.element_at(b, i)
        term = d * d
        total = term if total is None else total + term
    return total


def pq_subvectors(
    df: DataFrame,
    m: int,
    sub_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "vec_id",
) -> DataFrame:
    """Split each vector into ``m`` contiguous ``sub_dim``-wide
    subvectors → long form (id, sub, subv). The explode is ×m on row
    count but each row carries only 1/m of the payload — total bytes
    are unchanged, and the long form is what PQ's per-subspace
    codebook join wants."""
    v = F.col(vec_col).cast("array<double>")
    subs = F.array(
        *[F.slice(v, i * sub_dim + 1, sub_dim) for i in range(m)]
    )
    return df.select(
        F.col(id_col).alias(out_id),
        F.posexplode(subs).alias("sub", "subv"),
    )


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    k: int = 16,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebooks: one ``k``-centroid codebook per
    subspace — the Jégou et al. PQ layout that compresses a D-dim float
    vector to ``m`` byte codes (here 64 doubles → 8 codes, a 64×
    shrink) while keeping distances computable from an m×k lookup
    table.

    Init is deterministic (subvectors of the first ``k`` vectors by
    id), so with ``iters=0`` the whole PQ pipeline is reproducible on
    any engine and oracle-checkable; ``iters>0`` runs per-subspace
    Lloyd rounds (assign by squared-L2 argmin, recompute element-wise
    means) — every subspace trains in the SAME distributed pass, so an
    iteration is one assign shuffle + one mean shuffle regardless of
    ``m``.

    Returns (sub, centroid_id, _cbv) — m·k tiny rows, always
    broadcast downstream.
    """
    cb = pq_subvectors(
        corpus.filter(F.col(id_col) < k), m, sub_dim, id_col, vec_col
    ).select(
        "sub", F.col("vec_id").alias("centroid_id"), F.col("subv").alias("_cbv")
    )
    if iters:
        subv = pq_subvectors(
            fan_out(corpus), m, sub_dim, id_col, vec_col
        )
        for _ in range(iters):
            d2 = F.round(_dist2_n(F.col("subv"), F.col("_cbv"), sub_dim), 6)
            # argmin as a map-side-combinable min(struct) aggregate —
            # same (d2 asc, centroid_id asc) tie order as the former
            # row_number window, without the per-(vec, sub) sort
            # shuffle of the join output
            assigned = (
                subv.join(F.broadcast(cb), "sub")
                .groupBy("vec_id", "sub")
                .agg(
                    F.min(
                        F.struct(
                            d2.alias("_d2"),
                            F.col("centroid_id").alias("_cid"),
                        )
                    ).alias("_best"),
                    F.first("subv").alias("subv"),
                )
                .select(
                    "sub",
                    F.col("_best._cid").alias("centroid_id"),
                    "subv",
                )
            )
            cb = (
                assigned.select(
                    "sub",
                    "centroid_id",
                    F.posexplode("subv").alias("_dim", "_x"),
                )
                .groupBy("sub", "centroid_id", "_dim")
                .agg(F.avg("_x").alias("_mean"))
                .groupBy("sub", "centroid_id")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("_dim", "_mean"))
                    ).alias("_pairs")
                )
                .select(
                    "sub",
                    "centroid_id",
                    F.transform(
                        F.col("_pairs"), lambda p: p.getField("_mean")
                    ).alias("_cbv"),
                )
            )
    return cb


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as ``m`` codebook indices → (vec_id, sub,
    code): per subspace, the squared-L2-argmin centroid (distance
    rounded to 6 dp before the argmin, ties by centroid id — engine-
    stable). One broadcast join + one window; the output is the
    compressed corpus that ships to ADC search at ~1 byte/component
    instead of 4-8."""
    subv = pq_subvectors(fan_out(corpus), m, sub_dim, id_col, vec_col)
    d2 = F.round(_dist2_n(F.col("subv"), F.col("_cbv"), sub_dim), 6)
    # argmin via min(struct(d2, centroid_id)) — map-side combinable,
    # identical (round-6 d2, centroid id) tie discipline as the former
    # row_number window, no sort shuffle
    return (
        subv.join(F.broadcast(codebooks), "sub")
        .groupBy("vec_id", "sub")
        .agg(
            F.min(
                F.struct(
                    d2.alias("_d2"),
                    F.col("centroid_id").alias("_cid"),
                )
            ).alias("_best")
        )
        .select("vec_id", "sub", F.col("_best._cid").alias("code"))
    )


def pq_topk_adc(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-``k``: score every corpus vector
    against each query using ONLY its PQ codes and the query's m×k
    distance table — the uncompressed corpus is never touched at query
    time.

    Pipeline: distance table = queries' subvectors × codebooks (m·k
    rows per query — broadcast); each (vec, sub) code row picks its
    table cell by (query, sub, code) equi-join; per-(query, neighbor)
    approx dist² = Σ over the m subspaces (each addend pre-rounded to
    6 dp, the total re-rounded — engine-stable). Rank ascending, ties
    by neighbor id.

    Scale: codes are the fact (n·m fixed-width rows); the broadcast
    table join is narrow; the only shuffle is the (query, neighbor)
    sum — n·|queries| rows of 3 numbers. Compose with the IVF cell
    layout (encode per cell, probe then ADC) for the IVF-PQ shape
    where the scan itself prunes. Returns (query_id, neighbor_id,
    adist2, rank_val).
    """
    if codebooks is None:
        codebooks = pq_train(
            corpus, m, sub_dim, n_codes, iters, id_col, vec_col
        )
    if codes is None:
        codes = pq_encode(corpus, codebooks, m, sub_dim, id_col, vec_col)
    qsub = pq_subvectors(
        queries, m, sub_dim, id_col, vec_col, out_id="query_id"
    )
    table = qsub.join(F.broadcast(codebooks), "sub").select(
        "query_id",
        "sub",
        F.col("centroid_id").alias("code"),
        F.round(_dist2_n(F.col("subv"), F.col("_cbv"), sub_dim), 6).alias("_d2"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist2").asc(), F.col("neighbor_id")
    )
    return (
        codes.join(F.broadcast(table), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.round(F.sum("_d2"), 6).alias("adist2"))
        .withColumn("rank_val", F.row_number().over(w))
        .filter(F.col("rank_val") <= k)
    )


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    m: int = 16,
    sub_dim: int = 4,
    n_codes: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ shortlist + exact re-rank — the production two-stage ANN
    serving shape (FAISS ``IndexPQ`` + refine): ADC over the byte
    codes selects ``shortlist`` candidates per query (cheap — the
    corpus is scanned compressed), then ONLY those candidates' full
    vectors are fetched and exactly cosine-ranked for the final
    ``k``. Quantization error affects the shortlist boundary, not the
    returned ordering, so recall is governed by shortlist/k, not by
    codebook resolution.

    Scale: stage 1 touches n·m byte-code rows; stage 2 touches
    |queries|·shortlist full vectors — the expensive exact math runs
    on a candidate set 10⁴-10⁶× smaller than the corpus. Returns
    (query_id, neighbor_id, cosine, rank_val) — same contract as
    ``brute_force_topk``.
    """
    cand = pq_topk_adc(
        corpus, queries, shortlist, m, sub_dim, n_codes, iters,
        id_col, vec_col,
    ).select("query_id", "neighbor_id")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    cos = _dot(F.col("_cv"), F.col("_qv")) / (
        _norm(F.col("_cv")) * _norm(F.col("_qv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
        .withColumn("rank_val", F.row_number().over(w))
        .filter(F.col("rank_val") <= k)
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> None:
    """Materialize an IVF index as a PARTITIONED parquet lake: vectors
    written under ``path/vectors/cell=<id>/`` (one partition directory
    per IVF cell) plus the tiny centroid table at ``path/centroids``.

    This is the piece that turns ANN probing into PARTITION PRUNING on
    a real lake: ``query_ivf_index`` reads only the probed cells'
    directories — at 100 TB of embeddings a nprobe/n_centroids probe
    touches exactly that fraction of the files, enforced by the scan's
    PartitionFilters (pinned by test via ``inputFiles()``). Build cost
    is one assign (broadcast centroids + per-row argmax) and one
    partitioned write.
    """
    cen = (
        centroids
        if centroids is not None
        else corpus.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("_cenv"),
        )
    )
    vecs = fan_out(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    cos = F.round(
        _dot(F.col("vec"), F.col("_cenv"))
        / (_norm(F.col("vec")) * _norm(F.col("_cenv"))),
        6,
    )
    w = Window.partitionBy("vec_id").orderBy(
        cos.desc(), F.col("centroid_id")
    )
    assigned = (
        vecs.join(F.broadcast(cen), how="cross")
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("vec_id", "vec", F.col("centroid_id").alias("cell"))
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/vectors"
    )
    cen.select(
        "centroid_id", F.col("_cenv").alias("vec")
    ).write.mode("overwrite").parquet(f"{path}/centroids")


def query_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``k`` cosine neighbours from a persisted IVF index, reading
    ONLY the probed cells (partition pruning, not a full scan).

    The probe set is the union of every query's ``nprobe`` nearest
    centroids — collected (it is ≤ |queries|·nprobe ints) and pushed
    into the scan as a partition filter; per-query cell assignment then
    restricts candidates so a query only scores against ITS cells.
    Returns (query_id, neighbor_id, cosine, rank_val) — identical
    contract (and, with the same centroids, identical results) to the
    in-memory ``ivf_topk``.
    """
    cen = F.broadcast(
        spark.read.parquet(f"{path}/centroids").select(
            "centroid_id", F.col("vec").alias("_cenv")
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    qcos = F.round(
        _dot(F.col("_qv"), F.col("_cenv"))
        / (_norm(F.col("_qv")) * _norm(F.col("_cenv"))),
        6,
    )
    wq = Window.partitionBy("query_id").orderBy(
        qcos.desc(), F.col("centroid_id")
    )
    probes = (
        q.join(cen, how="cross")
        .withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= nprobe)
        .select("query_id", "_qv", F.col("centroid_id").alias("cell"))
        .localCheckpoint(eager=False)  # tiny; pinned by the cell probe
    )
    cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    vectors = spark.read.parquet(f"{path}/vectors").filter(
        F.col("cell").isin(cells)  # -> PartitionFilters: only probed dirs
    )
    cos = F.round(
        _dot(F.col("vec"), F.col("_qv"))
        / (_norm(F.col("vec")) * _norm(F.col("_qv"))),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        vectors.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
        .withColumn("rank_val", F.row_number().over(w))
        .filter(F.col("rank_val") <= k)
    )


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 8,
    m: int = 16,
    sub_dim: int = 4,
    n_codes: int = 16,
    pq_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    residual: bool = False,
    per_cell: bool = False,
) -> None:
    """Materialize an IVF-PQ index (the FAISS ``IndexIVFPQ`` layout, as
    a parquet lake): the cell-partitioned full vectors and centroid
    table of ``build_ivf_index``, PLUS per-vector PQ codes written
    under ``path/codes/cell=<id>/`` and the codebooks at
    ``path/codebooks``.

    This composes the two pruning levers: a query's probe prunes to
    nprobe/n_centroids of the FILES (partition filter), and within the
    probed cells the scan reads the byte codes (m longs/vector here;
    bytes in a packed layout) instead of the full vectors — the
    full-precision lake is touched only for the final shortlist
    re-rank.

    ``residual=True`` is the full FAISS formulation: codebooks are
    trained on (and codes encode) the RESIDUAL v − centroid(cell), so
    the m×k codebook spends its resolution on within-cell variation
    instead of re-describing the coarse cell position — tighter codes
    at the same bit budget. The query side must be built with the same
    flag (it subtracts each probed cell's centroid from the query
    before the distance table).

    ``per_cell=True`` goes one refinement further: each cell trains
    its OWN codebook (``pq_train_per_cell``) instead of sharing one —
    the codebooks lake gains a ``cell`` column and the query side's
    distance-table join becomes (cell, sub)-keyed. Combine with
    ``residual=True`` for the full local-codebook IVFPQ."""
    build_ivf_index(
        corpus, path, n_centroids, id_col, vec_col, centroids
    )
    assigned = corpus.sparkSession.read.parquet(f"{path}/vectors")
    if residual:
        cen = F.broadcast(
            corpus.sparkSession.read.parquet(f"{path}/centroids").select(
                F.col("centroid_id").alias("cell"),
                F.col("vec").alias("_cenv"),
            )
        )
        enc_input = assigned.join(cen, "cell").select(
            "vec_id",
            "cell",
            F.zip_with(
                F.col("vec"), F.col("_cenv"), lambda x, y: x - y
            ).alias("vec"),
        )
    else:
        enc_input = assigned
    if per_cell:
        enc_input = enc_input.localCheckpoint(eager=False)
        cb = pq_train_per_cell(
            enc_input, m, sub_dim, n_codes, pq_iters, "vec_id", "vec"
        )
        codes = pq_encode_per_cell(enc_input, cb, m, sub_dim, "vec_id", "vec")
        codes.write.mode("overwrite").partitionBy("cell").parquet(
            f"{path}/codes"
        )
        cb.select(
            "cell", "sub", "centroid_id", F.col("_cbv").alias("vec")
        ).write.mode("overwrite").parquet(f"{path}/codebooks")
        return
    cb = pq_train(
        enc_input, m, sub_dim, n_codes, pq_iters, "vec_id", "vec"
    )
    codes = pq_encode(enc_input, cb, m, sub_dim, "vec_id", "vec")
    codes.join(
        enc_input.select("vec_id", "cell"), "vec_id"
    ).write.mode("overwrite").partitionBy("cell").parquet(f"{path}/codes")
    cb.select("sub", "centroid_id", F.col("_cbv").alias("vec")).write.mode(
        "overwrite"
    ).parquet(f"{path}/codebooks")


def query_ivfpq_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    shortlist: int = 50,
    m: int = 16,
    sub_dim: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = False,
    per_cell: bool = False,
) -> DataFrame:
    """Top-``k`` cosine neighbours from a persisted IVF-PQ index:
    probe → ADC over ONLY the probed cells' code files → exact re-rank
    of the shortlist against ONLY those cells' full vectors. Both scans
    carry the probe set as a partition filter; the full-precision reads
    are |queries|·shortlist rows, not the corpus.

    Returns (query_id, neighbor_id, cosine, rank_val) — the exact
    cosine for every returned pair (re-rank), so scores are directly
    comparable to ``brute_force_topk``."""
    cen = F.broadcast(
        spark.read.parquet(f"{path}/centroids").select(
            "centroid_id", F.col("vec").alias("_cenv")
        )
    )
    cb_cols = (["cell"] if per_cell else []) + ["sub"]
    cb = F.broadcast(
        spark.read.parquet(f"{path}/codebooks").select(
            *cb_cols, F.col("centroid_id").alias("code"),
            F.col("vec").alias("_cbv"),
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    qcos = F.round(
        _dot(F.col("_qv"), F.col("_cenv"))
        / (_norm(F.col("_qv")) * _norm(F.col("_cenv"))),
        6,
    )
    wq = Window.partitionBy("query_id").orderBy(
        qcos.desc(), F.col("centroid_id")
    )
    probes = (
        q.join(cen, how="cross")
        .withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= nprobe)
        .select("query_id", "_qv", F.col("centroid_id").alias("cell"))
        .localCheckpoint(eager=False)  # pinned by the cell probe (r10)
    )
    cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    # ADC distance table for each query from its subvectors; with a
    # residual index the query is first re-expressed relative to each
    # probed cell's centroid (matching the codes' frame of reference)
    if residual:
        qres = probes.join(
            F.broadcast(
                spark.read.parquet(f"{path}/centroids").select(
                    F.col("centroid_id").alias("cell"),
                    F.col("vec").alias("_pcv"),
                )
            ),
            "cell",
        ).select(
            "query_id",
            "cell",
            F.zip_with(
                F.col("_qv"), F.col("_pcv"), lambda x, y: x - y
            ).alias("_tv"),
        )
    else:
        qres = probes.select(
            "query_id", "cell", F.col("_qv").alias("_tv")
        )
    qsub = qres.select(
        "query_id",
        "cell",
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col("_tv"), i * sub_dim + 1, sub_dim)
                    for i in range(m)
                ]
            )
        ).alias("sub", "_qsv"),
    )
    table = qsub.join(cb, cb_cols).select(
        "query_id",
        "cell",
        "sub",
        "code",
        F.round(_dist2_n(F.col("_qsv"), F.col("_cbv"), sub_dim), 6).alias("_d2"),
    )
    codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("cell").isin(cells)  # -> PartitionFilters
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("adist2").asc(), F.col("neighbor_id")
    )
    cand = (
        codes.join(F.broadcast(table), ["cell", "sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.round(F.sum("_d2"), 6).alias("adist2"))
        .withColumn("_sl", F.row_number().over(wa))
        .filter(F.col("_sl") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    vectors = spark.read.parquet(f"{path}/vectors").filter(
        F.col("cell").isin(cells)
    ).select(F.col("vec_id").alias("neighbor_id"), "vec")
    cos = F.round(
        _dot(F.col("vec"), F.col("_qv"))
        / (_norm(F.col("vec")) * _norm(F.col("_qv"))),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.join(vectors, "neighbor_id")
        .join(
            F.broadcast(probes.select("query_id", "_qv").dropDuplicates(["query_id"])),
            "query_id",
        )
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank_val", F.row_number().over(w))
        .filter(F.col("rank_val") <= k)
    )


def hard_negative_mining(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive-training hard negatives: for each anchor, the ``k``
    corpus vectors MOST cosine-similar to it among those with a
    DIFFERENT label — the mining step that turns a labeled embedding
    table into (anchor, hard-negative) training pairs. Easy negatives
    (random different-label rows) teach a model nothing; the hardest
    ones define the decision boundary.

    Brute-force form: one broadcast of the anchor set against the
    corpus — exact, the right baseline and the oracle-checkable
    contract. At 100 TB mine from an ANN shortlist instead: take
    ``pq_rerank_topk``/``query_ivfpq_index`` candidates at k' ≫ k and
    keep the top-k different-label rows — same downstream contract.

    Returns (anchor_id, anchor_label, neighbor_id, neighbor_label,
    cosine, rank_val); ranks rounded-cosine desc, ties by neighbor id.
    """
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    cos = _dot(F.col("_cv"), F.col("_qv")) / (
        _norm(F.col("_cv")) * _norm(F.col("_qv"))
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        c.join(
            F.broadcast(a),
            F.col("anchor_label") != F.col("neighbor_label"),
        )
        .select(
            "anchor_id",
            "anchor_label",
            "neighbor_id",
            "neighbor_label",
            F.round(cos, 6).alias("cosine"),
        )
        .withColumn("rank_val", F.row_number().over(w))
        .filter(F.col("rank_val") <= k)
    )


def build_lsh_pq_index(
    corpus: DataFrame,
    path: str,
    num_tables: int = 2,
    num_planes: int = 6,
    m: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    pq_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Materialize an EMBEDDING near-dup index with PQ codes riding in
    the band rows — the embedding analog of ``llm/dedup.py::
    build_band_index`` closing its handoff item (PQ codes in the
    incremental band-index path): entries are (table_id, bucket,
    vec_id, codes) where bucket is the hyperplane-LSH key and codes
    are the vector's m byte-sized PQ indices, so a later probe
    verifies candidates by ADC **on the index rows alone** — the raw
    corpus vectors are never read at probe time (the text-index probe
    still fetches candidate text; this one doesn't even do that).

    ``mode='append'`` is the ingest loop: codebooks are READ from the
    index (never retrained — appended codes must live in the same
    code space) and only the delta's entries land. ``overwrite``
    trains codebooks (deterministic with ``pq_iters=0``) and writes
    them to ``path/codebooks``."""
    spark = corpus.sparkSession
    if mode == "append":
        cb = spark.read.parquet(f"{path}/codebooks").select(
            "sub", "centroid_id", F.col("vec").alias("_cbv")
        )
    else:
        cb = pq_train(
            corpus, m, sub_dim, n_codes, pq_iters, id_col, vec_col
        )
        cb.select(
            "sub", "centroid_id", F.col("_cbv").alias("vec")
        ).write.mode("overwrite").parquet(f"{path}/codebooks")
    codes_wide = (
        pq_encode(corpus, cb, m, sub_dim, id_col, vec_col)
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("sub", "code"))
            ).alias("_p")
        )
        .select(
            id_col,
            F.transform(F.col("_p"), lambda p: p.getField("code")).alias(
                "codes"
            ),
        )
    )
    tables = [
        corpus.select(
            F.lit(t).alias("table_id"),
            hyperplane_bucket(vec_col, num_planes, t).alias("bucket"),
            F.col(id_col),
        )
        for t in range(num_tables)
    ]
    entries = tables[0]
    for t in tables[1:]:
        entries = entries.unionByName(t)
    entries.join(codes_wide, id_col).write.mode(mode).parquet(
        f"{path}/entries"
    )


def probe_lsh_pq_index(
    spark,
    path: str,
    new_vecs: DataFrame,
    threshold: float,
    num_tables: int = 2,
    num_planes: int = 6,
    m: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicates of an ingest delta against the indexed corpus,
    verified WITHOUT touching any corpus vector: the delta's LSH
    buckets equi-join the persisted entries (work ∝ delta + bucket
    collisions), then each candidate's stored PQ codes are scored by
    asymmetric distance against the delta vector's m×k table — the
    ``pq_topk_adc`` arithmetic verbatim (per-cell distance rounded to
    6 dp, the sum re-rounded), so the probe's adist2 is bit-identical
    to the in-memory ADC on the same codebooks. Pairs with adist2 ≤
    ``threshold`` survive. Returns (new_id, corpus_id, adist2)."""
    cb = spark.read.parquet(f"{path}/codebooks").select(
        "sub", F.col("centroid_id").alias("code"),
        F.col("vec").alias("_cbv"),
    )
    idx = spark.read.parquet(f"{path}/entries")
    probes = [
        new_vecs.select(
            F.lit(t).alias("table_id"),
            hyperplane_bucket(vec_col, num_planes, t).alias("bucket"),
            F.col(id_col).alias("_new_id"),
        )
        for t in range(num_tables)
    ]
    probe = probes[0]
    for t in probes[1:]:
        probe = probe.unionByName(t)
    cand = (
        probe.join(idx, ["table_id", "bucket"])
        .filter(F.col("_new_id") != F.col(id_col))
        .select("_new_id", F.col(id_col).alias("_old_id"), "codes")
        .distinct()
    )
    qsub = pq_subvectors(
        new_vecs, m, sub_dim, id_col, vec_col, out_id="_new_id"
    )
    table = qsub.join(F.broadcast(cb), "sub").select(
        "_new_id",
        "sub",
        "code",
        F.round(_dist2_n(F.col("subv"), F.col("_cbv"), sub_dim), 6).alias("_d2"),
    )
    return (
        cand.select(
            "_new_id", "_old_id", F.posexplode("codes").alias("sub", "code")
        )
        .join(table, ["_new_id", "sub", "code"])
        .groupBy("_new_id", "_old_id")
        .agg(F.round(F.sum("_d2"), 6).alias("adist2"))
        .filter(F.col("adist2") <= threshold)
        .select(
            F.col("_new_id").alias("new_id"),
            F.col("_old_id").alias("corpus_id"),
            "adist2",
        )
    )


def pq_pack_codes(codes: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Pack long-form PQ codes (vec_id, sub, code) into ONE binary
    cell per vector — byte i is subspace i's code (requires n_codes ≤
    256, the standard PQ byte budget). This is the real
    1-byte/component lake layout: a 64-dim float vector compressed by
    m=16 PQ codes stores as a single 16-byte value, no per-subspace
    row or array overhead. Returns (id, codes_bin)."""
    return (
        codes.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("sub", "code"))
            ).alias("_p")
        )
        .select(
            id_col,
            F.to_binary(
                F.array_join(
                    F.transform(
                        F.col("_p"),
                        lambda p: F.lpad(
                            F.hex(p.getField("code")), 2, "0"
                        ),
                    ),
                    "",
                ),
                F.lit("hex"),
            ).alias("codes_bin"),
        )
    )


def pq_topk_adc_packed(
    packed: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    m: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-``k`` over the PACKED byte codes: the per-query m×k
    distance tables are collected (|queries|·m·k doubles — broadcast
    scale by construction) and every corpus row is scored for ALL
    queries in one vectorized numpy gather per Arrow batch —
    ``T[q, sub, C]`` summed over subspaces. No (sub, code) join, no
    n·m row explosion: the corpus-side input is one narrow pass over
    n packed rows, and the only shuffle is the final per-query top-k.

    Arithmetic mirrors ``pq_topk_adc`` exactly (per-cell distance
    rounded to 6 dp, the per-pair sum re-rounded) so the two paths are
    interchangeable — pinned identical by test. Returns (query_id,
    neighbor_id, adist2, rank_val)."""
    import numpy as np
    import pandas as pd

    qsub = pq_subvectors(
        queries, m, sub_dim, id_col, vec_col, out_id="query_id"
    )
    tbl_rows = (
        qsub.join(F.broadcast(codebooks), "sub")
        .select(
            "query_id",
            "sub",
            F.col("centroid_id").alias("code"),
            F.round(_dist2_n(F.col("subv"), F.col("_cbv"), sub_dim), 6).alias("_d2"),
        )
        .collect()
    )
    qids = sorted({r["query_id"] for r in tbl_rows})
    qpos = {q: i for i, q in enumerate(qids)}
    n_codes = 1 + max(r["code"] for r in tbl_rows)
    table = np.zeros((len(qids), m, n_codes))
    for r in tbl_rows:
        table[qpos[r["query_id"]], r["sub"], r["code"]] = r["_d2"]
    qid_arr = np.asarray(qids)

    out_schema = (
        f"{id_col} long, query_id long, adist2 double"
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.frombuffer(
                b"".join(pdf["codes_bin"]), dtype=np.uint8
            ).reshape(len(pdf), m)
            # (q, rows): gather each subspace's cell, sum, re-round
            d = np.zeros((len(qid_arr), len(pdf)))
            for s in range(m):
                d += table[:, s, C[:, s]]
            d = d.round(6)
            rows = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.tile(
                        pdf[id_col].values, len(qid_arr)
                    ),
                    "query_id": np.repeat(qid_arr, rows),
                    "adist2": d.reshape(-1),
                }
            )

    w = Window.partitionBy("query_id").orderBy(
        F.col("adist2").asc(), F.col("neighbor_id")
    )
    return (
        packed.select(id_col, "codes_bin")
        .mapInPandas(score, out_schema)
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"), "adist2"
        )
        .withColumn("rank_val", F.row_number().over(w))
        .filter(F.col("rank_val") <= k)
    )


def matryoshka_overlap(
    emb: DataFrame,
    queries: DataFrame,
    prefix_dim: int = 16,
    k: int = 10,
) -> DataFrame:
    """Matryoshka truncation quality (Kusupati et al. 2022, arXiv
    2205.13147): top-k cosine neighbours computed on the FULL embedding
    vs on its ``prefix_dim``-dim PREFIX, reported as per-query overlap
    — the readout for "can retrieval run on the cheap prefix?".

    Both rankings are exact ``brute_force_topk`` runs (round-6 cosine,
    ties broken by neighbor id), so the overlap is deterministic and
    oracle-adjudicable. At scale, swap either arm for the IVF path —
    the overlap join is per-query × k rows either way. Returns
    (query_id, k_eff, n_overlap, overlap_frac)."""
    trunc = lambda d: d.select(  # noqa: E731
        "vec_id", F.slice(F.col("embedding"), 1, prefix_dim).alias("embedding")
    )
    full = brute_force_topk(emb, queries, k=k)
    pre = brute_force_topk(trunc(emb), trunc(queries), k=k)
    hit = full.join(
        pre.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    ).groupBy("query_id").agg(F.count(F.lit(1)).alias("n_overlap"))
    return (
        full.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("k_eff"))
        .join(hit, "query_id", "left")
        .na.fill(0, ["n_overlap"])
        .select(
            "query_id",
            "k_eff",
            "n_overlap",
            F.round(
                F.col("n_overlap") / F.col("k_eff").cast("double"), 6
            ).alias("overlap_frac"),
        )
    )


def pq_train_per_cell(
    assigned: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    k: int = 8,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    cell_col: str = "cell",
) -> DataFrame:
    """PER-CELL product-quantization codebooks: every IVF cell trains
    its OWN m×k codebook on the vectors (typically residuals) assigned
    to it — FAISS's local-codebook IVFPQ refinement. A shared codebook
    must describe the whole corpus's within-cell variation with one
    m×k budget; per-cell books spend the same per-vector bits on each
    cell's local distribution, so quantization error drops wherever
    cells are genuinely distinct clusters.

    Init is deterministic — the subvectors of each cell's ``k``
    lowest-id vectors, ``centroid_id`` = the seed's rank in the cell
    (0-based) — so ``iters=0`` is engine-portable and oracle-checkable;
    ``iters>0`` runs Lloyd per (cell, sub) group, ALL cells and
    subspaces in one distributed pass per round (an iteration is one
    broadcast-assign + one mean aggregate regardless of #cells·m).

    Returns (cell, sub, centroid_id, _cbv) — #cells·m·k rows; small
    enough to broadcast for moderate cell counts, and a keyed
    (cell, sub) join either way."""
    wseed = Window.partitionBy(cell_col).orderBy(F.col(id_col))
    seeds = (
        assigned.select(cell_col, id_col, vec_col)
        .withColumn("_sr", F.row_number().over(wseed))
        .filter(F.col("_sr") <= k)
    )
    cb = pq_subvectors(seeds, m, sub_dim, id_col, vec_col).join(
        seeds.select(F.col(id_col), cell_col, (F.col("_sr") - 1).alias(
            "centroid_id")),
        id_col,
    ).select(cell_col, "sub", "centroid_id", F.col("subv").alias("_cbv"))
    if iters:
        subv = pq_subvectors(
            fan_out(assigned), m, sub_dim, id_col, vec_col
        ).join(assigned.select(id_col, cell_col), id_col)
        for _ in range(iters):
            d2 = F.round(_dist2_n(F.col("subv"), F.col("_cbv"), sub_dim), 6)
            assigned_sub = (
                subv.join(F.broadcast(cb), [cell_col, "sub"])
                .groupBy("vec_id", cell_col, "sub")
                .agg(
                    F.min(
                        F.struct(
                            d2.alias("_d2"),
                            F.col("centroid_id").alias("_cid"),
                        )
                    ).alias("_best"),
                    F.first("subv").alias("subv"),
                )
                .select(
                    cell_col,
                    "sub",
                    F.col("_best._cid").alias("centroid_id"),
                    "subv",
                )
            )
            cb = (
                assigned_sub.select(
                    cell_col,
                    "sub",
                    "centroid_id",
                    F.posexplode("subv").alias("_dim", "_x"),
                )
                .groupBy(cell_col, "sub", "centroid_id", "_dim")
                .agg(F.avg("_x").alias("_mean"))
                .groupBy(cell_col, "sub", "centroid_id")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("_dim", "_mean"))
                    ).alias("_pairs")
                )
                .select(
                    cell_col,
                    "sub",
                    "centroid_id",
                    F.transform(
                        F.col("_pairs"), lambda p: p.getField("_mean")
                    ).alias("_cbv"),
                )
            )
    return cb


def pq_encode_per_cell(
    assigned: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    cell_col: str = "cell",
) -> DataFrame:
    """Encode each vector against ITS OWN cell's codebook → (vec_id,
    cell, sub, code). Same round-6-then-argmin tie discipline as
    ``pq_encode``; the codebook join is keyed (cell, sub), so a
    vector only ever sees its cell's m×k entries."""
    subv = pq_subvectors(
        fan_out(assigned), m, sub_dim, id_col, vec_col
    ).join(assigned.select(id_col, cell_col), id_col)
    d2 = F.round(_dist2_n(F.col("subv"), F.col("_cbv"), sub_dim), 6)
    return (
        subv.join(F.broadcast(codebooks), [cell_col, "sub"])
        .groupBy("vec_id", cell_col, "sub")
        .agg(
            F.min(
                F.struct(
                    d2.alias("_d2"),
                    F.col("centroid_id").alias("_cid"),
                )
            ).alias("_best")
        )
        .select(
            "vec_id", cell_col, "sub", F.col("_best._cid").alias("code")
        )
    )


def ivfpq_topk_percell(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    shortlist: int = 20,
    m: int = 8,
    sub_dim: int = 8,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """In-memory IVFPQ with RESIDUAL encoding and PER-CELL codebooks —
    the full FAISS IVFPQ refinement stack as one deterministic
    DataFrame pipeline (cells and codebook seeds are id-deterministic,
    every score rounded to 6 dp before argmin/rank), so the whole
    train→assign→encode→probe→ADC→re-rank path adjudicates bit-exact
    against a SQL oracle.

    Pipeline: coarse cells = round-6 cosine argmax against the first
    ``n_centroids`` vectors; residual r = v − centroid(cell); per-cell
    m×``n_codes`` codebooks from each cell's ``n_codes`` lowest-id
    residuals; ADC probes the query's ``nprobe`` best cells with the
    query re-expressed relative to EACH probed cell's centroid; exact
    cosine re-rank of the ``shortlist``. The persisted sibling
    (``build_ivfpq_index(per_cell=True)``) writes the same artifacts
    as a partition-pruned lake. Returns (query_id, neighbor_id,
    cosine, rank_val)."""
    centroids = corpus.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).cast("array<double>").alias("_cenv"),
    )

    def assign(df: DataFrame, prefix: str, keep: int) -> DataFrame:
        scored = df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).cast("array<double>").alias(f"_{prefix}v"),
        ).join(F.broadcast(centroids), how="cross")
        cos = F.round(
            _dot(F.col(f"_{prefix}v"), F.col("_cenv"))
            / (_norm(F.col(f"_{prefix}v")) * _norm(F.col("_cenv"))),
            6,
        )
        w = Window.partitionBy(f"{prefix}_id").orderBy(
            cos.desc(), F.col("centroid_id")
        )
        return (
            scored.withColumn("_crank", F.row_number().over(w))
            .filter(F.col("_crank") <= keep)
            .select(
                f"{prefix}_id",
                f"_{prefix}v",
                F.col("centroid_id").alias("cell"),
                F.col("_cenv"),
            )
        )

    cells = assign(fan_out(corpus), "neighbor", 1)
    resid = cells.select(
        F.col("neighbor_id").alias("vec_id"),
        "cell",
        F.zip_with(
            F.col("_neighborv"), F.col("_cenv"), lambda x, y: x - y
        ).alias("vec"),
    ).localCheckpoint(eager=False)  # pinned by the codebook pass (r10)
    cb = pq_train_per_cell(resid, m, sub_dim, n_codes)
    codes = pq_encode_per_cell(resid, cb, m, sub_dim)

    probes = assign(queries, "query", nprobe)
    qres = probes.select(
        "query_id",
        "_queryv",
        "cell",
        F.zip_with(
            F.col("_queryv"), F.col("_cenv"), lambda x, y: x - y
        ).alias("_tv"),
    )
    qsub = qres.select(
        "query_id",
        "cell",
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col("_tv"), i * sub_dim + 1, sub_dim)
                    for i in range(m)
                ]
            )
        ).alias("sub", "_qsv"),
    )
    table = qsub.join(F.broadcast(cb), ["cell", "sub"]).select(
        "query_id",
        "cell",
        "sub",
        F.col("centroid_id").alias("code"),
        F.round(_dist2_n(F.col("_qsv"), F.col("_cbv"), sub_dim), 6).alias("_d2"),
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("adist2").asc(), F.col("neighbor_id")
    )
    cand = (
        codes.join(F.broadcast(table), ["cell", "sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.round(F.sum("_d2"), 6).alias("adist2"))
        .withColumn("_sl", F.row_number().over(wa))
        .filter(F.col("_sl") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    full = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_nv"),
    )
    qfull = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    cos = F.round(
        _dot(F.col("_nv"), F.col("_qv"))
        / (_norm(F.col("_nv")) * _norm(F.col("_qv"))),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.join(full, "neighbor_id")
        .join(F.broadcast(qfull), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank_val", F.row_number().over(w))
        .filter(F.col("rank_val") <= k)
    )


def gram_exact(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact second-moment (Gram) statistics of an embedding column in
    ONE shuffle-free pass: per partition, an Arrow-batched kernel
    lattice-rounds every row's outer-product upper triangle onto the
    1e-9 nano grid and sums the resulting int64s; the tiny partials
    (≤ dim(dim+1)/2 + dim + 1 rows per partition) hash-aggregate to
    global cells. Because rounding happens PER ROW before any sum,
    the totals are bit-identical under any partitioning — the same
    contract as the repo's exact-moment regressions.

    Returns (i, j, v): v = Σ round(x_i·x_j·1e9) for 0 ≤ i ≤ j < dim,
    plus first-moment rows (i, -1) with Σ round(x_i·1e9) and the count
    row (-1, -1). This is the whole data-touching step of PCA: at
    100 TB the scan is the cost; everything after runs on ≤ 2145
    numbers.
    """
    import numpy as np
    import pandas as pd

    d = int(dim) if dim is not None else len(
        df.select(vec_col).first()[0]
    )
    iu = np.triu_indices(d)

    def part(batches):
        acc = np.zeros(len(iu[0]), dtype=np.int64)
        acc1 = np.zeros(d, dtype=np.int64)
        n = 0
        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if X.size == 0:
                continue
            n += X.shape[0]
            # chunk the n×d×d outer products to bound memory
            for lo in range(0, X.shape[0], 1024):
                B = X[lo:lo + 1024]
                outer = B[:, :, None] * B[:, None, :]
                acc += (
                    np.rint(outer[:, iu[0], iu[1]] * 1e9)
                    .astype(np.int64)
                    .sum(axis=0)
                )
                acc1 += np.rint(B * 1e9).astype(np.int64).sum(axis=0)
        out = pd.DataFrame(
            {
                "i": np.concatenate([iu[0], np.arange(d), [-1]]),
                "j": np.concatenate([iu[1], -np.ones(d, int), [-1]]),
                "v": np.concatenate([acc, acc1, [n]]),
            }
        )
        yield out.astype({"i": "int32", "j": "int32", "v": "int64"})

    partials = df.select(vec_col).mapInPandas(part, "i int, j int, v long")
    return partials.groupBy("i", "j").agg(F.sum("v").alias("v"))


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    k: int = 8,
):
    """Distributed PCA: exact-lattice covariance from ``gram_exact``
    (one data pass), then a driver-side symmetric eigendecomposition of
    the dim×dim matrix (numpy.linalg.eigh — dim is small by contract;
    the DATA never moves). Because the Gram cells are bit-identical
    under any partitioning, the covariance — and hence the
    eigenspectrum — is deterministic across runs and cluster layouts.

    Returns (n_rows, eigenvalues desc [k], components [k × dim] with a
    deterministic sign convention: each component's
    largest-|coordinate| entry is positive, covariance matrix).
    """
    import numpy as np

    cells = {(r.i, r.j): r.v for r in gram_exact(df, vec_col, dim).collect()}
    n = int(cells[(-1, -1)])
    d = int(dim) if dim is not None else (
        max(i for i, _ in cells) + 1
    )
    m = np.array([cells[(i, -1)] for i in range(d)], dtype=np.float64)
    m = m / 1e9 / n
    G = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            G[i, j] = G[j, i] = cells[(i, j)] / 1e9
    C = G / n - np.outer(m, m)
    w, V = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:k]
    comps = []
    for idx in order:
        v = V[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append(v)
    return n, [float(w[i]) for i in order], comps, C


def pca_project(
    df: DataFrame,
    components,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project embeddings onto fitted components — the dimensionality
    reduction step (64 → k floats per row).

    r11 shape (guide §4.2; the r10 tranche-2 lesson): the former
    array-of-arrays literal compiled to k interpreted zip_with/
    aggregate dot products PER ROW (higher-order functions get no
    codegen — the measured 3-5× regression class). One Arrow
    ``mapInPandas`` pass now does the projection as d vectorized
    multiply-adds over the batch, accumulated SEQUENTIALLY over the
    dims in the identical left-fold order (0.0 + p_0) + p_1 ... the
    aggregate expression used, so every float64 coordinate is
    bit-identical to the expression form (pinned in tests). Rows with
    a NULL vector, a length mismatch against the components, or a
    NULL element produce the same [NULL]*k coordinates the zip_with
    fold yielded."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    comps = [[float(x) for x in c] for c in components]
    fields = [f for f in df.schema.fields if f.name != out_col]
    schema = StructType(
        list(fields) + [StructField(out_col, ArrayType(DoubleType()))]
    )
    in_names = [f.name for f in fields]

    def project(it):
        carr = np.asarray(comps, dtype=np.float64)  # k × d
        kk, dc = carr.shape
        null_out = [None] * kk
        for pdf in it:
            vs = pdf[vec_col]
            rows = []
            good_idx = []
            for i, v in enumerate(vs):
                if v is None:
                    rows.append(None)
                    continue
                # a None ELEMENT nulls the fold (NULL semantics); NaN
                # stays float NaN arithmetic like the expression.
                # (Arrow may already surface null elements as NaN —
                # no engine caller produces null elements; the
                # whole-vector NULL and length-mismatch cases are the
                # ones the contract exercises.)
                vl = list(v)
                if len(vl) != dc or any(x is None for x in vl):
                    rows.append(None)
                else:
                    good_idx.append(i)
                    rows.append(np.asarray(vl, dtype=np.float64))
            out = [null_out] * len(vs)
            if good_idx:
                V = np.stack([rows[i] for i in good_idx])  # g × d
                acc = np.zeros((len(good_idx), kk))
                for j in range(dc):
                    acc = acc + V[:, j : j + 1] * carr[:, j]
                for r, i in enumerate(good_idx):
                    out[i] = acc[r].tolist()
            res = pdf[in_names].copy()
            res[out_col] = out
            yield res

    return df.select(*in_names).mapInPandas(project, schema)


def pca_shortlist_topk(
    corpus: DataFrame,
    queries: DataFrame,
    components,
    k: int = 10,
    shortlist: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via PCA-reduced shortlisting: scan in the k'-dim projected
    space (components from ``pca_fit`` — here the 64-dim dot products
    shrink 4× at k' = 16), keep a ``shortlist`` of candidates per
    query, then exact-cosine rerank ONLY the shortlist in the original
    space. The matryoshka-truncation sibling for embeddings that
    weren't trained front-loaded: PCA packs maximum variance into the
    leading projected coordinates regardless of training recipe.

    Recall comes from variance captured: candidates missed are those
    whose similarity lives in the discarded (64−k')-dim residual.
    Returns (query_id, neighbor_id, cosine, rank_val) like
    ``brute_force_topk``. Scale shape: the reduced scan is the same
    broadcast-join scan with k'/dim of the arithmetic (at 100 TB, a
    narrower column to read if the projection is materialized); the
    rerank touches #queries × shortlist rows only.
    """
    red_c = pca_project(corpus, components, vec_col, "_pca").select(
        id_col, "_pca"
    )
    red_q = pca_project(queries, components, vec_col, "_pca").select(
        id_col, "_pca"
    )
    cand = brute_force_topk(
        red_c, red_q, k=shortlist, id_col=id_col, vec_col="_pca"
    ).select("query_id", "neighbor_id")
    full = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    qfull = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    j = cand.join(full, "neighbor_id").join(F.broadcast(qfull), "query_id")
    cos = _dot(F.col("_cv"), F.col("_qv")) / (
        _norm(F.col("_cv")) * _norm(F.col("_qv"))
    )
    scored = j.select(
        "query_id", "neighbor_id", F.round(cos, 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn(
        "rank_val", F.row_number().over(w)
    ).filter(F.col("rank_val") <= k)


def opq_rotation(
    df: DataFrame,
    m: int = 8,
    vec_col: str = "embedding",
    dim: int | None = None,
):
    """Parametric OPQ rotation (Ge et al. 2013, "Optimized Product
    Quantization", the closed-form OPQ-P variant): rotate vectors onto
    the PCA eigenbasis, then PERMUTE the eigen-dimensions across the
    ``m`` PQ subspaces by greedy balanced eigenvalue allocation —
    each next-largest eigenvalue goes to the non-full subspace with
    the smallest running Σ log λ. Under the Gaussian independence
    assumption this minimizes PQ distortion over all orthogonal
    rotations with independent subspace codebooks, and unlike the
    iterative OPQ-NP it is CLOSED FORM and deterministic: one
    ``pca_fit`` (whose Gram pass is exact-lattice bit-identical under
    any partitioning) + a driver-side sort — the standard FAISS
    ``OPQ{m}`` pre-transform beyond per-cell codebooks.

    Returns (rotation, allocation): ``rotation`` is a list of d
    component rows ordered so subspace s owns rows
    [s·(d/m), (s+1)·(d/m)) — apply with ``pca_project(df, rotation,
    out_col=...)`` (a full-rank rotation is just a PCA projection that
    keeps every component) and feed the rotated column to the
    unchanged pq_train/pq_encode/ADC stack; ``allocation`` maps each
    subspace to its eigen-dimension indices (for audit).

    Scale: the data-touching work is the single gram_exact pass that
    ``pca_fit`` already does; the allocation itself handles d numbers
    on the driver.
    """
    import numpy as np

    d = int(dim) if dim is not None else len(
        df.select(vec_col).first()[0]
    )
    if d % m:
        raise ValueError(f"dim {d} not divisible by m {m}")
    sub_dim = d // m
    _, eigvals, comps, _ = pca_fit(df, vec_col, dim=d, k=d)
    # greedy balanced allocation of eigen-dims (desc eigenvalue order)
    logs = [0.0] * m
    members: list[list[int]] = [[] for _ in range(m)]
    for idx, lam in enumerate(eigvals):
        open_subs = [s for s in range(m) if len(members[s]) < sub_dim]
        target = min(open_subs, key=lambda s: (logs[s], s))
        members[target].append(idx)
        logs[target] += float(np.log(max(lam, 1e-300)))
    rotation = [comps[i] for s in range(m) for i in members[s]]
    return rotation, members


def cross_gram_exact(
    df: DataFrame,
    col_a: str,
    col_b: str,
    dim_a: int | None = None,
    dim_b: int | None = None,
) -> DataFrame:
    """Exact cross-moment matrix M = Σ a·bᵀ of two embedding columns
    in ONE shuffle-free pass — the ``gram_exact`` pattern on a pair:
    per partition an Arrow kernel nano-rounds each row's outer product
    and sums int64s; partials hash-aggregate to (i, j, v) cells with
    v = Σ round(a_i·b_j·1e9). Bit-identical under any partitioning."""
    import numpy as np
    import pandas as pd

    first = df.select(col_a, col_b).first()
    da = int(dim_a) if dim_a is not None else len(first[0])
    db = int(dim_b) if dim_b is not None else len(first[1])

    def part(batches):
        acc = np.zeros((da, db), dtype=np.int64)
        for pdf in batches:
            A = np.array(pdf[col_a].tolist(), dtype=np.float64)
            B = np.array(pdf[col_b].tolist(), dtype=np.float64)
            if A.size == 0:
                continue
            for lo in range(0, A.shape[0], 1024):
                outer = A[lo:lo + 1024, :, None] * B[lo:lo + 1024, None, :]
                acc += np.rint(outer * 1e9).astype(np.int64).sum(axis=0)
        ii, jj = np.meshgrid(np.arange(da), np.arange(db), indexing="ij")
        yield pd.DataFrame(
            {"i": ii.ravel().astype("int32"),
             "j": jj.ravel().astype("int32"),
             "v": acc.ravel()}
        )

    partials = df.select(col_a, col_b).mapInPandas(
        part, "i int, j int, v long"
    )
    return partials.groupBy("i", "j").agg(F.sum("v").alias("v"))


def procrustes_align(
    df: DataFrame,
    col_a: str,
    col_b: str,
    dim: int | None = None,
):
    """Orthogonal Procrustes alignment between two embedding spaces —
    the migration tool when an embedding model is retrained and the
    old vectors must keep working (Schönemann 1966; the same solve
    aligns cross-lingual word vectors in MUSE): find the rotation R
    minimizing Σ‖a_i·R − b_i‖², which is R = UVᵀ from the SVD of the
    cross-moment M = Σ aᵀb.

    Scale shape: the ONLY data-touching step is the one-pass exact
    ``cross_gram_exact`` (nano-lattice cells, bit-identical under
    partitioning); the SVD runs on the driver over the d×d matrix —
    the ``pca_fit`` contract. Returns R as a list of d rows; apply it
    with ``pca_project(df, R_transposed...)`` or a zip_with dot and
    measure residuals distributively.

    Determinism: R = UVᵀ is unique whenever M is nonsingular (any
    sign flip of a U column flips the matching V row, leaving the
    product unchanged), and it is rounded to 9 dp for cross-LAPACK
    stability."""
    import numpy as np

    cells = {
        (r.i, r.j): r.v
        for r in cross_gram_exact(df, col_a, col_b, dim, dim).collect()
    }
    d = int(dim) if dim is not None else (
        max(i for i, _ in cells) + 1
    )
    M = np.zeros((d, d))
    for (i, j), v in cells.items():
        M[i, j] = v / 1e9
    U, s, Vt = np.linalg.svd(M)
    # deterministic signs: flip (U col, V row) pairs together —
    # doesn't change U @ Vt ... it does NOT change the product, so
    # normalize on the PRODUCT instead: R itself is unique when M is
    # nonsingular; round for cross-build stability.
    R = np.round(U @ Vt, 9)
    return [list(map(float, row)) for row in R]
