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
        w = Window.partitionBy("_vid").orderBy(
            cos.desc(), F.col("centroid_id")
        )
        assigned = (
            vecs.join(F.broadcast(cen), how="cross")
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select("centroid_id", "_vv")
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
        .localCheckpoint(eager=True)  # tiny; also fixes the probe set
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
