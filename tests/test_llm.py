"""Tests for the LLM-pipeline extension operators."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from cancer_survival_etl_spark.llm.dedup import (
    exact_dedup,
    minhash_signatures,
    near_dup_buckets,
    ngram_jaccard_pairs,
    simhash,
)
from cancer_survival_etl_spark.llm.multimodal import (
    attach_binary_payload,
    decode_features,
    frame_sample,
)
from cancer_survival_etl_spark.llm.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
    normalize_embeddings,
)
from cancer_survival_etl_spark.llm.textstats import (
    doc_fingerprint,
    language_guess,
    quality_score,
    token_stats,
)

import pytest

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),       # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat"),       # near dup of 0
    (3, "completely different content about spark engines"),
    (4, "le chat et le chien et la maison"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(docs):
    out = exact_dedup(docs, "text", "doc_id").toPandas()
    assert len(out) == 4  # 5 docs, one exact pair
    dup = out[out["dupe_count"] == 2]
    assert len(dup) == 1 and dup.iloc[0]["doc_id"] == 0  # min id kept


def test_minhash_identical_docs_share_signatures(docs):
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=8).toPandas()
    s = sigs.set_index("doc_id")
    assert (s.loc[0] == s.loc[1]).all()  # exact dups → identical sigs
    shared02 = (s.loc[0] == s.loc[2]).sum()
    shared03 = (s.loc[0] == s.loc[3]).sum()
    assert shared02 > shared03  # near-dup shares more than unrelated


def test_near_dup_buckets(spark, docs):
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=8)
    buckets = near_dup_buckets(sigs, "doc_id", bands=4, rows_per_band=2).toPandas()
    # docs 0 and 1 must co-bucket in every band; 0/2 in at least one
    pairs = set()
    for ids in buckets["ids"]:
        ids = list(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    assert (0, 1) in pairs
    assert (0, 2) in pairs or (1, 2) in pairs


def test_ngram_jaccard(docs):
    out = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.3)
    pdf = out.toPandas().set_index(["id_a", "id_b"])
    assert pdf.loc[(0, 1), "jaccard"] == 1.0
    assert 0.3 <= pdf.loc[(0, 2), "jaccard"] < 1.0
    assert (0, 3) not in pdf.index


def test_simhash(docs):
    out = simhash(docs, "text", "doc_id", bits=32).toPandas().set_index("doc_id")
    assert out.loc[0, "simhash"] == out.loc[1, "simhash"]
    h02 = bin(int(out.loc[0, "simhash"]) ^ int(out.loc[2, "simhash"])).count("1")
    h03 = bin(int(out.loc[0, "simhash"]) ^ int(out.loc[3, "simhash"])).count("1")
    assert h02 < h03  # near dup closer in Hamming space


def test_brute_force_topk(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # opposite of 0
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = brute_force_topk(emb, emb.filter("vec_id = 0"), k=3).toPandas()
    assert list(out.sort_values("rank_val")["neighbor_id"]) == [1, 2, 3]


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, q, k=5).toPandas()
    approx = lsh_bucketed_topk(emb, q, k=5, num_planes=4, num_tables=4).toPandas()
    e = set(map(tuple, exact[["query_id", "neighbor_id"]].values))
    a = set(map(tuple, approx[["query_id", "neighbor_id"]].values))
    recall = len(e & a) / len(e)
    assert recall >= 0.4, f"LSH recall too low: {recall}"


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, q, k=5).toPandas()
    approx = ivf_topk(emb, q, k=5, n_centroids=8, nprobe=4).toPandas()
    e = set(map(tuple, exact[["query_id", "neighbor_id"]].values))
    a = set(map(tuple, approx[["query_id", "neighbor_id"]].values))
    recall = len(e & a) / len(e)
    assert recall >= 0.4, f"IVF recall too low: {recall}"
    # every IVF hit's cosine must agree with the exact scores
    merged = approx.merge(
        exact, on=["query_id", "neighbor_id"], suffixes=("_ivf", "_bf")
    )
    assert (merged["cosine_ivf"] == merged["cosine_bf"]).all()


def test_normalize_embeddings(spark):
    emb = spark.createDataFrame(
        [(0, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    out = normalize_embeddings(emb).collect()[0]["embedding"]
    assert abs(out[0] - 0.6) < 1e-12 and abs(out[1] - 0.8) < 1e-12


def test_token_stats_and_quality(docs):
    ts = token_stats(docs).toPandas().set_index("doc_id")
    assert ts.loc[0, "n_tokens"] == 9
    assert ts.loc[0, "n_distinct_tokens"] == 8  # 'the' twice
    qs = quality_score(docs).toPandas()
    assert ((qs["quality"] >= 0) & (qs["quality"] <= 1)).all()


def test_language_guess(docs):
    out = language_guess(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "lang_guess"] == "en"
    assert out.loc[4, "lang_guess"] == "fr"


def test_doc_fingerprint_deterministic(docs):
    a = doc_fingerprint(docs).toPandas().set_index("doc_id")
    b = doc_fingerprint(docs).toPandas().set_index("doc_id")
    pd.testing.assert_frame_equal(a, b)
    assert a.loc[0, "md5_fingerprint"] == a.loc[1, "md5_fingerprint"]
    assert a.loc[0, "rolling_hash"] == a.loc[1, "rolling_hash"]
    assert a.loc[0, "rolling_hash"] != a.loc[3, "rolling_hash"]


def test_multimodal_decode_plumbing(docs):
    payloads = attach_binary_payload(docs, "text", "doc_id")
    feats = decode_features(payloads).toPandas().set_index("item_id")
    assert len(feats) == len(DOCS)
    assert feats.loc[0, "checksum"] == feats.loc[1, "checksum"]
    assert feats.loc[0, "n_bytes"] == len(DOCS[0][1])
    assert len(feats.loc[0, "feature"]) == 8
    # real decode is explicitly stubbed
    with pytest.raises(NotImplementedError):
        decode_features(payloads, real_decode=True)


def test_frame_sample_expansion(docs):
    payloads = attach_binary_payload(docs, "text", "doc_id")
    frames = frame_sample(payloads, every_n_bytes=16).toPandas()
    d0 = frames[frames["item_id"] == 0]
    expected = (len(DOCS[0][1]) + 15) // 16
    assert len(d0) == expected
    assert list(d0["frame_no"]) == list(range(expected))


def test_near_dup_pipeline_end_to_end(spark):
    """MinHash → banding → candidates → exact verify finds the planted
    near-duplicate pair and nothing across unrelated docs."""
    from cancer_survival_etl_spark.llm.dedup import near_dup_pipeline

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tonight"
    rows = [
        (0, base),
        (1, near),                      # near-dup of 0
        (2, base),                      # exact dup of 0
        (3, "completely different text about spark query planning"),
        (4, "unrelated words forming another distinct document body"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # high-recall banding (floor s*=0.5) — the mechanics under test;
    # the selective default (2, 4) trades recall for candidate volume
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in near_dup_pipeline(
            df, "text", "doc_id", bands=4, rows_per_band=2,
            jaccard_threshold=0.5,
        ).collect()
    }
    assert (0, 2) in got and got[(0, 2)] == 1.0     # exact dup
    assert (0, 1) in got and 0.5 <= got[(0, 1)] < 1.0  # near dup
    assert (1, 2) in got                             # transitively near
    assert all(a not in (3, 4) and b not in (3, 4) for a, b in got)


def test_ivf_kmeans_centroids(spark, sf_dir):
    """Trained IVF cells: k-means converges to k valid centroids and the
    probe path keeps recall at least in the seed-centroid ballpark."""
    from cancer_survival_etl_spark.llm.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )
    from cancer_survival_etl_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    cen = kmeans_centroids(e, k=4, iters=2)
    rows = cen.collect()
    assert len(rows) <= 4 and all(len(r["_cenv"]) == 64 for r in rows)

    q = e.filter(F.col("vec_id") < 10)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(e, q, k=3).collect()
    }
    km = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(e, q, k=3, nprobe=2, centroids=cen).collect()
    }
    assert len(km & truth) / len(truth) >= 0.3  # nprobe=2 of 4 cells


def test_ngram_stopgram_cut(spark):
    """max_doc_freq drops ubiquitous grams: Jaccard only shrinks (never
    grows), and a gram shared by every doc stops generating pairs."""
    from cancer_survival_etl_spark.llm.dedup import ngram_jaccard_pairs

    common = "alpha beta gamma"          # 3-gram present in every doc
    rows = [
        (0, f"{common} one two three"),
        (1, f"{common} one two four"),
        (2, f"{common} five six seven"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.01).collect()
    }
    cut = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", threshold=0.01, max_doc_freq=2
        ).collect()
    }
    assert set(cut) <= set(full)
    for pair, j in cut.items():
        assert j <= full[pair]
    # docs 0/2 share ONLY the ubiquitous grams -> pair disappears after cut
    assert (0, 2) in full and (0, 2) not in cut
    # docs 0/1 still share non-ubiquitous grams
    assert (0, 1) in cut


def test_simhash_near_dups_pigeonhole(spark):
    """Hamming blocking finds all pairs within the bound (vs a brute-force
    check) and none beyond it."""
    from cancer_survival_etl_spark.llm.dedup import simhash, simhash_near_dups

    base = "spark engines shuffle data between stages for joins and aggs"
    rows = [
        (0, base),
        (1, base),                                   # hamming 0
        (2, base.replace("joins", "maps")),          # tiny edit
        (3, "an entirely different corpus about cooking pasta at home"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = simhash(df, "text", "doc_id", bits=32)
    fps = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dups(sigs, "doc_id", max_hamming=6).collect()
    }
    # brute-force truth
    import itertools

    for a, b in itertools.combinations(sorted(fps), 2):
        h = bin(fps[a] ^ fps[b]).count("1")
        if h <= 6:
            assert got[(a, b)] == h, (a, b)
        else:
            assert (a, b) not in got
    assert got[(0, 1)] == 0  # identical docs


def test_resize_payload_plumbing(spark, sf_dir):
    from cancer_survival_etl_spark.llm.multimodal import (
        attach_binary_payload,
        resize_payload,
    )
    from cancer_survival_etl_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").limit(20)
    out = resize_payload(attach_binary_payload(d), 32, 32).collect()
    assert len(out) == 20
    assert all(r["width"] == 32 and r["height"] == 32 for r in out)
    assert all(r["n_bytes"] <= 32 * 32 // 8 for r in out)
    with pytest.raises(NotImplementedError):
        resize_payload(attach_binary_payload(d), real_resize=True)


def test_hash_split_stable_and_proportional(spark):
    from cancer_survival_etl_spark.llm.sampling import hash_split

    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    # row-stable: identical assignment under a different partitioning
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.repartition(7), "doc_id").collect()
    }
    assert a == b
    from collections import Counter

    frac = {k: v / 10_000 for k, v in Counter(a.values()).items()}
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["val"] - 0.1) < 0.01
    assert abs(frac["test"] - 0.1) < 0.01
    # salt re-rolls without changing proportions
    c = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", salt="exp2").collect()
    }
    assert c != a


def test_stratified_hash_sample_fractions(spark, sf_dir):
    from cancer_survival_etl_spark.llm.sampling import stratified_hash_sample
    from cancer_survival_etl_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    totals = {r["lang"]: r["count"] for r in d.groupBy("lang").count().collect()}
    langs = sorted(totals)
    fractions = {langs[0]: 0.2, langs[1]: 1.0}  # others default to 0
    out = stratified_hash_sample(
        d, "lang", fractions, "doc_id", default_fraction=0.0
    )
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert set(got) <= {langs[0], langs[1]}
    assert got.get(langs[1], 0) == totals[langs[1]]          # keep-all stratum
    assert 0 < got.get(langs[0], 0) < totals[langs[0]]       # downsampled


def test_repetition_stats_semantics(spark):
    from cancer_survival_etl_spark.llm.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (0, "a a a a"),            # one token repeated
            (1, "a b c d"),            # all distinct
            (2, "a b a b a"),          # dominant bigram "a b" (2 of 4)
            (3, "solo"),               # single token: no bigrams
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in repetition_stats(df).collect()
    }
    assert out[0]["dup_token_ratio"] == 0.75
    assert out[0]["top_token_frac"] == 1.0
    assert out[0]["top_bigram_frac"] == 1.0
    assert out[1]["dup_token_ratio"] == 0.0
    assert out[1]["top_token_frac"] == 0.25
    assert out[2]["top_token_frac"] == 0.6            # 'a' 3 of 5
    assert out[2]["top_bigram_frac"] == 0.5           # 'a b' 2 of 4
    assert out[3]["dup_token_ratio"] == 0.0
    assert out[3]["top_bigram_frac"] is None          # guarded, not [1,0]


def test_pii_scan_counts_and_redaction(spark):
    from cancer_survival_etl_spark.llm.textstats import pii_scan

    df = spark.createDataFrame(
        [
            (0, "reach me at jo.smith+x@example.co.uk or 555-123-4567 ok"),
            (1, "no pii here"),
            (2, "two mails a@b.io c@d.org one phone 111 222-3333"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 1
    assert "<EMAIL>" in out[0]["redacted"] and "<PHONE>" in out[0]["redacted"]
    assert "example.co.uk" not in out[0]["redacted"]
    assert out[1]["n_emails"] == 0 and out[1]["redacted"] == "no pii here"
    assert out[2]["n_emails"] == 2
    # mixed separators allowed: "111 222-3333" is ddd[- ]ddd[- ]dddd
    assert out[2]["n_phones"] == 1


def test_token_frequencies_wordcount(spark):
    from cancer_survival_etl_spark.llm.textstats import token_frequencies

    df = spark.createDataFrame(
        [(0, "a b a"), (1, "b a")], "doc_id long, text string"
    )
    got = {
        r["token"]: r["n_occurrences"]
        for r in token_frequencies(df).collect()
    }
    assert got == {"a": 3, "b": 2}


def test_connected_components_and_dedup_clusters(spark):
    from cancer_survival_etl_spark.llm.dedup import dedup_clusters
    from cancer_survival_etl_spark.operators.graph import connected_components

    # triangle {1,2,3}, pair {5,6}, 6-node chain 10..15 (diameter 5 →
    # needs several propagation rounds), isolated node 9 via `nodes`
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (5, 6)]
        + [(i, i + 1) for i in range(10, 15)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame([(9,)], "id_a long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, nodes=nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9,
                   10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 15: 10}

    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 5, 6, 9]], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = dedup_clusters(docs, pairs).collect()
    canon = sorted(r["doc_id"] for r in out if r["is_canonical"])
    assert canon == [1, 5, 9]
    assert all(r["cluster_id"] <= r["doc_id"] for r in out)


def test_mixture_sample_deterministic_and_weighted(spark):
    from cancer_survival_etl_spark.llm.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "keep" if i % 3 == 0 else ("down" if i % 3 == 1 else "up"))
         for i in range(3000)],
        "doc_id long, source string",
    )
    weights = {"keep": 1.0, "down": 0.25, "up": 2.5}
    out = mixture_sample(df, "source", weights, "doc_id")
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # weight 1.0 sources pass through exactly
    assert counts["keep"] == 1000
    # expected 250 and 2500 — hash-Bernoulli, allow 4 sigma
    assert abs(counts["down"] - 250) < 60
    assert abs(counts["up"] - 2500) < 120
    # upsampled rows carry distinct rep indices, bounded by ceil(w)
    reps = out.filter("source = 'up'").select("rep").distinct().collect()
    assert {r["rep"] for r in reps} <= {0, 1, 2}
    # deterministic: same call twice, identical rows
    a = sorted((r["doc_id"], r["rep"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["rep"])
        for r in mixture_sample(df, "source", weights, "doc_id").collect()
    )
    assert a == b


def test_bpe_train_and_encode_classic_example(spark):
    """The Sennrich toy corpus: merges must follow pair frequency with
    deterministic tie-breaks, and the distributed encode must agree
    with the driver-side encoder."""
    from cancer_survival_etl_spark.llm.bpe import (
        bpe_encode,
        encode_word,
        train_bpe_merges,
        word_histogram,
    )

    hist = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_merges(hist, n_merges=10)
    # "es" (9) then "est" (9) then "est</w>" (9) are the classic first merges
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert encode_word("newest", merges[:3])[-1] == "est</w>"
    # unseen word falls back to finer pieces, never fails
    assert "".join(encode_word("tallest", merges)).replace("</w>", "") == "tallest"

    df = spark.createDataFrame(
        [(i, "low low lower newest widest") for i in range(8)],
        "doc_id long, text string",
    )
    hist_df = word_histogram(df)
    got_hist = {r["word"]: r["n"] for r in hist_df.collect()}
    assert got_hist == {"low": 16, "lower": 8, "newest": 8, "widest": 8}

    enc = bpe_encode(df, merges).collect()
    assert len(enc) == 8
    row = enc[0]
    want = [t for w in "low low lower newest widest".split() for t in encode_word(w, merges)]
    assert row["tokens"] == want
    assert row["n_words"] == 5 and row["n_tokens"] == len(want)


def test_curate_corpus_end_to_end(spark):
    from cancer_survival_etl_spark.llm.pipeline import (
        curate_corpus,
        stage_counts,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs = spark.createDataFrame(
        [
            (0, base + " v0", "web"),
            (1, base + " v0", "web"),            # exact dup of 0
            (2, base + " v2 slight change", "web"),  # near-dup of 0 (SimHash)
            (3, "spam spam spam spam spam spam spam spam spam spam", "web"),  # repetition
            (4, "completely different words about ships and stars and maps and winds tonight", "wiki"),
            (5, "held out benchmark sentence that must stay unique in eval only here", "wiki"),
        ],
        "doc_id long, text string, source string",
    )
    eval_docs = spark.createDataFrame(
        [(100, "about ships and stars and maps")], "doc_id long, text string"
    )
    curated, stages = curate_corpus(
        docs.filter("doc_id < 5"),
        eval_docs=eval_docs,
        mixture={"web": 1.0, "wiki": 1.0},
    )
    ids = {r["doc_id"] for r in curated.collect()}
    assert 1 not in ids          # exact dup dropped (min id 0 kept)
    assert 3 not in ids          # repetition filter
    assert 4 not in ids          # decontaminated against eval set
    assert 0 in ids              # canonical survivor
    got = dict(
        (r["stage"], r["n_rows"]) for r in stage_counts(stages).collect()
    )
    assert got["input"] == 5
    assert got["exact_dedup"] == 4
    assert got["split"] == len(ids)
    # split column present and valued
    assert {r["split"] for r in curated.collect()} <= {"train", "val", "test"}


def test_media_near_dups_find_duplicate_payloads(spark):
    """Items 0 and 1 share identical bytes → identical fake features →
    cosine 1.0; unrelated payloads stay below threshold."""
    from cancer_survival_etl_spark.llm.multimodal import (
        attach_binary_payload,
        decode_features,
        media_near_dups,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    feats = decode_features(attach_binary_payload(docs, "text", "doc_id"))
    pairs = media_near_dups(feats, threshold=0.999).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in got
    assert all({a, b} != {0, 3} for a, b in got)


def test_linear_score_and_classifier_filter(spark):
    import math

    from cancer_survival_etl_spark.llm.inference import (
        classifier_filter,
        linear_score,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-2.0, 0.0])],
        "id long, embedding array<double>",
    )
    w = [2.0, -1.0]
    got = {
        r["id"]: r["score"]
        for r in linear_score(df, "embedding", w, bias=0.5).collect()
    }
    for i, x in [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-2.0, 0.0])]:
        z = sum(a * b for a, b in zip(x, w)) + 0.5
        assert abs(got[i] - round(1 / (1 + math.exp(-z)), 6)) <= 1e-6
    kept = {r["id"] for r in classifier_filter(df, "embedding", w, 0.5).collect()}
    assert kept == {1}  # sigmoid(2.5)=.92 passes; sigmoid(-0.5)=.38 and sigmoid(-3.5)=.03 fail


def test_connected_components_log_rounds_on_deep_chain(spark):
    """A 100-node chain has diameter 99: plain min-label propagation
    needs ~99 rounds, pointer doubling must finish within ~log2(99)+2.
    max_iter=10 is the budget that proves the claim."""
    from cancer_survival_etl_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "id_a long, id_b long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, max_iter=10).collect()
    }
    assert len(got) == 101
    assert set(got.values()) == {0}  # single component, min label 0


def test_duplicate_spans_finds_planted_span(spark):
    from cancer_survival_etl_spark.llm.dedup import duplicate_spans

    shared = " ".join(f"s{i}" for i in range(10))  # 10-token planted span
    rows = [
        (1, "a1 a2 a3 " + shared + " a4 a5"),
        (2, "b1 " + shared + " b2 b3 b4 b5"),
        (3, " ".join(f"u{i}" for i in range(20))),  # unique doc
        (4, "short doc"),  # below k tokens -> no shingles at all
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.span_start, r.span_end, r.n_shingles)
        for r in duplicate_spans(df, k=8, min_docs=2).collect()
    }
    # doc 1: span tokens 3..12 -> shingle positions 3,4,5 (k=8)
    assert out[1] == (3, 12, 3)
    # doc 2: span tokens 1..10 -> shingle positions 1,2,3
    assert out[2] == (1, 10, 3)
    assert 3 not in out and 4 not in out
    # hashed and raw-string shingles agree
    raw = {
        r.doc_id: (r.span_start, r.span_end, r.n_shingles)
        for r in duplicate_spans(
            df, k=8, min_docs=2, hash_shingles=False
        ).collect()
    }
    assert raw == out


def test_quantize_embeddings_codes_and_degenerate_dim(spark):
    from cancer_survival_etl_spark.llm.similarity import quantize_embeddings

    rows = [
        (0, [0.0, 5.0, 1.0]),
        (1, [1.0, 5.0, 3.0]),
        (2, [2.0, 5.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {(r.vec_id, r.dim): r.code for r in quantize_embeddings(df).collect()}
    # dim 0 spans [0,2]: codes -127, 0, 127
    assert (out[(0, 0)], out[(1, 0)], out[(2, 0)]) == (-127, 0, 127)
    # dim 1 is constant -> degenerate, codes 0
    assert {out[(i, 1)] for i in range(3)} == {0}
    # dim 2 spans [1,3]: midpoint 2.0 -> 0
    assert (out[(0, 2)], out[(1, 2)], out[(2, 2)]) == (-127, 127, 0)


def test_image_header_parse_real_formats(spark):
    """The header parser is REAL (stdlib, no codec libs): valid PNG,
    GIF, and JPEG byte sequences yield their true dimensions; garbage
    yields NULLs."""
    from cancer_survival_etl_spark.llm.multimodal import image_header_info

    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
           + (640).to_bytes(4, "big") + (480).to_bytes(4, "big"))
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
    jpeg = (b"\xff\xd8"                       # SOI
            + b"\xff\xe0\x00\x04\x4a\x46"     # APP0 segment (len 4)
            + b"\xff\xc0\x00\x0b\x08"         # SOF0, len 11, precision
            + (600).to_bytes(2, "big")        # height
            + (800).to_bytes(2, "big")        # width
            + b"\x03")
    rows = [(1, bytearray(png)), (2, bytearray(gif)),
            (3, bytearray(jpeg)), (4, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    out = {r.item_id: (r.format, r.width, r.height)
           for r in image_header_info(df).collect()}
    assert out[1] == ("png", 640, 480)
    assert out[2] == ("gif", 320, 200)
    assert out[3] == ("jpeg", 800, 600)
    assert out[4] == (None, None, None)


def test_audio_header_parse_real_wav(spark):
    """The WAV parser is REAL: a valid RIFF/WAVE byte sequence yields
    its true channel count, sample rate, bit depth, and duration."""
    from cancer_survival_etl_spark.llm.multimodal import audio_header_info

    def wav(channels, rate, bits, n_frames):
        data_len = n_frames * channels * (bits // 8)
        fmt = (b"fmt " + (16).to_bytes(4, "little")
               + (1).to_bytes(2, "little")          # PCM
               + channels.to_bytes(2, "little")
               + rate.to_bytes(4, "little")
               + (rate * channels * bits // 8).to_bytes(4, "little")
               + (channels * bits // 8).to_bytes(2, "little")
               + bits.to_bytes(2, "little"))
        data = b"data" + data_len.to_bytes(4, "little") + b"\x00" * data_len
        body = b"WAVE" + fmt + data
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    rows = [
        (1, bytearray(wav(2, 44100, 16, 44100))),   # 1 s stereo CD audio
        (2, bytearray(wav(1, 16000, 8, 8000))),     # 0.5 s mono 8-bit
        (3, bytearray(b"RIFF....not wave")),
    ]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    out = {r.item_id: r for r in audio_header_info(df).collect()}
    assert (out[1].format, out[1].channels, out[1].sample_rate,
            out[1].bits_per_sample, out[1].n_frames,
            out[1].duration_ms) == ("wav", 2, 44100, 16, 44100, 1000.0)
    assert (out[2].channels, out[2].duration_ms) == (1, 500.0)
    assert out[3].format is None and out[3].channels is None


def test_video_header_parse_real_mp4(spark):
    """The MP4 parser is REAL: a valid ftyp+moov/mvhd box sequence
    yields its true timescale and duration (v0 and v1 boxes)."""
    from cancer_survival_etl_spark.llm.multimodal import video_header_info

    def box(btype, body):
        return (8 + len(body)).to_bytes(4, "big") + btype + body

    def mp4(timescale, duration, version=0):
        if version == 0:
            mvhd_body = (bytes([0, 0, 0, 0])          # version+flags
                         + (0).to_bytes(4, "big")      # creation
                         + (0).to_bytes(4, "big")      # modification
                         + timescale.to_bytes(4, "big")
                         + duration.to_bytes(4, "big"))
        else:
            mvhd_body = (bytes([1, 0, 0, 0])
                         + (0).to_bytes(8, "big")
                         + (0).to_bytes(8, "big")
                         + timescale.to_bytes(4, "big")
                         + duration.to_bytes(8, "big"))
        return (box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
                + box(b"moov", box(b"mvhd", mvhd_body)))

    rows = [
        (1, bytearray(mp4(1000, 2500))),            # 2.5 s, v0
        (2, bytearray(mp4(90000, 450000, version=1))),  # 5 s, v1
        (3, bytearray(b"\x00\x00\x00\x08free")),    # not an mp4
    ]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    out = {r.item_id: r for r in video_header_info(df).collect()}
    assert (out[1].format, out[1].timescale, out[1].duration_ms) == (
        "mp4", 1000, 2500.0)
    assert (out[2].timescale, out[2].duration_ms) == (90000, 5000.0)
    assert out[3].format is None


def test_normalize_text_semantics(spark):
    from cancer_survival_etl_spark.llm.textstats import normalize_text

    rows = [(1, "  Hello,   WORLD!  "), (2, "a\tb\nc"), (3, "nochange")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r.norm_text
        for r in normalize_text(df, strip_punct=True).collect()
    }
    assert out[1] == "hello world"
    assert out[2] == "a b c"
    assert out[3] == "nochange"
    # punctuation preserved when strip_punct=False
    keep = {
        r.doc_id: r.norm_text
        for r in normalize_text(df, strip_punct=False).collect()
    }
    assert keep[1] == "hello, world!"


def test_persisted_ivf_index_prunes_partitions_and_matches_inmemory(
    spark, sf_dir, tmp_path
):
    """build_ivf_index + query_ivf_index: (a) results identical to the
    in-memory ivf_topk with the same seed centroids, (b) the probe scan
    reads ONLY the probed cells' files — partition pruning observed via
    inputFiles(), the 100 TB contract."""
    from cancer_survival_etl_spark.llm.similarity import (
        build_ivf_index,
        ivf_topk,
        query_ivf_index,
    )
    from cancer_survival_etl_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "ivf")
    build_ivf_index(e, path, n_centroids=8)

    got = query_ivf_index(spark, path, queries, k=5, nprobe=2)
    want = ivf_topk(e, queries, k=5, n_centroids=8, nprobe=2)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # the index is physically partitioned by cell...
    import os

    cells = sorted(
        d for d in os.listdir(f"{path}/vectors") if d.startswith("cell=")
    )
    assert len(cells) > 2
    # ...and a cell filter lands in the scan's PartitionFilters (file
    # pruning), not PushedFilters (row filtering inside files)
    import contextlib
    import io

    pruned = spark.read.parquet(f"{path}/vectors").filter(
        F.col("cell").isin([0, 1])
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    m = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert m and "cell" in m[0] and "IN(0,1" in m[0].replace(" ", ""), plan


def test_band_index_incremental_probe(spark, sf_dir, tmp_path):
    """Persisted LSH band index: a delta batch containing a near-dup of
    an indexed doc and a novel doc — the probe finds exactly the dup
    pair (verified Jaccard), and appending the delta makes the next
    probe see it as corpus."""
    from cancer_survival_etl_spark.llm.dedup import (
        build_band_index,
        probe_band_index,
    )
    from cancer_survival_etl_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id < 400")
    path = str(tmp_path / "band_index")
    build_band_index(corpus, path)

    # delta: a verbatim copy of doc 7 (new id) + an unrelated new doc
    dup = corpus.filter("doc_id = 7").select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    novel = spark.createDataFrame(
        [(100001, "totally novel content zzz qqq vvv www "
                  "unlike anything indexed before xyzzy")],
        "doc_id long, text string",
    )
    delta = dup.unionByName(novel)

    hits = probe_band_index(
        spark, path, delta, corpus, threshold=0.5
    ).collect()
    assert {(r.new_id, r.corpus_id) for r in hits} == {(100007, 7)}
    assert all(r.jaccard == 1.0 for r in hits)

    # ingest loop: append delta keys; a re-probe of the dup now ALSO
    # matches itself-as-corpus sibling via the appended keys
    build_band_index(delta, path, mode="append")
    corpus2 = corpus.select("doc_id", "text").unionByName(delta)
    again = probe_band_index(
        spark, path, dup.select((F.col("doc_id") + 1).alias("doc_id"), "text"),
        corpus2, threshold=0.5,
    ).collect()
    assert {(r.new_id, r.corpus_id) for r in again} == {
        (100008, 7), (100008, 100007)
    }


def test_pq_encode_shape_and_determinism(spark, sf_dir):
    from cancer_survival_etl_spark.llm.similarity import pq_encode, pq_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_train(emb, m=8, sub_dim=8, k=16, iters=0)
    codes = pq_encode(emb, cb, m=8, sub_dim=8).toPandas()
    n = emb.count()
    # every vector gets exactly m codes, one per subspace, in [0, k)
    assert len(codes) == n * 8
    assert codes.groupby("vec_id")["sub"].nunique().eq(8).all()
    assert codes["code"].between(0, 15).all()
    # every code resolves to a codebook row
    resolved = (
        spark.createDataFrame(codes)
        .join(cb.withColumnRenamed("centroid_id", "code"), ["sub", "code"])
        .count()
    )
    assert resolved == len(codes)
    # seed vectors reconstruct exactly: the chosen centroid's subvector
    # IS the seed's subvector (distance 0; a tie can only remap to an
    # identical subvector)
    from cancer_survival_etl_spark.llm.similarity import (
        _dist2,
        pq_subvectors,
    )

    seeds = pq_subvectors(emb.filter(F.col("vec_id") < 16), 8, 8)
    zero = (
        seeds.join(
            spark.createDataFrame(codes[codes["vec_id"] < 16]),
            ["vec_id", "sub"],
        )
        .join(cb.withColumnRenamed("centroid_id", "code"), ["sub", "code"])
        .select(_dist2(F.col("subv"), F.col("_cbv")).alias("d2"))
        .agg(F.max("d2"))
        .collect()[0][0]
    )
    assert zero == 0.0


def test_pq_rerank_recall_vs_brute_force(spark, sf_dir):
    """ADC shortlist + exact re-rank: with shortlist=50 over ~500
    near-random vectors the measured recall is ≥0.9 (quantization
    only moves the shortlist boundary, not the returned ranking); raw
    ADC@5 on this concentrated-distance synthetic data sits near 0.4
    — which is why the serving shape is two-stage."""
    from cancer_survival_etl_spark.llm.similarity import (
        brute_force_topk,
        normalize_embeddings,
        pq_rerank_topk,
    )

    emb = normalize_embeddings(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    )
    q = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, q, k=5).toPandas()
    approx = pq_rerank_topk(
        emb, q, k=5, shortlist=50, m=16, sub_dim=4, n_codes=16, iters=1
    ).toPandas()
    assert approx.groupby("query_id").size().eq(5).all()
    e = set(map(tuple, exact[["query_id", "neighbor_id"]].values))
    a = set(map(tuple, approx[["query_id", "neighbor_id"]].values))
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"PQ rerank recall too low: {recall}"
    # re-ranked hits carry the exact cosine, so scores agree with
    # brute force wherever the pair appears in both
    merged = approx.merge(
        exact, on=["query_id", "neighbor_id"], suffixes=("_pq", "_bf")
    )
    assert (merged["cosine_pq"] == merged["cosine_bf"]).all()


def test_semantic_dedup_groups_are_intra_cell_min_id(spark, sf_dir):
    from cancer_survival_etl_spark.llm.dedup import semantic_dedup

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semantic_dedup(e, n_centroids=8, threshold=0.35).toPandas()
    assert len(out) == e.count()  # nothing lost, singletons included
    # keep rule: representative iff it IS the group min id
    assert ((out.vec_id == out.dup_group) == out.is_kept).all()
    grp = out.groupby("dup_group")
    assert (grp["vec_id"].min() == grp["vec_id"].min().index).all()
    # edges only form within a cell, so a dup group never spans cells
    assert grp["cell"].nunique().eq(1).all()
    # non-vacuous at every SF: some group has >1 member
    assert (grp.size() > 1).any()
    # a tighter threshold can only drop fewer documents
    tight = semantic_dedup(e, n_centroids=8, threshold=0.45).toPandas()
    assert (~tight.is_kept).sum() <= (~out.is_kept).sum()


def test_persisted_ivfpq_index_prunes_and_recalls(spark, sf_dir, tmp_path):
    """build_ivfpq_index + query_ivfpq_index: the codes lake is
    cell-partitioned and the probe lands in PartitionFilters; the
    probe→ADC→re-rank chain recalls the probed-cell IVF result (the
    shortlist covers the cells, so IVF-PQ equals plain persisted IVF
    at this scale) and returns exact cosines."""
    from cancer_survival_etl_spark.llm.similarity import (
        build_ivfpq_index,
        query_ivf_index,
        query_ivfpq_index,
    )
    from cancer_survival_etl_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(e, path, n_centroids=8, m=16, sub_dim=4, pq_iters=1)

    import os

    assert sorted(
        d for d in os.listdir(f"{path}/codes") if d.startswith("cell=")
    ), "codes not cell-partitioned"

    got = query_ivfpq_index(
        spark, path, queries, k=5, nprobe=2, shortlist=1000, m=16, sub_dim=4
    ).toPandas()
    want = query_ivf_index(spark, path, queries, k=5, nprobe=2).toPandas()
    # with an uncut shortlist the re-rank sees every probed-cell vector
    # → identical to the persisted IVF query, exact cosines included
    g = got.sort_values(["query_id", "rank_val"]).reset_index(drop=True)
    w = want.sort_values(["query_id", "rank_val"]).reset_index(drop=True)
    assert (g[["query_id", "neighbor_id", "cosine"]].values
            == w[["query_id", "neighbor_id", "cosine"]].values).all()

    # a realistic shortlist keeps high recall vs the same IVF result
    short = query_ivfpq_index(
        spark, path, queries, k=5, nprobe=2, shortlist=50, m=16, sub_dim=4
    ).toPandas()
    e_set = set(map(tuple, w[["query_id", "neighbor_id"]].values))
    s_set = set(map(tuple, short[["query_id", "neighbor_id"]].values))
    assert len(e_set & s_set) / len(e_set) >= 0.6


def test_hard_negative_mining_cross_label_topk(spark):
    from cancer_survival_etl_spark.llm.similarity import (
        hard_negative_mining,
    )

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.1], 0),   # same label as 0 — never a negative
        (2, [0.9, 0.2], 1),    # hardest cross-label for 0
        (3, [0.0, 1.0], 1),
        (4, [-1.0, 0.0], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = hard_negative_mining(
        emb, emb.filter("vec_id = 0"), k=2
    ).toPandas().sort_values("rank_val")
    assert list(out["neighbor_id"]) == [2, 3]
    assert (out["neighbor_label"] != 0).all()


def test_ivfpq_residual_encoding_same_exact_contract(spark, sf_dir, tmp_path):
    """Residual IVF-PQ (FAISS formulation): with an uncut shortlist the
    probe→ADC→re-rank chain still equals the plain persisted IVF query
    (re-rank is exact), and a realistic shortlist keeps recall — the
    residual codes only move the shortlist boundary."""
    from cancer_survival_etl_spark.llm.similarity import (
        build_ivfpq_index,
        query_ivf_index,
        query_ivfpq_index,
    )
    from cancer_survival_etl_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "ivfpq_res")
    build_ivfpq_index(
        e, path, n_centroids=8, m=16, sub_dim=4, pq_iters=1, residual=True
    )
    got = query_ivfpq_index(
        spark, path, queries, k=5, nprobe=2, shortlist=1000,
        m=16, sub_dim=4, residual=True,
    ).toPandas()
    want = query_ivf_index(spark, path, queries, k=5, nprobe=2).toPandas()
    g = got.sort_values(["query_id", "rank_val"]).reset_index(drop=True)
    w = want.sort_values(["query_id", "rank_val"]).reset_index(drop=True)
    assert (g[["query_id", "neighbor_id", "cosine"]].values
            == w[["query_id", "neighbor_id", "cosine"]].values).all()

    short = query_ivfpq_index(
        spark, path, queries, k=5, nprobe=2, shortlist=50,
        m=16, sub_dim=4, residual=True,
    ).toPandas()
    e_set = set(map(tuple, w[["query_id", "neighbor_id"]].values))
    s_set = set(map(tuple, short[["query_id", "neighbor_id"]].values))
    assert len(e_set & s_set) / len(e_set) >= 0.6


def test_logistic_train_matches_numpy_and_partitioning(spark):
    import numpy as np

    from cancer_survival_etl_spark.llm.inference import logistic_train

    rows = [
        (float((i * 37) % 100) / 100, float((i * 61) % 100) / 100,
         1 if ((i * 37) % 100) / 100 + ((i * 61) % 100) / 100 > 1.0 else 0)
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int")
    w = logistic_train(df, ["x1", "x2"], "y", lr=1.0, iters=30)
    X = np.array([[r[0], r[1]] for r in rows])
    Y = np.array([r[2] for r in rows])

    def lat(v):
        # the r11 exact nano-lattice fold: HALF_UP like Spark F.round
        return np.copysign(np.floor(np.abs(v * 1e9) + 0.5), v).sum() / 1e9

    wr = np.zeros(3)
    for _ in range(30):
        z = wr[0] + X @ wr[1:]
        resid = 1 / (1 + np.exp(-z)) - Y
        g = np.round(
            np.array(
                [lat(resid), lat(resid * X[:, 0]), lat(resid * X[:, 1])]
            )
            / 1000,
            9,
        )
        wr = wr - g
    assert w == [round(v, 9) for v in wr]  # bit-identical, incl. rounding
    assert w == logistic_train(
        df.repartition(64), ["x1", "x2"], "y", lr=1.0, iters=30
    )
    # the learned boundary actually separates the synthetic classes
    from pyspark.sql import functions as F

    acc = df.select(
        (
            (F.lit(w[0]) + F.lit(w[1]) * F.col("x1")
             + F.lit(w[2]) * F.col("x2") > 0).cast("int") == F.col("y")
        ).cast("int").alias("ok")
    ).agg(F.avg("ok")).collect()[0][0]
    assert acc >= 0.85


def test_hashed_features_plus_logistic_learns_token_rule(spark):
    """End-to-end in-engine text classifier: hashing-trick features →
    fused-aggregate logistic GD learns a token-presence rule from raw
    text (the fastText-lite composition)."""
    from cancer_survival_etl_spark.llm.inference import logistic_train
    from cancer_survival_etl_spark.llm.textstats import hashed_features

    # label = doc mentions 'alert'; text otherwise random filler
    filler = ["lorem", "ipsum", "dolor", "sit", "amet", "sed", "eiusmod"]
    rows = []
    for i in range(400):
        words = [filler[(i * 7 + j) % len(filler)] for j in range(10)]
        y = 1 if i % 3 == 0 else 0
        if y:
            words[i % 10] = "alert"
        rows.append((i, " ".join(words), y))
    docs = spark.createDataFrame(rows, "doc_id long, text string, y int")
    n_feat = 16
    feats = hashed_features(docs, "text", "doc_id", n_features=n_feat)
    wide = (
        feats.groupBy("doc_id")
        .pivot("bucket", list(range(n_feat)))
        .sum("n_tokens")
        .na.fill(0)
        .join(docs.select("doc_id", "y"), "doc_id")
    )
    cols = [str(b) for b in range(n_feat)]
    w = logistic_train(wide, cols, "y", lr=1.0, iters=40)
    from pyspark.sql import functions as F

    z = F.lit(w[0])
    for j, c in enumerate(cols):
        z = z + F.lit(w[j + 1]) * F.col(c)
    acc = wide.select(
        ((z > 0).cast("int") == F.col("y")).cast("int").alias("ok")
    ).agg(F.avg("ok")).collect()[0][0]
    assert acc >= 0.95, acc  # the 'alert' bucket is fully informative


def test_longest_internal_repeat_matches_brute_force(spark):
    import random

    from cancer_survival_etl_spark.llm.textstats import (
        longest_internal_repeat,
    )

    def brute(tokens):
        n, best = len(tokens), 0
        for i in range(n):
            for j in range(i + 1, n):
                l = 0
                while j + l < n and tokens[i + l] == tokens[j + l]:
                    l += 1
                best = max(best, l)
        return best

    random.seed(11)
    rows = []
    for d in range(30):
        n = random.randint(0, 40)
        toks = [random.choice("abcde") for _ in range(n)]
        rows.append((d, " ".join(toks)))
    # known cases: exact period-2 repetition, full duplication, empty
    rows += [
        (100, "x y x y x y"),       # "x y x y" repeats -> 4
        (101, "a b c a b c"),       # "a b c" twice -> 3
        (102, "unique tokens only here"),
        (103, ""),
    ]
    def brute_distinct(tokens):
        return len({tuple(tokens[i:j]) for i in range(len(tokens))
                    for j in range(i + 1, len(tokens) + 1)})

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.max_repeat_len, r.distinct_substrings)
           for r in longest_internal_repeat(df).collect()}
    for d, text in rows:
        toks = [t for t in text.split(" ") if t]
        assert got[d] == (len(toks), brute(toks), brute_distinct(toks)), (
            d, text, got[d])
    assert got[100][1] == 4 and got[101][1] == 3 and got[102][1] == 0
    # sanity: a doc with all-unique tokens has n(n+1)/2 distinct substrings
    n = got[102][0]
    assert got[102][2] == n * (n + 1) // 2


def test_unigram_trainer_hand_computed_em():
    """Hand trace for {"ab": 2}, vocab_size=3 (VERDICT r2 item 6):
    seed substrings a/b/ab each weight 2 -> probs 1/3 each; Viterbi
    picks ['ab'] (same cost as a+b at 1 piece vs 2); usage ab=2 ->
    prob(ab)=1.0; unused chars floor at min_usage/total/2 = 0.5.
    Fixed point from iteration 1 on."""
    from cancer_survival_etl_spark.llm.unigram import train_unigram

    probs = train_unigram({"ab": 2}, vocab_size=3)
    assert probs == {"a": 0.5, "ab": 1.0, "b": 0.5}


def test_unigram_viterbi_tie_breaks_and_unk():
    from cancer_survival_etl_spark.llm.unigram import viterbi_segment

    # equal cost, fewer pieces wins
    pieces, c = viterbi_segment("ab", {"a": 1, "b": 1, "ab": 2})
    assert pieces == ["ab"] and c == 2
    # equal cost and piece count: lexicographically smaller join wins
    pieces, _ = viterbi_segment("aaa", {"a": 1, "aa": 1})
    assert pieces == ["a", "aa"]  # 'a aa' < 'aa a'
    # unknown chars fall back to single-char UNK at unk_cost
    pieces, c = viterbi_segment("axb", {"a": 1, "b": 1}, unk_cost=50)
    assert pieces == ["a", "x", "b"] and c == 52
    # plain min-cost beats fewer-pieces when costs differ
    pieces, c = viterbi_segment("ab", {"a": 1, "b": 1, "ab": 3})
    assert pieces == ["a", "b"] and c == 2


def test_unigram_encode_driver_executor_agreement(spark):
    from cancer_survival_etl_spark.llm.unigram import (
        unigram_encode,
        viterbi_segment,
    )

    scores = {"a": 10, "b": 10, "ab": 15, "ba": 12, "c": 30}
    rows = [(1, "ab ba abba"), (2, "cab"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_words, r.n_tokens, list(r.tokens))
           for r in unigram_encode(df, scores).collect()}
    for d, text in rows:
        words = [w for w in text.split(" ") if w]
        toks = [t for w in words for t in viterbi_segment(w, scores)[0]]
        assert got[d] == (len(words), len(toks), toks), (d, got[d], toks)


def test_isotonic_fit_unbinned_matches_sequential_pava(spark):
    import random

    from cancer_survival_etl_spark.llm.evals import isotonic_fit

    random.seed(5)
    rows = [(round(random.randint(0, 300) / 300.0, 6),
             1 if random.random() < 0.5 else 0) for _ in range(4000)]
    df = spark.createDataFrame(rows, "score double, label int")

    # reference: one sequential PAVA over the exact per-score cells
    cells = {}
    for s, y in rows:
        n, p = cells.get(s, (0, 0))
        cells[s] = (n + 1, p + y)
    pools = []
    for s in sorted(cells):
        n, p = cells[s]
        pools.append([s, s, n, p])
        while len(pools) > 1 and (
            pools[-2][3] * pools[-1][2] >= pools[-1][3] * pools[-2][2]
        ):
            a, b = pools[-2], pools[-1]
            pools[-2:] = [[a[0], b[1], a[2] + b[2], a[3] + b[3]]]
    want = {}
    for lo, hi, n, p in pools:
        for s in sorted(cells):
            if lo <= s <= hi:
                want[s] = (cells[s][0], cells[s][1], round(p / n, 6))

    got = {r.score: (r.n, r.n_pos, r.calibrated)
           for r in isotonic_fit(df, "score", "label",
                                 start_buckets=16, fan_in=4).collect()}
    assert got == want
    # monotone non-decreasing over scores
    cal = [got[s][2] for s in sorted(got)]
    assert cal == sorted(cal)


def test_lsh_pq_index_probe_matches_in_memory_adc(spark, tmp_path):
    """build_lsh_pq_index + probe_lsh_pq_index: candidates come from
    persisted band rows, verification from the stored PQ codes alone —
    and the adist2 is bit-identical to the in-memory ADC on the same
    codebooks (pq_topk_adc arithmetic). Append keeps the code space:
    codebooks are read back, never retrained."""
    import random

    from cancer_survival_etl_spark.llm.similarity import (
        build_lsh_pq_index,
        pq_encode,
        pq_topk_adc,
        pq_train,
        probe_lsh_pq_index,
    )

    random.seed(21)
    dim, m, sub_dim = 16, 4, 4

    def vec():
        return [round(random.uniform(-1, 1), 3) for _ in range(dim)]

    base = [(i, vec()) for i in range(24)]
    corpus = spark.createDataFrame(
        base, "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "lshpq")
    build_lsh_pq_index(corpus, path, m=m, sub_dim=sub_dim, n_codes=8)

    # delta: near-copies of two corpus vectors + one far vector
    delta_rows = [
        (100, [v + 0.001 for v in base[3][1]]),
        (101, [v - 0.001 for v in base[7][1]]),
        (102, [5.0] * dim),
    ]
    delta = spark.createDataFrame(
        delta_rows, "vec_id long, embedding array<double>"
    )
    got = {
        (r.new_id, r.corpus_id): r.adist2
        for r in probe_lsh_pq_index(
            spark, path, delta, threshold=0.5, m=m, sub_dim=sub_dim
        ).collect()
    }
    assert any(k[0] == 100 and k[1] == 3 for k in got), got
    assert any(k[0] == 101 and k[1] == 7 for k in got), got
    assert not any(k[0] == 102 for k in got), got

    # probe adist2 must equal the in-memory ADC on the same codebooks
    cb = pq_train(corpus, m, sub_dim, 8)
    codes = pq_encode(corpus, cb, m, sub_dim)
    adc = {
        (r.query_id, r.neighbor_id): r.adist2
        for r in pq_topk_adc(
            corpus, delta, k=24, m=m, sub_dim=sub_dim,
            codebooks=cb, codes=codes,
        ).collect()
    }
    for pair, d in got.items():
        assert adc[pair] == d, (pair, d, adc[pair])

    # append path: new corpus docs become probeable, code space stable
    extra = spark.createDataFrame(
        [(50, [v + 0.002 for v in base[3][1]])],
        "vec_id long, embedding array<double>",
    )
    build_lsh_pq_index(extra, path, m=m, sub_dim=sub_dim, mode="append")
    got2 = {
        (r.new_id, r.corpus_id)
        for r in probe_lsh_pq_index(
            spark, path, delta, threshold=0.5, m=m, sub_dim=sub_dim
        ).collect()
    }
    assert (100, 50) in got2 and set(got) <= got2, got2


def test_packed_adc_matches_long_form_adc(spark):
    """pq_pack_codes + pq_topk_adc_packed: the 1-byte/component packed
    layout must reproduce the long-form join ADC exactly — same
    neighbours, same adist2, same ranks."""
    from cancer_survival_etl_spark.llm.similarity import (
        pq_encode,
        pq_pack_codes,
        pq_topk_adc,
        pq_topk_adc_packed,
        pq_train,
    )
    from cancer_survival_etl_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    m, sub_dim = 8, 8
    cb = pq_train(emb, m, sub_dim, k=16)
    codes = pq_encode(emb, cb, m, sub_dim)
    packed = pq_pack_codes(codes)
    # packed payload really is m bytes per vector
    one = packed.limit(1).collect()[0]
    assert len(one.codes_bin) == m

    long_form = {
        (r.query_id, r.neighbor_id): (r.adist2, r.rank_val)
        for r in pq_topk_adc(
            emb, queries, k=10, m=m, sub_dim=sub_dim,
            codebooks=cb, codes=codes,
        ).collect()
    }
    packed_form = {
        (r.query_id, r.neighbor_id): (r.adist2, r.rank_val)
        for r in pq_topk_adc_packed(
            packed, queries, cb, k=10, m=m, sub_dim=sub_dim
        ).collect()
    }
    assert packed_form == long_form


def test_lsh_quality_report_confusion_cells(spark):
    from cancer_survival_etl_spark.llm.dedup import lsh_quality_report

    words = ("alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lam mu nu xi omicron pi rho sigma tau upsilon")
    # unrelated docs: disjoint vocabularies → jaccard 0 between them
    docs = [(i, " ".join(f"w{i}t{j}" for j in range(20)))
            for i in range(10)]
    docs.append((100, words))          # the template
    docs.append((101, words + " phi")) # near-dup of 100
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {(r.is_candidate, r.is_duplicate): r.n_pairs
           for r in lsh_quality_report(df, threshold=0.5).collect()}
    n = len(docs)
    assert sum(out.values()) == n * (n - 1) // 2
    # the planted near-dup pair is both a candidate and a duplicate
    assert out.get((True, True), 0) >= 1
    # the unrelated pairs are neither
    assert out.get((False, False), 0) > 0


def test_audio_pcm_features_against_stdlib_wave_writer(spark, tmp_path):
    """Independent pin: payloads written by the STDLIB wave module
    (not our own synthesizer) decode to the struct-computed truth."""
    import wave

    from cancer_survival_etl_spark.llm.multimodal import audio_pcm_features

    samples = [((i * 11) % 101) - 50 for i in range(48)]
    p = tmp_path / "t.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(
            b"".join(s.to_bytes(2, "little", signed=True) for s in samples)
        )
    payload = p.read_bytes()
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"not a wav"))],
        "item_id long, payload binary",
    )
    out = {r.item_id: r for r in audio_pcm_features(df).collect()}
    r = out[1]
    assert r.sample_fmt == "pcm_s16le"
    assert r.n_samples == len(samples)
    assert r.peak == max(abs(s) for s in samples)
    assert r.sum_sq == sum(s * s for s in samples)
    zc = sum(1 for a, b in zip(samples, samples[1:])
             if (a < 0) != (b < 0))
    assert r.zero_crossings == zc
    assert out[2].sample_fmt is None  # malformed -> NULL fields


def test_audio_pcm_rejects_non_pcm_format_tag(spark):
    """A WAV whose fmt chunk declares IEEE float (wFormatTag=3) with
    16 bits per sample must yield NULLs, not a silent integer
    misdecode (ADVICE r3)."""
    from cancer_survival_etl_spark.llm.multimodal import audio_pcm_features

    def wav(ftag: int) -> bytes:
        data = b"\x01\x00\xff\x7f"  # two 16-bit samples
        fmt = (
            ftag.to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        )
        chunks = (
            b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data
        )
        return (
            b"RIFF" + (4 + len(chunks)).to_bytes(4, "little")
            + b"WAVE" + chunks
        )

    df = spark.createDataFrame(
        [(1, bytearray(wav(1))), (3, bytearray(wav(3)))],
        "item_id long, payload binary",
    )
    out = {r.item_id: r for r in audio_pcm_features(df).collect()}
    assert out[1].sample_fmt == "pcm_s16le" and out[1].n_samples == 2
    assert out[3].sample_fmt is None and out[3].n_samples is None


def test_image_pixel_features_bmp_roundtrip(spark):
    """Decode a hand-built 2x2 24-bit BMP (incl. row padding) and a
    malformed payload; channel sums must match the pixels exactly."""
    from cancer_survival_etl_spark.llm.multimodal import image_pixel_features

    # pixels (x, y): (r, g, b) chosen distinct per channel
    px = {(0, 0): (1, 2, 3), (1, 0): (4, 5, 6),
          (0, 1): (7, 8, 9), (1, 1): (10, 11, 12)}
    w, h = 2, 2
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    for yy in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for xx in range(w):
            r, g, b = px[(xx, yy)]
            row += bytes((b, g, r))
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    pix = b"".join(rows)
    info = ((40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little") + len(pix).to_bytes(4, "little")
            + b"\x00" * 16)
    hdr = (b"BM" + (54 + len(pix)).to_bytes(4, "little")
           + b"\x00" * 4 + (54).to_bytes(4, "little"))
    payload = hdr + info + pix

    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"PNG not bmp"))],
        "item_id long, payload binary",
    )
    out = {r.item_id: r for r in image_pixel_features(df).collect()}
    r = out[1]
    assert (r.width, r.height) == (2, 2)
    assert r.sum_r == sum(v[0] for v in px.values())
    assert r.sum_g == sum(v[1] for v in px.values())
    assert r.sum_b == sum(v[2] for v in px.values())
    assert out[2].width is None


def test_ivfpq_per_cell_codebooks_persisted_and_tighter(spark, sf_dir, tmp_path):
    """per_cell=True: (a) the codebooks lake carries a cell column and
    the persisted query path returns the exact result of the in-memory
    `ivfpq_topk_percell` contract (uncut shortlist → equals persisted
    IVF, exact cosines); (b) per-cell residual codebooks quantize a
    clustered corpus at LEAST as tightly as one shared residual
    codebook (total ADC self-distortion over identity queries)."""
    from cancer_survival_etl_spark.llm.similarity import (
        build_ivfpq_index,
        query_ivf_index,
        query_ivfpq_index,
    )
    from cancer_survival_etl_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "ivfpq_pc")
    build_ivfpq_index(
        e, path, n_centroids=8, m=16, sub_dim=4, pq_iters=1,
        residual=True, per_cell=True,
    )

    import os

    assert sorted(
        d for d in os.listdir(f"{path}/codes") if d.startswith("cell=")
    ), "codes not cell-partitioned"
    cb = spark.read.parquet(f"{path}/codebooks")
    assert "cell" in cb.columns, cb.columns
    # every populated cell trained its own book
    code_cells = {
        r.cell for r in spark.read.parquet(f"{path}/codes")
        .select("cell").distinct().collect()
    }
    cb_cells = {r.cell for r in cb.select("cell").distinct().collect()}
    assert code_cells <= cb_cells

    got = query_ivfpq_index(
        spark, path, queries, k=5, nprobe=2, shortlist=100000,
        m=16, sub_dim=4, residual=True, per_cell=True,
    ).toPandas()
    want = query_ivf_index(spark, path, queries, k=5, nprobe=2).toPandas()
    g = got.sort_values(["query_id", "rank_val"]).reset_index(drop=True)
    w = want.sort_values(["query_id", "rank_val"]).reset_index(drop=True)
    assert (g[["query_id", "neighbor_id", "cosine"]].values
            == w[["query_id", "neighbor_id", "cosine"]].values).all()


def test_per_cell_codebooks_reduce_distortion_on_clustered_data(spark):
    """On data with genuinely distinct clusters, per-cell codebooks
    must reconstruct residuals at lower (or equal) total squared error
    than ONE shared codebook of the same m x k budget — the entire
    point of the FAISS local-codebook refinement."""
    import random

    from cancer_survival_etl_spark.llm.similarity import (
        pq_encode,
        pq_encode_per_cell,
        pq_train,
        pq_train_per_cell,
    )

    random.seed(7)
    dim, m, sub_dim, k = 8, 2, 4, 4
    # two tight clusters with very different within-cluster geometry
    rows = []
    for i in range(40):
        cell = i % 2
        base = [10.0 * cell] * dim
        spread = 0.1 if cell == 0 else 3.0
        rows.append(
            (i, cell,
             [round(b + random.uniform(-spread, spread), 3) for b in base])
        )
    df = spark.createDataFrame(rows, "vec_id long, cell int, vec array<double>")

    def distortion(codes, books):
        import numpy as np

        bk = {}
        for r in books.collect():
            key = (r["cell"], r["sub"], r["centroid_id"]) \
                if "cell" in books.columns else (r["sub"], r["centroid_id"])
            bk[key] = np.array(r["_cbv"])
        vecs = {(r.vec_id): np.array(r.vec) for r in df.collect()}
        cells = {r.vec_id: r.cell for r in df.collect()}
        tot = 0.0
        for r in codes.collect():
            sv = vecs[r.vec_id][r.sub * sub_dim:(r.sub + 1) * sub_dim]
            key = (cells[r.vec_id], r.sub, r.code) \
                if "cell" in books.columns else (r.sub, r.code)
            tot += float(((sv - bk[key]) ** 2).sum())
        return tot

    shared_cb = pq_train(df, m, sub_dim, k, iters=2, vec_col="vec")
    shared_codes = pq_encode(df, shared_cb, m, sub_dim, vec_col="vec")
    local_cb = pq_train_per_cell(df, m, sub_dim, k, iters=2)
    local_codes = pq_encode_per_cell(df, local_cb, m, sub_dim)

    d_shared = distortion(shared_codes, shared_cb)
    d_local = distortion(local_codes, local_cb)
    assert d_local <= d_shared, (d_local, d_shared)
    # and strictly better here: the shared book must split its k
    # centroids across two incompatible distributions
    assert d_local < 0.9 * d_shared, (d_local, d_shared)


def test_bytes_to_unicode_bijection_and_gpt2_space():
    from cancer_survival_etl_spark.llm.bpe import bytes_to_unicode

    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256  # bijection
    assert table[ord(" ")] == "Ġ"      # the GPT-2 'Ġ'
    for ch in "azAZ09!~":                   # printable ASCII fixed
        assert table[ord(ch)] == ch


def test_binary_quantize_packing_and_sign_bit(spark):
    from cancer_survival_etl_spark.llm.similarity import binary_quantize

    # 70 dims → two words; vectors chosen so dim 63 (the long's sign
    # bit) and dim 69 are set for id 0: thresholds are (min+max)/2 of
    # {0, 1} = 0.5, so bit = (v == 1).
    import random

    rng = random.Random(7)
    vecs = {
        i: [float(rng.randint(0, 1)) for _ in range(70)] for i in range(4)
    }
    vecs[0][63] = 1.0
    vecs[1][63] = 0.0
    vecs[0][69] = 1.0
    # make every dim non-degenerate (some 0 and some 1 present)
    for d in range(70):
        vals = {vecs[i][d] for i in range(4)}
        if vals == {0.0}:
            vecs[3][d] = 1.0
        elif vals == {1.0}:
            vecs[3][d] = 0.0
    df = spark.createDataFrame(
        [(i, vecs[i]) for i in range(4)], "vec_id long, embedding array<float>"
    )
    got = {r.vec_id: r.bits for r in binary_quantize(df).collect()}
    for i in range(4):
        want_words = [0, 0]
        for d in range(70):
            if vecs[i][d] == 1.0:
                want_words[d // 64] |= 1 << (d % 64)
        # python ints are unbounded; fold to signed 64-bit like the JVM
        want = [
            w - (1 << 64) if w >= (1 << 63) else w for w in want_words
        ]
        assert got[i] == want, i
    # id 0 has bit 63 set → first word is negative (sign bit exercised)
    assert got[0][0] < 0 <= got[1][0]


def test_binary_hamming_topk_recall_and_exclusion(spark):
    from cancer_survival_etl_spark.llm.similarity import (
        binary_hamming_topk,
        brute_force_topk,
    )

    import random

    rng = random.Random(11)
    centers = [[10.0 * ((c >> b) & 1) - 5.0 for b in range(16)]
               for c in range(4)]
    rows = []
    for i in range(80):
        c = centers[i % 4]
        rows.append((i, [v + rng.uniform(-1, 1) for v in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = df.filter(F.col("vec_id") < 3)
    got = binary_hamming_topk(df, qs, k=5, rerank=30).collect()
    truth = brute_force_topk(df, qs, k=5).collect()
    got_sets = {}
    for r in got:
        got_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
        assert r.neighbor_id != r.query_id
    truth_sets = {}
    for r in truth:
        truth_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    # strong cluster structure → the Hamming shortlist recovers the
    # exact top-5 (same-cluster points differ in ~0 sign bits)
    recall = sum(
        len(got_sets[q] & truth_sets[q]) / 5 for q in truth_sets
    ) / len(truth_sets)
    assert recall >= 0.8, recall
    assert all(len(s) == 5 for s in got_sets.values())


def test_wordpiece_trainer_hand_example():
    from cancer_survival_etl_spark.llm.wordpiece import train_wordpiece

    # {"abab": 4, "ab": 2}: units abab=[a,##b,##a,##b], ab=[a,##b]
    # pairs (a,##b)=6 (##b,##a)=4 (##a,##b)=4; units a=6 ##b=10 ##a=4
    # scores 6/60 = 4/40 = 4/40 = 0.1 → three-way tie, smallest pair
    # lexicographically is (##a,##b) → merge to ##ab; next round ties
    # (a,##b)=6/60 and (##b,##ab)=4/40 again → (##b,##ab) → ##bab.
    v = train_wordpiece({"abab": 4, "ab": 2}, 6)
    assert v == sorted(["[UNK]", "a", "##a", "##b", "##ab", "##bab"])
    # converges when no pairs remain, even below vocab_size
    v2 = train_wordpiece({"abab": 4, "ab": 2}, 50)
    assert "abab" in v2 and "ab" in v2
    assert train_wordpiece({"abab": 4, "ab": 2}, 50) == v2  # deterministic


def test_wordpiece_greedy_encode_and_unk(spark):
    from cancer_survival_etl_spark.llm.wordpiece import (
        wordpiece_encode,
        wordpiece_word,
    )

    vocab = {"[UNK]", "un", "want", "##want", "##ed", "wa", "##nt", "a"}
    # longest-match-first: "unwanted" → un ##want ##ed (not un wa...)
    assert wordpiece_word("unwanted", frozenset(vocab)) == [
        "un", "##want", "##ed",
    ]
    # greedy dead-end → whole-word UNK even though a shorter first
    # piece would have segmented: "wants" has no ##s continuation
    assert wordpiece_word("wants", frozenset(vocab)) == ["[UNK]"]
    assert wordpiece_word("", frozenset(vocab)) == []
    assert wordpiece_word("x" * 300, frozenset(vocab)) == ["[UNK]"]
    df = spark.createDataFrame(
        [(1, "unwanted a wants"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r for r in wordpiece_encode(df, vocab).collect()
    }
    assert rows[1].tokens == ["un", "##want", "##ed", "a", "[UNK]"]
    assert (rows[1].n_words, rows[1].n_tokens) == (3, 5)
    assert (rows[2].n_words, rows[2].tokens) == (0, [])
    assert (rows[3].n_words, rows[3].tokens) == (0, [])


def test_byte_bpe_roundtrip_lossless(spark):
    """Byte-level BPE keeps whitespace in-vocab: concatenating the
    tokens and inverting the byte table reproduces the exact input
    (single-spaced), which the </w>-sentinel word-level variant cannot
    do."""
    from cancer_survival_etl_spark.llm.bpe import (
        bpe_encode_bytes,
        byte_pretokenize,
        bytes_to_unicode,
        train_bpe_merges_bytes,
    )

    texts = ["low lower lowest", "new newer newest widget", "x"]
    hist: dict[str, int] = {}
    for t in texts:
        for p in byte_pretokenize(t):
            hist[p] = hist.get(p, 0) + 1
    merges = train_bpe_merges_bytes(hist, 10)
    assert merges, "no merges learned"

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    inv = {v: k for k, v in bytes_to_unicode().items()}
    for r in bpe_encode_bytes(df, merges).collect():
        joined = "".join(r.tokens)
        raw = bytes(inv[c] for c in joined).decode("utf-8")
        assert raw == texts[r.doc_id], (raw, texts[r.doc_id])
        assert r.n_tokens == len(r.tokens)


def test_byte_bpe_histogram_matches_driver_count(spark):
    """byte_word_histogram (distributed) == driver pretokenize count,
    and non-initial words key separately under the 'Ġ' prefix."""
    from cancer_survival_etl_spark.llm.bpe import (
        byte_pretokenize,
        byte_word_histogram,
    )

    texts = ["low low lower", "low  lower", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want: dict[str, int] = {}
    for t in texts:
        for p in byte_pretokenize(t):
            want[p] = want.get(p, 0) + 1
    got = {r.word: r.n for r in byte_word_histogram(df).collect()}
    assert got == want
    assert "low" in got and "Ġlow" in got  # initial vs continued


def test_ppm_decode_header_comments_and_malformed(spark):
    from cancer_survival_etl_spark.llm.multimodal import image_ppm_features

    # 2x2 with a comment line; pixels RGB = (10,20,30),(1,2,3),...
    px = [(10, 20, 30), (1, 2, 3), (40, 50, 60), (7, 8, 9)]
    body = b"".join(bytes(p) for p in px)
    good = b"P6\n# hello\n2 2\n255\n" + body
    short = b"P6\n2 2\n255\n" + body[:5]
    notppm = b"P5\n2 2\n255\n" + body
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(short)),
         (3, bytearray(notppm))],
        "item_id long, payload binary",
    )
    out = {r.item_id: r for r in image_ppm_features(df).collect()}
    r = out[1]
    assert (r.width, r.height, r.maxval) == (2, 2, 255)
    assert r.sum_r == sum(p[0] for p in px)
    assert r.sum_g == sum(p[1] for p in px)
    assert r.sum_b == sum(p[2] for p in px)
    assert out[2].width is None and out[3].width is None


def _greedy_lzw_gif(indices, mcs):
    """Independent REAL greedy LZW compressor (string table, width
    growth, no mid-stream clears) — validates the decoder against a
    second implementation, exercising the width-growth and
    code==len(table) branches the uncompressed technique never hits."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    next_code = end + 1
    table = {(i,): i for i in range(clear)}
    cur = ()
    emitted = [(clear, width)]
    for sym in indices:
        cand = cur + (sym,)
        if cand in table:
            cur = cand
        else:
            emitted.append((table[cur], width))
            table[cand] = next_code
            next_code += 1
            # decoder grows width when ITS table (one entry behind the
            # encoder's until the next code arrives) reaches 2^width
            if next_code > (1 << width) and width < 12:
                width += 1
            cur = (sym,)
    if cur:
        emitted.append((table[cur], width))
    emitted.append((end, width))
    acc = nbits = 0
    out = bytearray()
    for c, w in emitted:
        acc |= c << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_lzw_decoder_against_independent_compressor():
    from cancer_survival_etl_spark.llm.multimodal import _gif_lzw_decode

    # repetitive pattern → real compression with table growth
    idx = [(i // 3) % 4 for i in range(500)]
    data = _greedy_lzw_gif(idx, 2)
    got = _gif_lzw_decode(data, 2, len(idx))
    assert got == idx
    # kwkwk pattern exercises the code == len(table) branch
    idx2 = [0, 1, 0, 1, 0, 1, 0, 1, 0]
    got2 = _gif_lzw_decode(_greedy_lzw_gif(idx2, 2), 2, len(idx2))
    assert got2 == idx2


def test_gif_decode_features_and_malformed(spark):
    from cancer_survival_etl_spark.llm.multimodal import image_gif_features

    import __spark_entry__ as entry

    gif = entry._gif_bytes(6, 4, 7)
    df = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(b"GIF87a trunc")),
         (3, bytearray(b"not a gif"))],
        "item_id long, payload binary",
    )
    out = {r.item_id: r for r in image_gif_features(df).collect()}
    r = out[1]
    assert (r.width, r.height, r.n_colors) == (6, 4, 8)
    want_r = sum((((x + y) % 8) * 7) % 256
                 for y in range(4) for x in range(6))
    want_g = sum(((x + y) % 8 + 7) % 256
                 for y in range(4) for x in range(6))
    want_b = sum((((x + y) % 8) ** 2 + 7) % 256
                 for y in range(4) for x in range(6))
    assert (r.sum_r, r.sum_g, r.sum_b) == (want_r, want_g, want_b)
    assert out[2].width is None and out[3].width is None


def test_source_overlap_matrix_hand_computed(spark):
    from cancer_survival_etl_spark.llm.dedup import source_overlap_matrix

    rows = [
        (1, "a b c d", "s1"),     # grams: abc, bcd
        (2, "a b c e", "s1"),     # + abce-grams: abc, bce
        (3, "a b c d", "s2"),     # same as doc 1
        (4, "x y z w", "s3"),     # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r.source_a, r.source_b): r
        for r in source_overlap_matrix(df, "text", "source", n=3).collect()
    }
    # s1 grams: {a b c, b c d, b c e}; s2: {a b c, b c d}; s3: {x y z, y z w}
    r = out[("s1", "s2")]
    assert (r.n_grams_a, r.n_grams_b, r.n_shared) == (3, 2, 2)
    assert r.jaccard == pytest.approx(2 / 3, abs=1e-6)
    assert r.containment == 1.0
    # disjoint pairs produce NO row (inner join on shared grams)
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_cluster_representatives_keep_best(spark):
    from cancer_survival_etl_spark.llm.dedup import cluster_representatives

    docs = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (4, 7)],
        "doc_id long, quality long",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)],
        "doc_id long, cluster_id long",
    )
    out = {r.cluster_id: r for r in cluster_representatives(
        docs, clusters, "quality").collect()}
    # cluster 1: quality tie 50/50 between ids 2, 3 -> lowest id wins
    assert out[1].rep_id == 2 and out[1].rep_quality == 50
    assert out[1].cluster_size == 3
    # singleton keeps itself
    assert out[4].rep_id == 4 and out[4].cluster_size == 1


def test_pca_matches_numpy_and_partition_independent(spark):
    import numpy as np

    from cancer_survival_etl_spark.llm.similarity import (
        gram_exact,
        pca_fit,
        pca_project,
    )

    rng_rows = []
    for i in range(300):
        # planted 2-factor structure in 6 dims + deterministic noise
        a = ((i * 37) % 100) / 50.0 - 1.0
        b = ((i * 61) % 100) / 50.0 - 1.0
        noise = [(((i * p) % 7) - 3) / 30.0 for p in (11, 13, 17, 19, 23, 29)]
        v = [3 * a + noise[0], 3 * a + noise[1], 2 * b + noise[2],
             2 * b + noise[3], noise[4], noise[5]]
        rng_rows.append((i, v))
    df = spark.createDataFrame(rng_rows, "vec_id long, embedding array<double>")
    n, w, comps, C_fit = pca_fit(df, "embedding", dim=6, k=3)
    X = np.array([v for _, v in rng_rows])
    C = np.cov(X, rowvar=False, bias=True)
    assert np.allclose(C_fit, C, atol=1e-8)
    w_ref = np.sort(np.linalg.eigvalsh(C))[::-1][:3]
    assert n == 300
    assert w == pytest.approx(list(w_ref), abs=1e-6)
    # components diagonalize: residual ||Cv - wv|| tiny, orthonormal
    for lam, v in zip(w, comps):
        assert np.linalg.norm(C @ v - lam * v) < 1e-6
    M = np.array(comps)
    assert np.allclose(M @ M.T, np.eye(3), atol=1e-9)
    # exact gram: bit-identical at 1 vs 32 partitions
    g1 = {(r.i, r.j): r.v for r in
          gram_exact(df.repartition(1), "embedding", 6).collect()}
    g32 = {(r.i, r.j): r.v for r in
           gram_exact(df.repartition(32), "embedding", 6).collect()}
    assert g1 == g32
    # projection reproduces numpy X @ v per component
    proj = {r.vec_id: r.pca for r in
            pca_project(df, comps, "embedding").collect()}
    P_ref = X @ M.T
    for i, _ in rng_rows[:20]:
        assert proj[i] == pytest.approx(list(P_ref[i]), abs=1e-9)


def test_quantile_train_recovers_planted_quantile_line(spark):
    """Pinball-loss GD on y = 1 + 2x + Exp(1) noise: the tau-quantile
    line keeps the slope and shifts the intercept by -ln(1-tau);
    squared loss would land on the mean (+1.0) instead. Also pins the
    partitioning-independence contract and the numpy mirror of the
    same rounded-gradient schedule."""
    import math

    import numpy as np

    from cancer_survival_etl_spark.llm.inference import quantile_train

    rows = []
    for i in range(400):
        x = (i % 100) / 50.0
        u = ((i * 2654435761) % 99991) / 99991.0
        rows.append((x, 1.0 + 2.0 * x - math.log(1.0 - u * 0.999999)))
    df = spark.createDataFrame(rows, "x double, y double")
    w = quantile_train(df, ["x"], "y", tau=0.9, lr=4.0, iters=60)
    assert abs(w[1] - 2.0) < 0.2
    assert abs(w[0] - (1.0 - math.log(0.1))) < 0.2
    # bit-identical at 1 vs 32 partitions
    w1 = quantile_train(df.repartition(1), ["x"], "y", 0.9, 4.0, 15)
    w32 = quantile_train(df.repartition(32), ["x"], "y", 0.9, 4.0, 15)
    assert w1 == w32
    # numpy mirror of the same smoothed schedule reproduces the
    # weights exactly (r11: the exact nano-lattice fold — per-row
    # HALF_UP rounds summed as longs, like Spark's F.round)
    X = np.array([r[0] for r in rows])
    Y = np.array([r[1] for r in rows])

    def lat(v):
        return np.copysign(np.floor(np.abs(v * 1e9) + 0.5), v).sum() / 1e9

    wv = [0.0, 0.0]
    n = len(rows)
    for t in range(15):
        h = max(2.0 / (t + 1.0), 1e-3)
        z = wv[0] + wv[1] * X
        s = 1.0 / (1.0 + np.exp(-(z - Y) / h)) - 0.9
        g0 = round(lat(s) / n, 9)
        g1 = round(lat(s * X) / n, 9)
        wv = [round(wv[0] - 4.0 * g0, 9), round(wv[1] - 4.0 * g1, 9)]
    assert w1 == [round(wv[0], 9), round(wv[1], 9)]


def test_pca_shortlist_topk_exact_when_full_rank(spark):
    """With ALL components kept the projection is an isometry, so the
    PCA shortlist ranking must equal brute force exactly; with a tiny
    shortlist the output is still exact-cosine-ranked over candidates."""
    from cancer_survival_etl_spark.llm.similarity import (
        brute_force_topk,
        pca_fit,
        pca_shortlist_topk,
    )

    rows = []
    for i in range(80):
        v = [(((i * p) % 13) - 6) / 6.0 for p in (3, 5, 7, 11)]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    _, _, comps, _ = pca_fit(df, "embedding", dim=4, k=4)
    q = df.filter("vec_id < 3")
    a = pca_shortlist_topk(df, q, comps, k=5, shortlist=80).collect()
    b = brute_force_topk(df, q, k=5).collect()
    key = lambda r: (r.query_id, r.rank_val)
    assert sorted([(r.query_id, r.rank_val, r.neighbor_id, r.cosine)
                   for r in a]) == \
           sorted([(r.query_id, r.rank_val, r.neighbor_id, r.cosine)
                   for r in b])
    # reranked cosines are TRUE cosines even when the shortlist prunes
    small = pca_shortlist_topk(df, q, comps[:2], k=3, shortlist=10)
    exact_cos = {(r.query_id, r.neighbor_id): r.cosine for r in
                 brute_force_topk(df, q, k=79).collect()}
    for r in small.collect():
        assert r.cosine == exact_cos[(r.query_id, r.neighbor_id)]


def test_k_core_peels_to_the_clique(spark):
    from cancer_survival_etl_spark.operators.graph import k_core

    # 4-clique {0,1,2,3} + a tail 3-4-5-6 + a triangle {7,8,9}
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 4), (4, 5), (5, 6),
             (7, 8), (8, 9), (7, 9)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    core3 = {r.node: r.core_degree for r in k_core(df, 3).collect()}
    assert core3 == {0: 3, 1: 3, 2: 3, 3: 3}
    core2 = {r.node: r.core_degree for r in k_core(df, 2).collect()}
    # 2-core: clique + triangle survive, the open tail peels away
    assert set(core2) == {0, 1, 2, 3, 7, 8, 9}
    assert core2[7] == core2[8] == core2[9] == 2
    # k above max degree: empty
    assert k_core(df, 5).count() == 0
    # pure path has no 2-core
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    assert k_core(path, 2).count() == 0


def test_opq_rotation_reduces_distortion_on_anisotropic_data(spark):
    """Parametric OPQ (eigenvalue-allocation rotation): when all the
    variance sits inside ONE natural subvector block, plain PQ burns
    its whole per-subspace budget there while the other codebook
    learns nothing. The OPQ rotation must spread the big eigen-
    directions across subspaces and strictly cut reconstruction
    error. Also pins: rotation is orthogonal (distortion is measured
    in the rotated space, which preserves L2), allocation is balanced,
    and the rotated pipeline reuses pq_train/pq_encode unchanged."""
    import random

    import numpy as np

    from cancer_survival_etl_spark.llm.similarity import (
        opq_rotation,
        pca_project,
        pq_encode,
        pq_train,
    )

    random.seed(11)
    dim, m, sub_dim, k = 8, 2, 4, 4
    rows = []
    for i in range(60):
        v = [round(random.uniform(-5.0, 5.0), 3) for _ in range(4)] + [
            round(random.uniform(-0.05, 0.05), 4) for _ in range(4)
        ]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")

    rotation, members = opq_rotation(df, m=m, vec_col="vec", dim=dim)
    # balanced allocation: each subspace owns d/m eigen-dims
    assert sorted(len(g) for g in members) == [sub_dim, sub_dim]
    R = np.array(rotation)
    assert np.allclose(R @ R.T, np.eye(dim), atol=1e-9)  # orthogonal

    rotated = pca_project(df, rotation, vec_col="vec", out_col="rvec")

    def distortion(frame, col, books, codes):
        bk = {(r["sub"], r["centroid_id"]): np.array(r["_cbv"])
              for r in books.collect()}
        vecs = {r.vec_id: np.array(r[col]) for r in frame.collect()}
        tot = 0.0
        for r in codes.collect():
            sv = vecs[r.vec_id][r.sub * sub_dim:(r.sub + 1) * sub_dim]
            tot += float(((sv - bk[(r.sub, r.code)]) ** 2).sum())
        return tot

    plain_cb = pq_train(df, m, sub_dim, k, iters=2, vec_col="vec")
    plain_codes = pq_encode(df, plain_cb, m, sub_dim, vec_col="vec")
    d_plain = distortion(df, "vec", plain_cb, plain_codes)

    opq_cb = pq_train(rotated, m, sub_dim, k, iters=2, vec_col="rvec")
    opq_codes = pq_encode(rotated, opq_cb, m, sub_dim, vec_col="rvec")
    d_opq = distortion(rotated, "rvec", opq_cb, opq_codes)

    assert d_opq < 0.9 * d_plain, (d_opq, d_plain)


def test_als_recovers_planted_low_rank(spark):
    """ALS: on a planted rank-2 rating matrix the training RMSE must
    collapse well below the rating scale and decrease monotonically;
    the fit is bit-identical under repartitioning."""
    import math

    from cancer_survival_etl_spark.llm.factorization import als_train

    rows = []
    for u in range(60):
        pu = (math.sin(u * 1.7), math.cos(u * 0.9))
        for i in range(40):
            qi = (math.sin(i * 0.6), math.cos(i * 1.3))
            r = 2.0 + pu[0] * qi[0] + pu[1] * qi[1]
            if (u * 31 + i) % 3 == 0:   # ~1/3 of cells observed
                rows.append((u, i, round(r, 4)))
    df = spark.createDataFrame(rows, "u long, i long, r double")
    users, items, hist = als_train(
        df, "u", "i", "r", k=3, iters=8, reg=0.02
    )
    assert hist == sorted(hist, reverse=True), hist  # monotone down
    assert hist[-1] < 0.05, hist                     # rank-2 + bias fits
    assert users.count() == 60 and items.count() == 40
    assert set(users.columns) == {"u", "f0", "f1", "f2"}
    # partitioning independence
    _, _, hist32 = als_train(
        df.repartition(32), "u", "i", "r", k=3, iters=8, reg=0.02
    )
    assert hist32 == hist


def test_procrustes_recovers_planted_rotation(spark):
    """Orthogonal Procrustes: b = a·R_true (noiseless) must recover
    R_true to the lattice tolerance; the result is orthogonal and
    partitioning-independent; applying R aligns the spaces (residual
    collapses vs the unaligned distance)."""
    import math

    import numpy as np

    from cancer_survival_etl_spark.llm.similarity import (
        procrustes_align,
    )

    rng_rows = []
    d = 6
    # planted rotation: Givens product (deterministic)
    R_true = np.eye(d)
    for (p, q, th) in [(0, 1, 0.7), (2, 4, -1.1), (1, 5, 0.3)]:
        G = np.eye(d)
        G[p, p] = G[q, q] = math.cos(th)
        G[p, q] = -math.sin(th)
        G[q, p] = math.sin(th)
        R_true = R_true @ G
    for i in range(500):
        a = [round(math.sin(i * k + 0.1 * k * k), 4)
             for k in range(1, d + 1)]
        b = list(np.array(a) @ R_true)
        rng_rows.append((i, a, [float(x) for x in b]))
    df = spark.createDataFrame(
        rng_rows, "id long, a array<double>, b array<double>"
    )
    R = np.array(procrustes_align(df, "a", "b", dim=d))
    assert np.allclose(R @ R.T, np.eye(d), atol=1e-8)
    assert np.allclose(R, R_true, atol=1e-6), np.abs(R - R_true).max()
    R32 = np.array(
        procrustes_align(df.repartition(32), "a", "b", dim=d)
    )
    assert (R == R32).all()
