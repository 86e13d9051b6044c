"""BM25 retrieval, n-gram LM scoring, and DSIR importance weighting.

Each operator is pinned against an independent pure-Python
re-computation on a hand-built corpus (not against Spark itself), plus
edge cases: empty-match queries, sub-n-gram documents, unseen grams.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from cancer_survival_etl_spark.llm.retrieval import (
    bm25_topk,
    dsir_importance,
    ngram_lm_score,
)

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the dog sat on the log", "en"),
    (2, "cat dog cat dog cat", "en"),
    (3, "completely unrelated words here", "de"),
    (4, "mat", "en"),  # single-token doc: no bigrams
    (5, "le chat noir dort le jour", "fr"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t, lang) for i, t, lang in DOCS],
        "doc_id long, text string, lang string",
    )


def _py_bm25(query: str, k1=1.2, b=0.75):
    toks = {i: t.split(" ") for i, t, _ in DOCS}
    tf = {i: {} for i in toks}
    for i, ts in toks.items():
        for t in ts:
            tf[i][t] = tf[i].get(t, 0) + 1
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    scores = {}
    for term in set(query.split(" ")):
        df = sum(1 for i in tf if term in tf[i])
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i in tf:
            if term in tf[i]:
                f = tf[i][term]
                tfn = (f * (k1 + 1)) / (
                    f + k1 * (1 - b + b * len(toks[i]) / avgdl)
                )
                scores[i] = scores.get(i, 0) + round(idf * tfn * 1e6)
    return {i: s / 1e6 for i, s in scores.items()}


def test_bm25_matches_python_reference(spark, docs_df):
    qs = spark.createDataFrame(
        [(1, "cat mat"), (2, "dog"), (3, "zebra")],
        "query_id int, query_text string",
    )
    got = {
        (r.query_id, r.doc_id): (r.score, r.rank_val)
        for r in bm25_topk(docs_df, qs, k=10).collect()
    }
    for qid, qtext in [(1, "cat mat"), (2, "dog")]:
        ref = _py_bm25(qtext)
        ranked = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (doc, score) in enumerate(ranked, start=1):
            assert got[(qid, doc)] == (pytest.approx(score, abs=1e-9), rank)
    # a query with no matching term returns no rows at all
    assert not [k for k in got if k[0] == 3]


def test_bm25_repeated_query_terms_count_once(spark, docs_df):
    qs = spark.createDataFrame(
        [(1, "cat"), (2, "cat cat cat")], "query_id int, query_text string"
    )
    rows = bm25_topk(docs_df, qs, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, {})[r.doc_id] = r.score
    assert by_q[1] == by_q[2]


def test_ngram_lm_score_matches_python_reference(spark, docs_df):
    got = {
        r.doc_id: (r.n_ngrams, r.avg_nll)
        for r in ngram_lm_score(docs_df, docs_df, n=2, alpha=1.0).collect()
    }
    # python reference LM
    bigrams, ctxs, vocab = {}, {}, set()
    for _, t, _ in DOCS:
        ts = t.split(" ")
        for a, c in zip(ts, ts[1:]):
            bigrams[(a, c)] = bigrams.get((a, c), 0) + 1
            ctxs[a] = ctxs.get(a, 0) + 1
            vocab.add(c)
    v = len(vocab) + 1
    for i, t, _ in DOCS:
        ts = t.split(" ")
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            assert got[i] == (0, None)
            continue
        micro = sum(
            round(
                -math.log(
                    (bigrams.get(p, 0) + 1.0) / (ctxs.get(p[0], 0) + 1.0 * v)
                )
                * 1e6
            )
            for p in pairs
        )
        assert got[i][0] == len(pairs)
        assert got[i][1] == pytest.approx(
            round(micro / 1e6 / len(pairs), 6), abs=1e-9
        )


def test_ngram_lm_unseen_grams_score_worse(spark, docs_df):
    lm = docs_df.filter("lang = 'en'")
    scored = {
        r.doc_id: r.avg_nll
        for r in ngram_lm_score(docs_df, lm, n=2, alpha=1.0).collect()
    }
    # in-domain English text is more likely under the English LM than
    # French text whose every bigram is unseen
    assert scored[0] < scored[5]
    assert scored[1] < scored[5]


def _py_bucket(tok: str, n_buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets


def test_dsir_importance_matches_python_reference(spark, docs_df):
    nb = 64
    got = {
        r.doc_id: (r.n_feats, r.weight)
        for r in dsir_importance(
            docs_df, docs_df.filter("lang = 'en'"), n_buckets=nb, alpha=1.0
        ).collect()
    }
    src, tgt = {}, {}
    for i, t, lang in DOCS:
        for tok in t.split(" "):
            b = _py_bucket(tok, nb)
            src[b] = src.get(b, 0) + 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
    ns, nt = sum(src.values()), sum(tgt.values())
    lam = {
        b: round(
            math.log(
                ((tgt.get(b, 0) + 1.0) / (nt + 1.0 * nb))
                / ((src.get(b, 0) + 1.0) / (ns + 1.0 * nb))
            ),
            6,
        )
        for b in src
    }
    for i, t, _ in DOCS:
        toks = t.split(" ")
        micro = sum(round(lam[_py_bucket(tok, nb)] * 1e6) for tok in toks)
        assert got[i][0] == len(toks)
        assert got[i][1] == pytest.approx(micro / 1e6, abs=1e-9)
    # English docs should look more target-like than the German doc
    per_tok = {i: got[i][1] / got[i][0] for i, _, _ in DOCS}
    assert per_tok[0] > per_tok[3]


def test_diversify_topk_cap(spark):
    from cancer_survival_etl_spark.llm.retrieval import diversify_topk_cap

    rows = [
        (1, 10, "a", 0.9), (1, 11, "a", 0.8), (1, 12, "a", 0.7),
        (1, 20, "b", 0.6), (1, 21, "b", 0.5), (1, 30, "c", 0.4),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, category string, score double"
    )
    out = (
        diversify_topk_cap(df, k=4, cap=2)
        .toPandas().sort_values("rank_val")
    )
    # third 'a' (0.7) is capped out; survivors ranked by score
    assert list(out["neighbor_id"]) == [10, 11, 20, 21]
    assert list(out["rank_val"]) == [1, 2, 3, 4]


def _mmr_reference(cands, k, lam):
    lam10 = round(lam * 10)
    sel = []
    while len(sel) < min(k, len(cands)):
        best = None
        for cid, rel, v in cands:
            if any(cid == s[0] for s in sel):
                continue
            red = max(
                (int(round(sum(x * y for x, y in zip(v, sv)) * 1e6))
                 for _, _, sv in sel),
                default=None,
            )
            score = lam10 * int(round(rel * 1e6)) - (
                (10 - lam10) * red if red is not None else 0
            )
            if best is None or (score, -cid) > (best[1], -best[0]):
                best = (cid, score, v)
        sel.append(best)
    return [(cid, score) for cid, score, _ in sel]


def test_mmr_rerank_matches_greedy_reference(spark, sf_dir):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.llm.retrieval import mmr_rerank
    from cancer_survival_etl_spark.llm.similarity import (
        brute_force_topk,
        normalize_embeddings,
    )

    emb = normalize_embeddings(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    )
    q = emb.filter(F.col("vec_id") < 3)
    shortlist = brute_force_topk(emb, q, k=10).join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("vec"),
        ),
        "neighbor_id",
    )
    got = mmr_rerank(shortlist, k=5, lam=0.7).toPandas()
    cand = shortlist.select(
        "query_id", "neighbor_id", "cosine", "vec"
    ).toPandas()
    for qid, grp in cand.groupby("query_id"):
        want = _mmr_reference(
            [(int(r.neighbor_id), float(r.cosine), list(r.vec))
             for r in grp.itertuples()],
            5, 0.7,
        )
        g = got[got.query_id == qid].sort_values("rank_val")
        assert list(g["neighbor_id"]) == [w[0] for w in want], qid
        assert [int(s) for s in g["mmr_score_micro"]] == [
            w[1] for w in want
        ], qid
    # every query returns exactly k rows and no duplicate items
    assert got.groupby("query_id").size().eq(5).all()
    assert not got.duplicated(["query_id", "neighbor_id"]).any()
