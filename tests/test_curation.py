from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cancer_survival_etl_spark.llm.curation import (
    chunk_documents,
    contamination,
    fuzzy_contamination,
    pack_bins,
)
from cancer_survival_etl_spark.operators.windows import global_prefix_sum


def test_contamination_counts_and_ratio(spark):
    train = spark.createDataFrame(
        [
            (1, "a b c d"),        # grams: "a b c", "b c d" — 1 hit
            (2, "x y z w"),        # no overlap
            (3, "a b c"),          # exactly the benchmark gram
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, "a b c")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in contamination(train, ev).collect()}
    assert (got[1]["n_grams"], got[1]["n_contaminated"]) == (2, 1)
    assert got[1]["contamination_ratio"] == 0.5
    assert got[1]["is_contaminated"]
    assert (got[2]["n_contaminated"], got[2]["is_contaminated"]) == (0, False)
    assert (got[3]["n_grams"], got[3]["n_contaminated"]) == (1, 1)


def test_contamination_short_doc_truncated_gram(spark):
    # a doc shorter than n still yields its full text as one gram
    train = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    ev = spark.createDataFrame([(2, "hello")], "doc_id long, text string")
    [r] = contamination(train, ev, n=3).collect()
    assert (r["n_grams"], r["n_contaminated"]) == (1, 1)


def test_fuzzy_contamination_catches_paraphrase_and_skips_disjoint(spark):
    # train doc 1 is a light edit of eval doc 100 (one word changed at
    # the end — MinHash signatures over 5-char shingles collide on at
    # least one band with high probability for ~0.9 shingle-Jaccard);
    # train doc 2 shares nothing with the eval side.
    base = "the quick brown fox jumps over the lazy dog again and again"
    train = spark.createDataFrame(
        [(1, base + " today"), (2, "completely unrelated text here")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, base + " tonight")], "doc_id long, text string"
    )
    # 4 bands × 2 rows (s* = 0.5) so the single-word edit reliably
    # collides on some band; the default 2×4 targets ~0.84 shingle
    # similarity and is exercised by the oracle-checked driver query
    rows = fuzzy_contamination(
        train, ev, bands=4, rows_per_band=2, jaccard_threshold=0.3
    ).collect()
    assert [(r["train_id"], r["eval_id"]) for r in rows] == [(1, 100)]
    # 3-gram Jaccard of the pair: 11 grams each, 10 shared, union 12
    assert abs(rows[0]["jaccard"] - 10 / 12) < 1e-5


def test_fuzzy_contamination_identical_doc_full_jaccard(spark):
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    [r] = fuzzy_contamination(train, ev).collect()
    assert (r["train_id"], r["eval_id"], r["jaccard"]) == (1, 9, 1.0)


def test_chunk_documents_sizes_and_reassembly(spark):
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4"), (2, "solo")], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(df, chunk_size=2).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    d1 = [r for r in rows if r["doc_id"] == 1]
    assert [r["chunk_id"] for r in d1] == [0, 1, 2]
    assert [r["n_tokens"] for r in d1] == [2, 2, 1]
    assert " ".join(r["chunk_text"] for r in d1) == "t0 t1 t2 t3 t4"
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert [(r["chunk_id"], r["chunk_text"], r["n_tokens"]) for r in d2] == [
        (0, "solo", 1)
    ]


def test_pack_bins_offsets_and_bins(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d"), (3, "a b c d e")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["start_offset"], r["bin_id"])
        for r in pack_bins(df, budget=6).collect()
    }
    assert got == {1: (0, 0), 2: (3, 0), 3: (7, 1)}


def test_global_prefix_sum_matches_single_window(spark):
    # 257 rows, shuffled insert order, verified against the naive
    # single-task global window it replaces
    df = spark.createDataFrame(
        [(int(k), int(k * 37 % 101 + 1)) for k in range(257)][::-1],
        "k long, v long",
    ).repartition(8)
    got = global_prefix_sum(df, "k", "v", alias="ps", num_partitions=8)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = df.select("k", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("ps"))
    assert {(r["k"], r["ps"]) for r in got.collect()} == {
        (r["k"], r["ps"]) for r in want.collect()
    }
    # plan shape: no global single-partition sort of the data side
    assert "ps" in got.columns and got.count() == 257


def test_boilerplate_spans_doc_frequency(spark):
    from cancer_survival_etl_spark.llm.curation import boilerplate_spans

    df = spark.createDataFrame(
        [
            (1, "p q r s x"),
            (2, "y p q r s"),
            (3, "p q r s"),
            (4, "a b c d"),
            (5, "p q r s p q r s"),  # repeats within doc count once
        ],
        "doc_id long, text string",
    )
    got = {
        r["span"]: r["n_docs"]
        for r in boilerplate_spans(df, n=4, min_docs=3).collect()
    }
    assert got["p q r s"] == 4
    assert "a b c d" not in got


def test_tfidf_topk_scores_and_ranking(spark):
    import math

    from cancer_survival_etl_spark.llm.curation import tfidf_topk

    df = spark.createDataFrame(
        [
            (1, "common rare rare"),
            (2, "common other"),
            (3, "common unique"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # "common" is in all 3 docs: ln(3/3)=0 — never the top keyword
    top1 = {d: sorted(rs, key=lambda r: r["rank_val"])[0] for d, rs in by_doc.items()}
    assert top1[1]["token"] == "rare"
    assert top1[1]["tfidf"] == round(2 * math.log(3.0 / 1.0), 6)
    assert top1[3]["token"] == "unique"
    assert all(len(rs) <= 2 for rs in by_doc.values())


def test_chunk_documents_overlapping_stride(spark):
    df = spark.createDataFrame([(1, "t0 t1 t2 t3 t4")], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_size=3, stride=2).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["chunk_text"] for r in rows] == ["t0 t1 t2", "t2 t3 t4", "t4"]
    # every token appears in some chunk; consecutive chunks overlap by 1
    assert [r["n_tokens"] for r in rows] == [3, 3, 1]


def test_bloom_decontaminate_identical_to_exact(spark, sf_dir):
    """The Bloom prefilter must be output-invisible: identical results
    to the exact operator even with a deliberately SATURATED tiny
    filter (every false positive must die in the exact verify), and
    with a roomy filter (false negatives impossible by construction)."""
    from cancer_survival_etl_spark.llm.curation import (
        bloom_decontaminate,
        contamination,
    )
    from cancer_survival_etl_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    train = d.filter("doc_id % 5 != 0")
    ev = d.filter("doc_id % 5 = 0")
    exact = sorted(map(tuple, contamination(train, ev, n=3).collect()))
    roomy = sorted(map(tuple, bloom_decontaminate(
        train, ev, n=3, n_bits=1 << 18, k=4).collect()))
    saturated = sorted(map(tuple, bloom_decontaminate(
        train, ev, n=3, n_bits=1 << 9, k=2).collect()))
    assert exact == roomy == saturated
    assert len(exact) > 0


def test_materialize_epochs_reproducible_shards(spark, sf_dir, tmp_path):
    """Two epochs land under epoch=N/ partitions; every doc appears
    once per epoch; epoch permutations differ; re-running reproduces
    byte-identical shard contents (pure function of salt+id)."""
    import os

    from cancer_survival_etl_spark.llm.pipeline import materialize_epochs
    from cancer_survival_etl_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    path = str(tmp_path / "shards")
    manifest = materialize_epochs(
        docs, path, n_epochs=2, seq_len=512, salt="s"
    ).toPandas()
    assert sorted(
        d for d in os.listdir(path) if d.startswith("epoch=")
    ) == ["epoch=0", "epoch=1"]
    per_epoch = manifest.groupby("epoch")["n_docs"].sum()
    assert (per_epoch == n_docs).all()

    shards = spark.read.parquet(path).toPandas()
    e0 = shards[shards.epoch == 0].sort_values("shuffle_pos")
    e1 = shards[shards.epoch == 1].sort_values("shuffle_pos")
    # different epoch salts -> different packing order
    assert list(e0["n_tokens"]) != list(e1["n_tokens"])

    path2 = str(tmp_path / "shards2")
    materialize_epochs(docs, path2, n_epochs=2, seq_len=512, salt="s")
    again = spark.read.parquet(path2).toPandas()
    key = ["epoch", "shuffle_pos", "n_tokens", "start_offset", "bin_id"]
    a = shards[key].sort_values(key).reset_index(drop=True)
    b = again[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_cli_curate_and_shards_end_to_end(spark, sf_dir, tmp_path):
    """The CLI surface drives the library pipeline: curate a corpus
    against a disjoint eval set, then materialize shards from the
    curated output — both emit one JSON report line."""
    import io
    import json
    from contextlib import redirect_stdout

    from cancer_survival_etl_spark.cli import main

    out = str(tmp_path / "curated")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([
            "curate",
            "--input", f"{sf_dir}/documents.parquet",
            "--output", out,
        ])
    assert rc == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["input"] == 500
    assert 0 < report["written"] <= report["input"]

    shards = str(tmp_path / "shards")
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        rc = main([
            "shards", "--input", out, "--output", shards,
            "--epochs", "2", "--seq-len", "512", "--salt", "t",
        ])
    assert rc == 0
    rep2 = json.loads(buf2.getvalue().strip().splitlines()[-1])
    assert rep2["epochs"] == 2 and rep2["bins"] > 0
    assert spark.read.parquet(shards).count() == 2 * report["written"]


def test_temperature_weights_flatten_and_preserve_mass(spark):
    import pytest

    from cancer_survival_etl_spark.llm.sampling import temperature_weights

    rows = [("big",)] * 900 + [("small",)] * 100
    df = spark.createDataFrame(rows, "source string")
    w = {r.source: r for r in temperature_weights(df, "source", 2.0).collect()}
    # T>1 flattens: rare source upweighted, dominant downweighted
    assert w["small"].weight > 1.0 > w["big"].weight
    # expected corpus size preserved: sum p * weight = sum q = 1
    assert sum(r.p_natural * r.weight for r in w.values()) == \
        pytest.approx(1.0, abs=1e-4)
    # T=1 is the identity mix
    w1 = {r.source: r for r in temperature_weights(df, "source", 1.0).collect()}
    for r in w1.values():
        assert r.weight == pytest.approx(1.0, abs=1e-6)
    # T→∞ approaches uniform shares
    winf = {r.source: r
            for r in temperature_weights(df, "source", 1e9).collect()}
    assert winf["small"].q_target == pytest.approx(0.5, abs=1e-3)


def test_readability_scores_hand_example(spark):
    import pytest

    from cancer_survival_etl_spark.llm.curation import readability_scores

    rows = [
        (1, "The cat sat. The dog ran!"),   # 6 words, 2 sentences
        (2, "Incomprehensibility notwithstanding, perseverance prevails."),
        (3, "12345 --- !!!"),               # wordless -> NULL scores
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in readability_scores(df).collect()}
    r1 = got[1]
    assert (r1.n_words, r1.n_sentences) == (6, 2)
    # vowel groups: the(1) cat(1) sat(1) the(1) dog(1) ran(1) = 6
    assert r1.n_syllables == 6
    wps, spw = 6 / 2, 6 / 6
    assert r1.flesch_ease == pytest.approx(
        round(206.835 - 1.015 * wps - 84.6 * spw, 4)
    )
    assert r1.fk_grade == pytest.approx(
        round(0.39 * wps + 11.8 * spw - 15.59, 4)
    )
    # long-word doc grades much harder than the simple one
    assert got[2].fk_grade > r1.fk_grade + 5
    r3 = got[3]
    assert r3.n_words == 0 and r3.flesch_ease is None
    assert r3.fk_grade is None and r3.n_syllables is None


def test_absorbing_chain_fundamental_matrix(spark):
    """Absorbing chain: matches the hand-solved Kemeny-Snell N, t, B
    on an exactly-planted two-transient/two-absorbing chain;
    post-absorption events are dropped; censored walks contribute
    their observed transitions; the max_states guard raises."""
    import pytest

    from cancer_survival_etl_spark.operators.timeseries import (
        absorbing_chain,
    )

    walks = [
        ["A", "B", "X"],
        ["A", "B", "A", "X"],
        ["A", "Y"],
        ["B", "A"],
        ["B", "X"],
    ]
    rows = []
    for s, walk in enumerate(walks):
        for i, st in enumerate(walk):
            rows.append((f"s{s}", i, st))
    df = spark.createDataFrame(rows, "subj string, ts int, st string")
    out = absorbing_chain(df, "subj", "ts", "st", ["X", "Y"])
    got = {(r.from_state, r.absorbing_state): r for r in out.collect()}
    # Q = [[0,.5],[.5,0]], R = [[.25,.25],[.5,0]]
    # N = [[4/3,2/3],[2/3,4/3]], t = [2,2]
    # B = [[2/3,1/3],[5/6,1/6]]
    assert got[("A", "X")].expected_steps == 2.0
    assert got[("B", "X")].expected_steps == 2.0
    assert got[("A", "X")].p_absorb == round(2 / 3, 6)
    assert got[("A", "Y")].p_absorb == round(1 / 3, 6)
    assert got[("B", "X")].p_absorb == round(5 / 6, 6)
    assert got[("B", "Y")].p_absorb == round(1 / 6, 6)
    assert got[("A", "X")].n_out == 4 and got[("B", "X")].n_out == 4

    # post-absorption events are dropped: appending X->B->Y to a walk
    # adds only the transition INTO X
    extra = rows + [("s9", 0, "A"), ("s9", 1, "X"), ("s9", 2, "B"),
                    ("s9", 3, "Y")]
    df2 = spark.createDataFrame(
        extra, "subj string, ts int, st string"
    )
    out2 = {
        (r.from_state, r.absorbing_state): r
        for r in absorbing_chain(
            df2, "subj", "ts", "st", ["X", "Y"]
        ).collect()
    }
    assert out2[("A", "X")].n_out == 5  # one extra A->X, nothing else
    assert out2[("B", "X")].n_out == 4

    with pytest.raises(ValueError, match="max_states"):
        absorbing_chain(df, "subj", "ts", "st", ["X"], max_states=2)
    with pytest.raises(ValueError, match="non-empty"):
        absorbing_chain(df, "subj", "ts", "st", [])

    # transient subchain with no observed path to absorption: A and B
    # only ever transition to each other (every walk censored), so
    # I - Q is singular — named error, not an opaque numpy
    # LinAlgError (ADVICE r09)
    cyc = spark.createDataFrame(
        [("c0", 0, "A"), ("c0", 1, "B"), ("c0", 2, "A"),
         ("c1", 0, "B"), ("c1", 1, "A"), ("c1", 2, "B"),
         ("c2", 0, "C"), ("c2", 1, "X")],
        "subj string, ts int, st string",
    )
    with pytest.raises(ValueError, match="no observed path"):
        absorbing_chain(cyc, "subj", "ts", "st", ["X"])
