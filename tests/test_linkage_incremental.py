"""Record linkage (blocked fuzzy pairs), incremental aggregate
maintenance, and hybrid retrieval fusion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cancer_survival_etl_spark.operators.incremental import (
    agg_state,
    incremental_update,
    merge_agg_state,
)
from cancer_survival_etl_spark.operators.linkage import (
    block_profile,
    blocked_fuzzy_pairs,
)


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        (1, "jon smith", "uk"),
        (2, "john smith", "uk"),   # dist 1 from jon smith
        (3, "johnny smith", "uk"),  # dist 3 from jon, 2 from john
        (4, "john smith", "us"),   # exact name, different block
        (5, "completely different", "uk"),
    ]
    return spark.createDataFrame(rows, "id long, name string, country string")


def test_blocked_fuzzy_pairs_distances_and_blocking(spark, people):
    got = {
        (r.id_a, r.id_b): (r.distance, r.similarity)
        for r in blocked_fuzzy_pairs(
            people, "id", "name", ["country"], max_distance=2
        ).collect()
    }
    assert got[(1, 2)][0] == 1          # jon/john
    assert got[(2, 3)][0] == 2          # john/jane
    assert (1, 3) not in got            # dist 3 > threshold
    assert (2, 4) not in got            # same name, different block
    assert (1, 5) not in got            # length pre-filter kills it
    assert got[(1, 2)][1] == pytest.approx(1 - 1 / 10, abs=1e-6)


def test_block_profile_pair_surface(spark, people):
    prof = {r.country: (r.n_records, r.n_pairs)
            for r in block_profile(people, ["country"]).collect()}
    assert prof["uk"] == (4, 6)
    assert prof["us"] == (1, 0)


def test_fuzzy_pair_algorithms_agree_on_insert_delete_edits(spark):
    """The three candidate-generation strategies (quadratic block,
    PassJoin segment index, SymSpell delete variants) must produce
    IDENTICAL pair sets — exercised with substitutions, insertions,
    and deletions at both supported distances."""
    from cancer_survival_etl_spark.operators.linkage import (
        segment_fuzzy_pairs,
        symdelete_fuzzy_pairs,
    )

    rows = [
        (1, "annabelle", "x"),
        (2, "anabelle", "x"),    # deletion (dist 1)
        (3, "annabella", "x"),   # substitution (dist 1)
        (4, "annabellle", "x"),  # insertion (dist 1)
        (5, "anabela", "x"),     # dist 3 from annabelle
        (6, "zzzzzzzzz", "x"),
        (7, "annabelle", "y"),   # other block
        (8, "ann", "x"),         # much shorter
    ]
    df = spark.createDataFrame(rows, "id long, name string, country string")
    for k in (1, 2):
        base = sorted(map(tuple, blocked_fuzzy_pairs(
            df, "id", "name", ["country"], k).collect()))
        seg = sorted(map(tuple, segment_fuzzy_pairs(
            df, "id", "name", ["country"], k).collect()))
        sym = sorted(map(tuple, symdelete_fuzzy_pairs(
            df, "id", "name", ["country"], k).collect()))
        assert base == seg == sym
        assert base  # non-vacuous: at least one pair at each k
    ids_k1 = {(r[0], r[1]) for r in blocked_fuzzy_pairs(
        df, "id", "name", ["country"], 1).collect()}
    assert ids_k1 == {(1, 2), (1, 3), (1, 4)}


def test_symdelete_rejects_unsupported_distance(spark, people):
    from cancer_survival_etl_spark.operators.linkage import (
        symdelete_fuzzy_pairs,
    )

    with pytest.raises(ValueError):
        symdelete_fuzzy_pairs(people, "id", "name", ["country"], 3)


def test_incremental_update_equals_full_recompute(spark):
    rows = [(i, "g%d" % (i % 3), (i * 37) % 101) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string, val long")
    base = df.filter("id % 5 != 0")
    delta = df.filter("id % 5 = 0")
    merged = incremental_update(
        agg_state(base, ["grp"], "val"), delta, ["grp"], "val"
    )
    full = agg_state(df, ["grp"], "val")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_merge_agg_state_handles_disjoint_keys_and_associativity(spark):
    a = spark.createDataFrame([(1, "x", 5)], "id long, grp string, val long")
    b = spark.createDataFrame([(2, "y", 7)], "id long, grp string, val long")
    c = spark.createDataFrame(
        [(3, "x", 1), (4, "y", 9)], "id long, grp string, val long"
    )
    sa, sb, sc = (agg_state(d, ["grp"], "val") for d in (a, b, c))
    left = merge_agg_state(merge_agg_state(sa, sb, ["grp"]), sc, ["grp"])
    right = merge_agg_state(sa, merge_agg_state(sb, sc, ["grp"]), ["grp"])
    assert sorted(map(tuple, left.collect())) == sorted(
        map(tuple, right.collect())
    )
    got = {r.grp: (r.cnt, r.sum_val, r.min_val, r.max_val)
           for r in left.collect()}
    assert got["x"] == (2, 6, 1, 5)
    assert got["y"] == (2, 16, 7, 9)


def test_hybrid_search_fuses_sparse_and_dense(spark):
    from cancer_survival_etl_spark.llm.retrieval import hybrid_search

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta delta"),
         (2, "unrelated words entirely"), (3, "alpha epsilon zeta")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    qs = spark.createDataFrame(
        [(1, "alpha beta", [1.0, 0.0])],
        "query_id int, query_text string, query_vec array<float>",
    )
    rows = hybrid_search(docs, emb, qs, k=4, n_candidates=4).collect()
    by_doc = {r.doc_id: r for r in rows}
    # doc 2 shares no query term: BM25 never surfaces it as a candidate
    assert 2 not in by_doc
    # doc 0 is top in BOTH rankings -> top fused
    top = min(rows, key=lambda r: r.rank_val)
    assert top.doc_id == 0 and top.bm25_rank == 1 and top.dense_rank == 1
    # fused score is the exact RRF of the two integer ranks
    for r in rows:
        assert r.rrf_score == pytest.approx(
            round(1 / (60 + r.bm25_rank) + 1 / (60 + r.dense_rank), 9),
            abs=1e-12,
        )


def test_golden_record_mode_and_latest(spark):
    from pyspark.sql import functions as F

    from cancer_survival_etl_spark.operators.linkage import golden_record

    rows = [
        # cluster 1: 'a' x2 vs 'b' x1; latest value at t=3
        (1, "a", 1, 10, 100),
        (1, "a", 2, 11, 200),
        (1, "b", 3, 12, 300),
        # cluster 2: tie 'x' vs 'y' -> value tiebreak picks 'y'
        (2, "x", 1, 20, 400),
        (2, "y", 2, 21, 500),
        # cluster 3: NULL mode values ignored
        (3, None, 1, 30, 600),
        (3, "z", 2, 31, 700),
    ]
    df = spark.createDataFrame(
        rows, "cl long, cat string, ts long, eid long, val long"
    )
    out = {
        r.cl: r
        for r in golden_record(
            df, "cl", mode_cols=["cat"], latest_cols=["val"],
            ts_col="ts", tiebreak_col="eid",
        ).collect()
    }
    assert out[1].cat == "a" and out[1].val == 300 and out[1].n_members == 3
    assert out[2].cat == "y"          # tie broken by value, deterministic
    assert out[3].cat == "z"          # NULL never survives


def test_cuped_reduces_to_raw_with_flat_covariate(spark):
    from cancer_survival_etl_spark.operators.stats import cuped_lift

    # constant covariate -> zero variance -> theta NULL, adjusted = raw
    rows = [(i % 2, float(i), 7) for i in range(20)]
    df = spark.createDataFrame(rows, "variant int, metric double, cov long")
    out = cuped_lift(
        df, "variant", "metric", "cov", covariate_is_cents=False
    ).collect()
    for r in out:
        assert r.theta is None
        assert r.mean_adjusted == r.mean_raw
    # perfectly-correlated covariate absorbs ALL the between-variant
    # difference: both adjusted means collapse to the pooled mean
    rows2 = [(i % 2, float(i), i) for i in range(20)]
    df2 = spark.createDataFrame(rows2, "variant int, metric double, cov long")
    out2 = cuped_lift(
        df2, "variant", "metric", "cov", covariate_is_cents=False
    ).collect()
    pooled = sum(float(i) for i in range(20)) / 20
    for r in out2:
        assert r.mean_adjusted == pytest.approx(pooled, abs=1e-4)


def test_cdc_apply_last_writer_wins_and_deletes(spark):
    from cancer_survival_etl_spark.operators.incremental import cdc_apply

    base = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)], "k long, v long"
    )
    changes = spark.createDataFrame(
        [
            (1, "U", 10, 111),   # update k=1
            (1, "U", 20, 122),   # later update wins
            (2, "D", 15, 0),     # delete k=2
            (4, "I", 5, 444),    # brand-new key
            (5, "I", 7, 555),    # insert then delete -> gone
            (5, "D", 9, 0),
            (6, "D", 3, 0),      # delete then re-insert -> back
            (6, "I", 4, 666),
            (7, "D", 8, 0),      # same-seq D vs U: U wins (op rank)
            (7, "U", 8, 777),
        ],
        "k long, op string, seq long, v long",
    )
    got = {r.k: r.v for r in
           cdc_apply(base, changes, ["k"], "seq").collect()}
    assert got == {1: 122, 3: 300, 4: 444, 6: 666, 7: 777}
    # empty change feed: snapshot unchanged
    empty = changes.filter("k < 0")
    same = {r.k: r.v for r in cdc_apply(base, empty, ["k"], "seq").collect()}
    assert same == {1: 100, 2: 200, 3: 300}


def test_sketched_state_moments_match_plain_and_rank_bound(spark):
    """Sketched incremental state: (1) cnt/sum/min/max after a
    maintenance cycle are EXACTLY agg_state over base+delta (the
    mergeability contract); (2) the median read off the merged KLL
    state satisfies the rank-error bound against the raw union;
    (3) a three-way fold in either association keeps the bound
    (KLL merge is an associative-contract combine)."""
    from cancer_survival_etl_spark.operators.incremental import (
        agg_state,
        agg_state_sketched,
        incremental_update_sketched,
        merge_agg_state_sketched,
        state_quantile,
    )

    def slab(seed, n):
        return spark.createDataFrame(
            [
                ("k%d" % (i % 3), (i * seed) % 1000)
                for i in range(n)
            ],
            "key string, v long",
        )

    a, b, c = slab(2654435761, 4000), slab(48271, 3000), slab(69069, 2000)
    st = agg_state_sketched(a, ["key"], "v")
    st = incremental_update_sketched(st, b, ["key"], "v")
    st = incremental_update_sketched(st, c, ["key"], "v")
    full = a.unionAll(b).unionAll(c)
    plain = {r.key: r for r in agg_state(full, ["key"], "v").collect()}
    got = {r.key: r for r in st.collect()}
    assert set(got) == set(plain)
    for k in plain:
        assert got[k].cnt == plain[k].cnt
        assert got[k].sum_val == plain[k].sum_val
        assert got[k].min_val == plain[k].min_val
        assert got[k].max_val == plain[k].max_val
    # rank bound on the maintained median
    est = {r.key: r.q_estimate for r in state_quantile(st, 0.5).collect()}
    raw = {k: sorted(r.v for r in full.collect() if r.key == k)
           for k in plain}
    for k, q in est.items():
        vals = raw[k]
        lo = sum(1 for v in vals if v < q) / len(vals)
        hi = sum(1 for v in vals if v <= q) / len(vals)
        assert lo <= 0.535 and hi >= 0.465, (k, q, lo, hi)
    # other association
    st2 = merge_agg_state_sketched(
        agg_state_sketched(a, ["key"], "v"),
        merge_agg_state_sketched(
            agg_state_sketched(b, ["key"], "v"),
            agg_state_sketched(c, ["key"], "v"),
            ["key"],
        ),
        ["key"],
    )
    got2 = {r.key: r for r in st2.collect()}
    for k in plain:
        assert got2[k].cnt == plain[k].cnt
    est2 = {r.key: r.q_estimate
            for r in state_quantile(st2, 0.5).collect()}
    for k, q in est2.items():
        vals = raw[k]
        lo = sum(1 for v in vals if v < q) / len(vals)
        hi = sum(1 for v in vals if v <= q) / len(vals)
        assert lo <= 0.535 and hi >= 0.465, (k, q, lo, hi)
