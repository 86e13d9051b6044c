"""Property tests (hypothesis) for the pandas↔Spark↔Snowflake semantic
edges called out in SURVEY.md §5.2 — each example set runs as ONE Spark
job over a generated batch, with a pure-Python reference model."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from cancer_survival_etl_spark.functions.keys import concat_key, quartile_bucket
from cancer_survival_etl_spark.functions.text import null_keeping_neq

_EXAMPLES = {"max_examples": 8, "deadline": None}


def _quartile_ref(rank, base):
    # docs/reporting_rank.sql:38-45 semantics (reference), decimal division
    if rank is None:
        return None
    if base < 4:
        return "-"
    r = rank / base
    if r < 0.25:
        return "1st"
    if r < 0.5:
        return "2nd"
    if r < 0.75:
        return "3rd"
    return "4th"


@settings(**_EXAMPLES)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=1, max_value=50)),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_quartile_bucket_matches_reference_formula(spark, pairs):
    pairs = [(i, r, b) for i, (r, b) in enumerate(pairs) if r is None or r <= b]
    if not pairs:
        return
    df = spark.createDataFrame(pairs, "i long, rank_val long, rank_base long")
    got = {
        r["i"]: r["q"]
        for r in df.select(
            "i", quartile_bucket("rank_val", "rank_base").alias("q")
        ).collect()
    }
    for i, rank, base in pairs:
        assert got[i] == _quartile_ref(rank, base), (rank, base)


@settings(**_EXAMPLES)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(alphabet="ab-", max_size=4)),
            st.one_of(st.none(), st.integers(min_value=-999, max_value=999)),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_concat_key_null_propagation_and_int_rendering(spark, rows):
    rows = [(i, s, n) for i, (s, n) in enumerate(rows)]
    df = spark.createDataFrame(rows, "i long, s string, n long")
    got = {
        r["i"]: r["k"]
        for r in df.select(
            "i", concat_key(F.col("s"), F.col("n")).alias("k")
        ).collect()
    }
    for i, s, n in rows:
        if s is None or n is None:
            assert got[i] is None, (s, n)  # Snowflake CONCAT null-propagates
        else:
            assert got[i] == f"{s}{n}", (s, n)  # no '.0', no padding


@settings(**_EXAMPLES)
@given(
    st.lists(
        st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
        min_size=1,
        max_size=60,
    )
)
def test_null_keeping_neq_matches_pandas_model(spark, vals):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i long, v string")
    kept = {
        r["i"]
        for r in df.filter(null_keeping_neq(F.col("v"), "y")).collect()
    }
    # pandas ~(series == 'y'): keeps NaN rows AND rows != 'y'
    expect = {i for i, v in rows if v is None or v != "y"}
    assert kept == expect


@settings(**_EXAMPLES)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcxyz", min_size=1, max_size=4),
            min_size=1,
            max_size=30,
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=7),
)
def test_chunking_partitions_tokens_exactly(spark, docs, chunk_size):
    """Chunks reassemble to the original text, sizes are chunk_size
    except the last, and chunk ids are dense from 0."""
    from cancer_survival_etl_spark.llm.curation import chunk_documents

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_size=chunk_size).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, toks in enumerate(docs):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        assert " ".join(c["chunk_text"] for c in chunks) == " ".join(toks)
        sizes = [c["n_tokens"] for c in chunks]
        assert all(s == chunk_size for s in sizes[:-1])
        assert 1 <= sizes[-1] <= chunk_size


@settings(**_EXAMPLES)
@given(
    st.lists(
        st.integers(min_value=1, max_value=50), min_size=1, max_size=64
    ),
    st.integers(min_value=2, max_value=16),
)
def test_pack_bins_offsets_are_exclusive_prefix_sums(spark, sizes, budget):
    """start_offset is the exclusive prefix sum in id order; bin ids are
    non-decreasing and consistent with offsets."""
    from cancer_survival_etl_spark.llm.curation import pack_bins

    rows = [(i, " ".join(["t"] * n)) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_offset"], r["bin_id"])
        for r in pack_bins(df, budget=budget).collect()
    }
    acc = 0
    for i, n in enumerate(sizes):
        assert got[i] == (n, acc, acc // budget)
        acc += n


@settings(**_EXAMPLES)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=80,
        unique=True,
    )
)
def test_zvalue_interleave_model(spark, points):
    """z equals the bit-interleave reference model for arbitrary points
    (8-bit domain)."""
    from cancer_survival_etl_spark.operators.layout import zvalue

    df = spark.createDataFrame(points, "x long, y long")
    rows = df.select("x", "y", zvalue(["x", "y"], bits=8).alias("z")).collect()
    for r in rows:
        want = sum(
            (((r["x"] >> i) & 1) << (2 * i)) + (((r["y"] >> i) & 1) << (2 * i + 1))
            for i in range(8)
        )
        assert r["z"] == want


@settings(**_EXAMPLES)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # score bucket (ties!)
            st.booleans(),
        ),
        min_size=2,
        max_size=40,
    )
)
def test_auc_by_matches_pairwise_definition(spark, pairs):
    """auc_by (rank-sum form) must equal the pairwise probability
    definition P(s⁺ > s⁻) + ½P(tie) for any tied/untied mix."""
    from cancer_survival_etl_spark.operators.stats import auc_by

    rows = [("g", float(s), int(y)) for s, y in pairs]
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    df = spark.createDataFrame(rows, "grp string, score double, label int")
    got = auc_by(df, "grp", "score", "label").collect()[0]
    if not pos or not neg:
        assert got.auc is None
        return
    want = sum(
        1.0 if p > q else (0.5 if p == q else 0.0)
        for p in pos for q in neg
    ) / (len(pos) * len(neg))
    assert got.auc is not None and abs(got.auc - want) < 1e-6


@settings(**_EXAMPLES)
@given(
    st.lists(
        st.integers(min_value=-50, max_value=50),
        min_size=3,
        max_size=40,
        unique=True,
    )
)
def test_spearman_extremes_on_monotone_data(spark, xs):
    """Strictly increasing y(x) → ρ = 1; strictly decreasing → −1."""
    from cancer_survival_etl_spark.operators.stats import spearman_by

    inc = [("g", float(x), float(2 * x + 1)) for x in xs]
    dec = [("g", float(x), float(-3 * x)) for x in xs]
    for rows, want in ((inc, 1.0), (dec, -1.0)):
        df = spark.createDataFrame(rows, "grp string, x double, y double")
        got = spearman_by(df, "grp", "x", "y").collect()[0]
        assert got.spearman_rho == want


@settings(**_EXAMPLES)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30),
        min_size=1,
        max_size=6,
    )
)
def test_rouge_precision_recall_duality(spark, texts):
    """rouge_p(A→B) must equal rouge_r with the pair swapped — the
    clipped-count overlap is symmetric, only the denominator flips."""
    from cancer_survival_etl_spark.llm.evals import rouge_n

    pairs = [(i, t, texts[(i + 1) % len(texts)]) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        pairs, "pair_id long, candidate string, reference string"
    )
    fwd = {r.pair_id: r for r in rouge_n(df, n=1).collect()}
    swapped = df.select(
        "pair_id",
        F.col("reference").alias("candidate"),
        F.col("candidate").alias("reference"),
    )
    rev = {r.pair_id: r for r in rouge_n(swapped, n=1).collect()}
    for k in fwd:
        assert (k in rev) == (k in fwd)
        if k in rev:
            assert fwd[k].n_overlap == rev[k].n_overlap
            assert fwd[k].rouge_p == rev[k].rouge_r
            assert fwd[k].rouge_r == rev[k].rouge_p
