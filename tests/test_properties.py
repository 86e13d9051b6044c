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
