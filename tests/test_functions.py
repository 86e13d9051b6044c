"""Property tests for the pandas↔Spark semantic edges (SURVEY §5.2)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from cancer_survival_etl_spark.functions.keys import (
    concat_key,
    quartile_bucket,
    sort_key,
)
from cancer_survival_etl_spark.functions.text import (
    bracket_extract,
    diagnosis_window_from_filename,
    literal_replace,
    null_keeping_neq,
    snapshot_date_parse,
    split_prefix,
    strip_suffix_titlecase,
)


def _col(spark, values, name="v"):
    return spark.createDataFrame(pd.DataFrame({name: values}))


def test_null_keeping_neq_keeps_nulls(spark):
    df = _col(spark, ["Other", "Breast", None])
    out = df.filter(null_keeping_neq("v", "Other")).collect()
    vals = sorted([r.v for r in out], key=lambda x: (x is None, x))
    # pandas ~(s == v) keeps NaN rows — the null must survive
    assert vals == ["Breast", None]


def test_bracket_extract_null_on_no_match(spark):
    df = _col(
        spark,
        ["Age-standardised (5 age groups)", "Non-standardised", "Plain"],
    )
    out = df.select(
        bracket_extract("v", guard_value="Non-standardised").alias("x")
    ).collect()
    assert [r.x for r in out] == ["5 age groups", None, None]


def test_split_prefix(spark):
    df = _col(spark, ["Age-standardised (5 age groups)", "Non-standardised"])
    out = df.select(split_prefix("v").alias("x")).collect()
    assert [r.x for r in out] == ["Age-standardised", "Non-standardised"]


def test_strip_suffix_titlecase_matches_str_title_on_domain(spark):
    # equivalence-on-domain: initcap == str.title for the reference values
    values = ["Net survival (%)", "Overall survival (%)"]
    df = _col(spark, values)
    out = df.select(strip_suffix_titlecase("v").alias("x")).collect()
    expected = [v.removesuffix(" (%)").title() for v in values]
    assert [r.x for r in out] == expected == ["Net Survival", "Overall Survival"]


def test_literal_replace_is_not_regex(spark):
    df = _col(spark, ["a.c Index", "abc"])
    out = df.select(literal_replace("v", "a.c", "X").alias("x")).collect()
    # literal: 'abc' must NOT match the dot
    assert [r.x for r in out] == ["X Index", "abc"]


def test_concat_key_int_rendering_and_null_propagation(spark):
    df = spark.createDataFrame(
        [("Breast", "Female", 5, "2016-2020"), ("Lung", None, 1, "2016-2020")],
        "site string, gender string, years long, win string",
    )
    out = df.select(concat_key("site", "gender", "years", "win").alias("k")).collect()
    # ints render without '.0'; NULL component → NULL key (Snowflake CONCAT)
    assert out[0].k == "BreastFemale52016-2020"
    assert out[1].k is None


def test_quartile_bucket_thresholds(spark):
    rows = [(None, 8), (1, 3), (1, 8), (2, 8), (4, 8), (6, 8), (8, 8), (1, 4)]
    df = spark.createDataFrame(rows, "r long, b long")
    out = df.select(quartile_bucket("r", "b").alias("q")).collect()
    # rank/base: NULL→NULL; base<4→'-'; 1/8<.25→1st; 2/8=.25→2nd;
    # 4/8=.5→3rd; 6/8=.75→4th; 8/8→4th; 1/4=.25→2nd (decimal not int division)
    assert [r.q for r in out] == [None, "-", "1st", "2nd", "3rd", "4th", "4th", "2nd"]


def test_sort_key(spark):
    df = _col(spark, ["Persons", "Female", "Male"])
    out = df.select(sort_key("v", {"Persons": 1}, 2).alias("s")).collect()
    assert [r.s for r in out] == [1, 2, 2]


def test_snapshot_date_parse():
    # reference: tokens [-3:-1] of the first cell; year bounds (2000, 2100)
    assert snapshot_date_parse("data as at March 2023 snapshot") == "March 2023"
    assert snapshot_date_parse("bad") is None
    assert snapshot_date_parse("x March 1830 y") is None
    assert snapshot_date_parse(None) is None


def test_diagnosis_window_from_filename():
    assert diagnosis_window_from_filename("adult_2016_2020.xlsx") == "2016-2020"
    assert diagnosis_window_from_filename("./data/adult_2015_2019.xlsx") == "2015-2019"


def test_parse_json_props_typed_and_malformed(spark):
    from cancer_survival_etl_spark.functions.semistructured import (
        parse_json_props,
    )

    df = spark.createDataFrame(
        [
            (1, '{"k": 7, "extra": "x"}'),
            (2, '{"k": null}'),
            (3, "not json"),
            (4, None),
        ],
        "id long, props string",
    )
    got = {
        r["id"]: r["k"]
        for r in parse_json_props(df, "props", "k long").collect()
    }
    assert got == {1: 7, 2: None, 3: None, 4: None}


def test_chunk_text_udtf_matches_expression_chunker(spark):
    from cancer_survival_etl_spark.functions.table_functions import (
        register_table_functions,
    )
    from cancer_survival_etl_spark.llm.curation import chunk_documents

    register_table_functions(spark)
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x"), (3, None)], "doc_id long, text string"
    )
    df.createOrReplaceTempView("udtf_docs")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in spark.sql(
            "SELECT d.doc_id, c.* FROM udtf_docs d, "
            "LATERAL chunk_text(d.text, 2) c"
        ).collect()
    }
    want = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df.filter("text IS NOT NULL"), chunk_size=2).collect()
    }
    assert got == want
    assert (3, 0) not in got  # null text yields no rows
