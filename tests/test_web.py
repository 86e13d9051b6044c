from __future__ import annotations

from pyspark.sql import functions as F

from cancer_survival_etl_spark.llm.web import (
    canonicalize_url,
    host_stats,
    url_dedup,
    url_domain,
    url_host,
    url_path,
    url_query_params,
)


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonicalize_url(F.col("url")).alias("c")).first()["c"]


def test_canonicalize_case_port_fragment_tracking(spark):
    assert (
        _canon(
            spark,
            "HTTPS://WWW.Example.COM:443/Docs/Page/?b=2&utm_source=x&a=1#sec",
        )
        == "https://example.com/Docs/Page?a=1&b=2"
    )


def test_canonicalize_keeps_nondefault_port_and_path_case(spark):
    assert (
        _canon(spark, "http://example.com:8080/a/b?gclid=z")
        == "http://example.com:8080/a/b"
    )


def test_canonicalize_root_path_and_userinfo(spark):
    assert _canon(spark, "https://user:pw@Example.com") == "https://example.com/"
    assert _canon(spark, "http://example.com:80///") == "http://example.com/"


def test_order_insensitive_params_equal(spark):
    a = _canon(spark, "https://e.com/p?b=2&a=1")
    b = _canon(spark, "https://e.com/p?a=1&b=2&fbclid=123&ref=nav")
    assert a == b == "https://e.com/p?a=1&b=2"


def test_url_parts(spark):
    df = spark.createDataFrame(
        [("https://www.a.b.Example.com:8443/x/?q=1#f",)], "url string"
    )
    row = df.select(
        url_host(F.col("url")).alias("host"),
        url_domain(F.col("url")).alias("domain"),
        url_path(F.col("url")).alias("path"),
        url_query_params(F.col("url")).alias("params"),
    ).first()
    assert row["host"] == "a.b.example.com"
    assert row["domain"] == "example.com"
    assert row["path"] == "/x"
    assert row["params"] == ["q=1"]


def test_url_dedup_collapses_surface_forms(spark):
    df = spark.createDataFrame(
        [
            (1, "https://example.com/p?a=1&b=2"),
            (2, "HTTPS://WWW.EXAMPLE.COM:443/p/?b=2&a=1&utm_medium=m"),
            (3, "https://example.com/other"),
        ],
        "doc_id long, url string",
    )
    rows = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert rows["https://example.com/p?a=1&b=2"]["dupe_count"] == 2
    assert rows["https://example.com/p?a=1&b=2"]["doc_id"] == 1
    assert rows["https://example.com/other"]["dupe_count"] == 1


def test_host_stats_dup_ratio(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.com/x"),
            (2, "https://WWW.A.com/x/"),
            (3, "https://a.com/y"),
            (4, "https://b.com/z"),
        ],
        "doc_id long, url string",
    )
    got = {r["host"]: r for r in host_stats(df).collect()}
    assert got["a.com"]["n_pages"] == 3
    assert got["a.com"]["n_canonical"] == 2
    assert abs(got["a.com"]["dup_ratio"] - (1 - 2 / 3)) < 1e-6
    assert got["b.com"]["dup_ratio"] == 0.0
