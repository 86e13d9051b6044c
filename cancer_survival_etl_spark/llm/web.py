"""Web-corpus URL operators: parsing, canonicalization, and
canonical-URL dedup — the first cleaning pass of a crawl-derived
training-data pipeline (Common-Crawl-style corpora key everything by
URL, and the same page surfaces under dozens of surface forms:
mixed-case hosts, default ports, tracking parameters, fragments,
shuffled query strings).

Beyond-reference extension (the reference — a small NHS ETL stack,
see SURVEY.md — has no web/URL operators).

Scale notes
-----------
- Everything here is pure column expressions (regexp + array ops) —
  no UDF, no shuffle, whole-stage-codegen friendly. At 100 TB the
  canonicalization cost is part of the scan stage.
- Parsing is deliberately regexp-based (not the JVM ``parse_url``)
  so the exact same grammar can be stated in ANSI SQL for the DuckDB
  oracle — one less cross-engine semantic edge. ``parse_url`` is the
  drop-in JVM alternative if oracle parity is not needed.
- ``url_dedup`` is one hash-groupBy on the canonical string — the
  same constant-width-shuffle shape as ``llm/dedup.py``'s
  ``exact_dedup``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# absolute-URL grammar: scheme://[userinfo@]host[:port][/path][?query][#frag]
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

#: query parameters stripped during canonicalization (analytics /
#: click-tracking noise that multiplies surface forms of one page)
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "ref=")

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def url_scheme(url: Column | str) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column | str, strip_www: bool = True) -> Column:
    """Lowercased host: authority minus userinfo and port (and a
    leading ``www.`` unless ``strip_www=False``)."""
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    hostport = F.regexp_extract(auth, r"([^@]*)$", 1)
    host = F.lower(F.regexp_replace(hostport, r":\d+$", ""))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return host


def url_port(url: Column | str) -> Column:
    """Explicit port as a string, '' if none given."""
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    hostport = F.regexp_extract(auth, r"([^@]*)$", 1)
    return F.regexp_extract(hostport, r":(\d+)$", 1)


def url_path(url: Column | str, strip_trailing_slash: bool = True) -> Column:
    """Path component; trailing slashes collapse to the bare path
    (and the root/empty path normalizes to ``/``)."""
    path = F.regexp_extract(url, _PATH_RE, 1)
    if strip_trailing_slash:
        path = F.regexp_replace(path, r"/+$", "")
    return F.when(path == "", F.lit("/")).otherwise(path)


def url_query_params(url: Column | str, drop_tracking: bool = True) -> Column:
    """Query parameters as a SORTED array of ``k=v`` strings —
    order-insensitive form so ``?b=2&a=1`` and ``?a=1&b=2`` compare
    equal. ``drop_tracking`` removes utm_* / fbclid / gclid / ref."""
    q = F.regexp_extract(url, _QUERY_RE, 1)
    parts = F.split(q, "&")
    keep = F.filter(parts, lambda p: p != F.lit(""))
    if drop_tracking:
        # nb: unary lambda built by a factory — a defaulted second
        # parameter would be bound to F.filter's array-index argument
        def not_prefixed(pref: str):
            return lambda p: F.substring(p, 1, len(pref)) != F.lit(pref)

        for pref in TRACKING_PREFIXES:
            keep = F.filter(keep, not_prefixed(pref))
    return F.array_sort(keep)


def url_domain(url: Column | str) -> Column:
    """Registered-domain heuristic: last two dot-labels of the host
    (``a.b.example.com`` → ``example.com``). A public-suffix list is
    the production upgrade; the two-label rule is deterministic and
    dependency-free."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def canonicalize_url(url: Column | str) -> Column:
    """Canonical surface form:

    - scheme and host lowercased, ``www.`` and userinfo dropped
    - default port for the scheme dropped (``:80`` http, ``:443``
      https); any other explicit port kept
    - path trailing slashes stripped (root stays ``/``)
    - fragment dropped
    - tracking query params dropped, the rest sorted

    Pure expressions end-to-end — safe in the scan stage at 100 TB.
    """
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    default_port = F.coalesce(
        *[
            F.when(scheme == k, F.lit(v))
            for k, v in _DEFAULT_PORTS.items()
        ],
        F.lit(""),
    )
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    params = url_query_params(url)
    query_part = F.when(F.size(params) == 0, F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(params, "&"))
    )
    return F.concat(
        scheme, F.lit("://"), host, port_part, url_path(url), query_part
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical-URL dedup: one representative (min id) per canonical
    form — (canonical_url, host, doc_id, dupe_count). The crawl-side
    sibling of content-hash ``exact_dedup``: catches re-crawls of the
    same page under different surface URLs before any text is
    compared."""
    return (
        df.select(
            F.col(id_col),
            canonicalize_url(F.col(url_col)).alias("canonical_url"),
            url_host(F.col(url_col)).alias("host"),
        )
        .groupBy("canonical_url", "host")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dupe_count"),
        )
    )


def host_stats(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per-host crawl profile: page count, distinct canonical URLs,
    dup ratio. The input to host-level curation policy (crawl budget,
    spam-host blocklists, per-host caps à la C4). One groupBy on a
    low-cardinality key — hosts follow a Zipf tail, so AQE's skew
    handling covers the mega-hosts."""
    enriched = df.select(
        F.col(id_col),
        url_host(F.col(url_col)).alias("host"),
        canonicalize_url(F.col(url_col)).alias("canonical_url"),
    )
    return enriched.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("canonical_url").alias("n_canonical"),
        F.round(
            1.0
            - F.countDistinct("canonical_url") / F.count(F.lit(1)),
            6,
        ).alias("dup_ratio"),
    )
