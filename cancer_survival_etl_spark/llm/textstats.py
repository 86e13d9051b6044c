"""Text analysis for corpus curation: token stats, quality scoring,
language ID, document fingerprinting.

All pure JVM expressions — runs inside whole-stage codegen at full scan
speed; the only shuffles are final aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"]

# Marker tokens per language for the n-gram-ish heuristic. On real text
# these would be learned character n-gram profiles; the mechanism (score
# per language from marker hits, argmax) is the production shape.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "de": ["der", "die", "und"],
    "es": ["el", "los", "que"],
    "zh": ["de", "shi", "le"],
}


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token accounting: whitespace tokens, distinct tokens,
    BPE-ish subword estimate (~chars/4 as the standard rule of thumb),
    mean token length."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    return df.select(
        "*",
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.ceil(F.length(F.col(text_col)) / 4).cast("long").alias("n_subwords_est"),
        F.round(
            (F.length(F.col(text_col)) - n_tokens + 1).cast("double")
            / n_tokens.cast("double"),
            6,
        ).alias("mean_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality in [0,1]: stopword ratio (fluency proxy), token
    diversity, and length band — the C4/Gopher-style rule family."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(STOPWORDS))
    ).cast("double")
    diversity = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    stop_ratio = stop_hits / n_tokens
    length_ok = F.when(
        (n_tokens >= 10) & (n_tokens <= 1000), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    score = F.round(
        (F.least(stop_ratio * 5, F.lit(1.0)) + diversity + length_ok) / 3, 6
    )
    return df.select(
        "*",
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(diversity, 6).alias("token_diversity"),
        score.alias("quality"),
    )


def language_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language ID: score = hits per language, argmax with
    deterministic tie-break on language code; 'und' when nothing hits."""
    toks = _tokens(text_col)

    # nb: the lambda must be unary — PySpark treats a second parameter
    # (even defaulted) as the array-index argument of F.filter.
    def marker_hits(markers: list[str]):
        return lambda t: t.isin(markers)

    # Tie-break: alphabetically first language wins — encode as a
    # negative priority so array_max picks (max hits, min alphabetical).
    ordered = sorted(LANG_MARKERS)
    scores = F.array(
        *[
            F.struct(
                F.size(
                    F.filter(toks, marker_hits(LANG_MARKERS[lang]))
                ).alias("hits"),
                F.lit(-ordered.index(lang)).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for lang in ordered
        ]
    )
    best = F.array_max(scores)
    guess = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.select("*", guess.alias("lang_guess"))


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content fingerprints: md5 digest (exact identity) + a 31-polynomial
    rolling hash over tokens (shift-resistant identity, order-sensitive),
    both as pure expressions."""
    toks = _tokens(text_col)
    rolling = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        # acc*31 + crc32(token), wrapped into 2^31 to stay overflow-safe
        lambda acc, t: (acc * 31 + F.crc32(t)) % F.lit(2147483647).cast("long"),
    )
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("md5_fingerprint"),
        rolling.alias("rolling_hash"),
    )


def bpe_like_token_count(
    df: DataFrame, text_col: str = "text", alias: str = "n_bpe_tokens"
) -> DataFrame:
    """Regex-segmented token count approximating a BPE pre-tokenizer:
    runs of letters, runs of digits, and single other non-space chars
    each count as one token (the GPT-2-style pre-tokenization split,
    without the learned merges). Pure JVM regexp — one pass, no UDF —
    and a much tighter estimate than chars/4 for code or punctuated
    text."""
    pattern = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
    return df.select(
        "*",
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
        )
        .cast("long")
        .alias(alias),
    )
