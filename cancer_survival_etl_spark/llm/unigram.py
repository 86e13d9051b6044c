"""Unigram-LM (SentencePiece-style) tokenizer: training and encoding
over a distributed corpus.

Same architecture contract as ``llm/bpe.py`` (its module docstring is
the spec): the corpus collapses to a WORD HISTOGRAM in one distributed
pass, the EM loop runs driver-side over that bounded histogram (Heaps'
law), and encoding fans back out as an Arrow-batched map with the
learned piece table broadcast — the corpus is touched exactly twice,
never once per EM iteration.

Unigram LM (Kudo 2018, "Subword Regularization", public arXiv
1804.10959) models a word as the max-probability segmentation into
vocabulary pieces. This implementation is the deterministic core:
substring-seeded vocabulary, hard-EM (Viterbi counts, not lattice
expectations), fixed tie-breaks — same histogram in, same vocabulary
out, on any machine.

Determinism rules (load-bearing for tests and the encode oracle):
- Viterbi tie-break: lowest total cost, then FEWEST pieces, then the
  lexicographically smallest space-joined piece string.
- Pruning keeps the highest-probability pieces, ties broken by the
  piece string; single characters are never pruned (coverage).
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def viterbi_segment(
    word: str,
    cost: dict[str, int | float],
    max_piece_len: int = 8,
    unk_cost: int | float = 1_000_000,
) -> tuple[list[str], int | float]:
    """Min-cost segmentation of ``word`` into pieces from ``cost``
    (additive costs — -log p, or the pinned integer scores of the
    encode oracle). Characters absent from the table fall back to a
    single-char UNK piece at ``unk_cost``. Returns (pieces, total).

    DP state per end-position keeps (cost, n_pieces, joined-string) —
    the joined-string comparison is exactly the oracle's ORDER BY,
    and it is prefix-decisive (pieces are non-empty, ' ' sorts below
    every piece character), so the local choice is globally optimal.
    """
    n = len(word)
    INF = float("inf")
    # best[j] = (cost, n_pieces, joined, pieces)
    best: list[tuple] = [(INF, 0, "", [])] * (n + 1)
    best[0] = (0, 0, "", [])
    for j in range(1, n + 1):
        cand = None
        for i in range(max(0, j - max_piece_len), j):
            if best[i][0] == INF:
                continue
            piece = word[i:j]
            c = cost.get(piece)
            if c is None:
                if j - i > 1:
                    continue
                c = unk_cost
            ci, ni, si, pi = best[i]
            key = (
                ci + c,
                ni + 1,
                piece if not si else si + " " + piece,
            )
            if cand is None or key < cand[0]:
                cand = (key, pi + [piece])
        if cand is not None:
            (c, np_, s), pieces = cand
            best[j] = (c, np_, s, pieces)
    c, _, _, pieces = best[n]
    return pieces, c


def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Same single-pass distributed histogram as ``bpe.word_histogram``
    (re-exported for symmetry — both trainers consume it)."""
    from cancer_survival_etl_spark.llm.bpe import word_histogram as wh

    return wh(df, text_col)


def train_unigram(
    histogram: list[tuple[str, int]] | dict[str, int],
    vocab_size: int,
    max_piece_len: int = 6,
    n_iters: int = 4,
    seed_factor: int = 4,
) -> dict[str, float]:
    """Deterministic hard-EM unigram-LM training over a word
    histogram. Pure driver-side Python over the bounded vocabulary —
    deliberately NOT a Spark loop (module docstring).

    1. SEED: every substring of every word up to ``max_piece_len``,
       frequency-weighted by word count; keep the ``seed_factor ×
       vocab_size`` most frequent (ties by piece string) plus ALL
       single characters; probabilities ∝ substring frequency.
    2. EM ×``n_iters``: E-step segments each histogram word with
       Viterbi under current costs (-log p) and accumulates
       count-weighted piece usage; M-step renormalizes usage to
       probabilities. Unused non-char pieces drop out; unused chars
       survive at the smallest seen probability (coverage floor).
    3. PRUNE to ``vocab_size`` keeping the most probable pieces
       (ties by piece string), chars always kept.

    Returns piece → probability (sums to ≤ 1 after char flooring).
    """
    items = sorted(
        histogram.items() if isinstance(histogram, dict) else histogram
    )

    seed: Counter = Counter()
    for w, n in items:
        for i in range(len(w)):
            for j in range(i + 1, min(i + max_piece_len, len(w)) + 1):
                seed[w[i:j]] += int(n)
    chars = {p for p in seed if len(p) == 1}
    keep = sorted(seed, key=lambda p: (-seed[p], p))[
        : max(vocab_size * seed_factor, len(chars))
    ]
    vocab = set(keep) | chars
    total = sum(seed[p] for p in vocab)
    probs = {p: seed[p] / total for p in vocab}

    for _ in range(n_iters):
        cost = {p: -math.log(pr) for p, pr in probs.items() if pr > 0}
        usage: Counter = Counter()
        for w, n in items:
            pieces, _ = viterbi_segment(w, cost, max_piece_len)
            for p in pieces:
                usage[p] += int(n)
        tot = sum(usage.values())
        floor = (
            min(u for u in usage.values()) / tot / 2 if usage else 0.0
        )
        probs = {p: u / tot for p, u in usage.items()}
        for c in chars:
            probs.setdefault(c, floor)

    ranked = sorted(probs, key=lambda p: (-probs[p], p))
    kept = set(ranked[:vocab_size]) | chars
    return {p: probs[p] for p in sorted(kept)}


def pinned_scores(
    probs: dict[str, float], scale: int = 1000
) -> dict[str, int]:
    """Freeze float probabilities into integer Viterbi costs
    (round(-log p × scale)) — the engine-portable form the encode
    oracle replays exactly (integer sums never drift)."""
    return {
        p: int(round(-math.log(pr) * scale))
        for p, pr in probs.items()
        if pr > 0
    }


def unigram_encode(
    df: DataFrame,
    scores: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 8,
    unk_cost: int = 1_000_000,
) -> DataFrame:
    """Encode every document by Viterbi segmentation under the pinned
    integer piece costs: returns (id, n_words, n_tokens, tokens).
    Arrow-batched ``mapInPandas`` with the score table in the closure
    (KB-scale) and per-batch word memoization — the mirror of
    ``bpe.bpe_encode``, same two-pass corpus contract."""
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("n_words", LongType()),
            StructField("n_tokens", LongType()),
            StructField("tokens", ArrayType(StringType())),
        ]
    )
    narrowed = df.select(id_col, text_col)

    def encode(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = cache.get(word)
            if got is None:
                got = cache[word] = viterbi_segment(
                    word, scores, max_piece_len, unk_cost
                )[0]
            return got

        for pdf in batches:
            ids, n_words, n_tokens, tokens = [], [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in (text or "").split(" ") if w]
                toks = [t for w in words for t in enc(w)]
                ids.append(rid)
                n_words.append(len(words))
                n_tokens.append(len(toks))
                tokens.append(toks)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": n_words,
                    "n_tokens": n_tokens,
                    "tokens": tokens,
                }
            )

    return narrowed.mapInPandas(encode, schema)


def vocab_coverage(
    docs: DataFrame,
    scores: dict[str, int],
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group vocab hygiene report: the fraction of word occurrences
    a unigram piece table cannot encode without UNK fallback. A word is
    encodable iff every character is covered by a single-char piece —
    the coverage floor ``train_unigram`` guarantees for its own corpus,
    checked here against an arbitrary (e.g. pinned) table.

    Pure JVM expressions (one explode + one aggregate, map-side
    combined); the OOV test is a character-class regex built from the
    table's single-char pieces, so the report is bit-exact across
    engines. Returns (group, n_words, n_oov_words, oov_frac)."""
    chars = "".join(sorted(p for p in scores if len(p) == 1))
    oov = F.col("_w").rlike(f"[^{chars}]")
    words = docs.select(
        group_col,
        F.explode(F.split(F.col(text_col), " ")).alias("_w"),
    ).filter(F.col("_w") != "")
    return words.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(oov.cast("long")).alias("n_oov_words"),
        F.round(
            F.sum(oov.cast("long")) / F.count(F.lit(1)).cast("double"), 6
        ).alias("oov_frac"),
    )
