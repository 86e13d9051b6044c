"""WordPiece tokenizer (BERT formulation): likelihood-gain pair
merging at train time, greedy longest-match-first (max-munch) encode
with '##' continuation prefixes and whole-word [UNK] fallback.

Completes the repo's tokenizer trio (llm/bpe.py char/byte BPE,
llm/unigram.py SentencePiece unigram-LM) with the same two-touch
architecture: ONE distributed word histogram (corpus-sized, one
shuffle, map-side combined), a driver-side training loop over the
BOUNDED histogram (vocabulary-scale work, deliberately not a Spark
job per merge), then ONE Arrow-batched ``mapInPandas`` encode pass
with the KB-scale piece table in the closure and per-batch word
memoization.

WordPiece differs from BPE only in the merge objective: instead of
raw pair frequency it maximizes the likelihood gain of the merged
unigram LM, score(a, b) = count(ab) / (count(a) · count(b)) — and
from unigram-LM in being greedy-deterministic at encode time
(longest matching piece at each position, no lattice search). Ties
at train time break on the lexicographically smallest pair, so
training is order-independent and replayable.

The reference repo has no tokenizer; this family belongs to the
brief's large-scale training-data-pipeline surface.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame

UNK = "[UNK]"


def word_units(word: str) -> list[str]:
    """A word as WordPiece units: first char bare, the rest with the
    '##' continuation prefix."""
    return [word[0]] + ["##" + c for c in word[1:]] if word else []


def train_wordpiece(
    histogram: list[tuple[str, int]] | dict[str, int],
    vocab_size: int,
) -> list[str]:
    """Deterministic WordPiece training over a word histogram.

    Starts from the unit alphabet (every initial char + every '##'
    continuation char seen), then repeatedly merges the adjacent pair
    with the highest likelihood score count(ab)/(count(a)·count(b)),
    ties broken by the lexicographically smallest (a, b). Stops at
    ``vocab_size`` pieces or when no adjacent pairs remain. Returns
    the sorted piece vocabulary ([UNK] always included).

    Pure driver-side Python over the bounded histogram — the same
    contract as ``bpe.train_bpe_merges`` / ``unigram.train_unigram``.
    """
    items = sorted(
        histogram.items() if isinstance(histogram, dict) else histogram
    )
    words: list[tuple[list[str], int]] = [
        (word_units(w), int(n)) for w, n in items if w
    ]
    vocab: set[str] = {UNK}
    for units, _ in words:
        vocab.update(units)

    while len(vocab) < vocab_size:
        pair_counts: Counter = Counter()
        unit_counts: Counter = Counter()
        for units, n in words:
            for u in units:
                unit_counts[u] += n
            for a, b in zip(units, units[1:]):
                pair_counts[(a, b)] += n
        if not pair_counts:
            break
        def score(p):
            return pair_counts[p] / (unit_counts[p[0]] * unit_counts[p[1]])

        # deterministic tie-break: among max-score pairs, smallest (a, b)
        best_score = max(score(p) for p in pair_counts)
        a, b = min(p for p in pair_counts if score(p) == best_score)
        merged = a + (b[2:] if b.startswith("##") else b)
        vocab.add(merged)
        new_words = []
        for units, n in words:
            out, i = [], 0
            while i < len(units):
                if (
                    i + 1 < len(units)
                    and units[i] == a
                    and units[i + 1] == b
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(units[i])
                    i += 1
            new_words.append((out, n))
        words = new_words
    return sorted(vocab)


def wordpiece_word(
    word: str, vocab: set[str] | frozenset[str], max_chars: int = 200
) -> list[str]:
    """Greedy longest-match-first segmentation of one word: at each
    position take the longest piece in ``vocab`` (with '##' prefix
    after position 0); if no piece matches, the WHOLE word becomes
    [UNK] (the BERT convention — partial segmentations are
    discarded). Words longer than ``max_chars`` are [UNK] outright."""
    if not word:
        return []
    if len(word) > max_chars:
        return [UNK]
    out, pos = [], 0
    while pos < len(word):
        end = len(word)
        piece = None
        while end > pos:
            sub = word[pos:end]
            if pos > 0:
                sub = "##" + sub
            if sub in vocab:
                piece = sub
                break
            end -= 1
        if piece is None:
            return [UNK]
        out.append(piece)
        pos = end
    return out


def wordpiece_encode(
    df: DataFrame,
    vocab: list[str] | set[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int = 200,
) -> DataFrame:
    """Encode every document with the pinned WordPiece vocabulary:
    returns (id, n_words, n_tokens, tokens). Arrow-batched
    ``mapInPandas`` with the vocabulary frozen in the closure and
    per-batch word memoization — the greedy encode is a pure function
    of (word, vocab), so results are partitioning-independent."""
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    vset = frozenset(vocab)
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
                got = cache[word] = wordpiece_word(word, vset, max_chars)
            return got

        for pdf in batches:
            ids, n_words, n_tokens, tokens = [], [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                ws = [w for w in (text or "").split(" ") if w]
                toks = [t for w in ws for t in enc(w)]
                ids.append(rid)
                n_words.append(len(ws))
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
