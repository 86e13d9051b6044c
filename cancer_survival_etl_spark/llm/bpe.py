"""BPE tokenizer training and encoding over a distributed corpus.

Architecture matches production BPE trainers (HuggingFace tokenizers,
SentencePiece): the 100 TB corpus collapses to a WORD HISTOGRAM by a
distributed count (Heaps' law bounds distinct words at millions —
driver-collectable), the merge loop then runs over that bounded
histogram, and encoding fans back out over the corpus as an
Arrow-batched map with the learned merge table broadcast. The corpus
is touched exactly twice (histogram, encode); no per-merge-round
distributed job ever runs, which is what makes N=32k merges feasible —
a naive "one Spark job per merge" design would be 32k shuffles.

Merge selection is deterministic: max count, ties broken by pair
lexicographic order — same corpus, same merges, any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed word→count histogram (the only full-corpus pass of
    training). Map-side partial aggregation collapses repeats before
    the shuffle; output size is vocabulary, not corpus."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe_merges(
    histogram: list[tuple[str, int]] | dict[str, int],
    n_merges: int,
    end_of_word: str = "</w>",
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word histogram (Sennrich et
    al. 2016): start from characters (+ end-of-word marker), repeatedly
    merge the most frequent adjacent symbol pair. Pure driver-side
    Python over the bounded histogram — deliberately NOT a Spark loop
    (see module docstring).
    """
    items = histogram.items() if isinstance(histogram, dict) else histogram
    words: dict[tuple[str, ...], int] = {}
    for w, n in items:
        words[tuple(w) + (end_of_word,)] = words.get(
            tuple(w) + (end_of_word,), 0
        ) + int(n)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        pair, cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_words: dict[tuple[str, ...], int] = {}
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == pair[0]
                    and syms[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + n
        words = new_words
    return merges


def encode_word(word: str, merges: list[tuple[str, str]], end_of_word: str = "</w>") -> list[str]:
    """Apply learned merges to one word (driver/test helper; the rank
    of a merge in the list is its priority, lowest rank first — the
    standard BPE encode)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    syms = list(word) + [end_of_word]
    while len(syms) > 1:
        pairs = [(ranks.get((a, b), float("inf")), i) for i, (a, b) in enumerate(zip(syms, syms[1:]))]
        rank, i = min(pairs)
        if rank == float("inf"):
            break
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Encode every document with the learned merge table: returns
    (id, n_words, n_tokens, tokens) where tokens is the BPE symbol
    sequence. Arrow-batched ``mapInPandas``; the merge table rides to
    executors inside the closure (broadcast-by-serialization — it is
    KB-to-MB scale). Per-word encodes are memoized per batch: Zipf's
    law makes the word cache hit rate ~99% on natural text.
    """
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
                got = cache[word] = encode_word(word, merges, end_of_word)
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


def bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte↔printable-unicode bijection (Radford et al. 2019,
    public ``encoder.py`` algorithm): printable ASCII and two Latin-1
    ranges map to themselves; every other byte value maps to 256+n —
    so arbitrary UTF-8 BYTES become a reversible string of printable
    code points that the string-pair merge machinery can chew on.
    Space (0x20) lands on 'Ġ' (U+0120), the familiar GPT-2 marker."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


def byte_pretokenize(text: str) -> list[str]:
    """Byte-level pre-tokenization, GPT-2 leading-space convention:
    the document splits into words, each word AFTER the first carries
    the space that preceded it (mapped to 'Ġ') — whitespace is vocab,
    not a discarded delimiter, so detokenization is lossless. Runs of
    spaces collapse like the word-level pipeline's split (simplified
    vs the full GPT-2 regex, which also isolates digits/punct)."""
    table = bytes_to_unicode()
    words = [w for w in (text or "").split(" ") if w]
    out = []
    for i, w in enumerate(words):
        raw = (" " + w) if i > 0 else w
        out.append("".join(table[b] for b in raw.encode("utf-8")))
    return out


def byte_word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed byte-level pre-token histogram — the byte-level
    sibling of ``word_histogram`` (same single-pass, map-side-combined
    shape; output bounded by vocabulary). Non-initial words key
    separately from initial ones ('Ġword' vs 'word'), exactly like
    GPT-2's vocabulary."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("word", StringType()), StructField("n", LongType())]
    )
    narrowed = df.select(text_col)

    def hist(batches):
        import pandas as pd

        counts: dict[str, int] = {}
        for pdf in batches:
            for text in pdf[text_col]:
                for tok in byte_pretokenize(text):
                    counts[tok] = counts.get(tok, 0) + 1
        yield pd.DataFrame(
            {"word": list(counts), "n": list(counts.values())}
        )

    return (
        narrowed.mapInPandas(hist, schema)
        .groupBy("word")
        .agg(F.sum("n").alias("n"))
    )


def train_bpe_merges_bytes(
    histogram: list[tuple[str, int]] | dict[str, int],
    n_merges: int,
) -> list[tuple[str, str]]:
    """Byte-level BPE merge learning: identical merge loop to
    ``train_bpe_merges`` but over byte-mapped pre-tokens (histogram
    keys already carry the 'Ġ' convention from
    ``byte_word_histogram``) and with NO end-of-word marker — GPT-2's
    formulation, where word boundaries live in the leading-space
    bytes instead of a sentinel symbol."""
    items = histogram.items() if isinstance(histogram, dict) else histogram
    words: dict[tuple[str, ...], int] = {}
    for w, n in items:
        words[tuple(w)] = words.get(tuple(w), 0) + int(n)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        pair, cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_words: dict[tuple[str, ...], int] = {}
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == pair[0]
                    and syms[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + n
        words = new_words
    return merges


def encode_pretoken(
    pretoken: str, merges: list[tuple[str, str]]
) -> list[str]:
    """Apply byte-level merges to one mapped pre-token: start from its
    code points (each one mapped byte), repeatedly merge the
    (lowest-rank, leftmost) adjacent pair — the GPT-2 encode, no
    end-of-word sentinel."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    syms = list(pretoken)
    while len(syms) > 1:
        pairs = [
            (ranks.get((a, b), float("inf")), i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
        ]
        rank, i = min(pairs)
        if rank == float("inf"):
            break
        syms[i:i + 2] = [syms[i] + syms[i + 1]]
    return syms


def bpe_encode_bytes(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Byte-level BPE corpus encode — the GPT-2 sibling of
    ``bpe_encode``: byte-mapped pre-tokens (leading-space 'Ġ'
    convention) through the rank-greedy merge fold, Arrow-batched
    ``mapInPandas`` with the merge table in the closure and per-batch
    pre-token memoization. Returns (id, n_words, n_tokens, tokens)."""
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

        def enc(tok: str) -> list[str]:
            got = cache.get(tok)
            if got is None:
                got = cache[tok] = encode_pretoken(tok, merges)
            return got

        for pdf in batches:
            ids, n_words, n_tokens, tokens = [], [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                pretoks = byte_pretokenize(text)
                toks = [t for p in pretoks for t in enc(p)]
                ids.append(rid)
                n_words.append(len(pretoks))
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
