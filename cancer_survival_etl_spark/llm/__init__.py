"""LLM training-data pipeline operators (beyond-reference extensions).

Designed for 100 TB corpora: everything is expression-level (JVM,
codegen) or Arrow-batched; nothing collects to the driver. Determinism
everywhere — hashes are md5-based so results are reproducible across
engines and runs (and oracle-checkable in DuckDB).
"""

from .dedup import (
    exact_dedup,
    minhash_signatures,
    near_dup_buckets,
    ngram_jaccard_pairs,
    simhash,
)
from .similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
    normalize_embeddings,
)
from .bpe import bpe_encode, train_bpe_merges, word_histogram
from .curation import (
    boilerplate_spans,
    chunk_documents,
    contamination,
    pack_bins,
    tfidf_topk,
)
from .inference import classifier_filter, linear_score
from .pipeline import curate_corpus
from .sampling import hash_split, mixture_sample, stratified_hash_sample
from .textstats import doc_fingerprint, language_guess, quality_score, token_stats

__all__ = [
    "boilerplate_spans",
    "bpe_encode",
    "brute_force_topk",
    "chunk_documents",
    "classifier_filter",
    "contamination",
    "curate_corpus",
    "hash_split",
    "linear_score",
    "mixture_sample",
    "pack_bins",
    "stratified_hash_sample",
    "tfidf_topk",
    "train_bpe_merges",
    "word_histogram",
    "doc_fingerprint",
    "exact_dedup",
    "ivf_topk",
    "language_guess",
    "lsh_bucketed_topk",
    "minhash_signatures",
    "near_dup_buckets",
    "ngram_jaccard_pairs",
    "normalize_embeddings",
    "quality_score",
    "simhash",
    "token_stats",
]
