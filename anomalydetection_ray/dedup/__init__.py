"""Deduplication pipelines — exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine. First-class engine features for training-data curation
(the reference has no dedup at all, SURVEY.md §2.7)."""

from .exact import exact_dedup
from .minhash_lsh import minhash_dedup
from .ngram import ngram_jaccard_pairs
from .simhash_dedup import simhash_dedup
from .embedding import embedding_near_dups

__all__ = [
    "exact_dedup",
    "minhash_dedup",
    "ngram_jaccard_pairs",
    "simhash_dedup",
    "embedding_near_dups",
]
