"""Deduplication pipelines — exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine. First-class engine features for training-data curation
(the reference has no dedup at all, SURVEY.md §2.7)."""

from .distributed import connected_components
from .exact import exact_dedup
from .neardup import (
    embedding_cosine_dedup,
    embedding_neardup_pairs,
    minhash_lsh_dedup,
    minhash_lsh_dedup_verified,
    neardup_pairs,
    simhash_dedup,
    simhash_fingerprints,
)

__all__ = [
    "connected_components",
    "exact_dedup",
    "minhash_lsh_dedup",
    "minhash_lsh_dedup_verified",
    "neardup_pairs",
    "simhash_dedup",
    "simhash_fingerprints",
    "embedding_cosine_dedup",
    "embedding_neardup_pairs",
]
