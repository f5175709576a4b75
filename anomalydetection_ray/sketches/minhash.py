"""MinHash signatures + LSH banding for near-duplicate detection.

Not present in the reference (it has no dedup at all — SURVEY.md §2.7); a
first-class capability of this engine for training-data pipelines.
Vectorized: shingles are hashed to uint64 once, then ``num_perm``
universal-hash permutations ``(a*x + b) mod p`` are applied as one
broadcasted numpy op. LSH: the signature splits into ``bands`` bands of
``rows_per_band`` rows; each band hashes to a bucket key, and two documents
sharing any band bucket become a candidate pair (checked downstream by a
``groupby(band_id, band_hash)`` in the dedup pipeline — no pairwise loop).
"""

from __future__ import annotations

import numpy as np

from .hll import _avalanche, _fnv1a

_MERSENNE_P = np.uint64((1 << 61) - 1)


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """uint64 hashes of the k-character shingles of `text` (rolling)."""
    if not text:
        return np.zeros(1, dtype=np.uint64)
    b = text.encode("utf-8", "surrogatepass")
    if len(b) <= k:
        return np.array([_fnv1a(b)], dtype=np.uint64)
    a = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    # polynomial rolling hash over byte windows, fully vectorized:
    # windows as a strided view, dot with powers of the base.
    base = np.uint64(1099511628211)
    powers = np.empty(k, dtype=np.uint64)
    powers[0] = 1
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        for i in range(1, k):
            powers[i] = powers[i - 1] * base
        win = np.lib.stride_tricks.sliding_window_view(a, k)
        h = (win * powers[::-1]).sum(axis=1, dtype=np.uint64)
    return _avalanche(np.unique(h))


def word_hashes(text: str) -> np.ndarray:
    """uint64 hashes of whitespace tokens (for word-level Jaccard)."""
    toks = text.split()
    if not toks:
        return np.zeros(1, dtype=np.uint64)
    return _avalanche(np.array([_fnv1a(t.encode("utf-8", "surrogatepass")) for t in set(toks)], dtype=np.uint64))


class MinHasher:
    """Stateful signature generator — build once per actor (the analog of
    the reference loading CodeBERT once per process,
    ``models/feature_extraction.py:37-43``)."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)

    def signature(self, hashes: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 MinHash signature of a shingle-hash set."""
        x = hashes.astype(np.uint64)[:, None]  # (n, 1)
        hv = (self.a[None, :] * x + self.b[None, :]) % _MERSENNE_P
        return hv.min(axis=0)

    @staticmethod
    def jaccard(sig1: np.ndarray, sig2: np.ndarray) -> float:
        return float(np.mean(sig1 == sig2))


def band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """(bands,) uint64 bucket hash per band of the signature."""
    rows = len(sig) // bands
    view = sig[: bands * rows].reshape(bands, rows)
    # combine rows of each band into one 64-bit key
    key = np.zeros(bands, dtype=np.uint64)
    for r in range(rows):
        key = _avalanche(key ^ view[:, r])
    return key


def exact_jaccard(h1: np.ndarray, h2: np.ndarray) -> float:
    inter = np.intersect1d(h1, h2, assume_unique=False).size
    union = np.union1d(h1, h2).size
    return inter / union if union else 1.0
