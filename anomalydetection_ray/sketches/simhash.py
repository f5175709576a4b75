"""SimHash 64-bit fingerprints for near-duplicate detection.

Charikar (STOC 2002) similarity-preserving fingerprint: token hashes vote
±1 on each of 64 bit positions; the sign vector becomes the fingerprint,
and near-duplicates differ in few bits (Hamming distance). Grouping by
rotated prefix blocks finds all pairs within distance d without a pairwise
scan (Manku et al., WWW 2007).
"""

from __future__ import annotations

import numpy as np

from .hll import _fnv1a


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> np.uint64:
    """64-bit SimHash of a set of uint64 token hashes."""
    if token_hashes.size == 0:
        return np.uint64(0)
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = 2 * bits - 1  # ±1
    if weights is not None:
        votes = votes * weights[:, None].astype(np.int64)
    col = votes.sum(axis=0)
    fp = np.uint64(0)
    for i in np.nonzero(col > 0)[0]:
        fp |= np.uint64(1) << np.uint64(i)
    return fp


def _md5_token_hash(token: str) -> np.uint64:
    """uint64 token hash matching DuckDB's ``md5_number_lower`` (digest
    bytes 8..16, little-endian) — the SQL-reproducible hash used by the
    oracle-checked SimHash variant."""
    import hashlib

    d = hashlib.md5(token.encode("utf-8", "surrogatepass")).digest()
    return np.uint64(int.from_bytes(d[8:], "little"))


def simhash_text(text: str, token_hash: str = "fnv") -> np.uint64:
    """64-bit SimHash over whitespace tokens (distinct tokens weighted by
    count). ``token_hash``: "fnv" (fast vectorized default) or "md5"
    (SQL-reproducible — DuckDB ``md5_number_lower`` parity)."""
    toks = text.split()
    if not toks:
        return np.uint64(0)
    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    if token_hash == "md5":
        hashes = np.array([_md5_token_hash(t) for t in uniq], dtype=np.uint64)
    else:
        hashes = np.array([_fnv1a(t.encode("utf-8", "surrogatepass")) for t in uniq], dtype=np.uint64)
    return simhash64(hashes, counts)


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR between uint64 arrays."""
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    return popcount64(x)


def popcount64(x: np.ndarray) -> np.ndarray:
    # SWAR popcount, vectorized over uint64 arrays
    x = x.astype(np.uint64, copy=True)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def prefix_blocks(fp: np.ndarray, n_blocks: int = 4) -> np.ndarray:
    """(len(fp), n_blocks) block keys: fingerprints within Hamming distance
    n_blocks-1 share at least one identical 64/n_blocks-bit block
    (pigeonhole) — the LSH grouping key for SimHash dedup."""
    width = 64 // n_blocks
    mask = np.uint64((1 << width) - 1)
    out = np.empty((len(fp), n_blocks), dtype=np.uint64)
    for b in range(n_blocks):
        out[:, b] = (fp.astype(np.uint64) >> np.uint64(b * width)) & mask
    return out
