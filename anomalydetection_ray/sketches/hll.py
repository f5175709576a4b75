"""HyperLogLog distinct-count sketch (dense, vectorized, mergeable).

Replaces the reference's exact distinct-key set (the index of
``value_counts()`` at ``models/preprocessing.py:7``) which requires a full
shuffle / single-node materialization. An HLL partial is computed per Arrow
block inside ``map_batches`` and merged associatively (elementwise max of
registers), so distinct counts stream at any scale.

Standard HLL (Flajolet et al. 2007) with the small-range linear-counting
correction; p in [4, 18], relative error ~= 1.04/sqrt(2^p).
"""

from __future__ import annotations

import numpy as np

# 64-bit splitmix-style avalanche; vectorized over uint64 arrays.
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


# fixed hash for null slots in typed integer/temporal columns (strings go
# through polars' own null handling; floats map null -> canonical NaN bits)
_NULL_HASH = np.uint64(0x9E3779B97F4A7C15)


def _avalanche(h: np.ndarray) -> np.ndarray:
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= _C1
    h ^= h >> np.uint64(27)
    h *= _C2
    h ^= h >> np.uint64(31)
    return h


def hash64_arrow(arr) -> np.ndarray:
    """Vectorized deterministic 64-bit hashes of a pyarrow (Chunked)Array.

    String/binary columns hash via polars (xxhash, Rust-vectorized) —
    ~1000× the per-byte Python FNV fallback on long content columns;
    numeric columns take the avalanche fast path. Null → fixed sentinel.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if (
        pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
        # nested types through the same polars path (round-5 review: the
        # numpy fallback's dict cache crashed on unhashable list values,
        # aborting full-schema profiling of any corpus with a list/struct
        # column)
        or pa.types.is_list(t) or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t) or pa.types.is_struct(t) or pa.types.is_map(t)
    ):
        import polars as pl

        h = pl.from_arrow(arr).hash(seed=0).to_numpy().astype(np.uint64, copy=False)
        return _avalanche(h)
    if (pa.types.is_integer(t) or pa.types.is_temporal(t)) and arr.null_count:
        # hashes must be a pure function of the VALUE: to_numpy on a
        # null-bearing integer column silently converts to float64, which
        # would route through the float bit-pattern path (different hash
        # for the same int across blocks, and values >= 2^53 collapse).
        # Stay integral: cast, fill nulls, hash, stamp the null slots.
        import pyarrow.compute as pc

        vals = arr.cast(pa.int64()).fill_null(0).to_numpy(zero_copy_only=False)
        h = _avalanche(vals.astype(np.int64, copy=False).view(np.uint64))
        h[pc.is_null(arr).to_numpy(zero_copy_only=False)] = _NULL_HASH
        return h
    return hash64(arr.to_numpy(zero_copy_only=False))


def hash64(values) -> np.ndarray:
    """Deterministic 64-bit hashes for an array of arbitrary values.

    Strings/bytes go through a vectorized FNV-1a-over-bytes fallback only
    when numpy can't view them as integers; numeric arrays are avalanche-
    mixed directly (fast path for key columns).
    """
    arr = np.asarray(values)
    if arr.dtype.kind == "f":
        # hash the IEEE bit pattern, NOT a value cast: astype(int64)
        # truncated every float in [k, k+1) onto one hash (a uniform(0,1)
        # score column distinct-counted as 1). Normalize -0.0 -> +0.0
        # (SQL equality) and NaN -> one canonical payload first.
        f = arr.astype(np.float64, copy=False) + 0.0
        f = np.where(np.isnan(f), np.nan, f)
        return _avalanche(f.view(np.uint64))
    if arr.dtype.kind in "iu":
        return _avalanche(arr.astype(np.int64, copy=False).view(np.uint64))
    if arr.dtype.kind == "M":  # datetime64
        return _avalanche(arr.view(np.int64).view(np.uint64))
    # object / string path: hash via python-level but amortized with a dict
    # cache for repeated values (categorical-ish columns are common).
    out = np.empty(len(arr), dtype=np.uint64)
    cache: dict = {}
    for i, v in enumerate(arr):
        key = v
        h = cache.get(key)
        if h is None:
            if isinstance(v, bytes):
                b = v
            elif v is None:
                b = b"\x00<null>"
            else:
                b = str(v).encode("utf-8", "surrogatepass")
            h = np.uint64(_fnv1a(b))
            cache[key] = h
        out[i] = h
    return _avalanche(out)


def _fnv1a(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for byte in data:
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update(self, values) -> "HyperLogLog":
        """Add a batch of values (vectorized)."""
        if len(values) == 0:
            return self
        return self.update_hashed(hash64(values))

    def update_hashed(self, h: np.ndarray) -> "HyperLogLog":
        """Add pre-hashed uint64 values (hash once per column per batch,
        then slice per partition group — see checks/stats.py)."""
        if len(h) == 0:
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # rank = leading zeros of the remaining (64-p) bits, + 1
        rest = (h << np.uint64(self.p)) | (np.uint64(1) << np.uint64(self.p - 1))
        # position of highest set bit -> leading zero count. rest is
        # never 0 (guard bit or-ed in), but float64 log2 alone is NOT
        # exact: an integer within half-ulp BELOW a power of two rounds
        # up on the astype, overestimating the exponent by 1 (rest near
        # 2^64 → log2=64 → rank 0 → the value silently dropped; round-5
        # review, ~2^-48 of hashes). The float estimate is only ever 0
        # or +1 off (integers ≥ 2^k never round below 2^k), so one
        # integer shift-check repairs it exactly.
        e = np.floor(np.log2(rest.astype(np.float64))).astype(np.int64)
        np.minimum(e, 63, out=e)
        e[(rest >> e.astype(np.uint64)) == 0] -= 1
        rank = (64 - e).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs of different precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    @classmethod
    def merge_many_bytes(cls, blobs) -> "HyperLogLog":
        """n-ary merge straight from serialized form: one (n, m) register
        matrix max-reduce instead of n deserialize+merge round-trips —
        the driver merges tens of thousands of per-block partials, where
        the pairwise path was ~50× slower (see checks/stats.py)."""
        blobs = list(blobs)
        if not blobs:
            return cls()
        p = blobs[0][0]
        m = 1 << p
        if any(b[0] != p for b in blobs):
            raise ValueError("cannot merge HLLs of different precision")
        mat = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(len(blobs), m + 1)
        sk = cls(p)
        sk.registers = mat[:, 1:].max(axis=0).copy()
        return sk

    def estimate(self) -> float:
        m = float(self.m)
        if self.p == 4:
            alpha = 0.673
        elif self.p == 5:
            alpha = 0.697
        elif self.p == 6:
            alpha = 0.709
        else:
            alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        est = alpha * m * m / inv.sum()
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                est = m * np.log(m / zeros)  # linear counting
        return float(est)

    # --- serialization (for transport in Arrow binary columns) ---
    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        sk = cls(data[0])
        sk.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return sk
