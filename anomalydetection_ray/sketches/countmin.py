"""Count-Min sketch (Cormode & Muthukrishnan 2005): mergeable
fixed-memory FREQUENCY estimates for every key — the complement of the
Misra-Gries heavy-hitter sketch (MG answers "which keys are frequent",
Count-Min answers "how often is THIS key" for arbitrary later probes,
e.g. frequency features at serve time or join-selectivity estimates).

Guarantee (depth d, width w, N total count): estimates never
undercount, and overcount by more than ``e·N/w`` with probability at
most ``e^-d``. Everything is vectorized: one 64-bit base hash per value
(`hll.hash64_arrow`, xxhash/avalanche), ``d`` derived row hashes via
avalanche remixes with odd constants, counter updates via
``np.add.at``. Mergeability is elementwise addition, so the dataset
pass is the standard per-block-partial → n-ary driver merge shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hll import _avalanche, hash64, hash64_arrow

_ROW_SALTS = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _canon_hash(values) -> np.ndarray:
    """One canonical hash for BOTH ingest and probe: string-ish inputs
    route through the same polars-xxhash path ``update_arrow`` /
    ``dataset_countmin`` use (round-5 review: ``estimate`` hashed
    strings with the FNV fallback while ingest used xxhash, so string
    probes hit different cells and returned garbage — an undercount the
    sketch's floor guarantee forbids). Numeric inputs are identical
    under both paths (avalanche over the integer view)."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("U", "S", "O"):
        return hash64_arrow(pa.array(values))
    return hash64(values)


class CountMin:
    __slots__ = ("width", "depth", "seed", "table", "n")

    def __init__(self, width: int = 2048, depth: int = 4, seed: int = 1):
        if width < 2 or depth < 1:
            raise ValueError(f"need width >= 2 and depth >= 1, got {width}x{depth}")
        self.width, self.depth, self.seed = int(width), int(depth), int(seed)
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.n = 0

    def _row_hashes(self, h: np.ndarray) -> np.ndarray:
        """(depth, n) column indices from one base hash per value."""
        salts = (np.arange(1, self.depth + 1, dtype=np.uint64) + np.uint64(self.seed)) * _ROW_SALTS
        return (_avalanche(h[None, :] ^ salts[:, None]) % np.uint64(self.width)).astype(np.int64)

    def update_hashed(self, h: np.ndarray, counts: np.ndarray | None = None) -> "CountMin":
        if len(h) == 0:
            return self
        c = np.ones(len(h), dtype=np.int64) if counts is None else np.asarray(counts, dtype=np.int64)
        idx = self._row_hashes(np.asarray(h, dtype=np.uint64))
        for d in range(self.depth):
            np.add.at(self.table[d], idx[d], c)
        self.n += int(c.sum())
        return self

    def update(self, values, counts=None) -> "CountMin":
        return self.update_hashed(_canon_hash(values), counts)

    def update_arrow(self, arr, counts=None) -> "CountMin":
        return self.update_hashed(hash64_arrow(arr), counts)

    def estimate(self, values) -> np.ndarray:
        """Point estimates (int64, one per value): min over depth rows —
        never an undercount of the true total."""
        v = np.asarray(_canon_hash(values), dtype=np.uint64)
        if len(v) == 0:
            return np.empty(0, dtype=np.int64)
        idx = self._row_hashes(v)
        return self.table[np.arange(self.depth)[:, None], idx].min(axis=0)

    def estimate_arrow(self, arr) -> np.ndarray:
        v = np.asarray(hash64_arrow(arr), dtype=np.uint64)
        if len(v) == 0:
            return np.empty(0, dtype=np.int64)
        idx = self._row_hashes(v)
        return self.table[np.arange(self.depth)[:, None], idx].min(axis=0)

    def error_bound(self) -> float:
        """e·N/w — exceeded with probability <= e^-depth."""
        return float(np.e * self.n / self.width)

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.width, self.depth, self.seed) != (other.width, other.depth, other.seed):
            raise ValueError("cannot merge CountMin sketches with different params")
        self.table += other.table
        self.n += other.n
        return self

    @classmethod
    def merge_many(cls, sketches) -> "CountMin":
        it = iter(sketches)
        first = next(it, None)
        if first is None:
            raise ValueError("merge_many: no sketches")
        # a FRESH sketch (TDigest.merge_many discipline): mutating the
        # first input would corrupt any later per-partition use of it
        out = cls(first.width, first.depth, first.seed).merge(first)
        for s in it:
            out.merge(s)
        return out

    def to_bytes(self) -> bytes:
        head = np.array([self.width, self.depth, self.seed, self.n], dtype=np.int64)
        return head.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMin":
        head = np.frombuffer(data[:32], dtype=np.int64)
        sk = cls(int(head[0]), int(head[1]), int(head[2]))
        sk.n = int(head[3])
        sk.table = np.frombuffer(data[32:], dtype=np.int64).reshape(sk.depth, sk.width).copy()
        return sk


def dataset_countmin(ds, col: str, width: int = 2048, depth: int = 4, seed: int = 1) -> CountMin:
    """Count-Min over a Dataset column: one sketch per block
    (``update_arrow`` — the whole block hashes in one vectorized pass),
    elementwise-add n-ary merge on the driver — O(blocks × depth × width)
    driver work, NO shuffle, never O(distinct)."""
    from ..functions.shuffle import select_if_needed

    def partial(tb: pa.Table) -> pa.Table:
        sk = CountMin(width, depth, seed).update_arrow(tb[col])
        return pa.table({"cm": pa.array([sk.to_bytes()], type=pa.binary())})

    blobs = [
        b.as_py()
        for tb in select_if_needed(ds, [col])
        .map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
        for b in tb["cm"]
    ]
    if not blobs:
        return CountMin(width, depth, seed)
    return CountMin.merge_many(CountMin.from_bytes(b) for b in blobs)
