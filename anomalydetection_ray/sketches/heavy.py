"""Misra-Gries heavy-hitters (frequent items) sketch — mergeable,
vectorized, bounded memory.

The reference's only frequency machinery is an exact full
``value_counts()`` (``models/preprocessing.py:7``), which materializes
every distinct key on one machine. At 100 TB a raw key column can hold
billions of distinct values; the engine needs a bounded-size summary to
(a) answer "which keys are hot?" for skew-aware join planning
(:func:`anomalydetection_ray.functions.relational.skew_join`) and
(b) report approximate top-k with a provable bound.

Misra-Gries with ``k`` counters guarantees, for EVERY key x over a
stream of N rows, ``n(x) - err <= estimate(x) <= n(x)`` with
``err <= N/(k+1)`` — and the bound is independent of merge order
(Agarwal et al., "Mergeable Summaries", PODS 2012): each trim subtracts
the (k+1)-th largest counter value c from all counters, removing at
least (k+1)*c mass from the summary, so the accumulated error can never
exceed N/(k+1) no matter how block partials are combined. Consequently
any key with n(x) > N/(k+1) is guaranteed PRESENT in the sketch.

All operations are numpy-vectorized: a batch update is one
``np.unique`` + one sorted reduceat aggregation; the trim is one
``np.partition``. Keys may be any numpy-sortable dtype (int64 ids,
object/str columns).
"""

from __future__ import annotations

import numpy as np


class MisraGries:
    """k-counter Misra-Gries summary.

    ``keys`` is kept sorted (by key) so ``estimate`` is a searchsorted;
    ``err`` is the tracked total decrement — the actual undercount bound
    for THIS sketch instance (always <= rows_seen/(k+1))."""

    __slots__ = ("k", "keys", "counts", "err", "n")

    def __init__(self, k: int = 256):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.keys: np.ndarray | None = None
        self.counts: np.ndarray | None = None
        self.err: int = 0
        self.n: int = 0  # total weight seen (for the a-priori bound)

    # -- core -----------------------------------------------------------

    def _absorb(self, uniq: np.ndarray, cnt: np.ndarray) -> "MisraGries":
        """Merge already-deduplicated (key, count) arrays, then trim."""
        if len(uniq) == 0:
            return self
        cnt = cnt.astype(np.int64, copy=False)
        if self.keys is None or len(self.keys) == 0:
            order = np.argsort(uniq, kind="mergesort")
            keys, counts = uniq[order], cnt[order]
        else:
            keys = np.concatenate([self.keys, uniq])
            counts = np.concatenate([self.counts, cnt])
            order = np.argsort(keys, kind="mergesort")
            keys, counts = keys[order], counts[order]
            starts = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
            counts = np.add.reduceat(counts, starts)
            keys = keys[starts]
        if len(keys) > self.k:
            # subtract the (k+1)-th largest count from every counter and
            # drop the non-positive ones: at most k survive, and at least
            # (k+1)*thresh total mass is removed per unit of added err
            thresh = int(np.partition(counts, len(counts) - self.k - 1)[len(counts) - self.k - 1])
            counts = counts - thresh
            keep = counts > 0
            keys, counts = keys[keep], counts[keep]
            self.err += thresh
        self.keys, self.counts = keys, counts
        return self

    def update(self, values) -> "MisraGries":
        """Absorb a batch of raw key values (nulls must be pre-dropped)."""
        arr = np.asarray(values)
        if arr.size == 0:
            return self
        uniq, cnt = np.unique(arr, return_counts=True)
        self.n += int(arr.size)
        return self._absorb(uniq, cnt)

    def merge(self, other: "MisraGries") -> "MisraGries":
        if other.k != self.k:
            raise ValueError(f"cannot merge MisraGries sketches of different k: {self.k} vs {other.k}")
        self.err += other.err
        self.n += other.n
        if other.keys is not None:
            self._absorb(other.keys, other.counts)
        return self

    @classmethod
    def merge_many(cls, sketches) -> "MisraGries":
        it = iter(sketches)
        first = next(it, None)
        if first is None:
            return cls()
        out = cls(first.k)
        out.merge(first)
        for s in it:
            out.merge(s)
        return out

    # -- queries ----------------------------------------------------------

    def estimate(self, key) -> int:
        """Estimated count: n(key) - err <= estimate <= n(key); 0 if absent."""
        if self.keys is None or len(self.keys) == 0:
            return 0
        i = int(np.searchsorted(self.keys, key))
        if i < len(self.keys) and self.keys[i] == key:
            return int(self.counts[i])
        return 0

    def estimates(self, keys) -> np.ndarray:
        """Vectorized :meth:`estimate` for an array of keys."""
        out = np.zeros(len(keys), dtype=np.int64)
        if self.keys is None or len(self.keys) == 0:
            return out
        arr = np.asarray(keys)
        idx = np.clip(np.searchsorted(self.keys, arr), 0, len(self.keys) - 1)
        hit = self.keys[idx] == arr
        out[hit] = self.counts[idx[hit]]
        return out

    def error_bound(self) -> int:
        """The a-priori, merge-order-independent bound floor(n/(k+1));
        ``self.err`` (the tracked decrement total) is always <= this."""
        return self.n // (self.k + 1)

    def candidates(self, min_count: int) -> np.ndarray:
        """Every key whose TRUE count could reach ``min_count``
        (estimate + err >= min_count) — a superset of the real hot set,
        never larger than k keys. The empty result is definitive: no key
        anywhere in the stream has n(x) >= min_count."""
        if self.keys is None or len(self.keys) == 0:
            return np.empty(0)
        return self.keys[self.counts + self.err >= min_count]

    def items(self) -> list[tuple]:
        """(key, estimate) pairs, descending estimate, key-ascending ties."""
        if self.keys is None or len(self.keys) == 0:
            return []
        order = np.lexsort((self.keys, -self.counts))
        return [(self.keys[i], int(self.counts[i])) for i in order]
