"""KLL quantile sketch (Karnin-Lang-Liberty, FOCS 2016) — mergeable, numpy.

Replaces the reference's exact global percentile
(``np.percentile(scores, 95)`` over the entire vector,
``end_to_end_prediction.py:447``; ``prediction_pipeline.py:338``) with a
streaming, mergeable summary: per-block partials from ``map_batches`` merge
associatively, so p50/p95/p99 of a 10^12-row column never materialize the
column.

Determinism: compaction keeps alternating even/odd survivors driven by a
per-level toggle instead of a random coin, so results are byte-stable across
runs and merge orders at the cost of slightly worse constants than the
randomized analysis. Tests assert observed rank error stays under the
2.5/k bound on adversarial inputs.
"""

from __future__ import annotations

import numpy as np


class KLL:
    __slots__ = ("k", "levels", "toggles", "n")

    _C = 2.0 / 3.0  # per-level capacity decay

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.toggles: list[bool] = [False]
        self.n = 0

    # --- capacity handling ---
    def _capacity(self, level: int) -> int:
        depth = len(self.levels) - level - 1
        return max(2, int(np.ceil(self.k * (self._C ** depth))))

    def _total(self) -> int:
        return sum(len(lv) for lv in self.levels)

    def _cap_total(self) -> int:
        return sum(self._capacity(i) for i in range(len(self.levels)))

    def _compress(self) -> None:
        while self._total() > self._cap_total():
            for i in range(len(self.levels)):
                if len(self.levels[i]) > self._capacity(i):
                    self._compact_level(i)
                    break
            else:
                break

    def _compact_level(self, i: int) -> None:
        lv = np.sort(self.levels[i])
        if len(lv) < 2:
            return
        off = 1 if self.toggles[i] else 0
        self.toggles[i] = not self.toggles[i]
        keep = lv[off::2]
        if len(lv) % 2 == 1:
            # odd leftover stays at this level to keep weights exact: the
            # unpaired element is the MAX for off=0, the MIN for off=1
            # (the off=1 branch used to discard lv[0] outright — total
            # sample weight drifted ~4% under n and minima vanished)
            if off == 0:
                promoted, leftover = keep[: len(lv) // 2], lv[-1:]
            else:
                promoted, leftover = keep, lv[:1]
        else:
            promoted, leftover = keep, np.empty(0)
        self.levels[i] = leftover.astype(np.float64)
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.toggles.append(False)
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])

    # --- public API ---
    def update(self, values) -> "KLL":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.n += int(v.size)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def merge(self, other: "KLL") -> "KLL":
        # parameter-mismatch is a caller bug every sibling sketch turns
        # into a loud ValueError (round-5 review): merging a k=16 sketch
        # into a k=256 one silently degrades the 2.5/k rank-error bound
        if other.k != self.k:
            raise ValueError(
                f"cannot merge KLL sketches with different k ({self.k} vs {other.k})"
            )
        if other.n == 0:
            return self
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.toggles.append(False)
        for i, lv in enumerate(other.levels):
            if len(lv):
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._compress()
        return self

    @classmethod
    def merge_many(cls, sketches) -> "KLL":
        """n-ary merge: concatenate all sketches per level, then compress
        ONCE — same error guarantees as pairwise merging (compaction only
        sees larger levels, never more of them), but n× fewer sort/compact
        passes. The driver-side stats merge folds thousands of per-block
        partials per group; pairwise merging dominated its runtime."""
        sks = list(sketches)
        ks = {s.k for s in sks}
        if len(ks) > 1:
            raise ValueError(
                f"cannot merge KLL sketches with different k ({sorted(ks)})"
            )
        live = [s for s in sks if s.n]
        if not live:
            return cls(sks[0].k if sks else 256)
        out = cls(live[0].k)
        depth = max(len(s.levels) for s in live)
        out.levels = [
            np.concatenate(
                [s.levels[i] for s in live if i < len(s.levels) and len(s.levels[i])]
                or [np.empty(0, dtype=np.float64)]
            )
            for i in range(depth)
        ]
        out.toggles = [False] * depth
        out.n = sum(s.n for s in live)
        out._compress()
        return out

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for i, lv in enumerate(self.levels):
            if len(lv):
                vals.append(lv)
                wts.append(np.full(len(lv), 1 << i, dtype=np.int64))
        if not vals:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted()
        if v.size == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(idx, v.size - 1)])

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def rank(self, x: float) -> float:
        """Estimated fraction of items <= x."""
        v, w = self._weighted()
        if v.size == 0:
            return float("nan")
        cum = np.cumsum(w)
        idx = int(np.searchsorted(v, x, side="right"))
        return float(cum[idx - 1] / cum[-1]) if idx > 0 else 0.0

    # --- serialization ---
    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps(
            {"k": self.k, "levels": self.levels, "toggles": self.toggles, "n": self.n},
            protocol=4,
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLL":
        import pickle

        d = pickle.loads(data)
        sk = cls(d["k"])
        sk.levels, sk.toggles, sk.n = d["levels"], d["toggles"], d["n"]
        return sk
