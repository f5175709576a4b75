"""Mergeable sketches — the engine's replacement for order-dependent state.

The reference keeps order-sensitive global state (Drain's streaming template
tree, `models/drain.py:48-67`) and exact global aggregates
(`np.percentile` over the full score vector, `end_to_end_prediction.py:447`).
Neither parallelizes. This package provides associative, commutative,
mergeable summaries so per-block partials computed inside ``map_batches``
can be merged in any order by a small final reduce:

- :class:`~anomalydetection_ray.sketches.hll.HyperLogLog` — distinct counts.
- :class:`~anomalydetection_ray.sketches.kll.KLL` — rank/quantile estimates.
- :class:`~anomalydetection_ray.sketches.bloom.BloomFilter` — membership
  (broadcast semi-join small side).
- :class:`~anomalydetection_ray.sketches.histogram.FixedHistogram` — shared
  bin-edge histograms for PSI / KS drift.
- :mod:`~anomalydetection_ray.sketches.minhash` / ``simhash`` — near-dup
  signatures.

All are pure numpy (no external sketch deps), picklable, and serialize to
bytes for transport inside Arrow binary columns.
"""

from .bloom import BloomFilter
from .histogram import FixedHistogram
from .hll import HyperLogLog
from .kll import KLL

__all__ = ["BloomFilter", "FixedHistogram", "HyperLogLog", "KLL"]
