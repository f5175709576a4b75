"""anomalydetection_ray — a Ray-Data-native schema + constraint validation engine.

Brand-new engine (NOT a port) with the query / data-processing capabilities
of the reference repo ElkamelDyari/AnomalyDetection, re-expressed as
idiomatic Ray Data: ``ray.data.Dataset`` pipelines of ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages, and
groupby/aggregate/sort for the wide steps.

Top-level layout
----------------
- ``sketches/``   mergeable statistical sketches (HLL, KLL, Bloom, histogram,
                  MinHash, SimHash) — pure numpy, order-independent merges.
- ``sources/``    readers (parquet corpus, BGL-style raw log lines).
- ``stages/``     per-batch transforms (text stats, scoring, drift actors).
- ``checks/``     the constraint-check registry (stats, uniqueness,
                  referential, drift) and the suite runner.
- ``pipelines/``  end-to-end pipelines (corpus validation, log parity).
- ``dedup/``      exact / MinHash-LSH / SimHash / n-gram / embedding dedup.
- ``functions/``  scalar function library + ANN similarity search.
- ``state/``      per-partition checkpoint + lineage bookkeeping.

Library code never calls ``ray.init``/``ray.shutdown`` — only entry points
(bench.py, CLI) and the test fixture own a Ray session.
"""

__version__ = "0.1.0"
