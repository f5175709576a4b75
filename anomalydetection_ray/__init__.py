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
- ``sources/``    readers (parquet corpus with column pruning, BGL-style raw
                  log parsing + digit-mask template mining).
- ``checks/``     the constraint checks (stats, uniqueness, referential,
                  drift) powering the validation suite.
- ``pipelines/``  end-to-end pipelines (``validate.run_suite`` flagship +
                  per-shard ``run_suite_sharded``, ``predict`` log→anomaly
                  chain, driver-contract query registry).
- ``__main__``    CLI: validate / baseline / predict subcommands.
- ``dedup/``      exact / MinHash-LSH / SimHash / n-gram-Jaccard /
                  embedding-cosine dedup and near-dup pair mining.
- ``functions/``  batch kernels: text analysis, vectors, ANN similarity
                  search, multimodal stub stages, broadcast relational ops,
                  and the hash-shuffle grouped-aggregation pattern.
- ``state/``      per-partition checkpoint + lineage bookkeeping.
- ``corpus.py``   deterministic synthetic code corpus with planted defects.

Library code never calls ``ray.init``/``ray.shutdown`` — only entry points
(bench.py, CLI) and the test fixture own a Ray session.
"""

__version__ = "0.1.0"

# Cap polars' per-process threadpool in RAY WORKER processes only, BEFORE
# any (lazy, function-local) polars import. Workers import this package
# while unpickling UDFs, so the cap lands there first: without it each of
# N concurrent map tasks spins up a cpu_count-wide rayon pool — measured
# 7× cpu-time inflation (thread thrash) on many-small-block inputs (the
# template miner at sf0.1 dropped 2.4 s → 0.85 s with the cap). Ray
# already owns across-task parallelism; intra-task polars gets a small
# pool. The DRIVER keeps polars' full pool — its single-process grouped
# merges (uniqueness pairs) are ~0.8 s faster with it. Respect an
# explicit user override.
import os as _os
import sys as _sys

# One polars thread per worker: each Ray map task budgets num_cpus=1, so
# a wider pool silently overruns the task's CPU allocation — on one box
# that inflates the small-parallelism legs of the scaling benchmark (the
# 2-CPU suite leg measured 39.8 s with spillover vs 47.5 s honest), and
# on a real cluster it oversubscribes nodes exactly the same way.
if "default_worker.py" in (_sys.argv[0] if _sys.argv else ""):
    _os.environ.setdefault("POLARS_MAX_THREADS", "1")

# Import polars EAGERLY (after the thread cap above) rather than leaving
# the first import to whichever UDF touches it mid-task: a lazy first
# import inside a running map task raced Ray worker-side module loading
# and intermittently yielded a PARTIALLY-initialized polars
# ("module 'polars._reexport' has no attribute 'Series'"), aborting
# whole pipelines nondeterministically (observed on the curate CLI at
# sf0.01, ~50% of runs). Every process that can run a UDF imports this
# package first (UDF deserialization), so completing polars here
# guarantees every later `import polars` — module-level or
# function-local — returns the fully-initialized module.
import polars as _pl  # noqa: F401  (imported for the side effect)

# High-cardinality grouped operators (uniqueness counts, LSH buckets, exact
# dedup) rely on repartition(keys=...) which Ray Data only supports under
# the hash-shuffle strategy; it also scales better than sort-based shuffle
# for every groupby this engine issues (no ordering requirements anywhere).
# Set once at import; entry points that build their own DataContext inherit.
def _configure_data_context() -> None:
    try:
        from ray.data.context import DataContext, ShuffleStrategy

        DataContext.get_current().shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    except Exception:  # pragma: no cover - older/newer ray API drift
        pass


def tune_shuffle_to_cluster() -> None:
    """Size hash-shuffle fan-out to the live cluster (idempotent, cheap).

    Ray's defaults (200 shuffle partitions, 64 aggregator actors needing
    ~16 CPUs) deadlock small clusters: map tasks hold every CPU while the
    aggregators they feed can never start. Called lazily from the engine's
    entry paths because the cluster size is unknown at import time."""
    try:
        import ray
        from ray.data.context import DataContext

        if not ray.is_initialized():
            return
        cpus = int(ray.cluster_resources().get("CPU", 8))
        ctx = DataContext.get_current()
        ctx.default_hash_shuffle_parallelism = max(8, cpus * 2)
        # aggregators are long-lived actors (~0.25 CPU each): cap them so
        # map stages and actor pools keep enough CPUs to make progress
        ctx.max_hash_shuffle_aggregators = min(64, max(2, cpus // 4))
    except Exception:  # pragma: no cover
        pass


_configure_data_context()

# Empty sort partitions carry no schema (Ray internal; see _raycompat
# module docstring) — complete the executor's own empty-schema check so
# they stop logging a spurious per-operator divergence warning.
from ._raycompat import patch_empty_schema_bundle_divergence as _patch_schema_shim

_patch_schema_shim()
