"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: the validation-suite
    stats pass (per-(lang) column statistics with HLL distinct + KLL
    quantile sketches) over the documents table."""
    from anomalydetection_ray.checks.stats import column_stats
    from anomalydetection_ray.sources import read_table

    ds = read_table("/root/testdata/sf0.001", "documents")
    stats = column_stats(
        ds, columns=["doc_id", "text", "lang", "source", "n_chars"], partition_by=["lang"]
    )
    # drop the binary sketch payloads for the smoke check's stable schema
    return stats.drop_columns(["hll", "kll", "hist"])


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 (and
    the engine's first-class training-data ops). See
    anomalydetection_ray/pipelines/queries.py for the registry."""
    from anomalydetection_ray.pipelines.queries import registry

    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    names as the Ray result). Non-SQL-expressible ops (sketch estimates,
    LSH dedup, drift scores) are omitted → driver records rows-only."""
    from anomalydetection_ray.pipelines.queries import registry

    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
