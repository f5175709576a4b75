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
    """Flagship pipeline on /root/testdata/sf0.001: the FULL validation
    suite (per-partition stats + sketches, row rules, uniqueness,
    referential) over the documents table mapped onto the corpus schema
    (key=doc_id, partition=lang, content=text, repo=source). Returns the
    per-partition verdict table."""
    import tempfile

    from anomalydetection_ray.pipelines.validate import SuiteConfig, run_suite

    cfg = SuiteConfig(
        key=("doc_id",),
        partition_by="lang",
        content_col="text",
        repo_col="source",
        repos_dim_path=None,
    )
    out = tempfile.mkdtemp(prefix="adray_entry_")
    res = run_suite("/root/testdata/sf0.001/documents.parquet", out, cfg, resume=False)
    return res.verdicts


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
