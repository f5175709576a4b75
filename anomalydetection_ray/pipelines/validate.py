"""The flagship pipeline: full schema + constraint validation suite over a
source-code corpus ``(repo, path, commit, lang, content)``.

North-rule semantics (BASELINE.json): per-partition pass/fail verdicts +
exact violation rows, every violation row carrying ``sha256(content)`` so
it can be verified byte-equal against the input; resumable from per-check
checkpoints with lineage + metrics (state/checkpoint.py).

Pass layout (each pass prunes columns at the read — the wide ``content``
column is never shuffled, SURVEY.md M6/§7.4):

  stats        read all cols       map-only partials → tiny groupby merge
  rowrules     key+lang+content    map-only filter (null lang / empty content)
  uniqueness   key+lang only       combiner → groupby-sum → broadcast filter
  referential  key+lang+content    broadcast Bloom anti-join (map-only)
  drift        (stats output)      PSI/KS vs baseline snapshot, driver-side
                                   on the small merged table

Wall-clock is dominated by the two content-bearing map-only passes; at
cluster scale those pipeline against the read. The uniqueness shuffle moves
only (key, partial-count) rows.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..checks.drift import partition_drift, write_snapshot
from ..checks.referential import orphans_bloom
from ..checks.stats import column_stats
from ..checks.uniqueness import duplicate_rows
from ..functions.text import sha256_hex_batch
from ..state import RunState


@dataclass
class SuiteConfig:
    key: tuple = ("repo", "path", "commit")
    partition_by: str = "lang"
    content_col: str = "content"
    repo_col: str = "repo"
    repos_dim_path: str | None = None  # parquet with a `repo` column
    dim_key: str = "repo"
    max_null_rate: float = 0.0
    min_rows_per_partition: int = 1
    psi_threshold: float = 0.25
    ks_threshold: float = 0.2
    hll_p: int = 12
    kll_k: int = 256
    # log-spaced length bins: content lengths are long-tailed
    hist_edges: np.ndarray = field(
        default_factory=lambda: np.concatenate([[0.0], np.logspace(0, 5, 40)])
    )
    batch_size: int | None = 8192


@dataclass
class SuiteResult:
    out_dir: str
    verdicts: pd.DataFrame
    stats: pd.DataFrame
    violations: dict[str, pa.Table]
    passed: bool


def _violation_table(ds_or_tbl, cfg: SuiteConfig, kind: str) -> pa.Table:
    """Materialize violation rows (small by contract): attach
    sha256(content) + violation_kind, project to key+partition+sha, sort
    deterministically."""
    from .queries import as_table

    tbl = ds_or_tbl if isinstance(ds_or_tbl, pa.Table) else as_table(ds_or_tbl)
    cols = list(cfg.key) + [cfg.partition_by]
    if cfg.content_col in tbl.column_names:
        tbl = sha256_hex_batch(tbl, cfg.content_col, "content_sha256")
        keep = cols + ["content_sha256"]
    else:
        keep = cols
    tbl = tbl.select(keep)
    tbl = tbl.append_column("violation_kind", pa.array([kind] * tbl.num_rows, type=pa.string()))
    if tbl.num_rows:
        order = [(c, "ascending") for c in cols]
        tbl = tbl.sort_by(order)
    return tbl


def _per_part_counts(tbl: pa.Table, part_col: str) -> dict[str, int]:
    if tbl.num_rows == 0:
        return {}
    col = pc.fill_null(pc.cast(tbl[part_col], pa.string()), "<null>")
    vals, counts = np.unique(np.asarray(col), return_counts=True)
    return {str(v): int(c) for v, c in zip(vals, counts)}


def run_suite(
    corpus_path: str,
    out_dir: str,
    cfg: SuiteConfig | None = None,
    baseline_snapshot: str | None = None,
    resume: bool = True,
) -> SuiteResult:
    """Run every check; returns verdicts + violations. Re-running with
    ``resume=True`` skips checks whose ``_DONE`` marker exists and reloads
    their outputs (checkpoint semantics; see tests/test_validate.py)."""
    from .. import tune_shuffle_to_cluster

    tune_shuffle_to_cluster()
    cfg = cfg or SuiteConfig()
    state = RunState(out_dir)
    key = list(cfg.key)
    part = cfg.partition_by
    verdict_rows: list[dict] = []
    violations: dict[str, pa.Table] = {}

    def corpus(columns: list[str] | None = None):
        return rd.read_parquet(corpus_path, columns=columns)

    # ---------------- stats (+ snapshot material) ----------------
    stats_path = os.path.join(state.unit_dir("stats"), "stats.parquet")
    if resume and state.is_done("stats"):
        stats_df = pq.read_table(stats_path).to_pandas()
    else:
        all_cols = [f.name for f in corpus().schema().base_schema]
        stats_df = column_stats(
            corpus(),
            columns=all_cols,
            partition_by=[part],
            hll_p=cfg.hll_p,
            kll_k=cfg.kll_k,
            hist_edges={cfg.content_col: cfg.hist_edges},
            batch_size=cfg.batch_size,
        ).to_pandas()
        pa_tbl = pa.Table.from_pandas(stats_df, preserve_index=False)
        pq.write_table(pa_tbl, stats_path)
        state.mark_done("stats", {"partitions": int(stats_df["part"].nunique()), "rows_seen": int(stats_df[stats_df["column"] == cfg.content_col]["count"].sum())})

    for _, r in stats_df.iterrows():
        issues = []
        if r["null_rate"] > cfg.max_null_rate:
            issues.append(f"null_rate {r['null_rate']:.4f} > {cfg.max_null_rate}")
        verdict_rows.append(
            {
                "check": "stats",
                "partition": r["part"],
                "column": r["column"],
                "passed": not issues,
                "metric": r["null_rate"],
                "detail": "; ".join(issues),
            }
        )
    part_counts = (
        stats_df[stats_df["column"] == cfg.content_col][["part", "count"]]
        .set_index("part")["count"]
        .to_dict()
    )
    for p, c in part_counts.items():
        verdict_rows.append(
            {
                "check": "min_rows",
                "partition": p,
                "column": "",
                "passed": bool(c >= cfg.min_rows_per_partition),
                "metric": float(c),
                "detail": "",
            }
        )

    # ---------------- rowrules: null partition col / empty content -------
    rr_path = os.path.join(state.unit_dir("rowrules"), "violations.parquet")
    if resume and state.is_done("rowrules"):
        rr = pq.read_table(rr_path)
    else:
        need = key + [part, cfg.content_col]

        def bad_rows(batch: pa.Table) -> pa.Table:
            null_part = pc.is_null(batch[part])
            empty = pc.equal(pc.coalesce(batch[cfg.content_col], ""), "")
            return batch.filter(pc.or_(null_part, empty))

        bad = corpus(list(dict.fromkeys(need))).map_batches(
            bad_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        # kind is decided per row after materialization (small)
        from .queries import as_table

        bad_tbl = as_table(bad)
        null_mask = pc.is_null(bad_tbl[part])
        nulls = _violation_table(bad_tbl.filter(null_mask), cfg, f"null_{part}")
        empties = _violation_table(bad_tbl.filter(pc.invert(null_mask)), cfg, "empty_content")
        rr = pa.concat_tables([nulls, empties])
        pq.write_table(rr, rr_path)
        state.mark_done("rowrules", {"violations": rr.num_rows})
    violations["rowrules"] = rr
    for p, c in _per_part_counts(rr, part).items():
        verdict_rows.append(
            {"check": "rowrules", "partition": p, "column": "", "passed": False, "metric": float(c), "detail": f"{c} row-rule violations"}
        )

    # ---------------- uniqueness on the key ----------------
    uq_path = os.path.join(state.unit_dir("uniqueness"), "violations.parquet")
    if resume and state.is_done("uniqueness"):
        uq = pq.read_table(uq_path)
    else:
        dup = duplicate_rows(corpus(key + [part, cfg.content_col]), key)
        uq = _violation_table(dup, cfg, "duplicate_key")
        pq.write_table(uq, uq_path)
        state.mark_done("uniqueness", {"violations": uq.num_rows})
    violations["uniqueness"] = uq
    for p, c in _per_part_counts(uq, part).items():
        verdict_rows.append(
            {"check": "uniqueness", "partition": p, "column": "", "passed": False, "metric": float(c), "detail": f"{c} duplicate-key rows"}
        )

    # ---------------- referential vs repos dim ----------------
    if cfg.repos_dim_path:
        rf_path = os.path.join(state.unit_dir("referential"), "violations.parquet")
        if resume and state.is_done("referential"):
            rf = pq.read_table(rf_path)
        else:
            dim = rd.read_parquet(cfg.repos_dim_path, columns=[cfg.dim_key])
            orphans = orphans_bloom(
                corpus(list(dict.fromkeys(key + [part, cfg.content_col, cfg.repo_col]))),
                cfg.repo_col,
                dim,
                cfg.dim_key,
            )
            rf = _violation_table(orphans, cfg, "orphan_repo")
            pq.write_table(rf, rf_path)
            state.mark_done("referential", {"violations": rf.num_rows})
        violations["referential"] = rf
        for p, c in _per_part_counts(rf, part).items():
            verdict_rows.append(
                {"check": "referential", "partition": p, "column": "", "passed": False, "metric": float(c), "detail": f"{c} orphan rows"}
            )

    # ---------------- drift vs baseline snapshot ----------------
    if baseline_snapshot:
        drift = partition_drift(
            stats_df,
            pq.read_table(baseline_snapshot).to_pandas(),
            cfg.content_col,
            cfg.psi_threshold,
            cfg.ks_threshold,
        )
        drift_path = os.path.join(state.unit_dir("drift"), "drift.parquet")
        pq.write_table(pa.Table.from_pandas(drift, preserve_index=False), drift_path)
        state.lineage_append({"unit": "drift", "metrics": {"failed": int((~drift["passed"]).sum())}})
        for _, r in drift.iterrows():
            verdict_rows.append(
                {
                    "check": "drift",
                    "partition": r["part"],
                    "column": r["column"],
                    "passed": bool(r["passed"]),
                    "metric": float(r["psi"]) if np.isfinite(r["psi"]) else 1e9,
                    "detail": r["reason"] or f"psi={r['psi']:.4f} ks={r['ks']:.4f}",
                }
            )

    # partitions with no violation rows get explicit passing verdicts
    flagged = {(v["check"], v["partition"]) for v in verdict_rows}
    for check in ["rowrules", "uniqueness"] + (["referential"] if cfg.repos_dim_path else []):
        for p in part_counts:
            if (check, p) not in flagged:
                verdict_rows.append(
                    {"check": check, "partition": p, "column": "", "passed": True, "metric": 0.0, "detail": ""}
                )

    verdicts = pd.DataFrame(verdict_rows).sort_values(["check", "partition", "column"]).reset_index(drop=True)
    verdicts_path = os.path.join(out_dir, "verdicts.parquet")
    pq.write_table(pa.Table.from_pandas(verdicts, preserve_index=False), verdicts_path)
    passed = bool(verdicts["passed"].all())
    state.lineage_append(
        {
            "unit": "suite",
            "metrics": {
                "passed": passed,
                "n_verdicts": len(verdicts),
                "n_violations": {k: v.num_rows for k, v in violations.items()},
            },
        }
    )
    return SuiteResult(out_dir=out_dir, verdicts=verdicts, stats=stats_df, violations=violations, passed=passed)


def write_baseline(corpus_path: str, snapshot_path: str, cfg: SuiteConfig | None = None) -> None:
    """Compute and persist the baseline snapshot (per-partition stats +
    histogram/sketch bytes) — the artifact drift checks score against."""
    cfg = cfg or SuiteConfig()
    all_cols = None
    ds = rd.read_parquet(corpus_path)
    all_cols = [f.name for f in ds.schema().base_schema]
    stats_df = column_stats(
        ds,
        columns=all_cols,
        partition_by=[cfg.partition_by],
        hll_p=cfg.hll_p,
        kll_k=cfg.kll_k,
        hist_edges={cfg.content_col: cfg.hist_edges},
        batch_size=cfg.batch_size,
    ).to_pandas()
    write_snapshot(stats_df, snapshot_path)


def verify_violation_invariant(
    violations: pa.Table, corpus_path: str, cfg: SuiteConfig | None = None
) -> bool:
    """The per-row invariant (input_hint): every violation row's
    content_sha256 equals sha256 of the input row with the same key."""
    cfg = cfg or SuiteConfig()
    if violations.num_rows == 0 or "content_sha256" not in violations.column_names:
        return True
    key = list(cfg.key)
    want = {
        tuple(r[k] for k in key): r["content_sha256"]
        for r in violations.to_pylist()
    }
    ds = rd.read_parquet(corpus_path, columns=key + [cfg.content_col])
    import ray

    ref = ray.put(set(want.keys()))

    def pick(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        cols = [np.asarray(pc.cast(batch[k], pa.string())) for k in key]
        mask = np.fromiter(
            (tuple(c[i] for c in cols) in keys for i in range(batch.num_rows)),
            dtype=bool,
            count=batch.num_rows,
        )
        return sha256_hex_batch(batch.filter(pa.array(mask)), cfg.content_col, "content_sha256")

    from .queries import as_table

    got_tbl = as_table(ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True))
    got: dict[tuple, set] = {}
    for r in got_tbl.to_pylist():
        got.setdefault(tuple(r[k] for k in key), set()).add(r["content_sha256"])
    # duplicate keys may map to >1 content hash; the recorded hash must be
    # among the input hashes for that key
    return all(want[k] in got.get(k, set()) for k in want)
