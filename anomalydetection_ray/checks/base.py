"""Check protocol + shared result types.

A Check is the engine's unit of validation work (the analog of one
reference pipeline step, `end_to_end_prediction.py:216-535`, but
declarative and composable). The lifecycle is:

    partials = ds.map_batches(check.partial_fn, batch_format="pyarrow", batch_size=None)
    merged   = partials.groupby(keys).map_groups(check.merge_fn)
    verdicts = check.verdict(merged_small_table, tolerances)   # driver-side, tiny
    violations = check.violations(ds)                          # optional second pass

Partials are tiny (rows ~= blocks × partitions × columns), so the merge
groupby shuffles kilobytes, never data rows. Verdict evaluation happens on
the merged stat table, which is small by construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class Tolerance:
    """Bounds a per-partition metric must satisfy (inclusive)."""

    metric: str
    min_value: float | None = None
    max_value: float | None = None

    def passes(self, value: float | None) -> bool:
        if value is None:
            return False
        if self.min_value is not None and value < self.min_value:
            return False
        if self.max_value is not None and value > self.max_value:
            return False
        return True


@dataclass
class CheckResult:
    """Outcome of one check over one run.

    verdicts: one dict per (partition) with at least
      {"check", "partition", "passed", "metrics": {...}}
    violations: optional Dataset / pyarrow.Table of exact offending rows
      (schema: input key columns + violation_kind + detail) — the analog of
      the reference's anomaly rows (`end_to_end_prediction.py:590-591`).
    """

    check: str
    verdicts: list[dict] = field(default_factory=list)
    violations: Any = None

    @property
    def passed(self) -> bool:
        return all(v.get("passed", False) for v in self.verdicts)

    def failed_partitions(self) -> list[str]:
        return [v["partition"] for v in self.verdicts if not v.get("passed", False)]
