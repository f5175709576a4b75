"""Constraint-check registry — the engine's user-extension surface.

The reference's extension surface is a chain of pipeline-step methods
(`step1..step7` on `EndToEndPipeline`, `end_to_end_prediction.py:216-535`).
Here checks are first-class, composable objects (SURVEY.md §2.10): each
check declares the columns it needs, computes mergeable partials inside
``map_batches``, merges them, renders per-partition verdicts against
tolerances, and can extract exact violation rows.
"""

from .base import CheckResult, Tolerance
from .stats import column_stats

__all__ = ["CheckResult", "Tolerance", "column_stats"]
