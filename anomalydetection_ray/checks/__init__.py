"""Constraint-check registry — the engine's user-extension surface.

The reference's extension surface is a chain of pipeline-step methods
(`step1..step7` on `EndToEndPipeline`, `end_to_end_prediction.py:216-535`).
Here constraints are first-class, composable objects (SURVEY.md §2.10):
a :class:`Tolerance` bounds any statistic the suite's fused scan already
computes, per partition and column, and renders as verdict rows without
adding a scan (see checks/base.py).
"""

from .base import Tolerance
from .stats import column_stats

__all__ = ["Tolerance", "column_stats"]
