"""Run-state bookkeeping: per-check checkpoints, lineage, metrics."""

from .checkpoint import RunState

__all__ = ["RunState"]
