"""Sources: parquet corpus readers (column-pruned) and the BGL-style raw
log-line reader (reference parity, `models/drain.py:11-21`)."""

from .readers import read_table

__all__ = ["read_table"]
