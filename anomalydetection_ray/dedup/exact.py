"""Exact deduplication: content-hash partition + keep-first.

Pattern (ray_guide): add a sha256 fingerprint in a vectorized map_batches,
shuffle ONLY (fingerprint, id) pairs — the wide text column never moves —
take min(id) per fingerprint, broadcast the survivor-id set, stream-filter.
"""

from __future__ import annotations

from ..functions.relational import broadcast_value_filter
from ..functions.shuffle import grouped_min
from ..functions.text import fingerprint_batch


def exact_dedup(ds, id_col: str, text_col: str):
    """Survivors: the min-id row of every distinct text value.

    One group per distinct text → high-cardinality, so survivor selection
    uses the hash-shuffle + per-block local min (functions/shuffle.py),
    never ``groupby().aggregate()``'s per-group Python path."""
    fp = ds.map_batches(
        lambda t: fingerprint_batch(t, text_col=text_col),
        batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    pairs = fp.select_columns(["fingerprint", id_col])
    keep = grouped_min(pairs, ["fingerprint"], id_col, "keep_id").to_pandas()["keep_id"].to_numpy()
    return broadcast_value_filter(ds, id_col, keep, keep=True)
