"""Exact deduplication: content-hash partition + keep-first.

Pattern (ray_guide): add a 128-bit vectorized content hash in a
map_batches (two independent polars xxhash64 lanes — the per-row Python
sha256 this replaced dominated the whole dedup pass), shuffle ONLY
(h1, h2, id) triples — the wide text column never moves — take min(id)
per hash, broadcast the survivor-id set, stream-filter.
"""

from __future__ import annotations

from ..functions.relational import broadcast_value_filter
from ..functions.shuffle import grouped_min
from ..functions.text import content_hash128_batch


def exact_dedup(ds, id_col: str, text_col: str, driver_merge_max_bytes: int = 1 << 30):
    """Survivors: the min-id row of every distinct text value.

    One group per distinct text → high-cardinality, so survivor selection
    uses the hash-shuffle + per-block local min (functions/shuffle.py),
    never ``groupby().aggregate()``'s per-group Python path.

    Cost-based plan choice: when the INPUT's metadata size estimate is
    under ``driver_merge_max_bytes``, the (h1, h2, id) triples — tiny
    relative to the text — stream to one driver-side polars group-min
    instead, skipping the hash shuffle's fixed aggregator-actor spawn
    (~4 s at 32 CPUs, which dwarfs small corpora)."""
    fp = ds.map_batches(
        lambda t: content_hash128_batch(t, text_col),
        batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    pairs = fp.select_columns(["h1", "h2", id_col])
    est = None
    try:
        est = ds.size_bytes()  # parquet-metadata estimate; no execution
    except Exception:
        pass
    if est is not None and est <= driver_merge_max_bytes:
        import polars as pl
        import pyarrow as pa

        tabs = [
            t for t in pairs.iter_batches(batch_format="pyarrow", batch_size=None) if t.num_rows
        ]
        if not tabs:
            return ds.limit(0)
        keep = (
            pl.from_arrow(pa.concat_tables(tabs, promote_options="default"))
            .group_by(["h1", "h2"])
            .agg(pl.col(id_col).min().alias("keep_id"))["keep_id"]
            .to_numpy()
        )
    else:
        keep = grouped_min(pairs, ["h1", "h2"], id_col, "keep_id").to_pandas()["keep_id"].to_numpy()
    return broadcast_value_filter(ds, id_col, keep, keep=True)
