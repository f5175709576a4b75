"""Broadcast relational building blocks: value-set filters, frequency
filters, and broadcast hash joins.

Reference parity: the frequency semi-join
``keys = value_counts(); data[data[col].isin(keys)]``
(``models/preprocessing.py:4-13``, threshold default 5 at
``end_to_end_prediction.py:677``) — re-expressed as an exact distributed
count with a map-side combiner followed by a broadcast membership filter.
The small side always travels through the object store once (``ray.put``),
never per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..checks.uniqueness import key_counts


def broadcast_value_filter(ds, col: str, values, keep: bool = True):
    """Stream-filter rows by membership of `col` in a broadcast value set."""
    import ray

    arr = np.sort(np.asarray(list(values) if isinstance(values, (set, frozenset)) else values))
    ref = ray.put(arr)

    def probe(batch: pa.Table) -> pa.Table:
        vals_sorted = ray.get(ref)
        col_arr = batch[col].combine_chunks()
        vals = np.asarray(col_arr)
        valid = np.asarray(pc.is_valid(col_arr))
        present = np.zeros(len(vals), dtype=bool)
        if len(vals_sorted) and valid.any():
            idx = np.clip(np.searchsorted(vals_sorted, vals[valid]), 0, len(vals_sorted) - 1)
            present[valid] = vals_sorted[idx] == vals[valid]
        return batch.filter(pa.array(present if keep else ~present))

    return ds.map_batches(probe, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def frequency_filter(ds, col: str, min_count: int):
    """Keep rows whose `col` value occurs more than `min_count` times
    (strict >, matching ``models/preprocessing.py:7-10``)."""
    counts = key_counts(ds, [col]).to_pandas()
    keep = counts.loc[counts["cnt"] > min_count, col].to_numpy()
    return broadcast_value_filter(ds, col, keep, keep=True)


def broadcast_join(fact_ds, fact_key: str, dim, dim_key: str, how: str = "inner"):
    """Join a streaming fact Dataset against a small dim table.

    Arrow-native: the dim (pandas DataFrame or pyarrow Table) ships once
    as an Arrow table via ``ray.put``; every batch runs ONE vectorized
    polars hash join on the zero-copy Arrow block — no pandas round-trip
    in the hot path (the round-1 version converted Arrow→pandas→Arrow per
    batch). ``how`` ∈ {"inner", "left"}; the dim key column is dropped
    from the output (standard join semantics — it equals the fact key on
    matches). For dim sides too large to broadcast, use a partitioned
    hash join (bucket both sides) instead — see SURVEY.md §7.3.
    """
    import polars as pl
    import ray

    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    dim_tbl = pa.Table.from_pandas(dim, preserve_index=False) if isinstance(dim, pd.DataFrame) else dim
    ref = ray.put(dim_tbl)

    dim_out = [f for f in dim_tbl.schema if f.name != dim_key]

    def join(batch: pa.Table) -> pa.Table:
        d = pl.from_arrow(ray.get(ref))
        out = pl.from_arrow(batch).join(
            d, left_on=fact_key, right_on=dim_key, how=how, coalesce=True
        )
        # stable output schema: fact columns keep their exact types,
        # dim columns theirs (polars round-trips string → large_string)
        want = pa.schema(list(batch.schema) + dim_out)
        return out.select([f.name for f in want]).to_arrow().cast(want)

    return fact_ds.map_batches(join, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
