"""Distributed per-column statistics — the engine's core stats suite.

Reference analogs: array summary stats ``mean/std/min/max``
(`mlflow_utils.py:79-93`), null-drop projections
(`models/feature_extraction.py:79`), exact global percentile
(`end_to_end_prediction.py:447`) and the distinct-template set
(`models/preprocessing.py:7`). All are re-expressed as ONE pass of
mergeable partials:

    ds.map_batches(partials)                 # tiny rows: (part, col) → moments + sketches
      .groupby(["part", "column"]).map_groups(merge)   # kilobyte shuffle

- count / nulls / min / max: exact.
- mean / std: exact via Chan et al. parallel (count, mean, M2) merge —
  numerically stable, order-independent.
- distinct: HyperLogLog (exact distinct would shuffle every row).
- p50/p95/p99: KLL sketch (exact global quantiles don't stream).
- optional fixed-bin histogram partial for the drift snapshot.

String columns: numeric stats/KLL run over ``utf8_length(col)``;
``smin``/``smax`` hold the lexicographic min/max of the raw strings.
Timestamps are cast to epoch microseconds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches import HyperLogLog, KLL
from ..sketches.histogram import FixedHistogram
from ..sketches.hll import hash64_arrow

PARTIAL_SCHEMA = pa.schema(
    [
        ("part", pa.string()),
        ("column", pa.string()),
        ("dtype", pa.string()),
        ("count", pa.int64()),
        ("nulls", pa.int64()),
        ("nmean", pa.float64()),
        ("m2", pa.float64()),
        ("vmin", pa.float64()),
        ("vmax", pa.float64()),
        ("smin", pa.string()),
        ("smax", pa.string()),
        ("hll", pa.binary()),
        ("kll", pa.binary()),
        ("hist", pa.binary()),
    ]
)


def partition_key_array(batch: pa.Table, partition_by: list[str]) -> np.ndarray:
    """String partition key per row, e.g. 'python|small'. Vectorized."""
    parts = [pc.cast(batch[c], pa.string()) for c in partition_by]
    if len(parts) == 1:
        key = parts[0]
    else:
        key = pc.binary_join_element_wise(*parts, "|", null_handling="replace", null_replacement="<null>")
    return np.asarray(pc.fill_null(key, "<null>"))


def _numeric_view(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """→ (float64 values with NaN at nulls, valid bool mask, raw strings or None)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    valid = np.asarray(pc.is_valid(arr))
    t = arr.type
    strings = None
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        strings = arr.to_numpy(zero_copy_only=False)
        lengths = pc.utf8_length(arr)
        vals = np.asarray(pc.cast(lengths, pa.float64())).astype(np.float64)
    elif pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t):
        vals = np.asarray(pc.cast(arr, pa.int64())).astype(np.float64)
    elif pa.types.is_boolean(t):
        vals = np.asarray(pc.cast(arr, pa.float64())).astype(np.float64)
    else:
        vals = np.asarray(pc.cast(arr, pa.float64())).astype(np.float64)
    vals = np.where(valid, vals, np.nan)
    return vals, valid, strings


def make_stats_partial_fn(
    columns: list[str],
    partition_by: list[str] | None = None,
    hll_p: int = 12,
    kll_k: int = 256,
    hist_edges: dict[str, np.ndarray] | None = None,
):
    """Build the map_batches partial function (stateless; cheap closures)."""
    hist_edges = hist_edges or {}

    def partials(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if partition_by:
            keys = partition_key_array(batch, partition_by)
            uniq, inv = np.unique(keys, return_inverse=True)
        else:
            uniq, inv = np.array([""], dtype=object), np.zeros(n, dtype=np.int64)

        out: dict[str, list] = {f.name: [] for f in PARTIAL_SCHEMA}
        for c in columns:
            col = batch[c]
            vals, valid, strings = _numeric_view(col)
            # hash the whole column ONCE (vectorized; strings via polars
            # xxhash), then slice per group — never per-row Python hashing
            col_hashes = hash64_arrow(col)
            dtype = str(col.type)
            for g, part in enumerate(uniq):
                m = inv == g
                gv = vals[m]
                gvalid = valid[m]
                gclean = gv[gvalid]
                ghashes = col_hashes[m][gvalid]
                cnt, nulls = int(m.sum()), int((~gvalid).sum())
                if gclean.size:
                    nmean = float(gclean.mean())
                    m2 = float(((gclean - nmean) ** 2).sum())
                    vmin, vmax = float(gclean.min()), float(gclean.max())
                else:
                    nmean = m2 = 0.0
                    vmin, vmax = np.nan, np.nan
                if strings is not None:
                    gs = strings[m][gvalid]
                    smin = str(gs.min()) if gs.size else None
                    smax = str(gs.max()) if gs.size else None
                else:
                    smin = smax = None
                hll = HyperLogLog(hll_p).update_hashed(ghashes)
                kll = KLL(kll_k).update(gclean)
                hist = None
                if c in hist_edges:
                    hist = FixedHistogram(hist_edges[c]).update(gclean).to_bytes()
                out["part"].append(str(part))
                out["column"].append(c)
                out["dtype"].append(dtype)
                out["count"].append(cnt)
                out["nulls"].append(nulls)
                out["nmean"].append(nmean)
                out["m2"].append(m2)
                out["vmin"].append(vmin)
                out["vmax"].append(vmax)
                out["smin"].append(smin)
                out["smax"].append(smax)
                out["hll"].append(hll.to_bytes())
                out["kll"].append(kll.to_bytes())
                out["hist"].append(hist)
        return pa.Table.from_pydict(out, schema=PARTIAL_SCHEMA)

    return partials


def merge_partial_rows(tb: pa.Table) -> pa.Table:
    """Combine partial rows within one block: one PARTIAL row per
    (part, column) present — the intermediate level of the tree reduce.
    Keeps the PARTIAL_SCHEMA so merges stay associative."""
    if tb.num_rows == 0:
        return tb
    df = tb.to_pandas()
    out: dict[str, list] = {f.name: [] for f in PARTIAL_SCHEMA}
    for (part, col), g in df.groupby(["part", "column"], sort=False):
        count = int(g["count"].sum())
        nulls = int(g["nulls"].sum())
        mean = 0.0
        m2 = 0.0
        seen = 0
        for _, r in g.iterrows():
            nb = int(r["count"]) - int(r["nulls"])
            if nb == 0:
                continue
            delta = r["nmean"] - mean
            tot = seen + nb
            mean += delta * nb / tot
            m2 += r["m2"] + delta * delta * seen * nb / tot
            seen = tot
        hll = kll = hist = None
        for _, r in g.iterrows():
            h = HyperLogLog.from_bytes(r["hll"])
            hll = h if hll is None else hll.merge(h)
            k = KLL.from_bytes(r["kll"])
            kll = k if kll is None else kll.merge(k)
            if r["hist"] is not None:
                fh = FixedHistogram.from_bytes(r["hist"])
                hist = fh if hist is None else hist.merge(fh)
        smins = [s for s in g["smin"] if s is not None]
        smaxs = [s for s in g["smax"] if s is not None]
        out["part"].append(part)
        out["column"].append(col)
        out["dtype"].append(g["dtype"].iloc[0])
        out["count"].append(count)
        out["nulls"].append(nulls)
        out["nmean"].append(mean)
        out["m2"].append(m2)
        out["vmin"].append(float(np.nanmin(g["vmin"].values)) if seen else np.nan)
        out["vmax"].append(float(np.nanmax(g["vmax"].values)) if seen else np.nan)
        out["smin"].append(min(smins) if smins else None)
        out["smax"].append(max(smaxs) if smaxs else None)
        out["hll"].append(hll.to_bytes() if hll else HyperLogLog().to_bytes())
        out["kll"].append(kll.to_bytes() if kll else KLL().to_bytes())
        out["hist"].append(hist.to_bytes() if hist else None)
    return pa.Table.from_pydict(out, schema=PARTIAL_SCHEMA)


def merge_stats_group(df: pd.DataFrame) -> pd.DataFrame:
    """Merge all partial rows of one (part, column) group → one stats row.

    Chan et al. (1979) parallel mean/M2 merge; sketch merges are
    associative, so merge order doesn't matter.
    """
    count = int(df["count"].sum())
    nulls = int(df["nulls"].sum())
    n_valid = count - nulls

    mean = 0.0
    m2 = 0.0
    seen = 0
    for _, r in df.iterrows():
        nb = int(r["count"]) - int(r["nulls"])
        if nb == 0:
            continue
        delta = r["nmean"] - mean
        tot = seen + nb
        mean += delta * nb / tot
        m2 += r["m2"] + delta * delta * seen * nb / tot
        seen = tot

    std = float(np.sqrt(m2 / (n_valid - 1))) if n_valid > 1 else 0.0

    vmin = float(np.nanmin(df["vmin"].values)) if n_valid else np.nan
    vmax = float(np.nanmax(df["vmax"].values)) if n_valid else np.nan
    smins = [s for s in df["smin"] if s is not None]
    smaxs = [s for s in df["smax"] if s is not None]

    hll = None
    kll = None
    hist = None
    for _, r in df.iterrows():
        h = HyperLogLog.from_bytes(r["hll"])
        hll = h if hll is None else hll.merge(h)
        k = KLL.from_bytes(r["kll"])
        kll = k if kll is None else kll.merge(k)
        if r["hist"] is not None:
            fh = FixedHistogram.from_bytes(r["hist"])
            hist = fh if hist is None else hist.merge(fh)

    return pd.DataFrame(
        [
            {
                "part": df["part"].iloc[0],
                "column": df["column"].iloc[0],
                "dtype": df["dtype"].iloc[0],
                "count": count,
                "nulls": nulls,
                "null_rate": nulls / count if count else 0.0,
                "distinct_est": hll.estimate() if hll else 0.0,
                "vmin": vmin,
                "vmax": vmax,
                "mean": float(mean) if n_valid else np.nan,
                "std": std,
                "p50": kll.quantile(0.5) if kll else np.nan,
                "p95": kll.quantile(0.95) if kll else np.nan,
                "p99": kll.quantile(0.99) if kll else np.nan,
                "smin": min(smins) if smins else None,
                "smax": max(smaxs) if smaxs else None,
                "hll": hll.to_bytes() if hll else None,
                "kll": kll.to_bytes() if kll else None,
                "hist": hist.to_bytes() if hist else None,
            }
        ]
    )


def column_stats(
    ds,
    columns: list[str] | None = None,
    partition_by: list[str] | None = None,
    hll_p: int = 12,
    kll_k: int = 256,
    hist_edges: dict[str, np.ndarray] | None = None,
    batch_size: int | None = 8192,
):
    """Full stats suite as a Dataset → Dataset of one row per (part, column).

    The input dataset streams once; only kilobyte-scale partials shuffle.
    """
    from .. import tune_shuffle_to_cluster

    tune_shuffle_to_cluster()
    if columns is None:
        columns = [f.name for f in ds.schema().base_schema]
    need = list(dict.fromkeys(columns + (partition_by or [])))
    ds = ds.select_columns(need)  # prune before the scan fans out (M6 analog)
    partials = ds.map_batches(
        make_stats_partial_fn(columns, partition_by, hll_p, kll_k, hist_edges),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    # TREE reduce, not a keyed shuffle: partial rows are kilobytes per
    # block, so a fan-in repartition + within-block associative merge +
    # driver-side final merge beats shuffling 600-row tables through
    # aggregator actors (measured: the keyed shuffle ALONE cost more than
    # the whole scan at 32 CPUs). Driver sees fan_in × groups rows only.
    fan_in = 8
    level2 = partials.repartition(num_blocks=fan_in).map_batches(
        merge_partial_rows, batch_format="pyarrow", batch_size=None
    )
    import ray
    import ray.data as rd

    l2_tables = [t for t in ray.get(level2.to_arrow_refs()) if t.num_rows]
    if l2_tables:
        all_partials = pa.concat_tables(l2_tables).to_pandas()
    else:
        all_partials = pa.Table.from_pydict(
            {f.name: [] for f in PARTIAL_SCHEMA}, schema=PARTIAL_SCHEMA
        ).to_pandas()
    finals = [
        merge_stats_group(g) for _, g in all_partials.groupby(["part", "column"], sort=True)
    ]
    out = (
        pd.concat(finals, ignore_index=True)
        if finals
        else merge_stats_group(all_partials) if len(all_partials) else pd.DataFrame()
    )
    return rd.from_pandas(out) if len(out) else rd.from_items([])
