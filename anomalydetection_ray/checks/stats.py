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


class StatsAccumulator:
    """Incremental merge of PARTIAL rows for one (part, column) group.

    Chan et al. (1979) parallel mean/M2 merge; sketch merges are
    associative, so merge order doesn't matter — the driver can stream
    partial blocks in any order with constant memory per group."""

    __slots__ = ("dtype", "count", "nulls", "mean", "m2", "seen", "vmin", "vmax", "smin", "smax", "hll", "kll", "hist")

    def __init__(self):
        self.dtype = None
        self.count = 0
        self.nulls = 0
        self.mean = 0.0
        self.m2 = 0.0
        self.seen = 0
        self.vmin = np.nan
        self.vmax = np.nan
        self.smin = None
        self.smax = None
        self.hll = None
        self.kll = None
        self.hist = None

    def add(self, r: dict) -> None:
        self.dtype = self.dtype or r["dtype"]
        self.count += int(r["count"])
        self.nulls += int(r["nulls"])
        nb = int(r["count"]) - int(r["nulls"])
        if nb:
            delta = r["nmean"] - self.mean
            tot = self.seen + nb
            self.mean += delta * nb / tot
            self.m2 += r["m2"] + delta * delta * self.seen * nb / tot
            self.seen = tot
            self.vmin = np.nanmin([self.vmin, r["vmin"]])
            self.vmax = np.nanmax([self.vmax, r["vmax"]])
        if r["smin"] is not None:
            self.smin = r["smin"] if self.smin is None else min(self.smin, r["smin"])
        if r["smax"] is not None:
            self.smax = r["smax"] if self.smax is None else max(self.smax, r["smax"])
        h = HyperLogLog.from_bytes(r["hll"])
        self.hll = h if self.hll is None else self.hll.merge(h)
        k = KLL.from_bytes(r["kll"])
        self.kll = k if self.kll is None else self.kll.merge(k)
        if r["hist"] is not None:
            fh = FixedHistogram.from_bytes(r["hist"])
            self.hist = fh if self.hist is None else self.hist.merge(fh)

    def final(self, part: str, column: str) -> dict:
        n_valid = self.seen
        std = float(np.sqrt(self.m2 / (n_valid - 1))) if n_valid > 1 else 0.0
        return {
            "part": part,
            "column": column,
            "dtype": self.dtype,
            "count": self.count,
            "nulls": self.nulls,
            "null_rate": self.nulls / self.count if self.count else 0.0,
            "distinct_est": self.hll.estimate() if self.hll else 0.0,
            "vmin": self.vmin if n_valid else np.nan,
            "vmax": self.vmax if n_valid else np.nan,
            "mean": float(self.mean) if n_valid else np.nan,
            "std": std,
            "p50": self.kll.quantile(0.5) if self.kll else np.nan,
            "p95": self.kll.quantile(0.95) if self.kll else np.nan,
            "p99": self.kll.quantile(0.99) if self.kll else np.nan,
            "smin": self.smin,
            "smax": self.smax,
            "hll": self.hll.to_bytes() if self.hll else None,
            "kll": self.kll.to_bytes() if self.kll else None,
            "hist": self.hist.to_bytes() if self.hist else None,
        }


def column_stats(
    ds,
    columns: list[str] | None = None,
    partition_by: list[str] | None = None,
    hll_p: int = 12,
    kll_k: int = 256,
    hist_edges: dict[str, np.ndarray] | None = None,
    batch_size: int | None = 8192,
    tree_fan_in: int | None = None,
):
    """Full stats suite as a Dataset → Dataset of one row per (part, column).

    The input dataset streams once; NO keyed shuffle anywhere. Per-block
    partial rows (one per (partition, column) per block — kilobytes)
    stream back to the driver via ``iter_batches`` and merge into a
    constant-memory :class:`StatsAccumulator` per group. The merge is
    associative, so arrival order is irrelevant.

    ``tree_fan_in``: for extreme block counts (≳10^5 blocks, where
    blocks × groups driver work would dominate), insert a repartition
    tree level that pre-merges partials ``fan_in``-ways before they reach
    the driver. Off by default — measured: the repartition's shuffle costs
    more than it saves below ~10^4 blocks.
    """
    from .. import tune_shuffle_to_cluster

    tune_shuffle_to_cluster()
    if columns is None:
        columns = [f.name for f in ds.schema().base_schema]
    need = list(dict.fromkeys(columns + (partition_by or [])))
    from ..functions.shuffle import select_if_needed

    # prune before the scan fans out (M6 analog); skipped when the read is
    # already pruned — a no-op Project would break read->map fusion
    ds = select_if_needed(ds, need)
    partials = ds.map_batches(
        make_stats_partial_fn(columns, partition_by, hll_p, kll_k, hist_edges),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    if tree_fan_in:
        partials = partials.repartition(num_blocks=tree_fan_in).map_batches(
            merge_partial_rows, batch_format="pyarrow", batch_size=None
        )

    import ray.data as rd

    out = merge_partials_to_stats(
        partials.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return rd.from_pandas(out) if len(out) else rd.from_items([])


def stats_partial_table(
    ds,
    columns: list[str],
    partition_by: list[str] | None = None,
    hll_p: int = 12,
    kll_k: int = 256,
    hist_edges: dict[str, np.ndarray] | None = None,
    batch_size: int | None = None,
) -> pa.Table:
    """One PARTIAL_SCHEMA table for a dataset slice — the checkpointable
    unit of the sharded stats pass (pipelines/validate.py): partial tables
    from different shard groups merge associatively at any later time."""
    from ..functions.shuffle import select_if_needed

    need = list(dict.fromkeys(columns + (partition_by or [])))
    partials = select_if_needed(ds, need).map_batches(
        make_stats_partial_fn(columns, partition_by, hll_p, kll_k, hist_edges),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    tabs = [
        tb
        for tb in partials.iter_batches(batch_format="pyarrow", batch_size=None)
        if tb.num_rows
    ]
    if not tabs:
        return pa.Table.from_pydict({f.name: [] for f in PARTIAL_SCHEMA}, schema=PARTIAL_SCHEMA)
    return pa.concat_tables(tabs).cast(PARTIAL_SCHEMA)


def merge_partials_to_stats(partial_tables) -> pd.DataFrame:
    """Associatively merge PARTIAL_SCHEMA tables (any order, any grouping)
    into the final one-row-per-(part, column) stats frame."""
    accs: dict[tuple, StatsAccumulator] = {}
    for tb in partial_tables:
        for r in tb.to_pylist():
            accs.setdefault((r["part"], r["column"]), StatsAccumulator()).add(r)
    rows = [acc.final(p, c) for (p, c), acc in sorted(accs.items())]
    return pd.DataFrame(rows)
