"""Distribution-drift detection: PSI + KS per partition vs a baseline
snapshot, plus a per-row drift scorer actor pool.

Reference analog: the SimCLR/VAE scorers load trained weights once per
process and score every row (``models/SimCLR_utils.py:142-161``,
``models/VAE_utils.py:214-235``); the anomaly verdict thresholds the score
(``end_to_end_prediction.py:447-451``). Here the "model" is a baseline
snapshot (per-partition histograms + KLL sketches written by
:func:`write_snapshot`), loaded ONCE per actor in ``__init__``; drifted
partitions are the anomaly signal.

Partition-level scoring (PSI/KS over merged histograms) runs driver-side on
the tiny merged stats table; row-level scoring streams through the actor
pool.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..sketches import KLL
from ..sketches.histogram import FixedHistogram, ks_statistic, psi


def write_snapshot(stats_df: pd.DataFrame, path: str) -> None:
    """Persist the merged stats table (checks/stats.py output, including
    sketch/hist bytes) as the immutable baseline artifact."""
    # dtype rides along so schema drift can diff the live schema against
    # the snapshot (checks/schema.py:spec_from_stats)
    cols = ["part", "column", "dtype", "count", "nulls", "hll", "kll", "hist"]
    # reindex, not []: an EMPTY corpus round-trips through Ray as a
    # column-less frame (round-5 review — write_baseline raised KeyError
    # instead of writing an empty snapshot, breaking the suite's own
    # empty-corpus-flows-through contract)
    tbl = pa.Table.from_pandas(stats_df.reindex(columns=cols), preserve_index=False)
    pq.write_table(tbl, path)


def load_snapshot(path: str) -> pd.DataFrame:
    return pq.read_table(path).to_pandas()


def partition_drift(
    current: pd.DataFrame,
    baseline: pd.DataFrame,
    column: str,
    psi_threshold: float = 0.25,
    ks_threshold: float = 0.2,
) -> pd.DataFrame:
    """Per-partition (psi, ks, passed) for one column vs baseline.

    Partitions present on one side only fail loudly (coverage drift) —
    the engine never silently passes an empty side (cf. the empty-histogram
    PSI pitfall found in verification).
    """
    cur = current[current["column"] == column].set_index("part")
    base = baseline[baseline["column"] == column].set_index("part")
    rows = []
    for part in sorted(set(cur.index) | set(base.index)):
        in_cur, in_base = part in cur.index, part in base.index
        if not (in_cur and in_base):
            rows.append(
                {
                    "part": part,
                    "column": column,
                    "psi": float("inf"),
                    "ks": float("inf"),
                    "passed": False,
                    "reason": "missing_in_current" if not in_cur else "missing_in_baseline",
                }
            )
            continue
        cb, bb = cur.loc[part, "hist"], base.loc[part, "hist"]
        if cb is None or bb is None:
            # the column was profiled without hist_edges: say so instead
            # of an opaque pickle TypeError after the expensive scans
            raise ValueError(
                f"no histogram recorded for column {column!r} in the "
                f"{'current' if cb is None else 'baseline'} stats — add the column to "
                "hist_edges when profiling"
            )
        ch = FixedHistogram.from_bytes(cb)
        bh = FixedHistogram.from_bytes(bb)
        p, k = psi(bh, ch), ks_statistic(bh, ch)
        rows.append(
            {
                "part": part,
                "column": column,
                "psi": p,
                "ks": k,
                "passed": bool(p <= psi_threshold and k <= ks_threshold),
                "reason": "",
            }
        )
    return pd.DataFrame(rows)


class RowDriftScorer:
    """Actor-pool stage: per-row anomaly score = two-sided tail mass of the
    row's content length under its partition's BASELINE KLL sketch.

    ``__init__`` loads the snapshot once per actor (T2-T4 pattern,
    ``models/feature_extraction.py:37-43``); ``__call__`` scores batches
    vectorized. Score = 2*|rank - 0.5| ∈ [0,1]; rows in distribution tails
    score near 1 — the analog of the reference's per-row anomaly score
    (``end_to_end_prediction.py:444``).
    """

    def __init__(
        self,
        snapshot_path: str,
        column: str,
        partition_by: str = "lang",
        out_col: str = "drift_score",
    ):
        snap = load_snapshot(snapshot_path)
        snap = snap[snap["column"] == column]
        # pre-sort each partition's weighted sample ONCE per actor (the
        # class contract): the (values, cumulative-weight) pairs are
        # immutable, and re-deriving them inside every batch's partition
        # loop re-ran the sketch sort thousands of times on the hot
        # scoring path (round-5 review)
        self.lookup: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for _, r in snap.iterrows():
            if r["kll"] is None:
                continue
            v, w = KLL.from_bytes(r["kll"])._weighted()
            if v.size:
                self.lookup[r["part"]] = (v, np.cumsum(w))
        self.column, self.partition_by, self.out_col = column, partition_by, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.column].combine_chunks()
        t = col.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            vals = np.asarray(pc.cast(pc.utf8_length(col), pa.float64()))
        else:
            vals = np.asarray(pc.cast(col, pa.float64()))
        parts = np.asarray(pc.fill_null(pc.cast(batch[self.partition_by], pa.string()), "<null>"))
        scores = np.ones(len(vals))  # unknown partition → max surprise
        for part in np.unique(parts):
            hit = self.lookup.get(part)
            if hit is None:
                continue
            m = parts == part
            # vectorized rank lookup against the sketch's weighted sample
            v, cum = hit
            idx = np.searchsorted(v, vals[m], side="right")
            ranks = np.where(idx > 0, cum[np.clip(idx - 1, 0, len(cum) - 1)], 0) / cum[-1]
            scores[m] = 2.0 * np.abs(ranks - 0.5)
        # a null (or NaN) value has NO rank under a baseline that was
        # built excluding nulls: score null, not 1.0 — searchsorted
        # places NaN past the end, which silently branded every null row
        # a maximal-tail anomaly (round-5 review)
        unscorable = np.isnan(vals)
        return batch.append_column(
            self.out_col, pa.array(scores, type=pa.float64(), mask=unscorable)
        )
