"""SemDeDup — semantic deduplication via cluster-then-compare
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication").

The published recipe for embedding-space dedup at corpus scale: k-means
the embeddings, then compare pairs ONLY within a cluster — the
within-cluster pairwise cost is (n/k)² per cluster instead of n² global,
and the approximation (cross-cluster duplicates are missed) is the
published trade-off. Complements the engine's hyperplane-LSH embedding
dedup (dedup/neardup.py:embedding_neardup_pairs) with the
cluster-partitioned shape: LSH recalls pairs by random projections,
SemDeDup by k-means locality.

Ray-Data-first plan:

1. ``kmeans_fit`` — the engine's full-corpus distributed Lloyd
   iterations (streaming k×d partials; functions/similarity.py).
2. ``kmeans_assign`` — centers broadcast once via ``ray.put``, one
   matmul per batch appends the cluster id.
3. ONE co-locating exchange (``local_group_map`` on the cluster id —
   a range-partition sort, skew-safe), then per cluster: rows
   L2-normalize, the gram matrix computes in ~64 MB panels, pairs with
   cosine ≥ threshold close into connected components (union-find over
   the verified edges — bounded, block-local, the same acceptance as
   dedup/distributed._block_forest), and every component keeps ONE
   survivor.

Survivor policy: ``keep="min_id"`` (default; deterministic and
oracle-friendly — matches every other dedup family in this engine) or
``keep="far_from_centroid"`` (the paper's choice: within a duplicate
component keep the member LEAST similar to its cluster centroid, which
preserves diversity; ties break on min id).

Reference analog: the AnomalyDetection reference has no embedding dedup
(its only content lookup is the frequency semi-join at
``models/preprocessing.py:7-10``); this operator is engine-completeness
for the 100 TB training-data brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_PANEL_BYTES = 64 << 20


def _component_survivors(
    ids: np.ndarray, x: np.ndarray, center: np.ndarray, threshold: float, keep: str
) -> np.ndarray:
    """Boolean keep-mask for one cluster: close cosine-≥-threshold pairs
    into components, keep one member per component."""
    n = len(ids)
    if n <= 1:
        return np.ones(n, dtype=bool)
    norms = np.linalg.norm(x, axis=1)
    safe = np.where(norms > 0, norms, 1.0)
    u = x / safe[:, None]
    parent = np.arange(n, dtype=np.int64)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    # gram in row panels so a big cluster never allocates n² floats at once
    rows_per_panel = max(1, _PANEL_BYTES // (8 * n))
    for s in range(0, n, rows_per_panel):
        e = min(n, s + rows_per_panel)
        sim = u[s:e] @ u.T
        ai, bj = np.nonzero(sim >= threshold)
        ai = ai + s
        m = ai < bj  # upper triangle only
        for a, b in zip(ai[m], bj[m]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)
    if keep == "min_id":
        # survivor = member with the smallest id in its component
        order = np.lexsort((ids, roots))
    else:  # far_from_centroid: least centroid-similar member survives
        cn = float(np.linalg.norm(center))
        csim = (u @ center) / (cn if cn > 0 else 1.0)
        order = np.lexsort((ids, csim, roots))
    first = np.zeros(n, dtype=bool)
    seen_roots = roots[order]
    newgrp = np.empty(n, dtype=bool)
    newgrp[0] = True
    newgrp[1:] = seen_roots[1:] != seen_roots[:-1]
    first[order[newgrp]] = True
    return first


def semdedup(
    ds,
    id_col: str,
    vec_col: str = "embedding",
    k: int = 64,
    threshold: float = 0.95,
    iters: int = 10,
    seed: int = 42,
    keep: str = "min_id",
    cluster_col: str = "cluster",
    centers: np.ndarray | None = None,
):
    """Semantic dedup: drop all but one member of every within-cluster
    group of embeddings with pairwise cosine ≥ ``threshold``. Returns a
    lazy Dataset of the surviving rows (all input columns plus
    ``cluster_col``). Pass precomputed ``centers`` to skip the k-means
    fit (e.g. reuse an IVF index's centroids)."""
    import ray

    from ..functions.shuffle import arrow_schema, local_group_map
    from ..functions.similarity import kmeans_assign, kmeans_fit
    from ..functions.vector import list_column_to_matrix

    if keep not in ("min_id", "far_from_centroid"):
        raise ValueError(f"keep must be 'min_id' or 'far_from_centroid', got {keep!r}")
    # arrow_schema, not schema().base_schema: pandas-backed datasets
    # surface a PandasBlockSchema namedtuple there (round-5 review)
    in_names = {f.name for f in arrow_schema(ds)}
    if cluster_col in in_names:
        # same up-front check as the join family: appending a duplicate
        # field otherwise crashes deep inside execution with a KeyError
        raise ValueError(
            f"cluster_col {cluster_col!r} already exists in the input; pass a different name"
        )
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if centers is None:
        centers, _, _ = kmeans_fit(ds, id_col, vec_col, k=k, iters=iters, seed=seed)
    centers = np.asarray(centers, dtype=np.float64)
    assigned = kmeans_assign(ds, centers, vec_col=vec_col, out_col=cluster_col)
    cref = ray.put(centers)

    def dedup_block(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return tb
        if tb[id_col].null_count or tb[vec_col].null_count:
            raise ValueError("semdedup: null ids or embeddings")
        c = ray.get(cref)
        cl = tb[cluster_col].to_numpy(zero_copy_only=False)
        # ids are only an ordering key for the survivor policy — keep
        # their native type (string/UUID ids are first-class across the
        # dedup family; a hard int64 cast crashed deep inside execution)
        ids = tb[id_col].to_numpy(zero_copy_only=False)
        x = list_column_to_matrix(tb[vec_col])
        keep_mask = np.ones(tb.num_rows, dtype=bool)
        order = np.argsort(cl, kind="stable")
        bounds = np.flatnonzero(np.diff(cl[order])) + 1
        for seg in np.split(order, bounds):
            g = int(cl[seg[0]])
            keep_mask[seg] = _component_survivors(ids[seg], x[seg], c[g], threshold, keep)
        return tb.filter(pa.array(keep_mask))

    return local_group_map(assigned, [cluster_col], dedup_block, keys_non_null=True)
