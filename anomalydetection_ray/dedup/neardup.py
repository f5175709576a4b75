"""Near-duplicate detection: MinHash+LSH, exact n-gram Jaccard verify,
SimHash Hamming blocking, and embedding-cosine LSH.

Not present in the reference (no dedup at all — SURVEY.md §2.7); these are
first-class training-data operators of this engine.

Scale shape (100 TB):
- signatures are computed in a stateful actor pool (`MinHasher` /
  hyperplanes built once per actor, ``models/feature_extraction.py:37-43``
  analog) over zero-copy Arrow batches;
- ONLY (id, band, key) int64 triples shuffle — never text/embeddings;
- bucket groups emit candidate EDGES (id -> bucket-min) via ``map_groups``,
  so the all-to-all moves kilobytes per million rows;
- the tail (verify + cluster + drop) is COST-BASED (``_dedup_via_edges``):
  small edge sets (the normal regime, dup rate ≪ 100%) take the driver
  plan — collect int64 edges, broadcast-gather only candidate payloads
  for exact verification, union-find, broadcast drop filter. Above
  ``driver_max_edges`` the fully-distributed plan engages
  (dedup/distributed.py): partitioned pair verification (payloads
  SHUFFLE to their pairs, never gather), min-label-propagation
  clustering, shuffle anti-join — nothing corpus-sized ever touches the
  driver, so adversarial (e.g. 50%-duplicate) corpora stream through.
  Both plans produce identical results (tests/test_neardup.py asserts
  equality with the threshold forced to 0).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from ..functions.relational import broadcast_value_filter
from ..functions.shuffle import local_group_map, sized_actor_concurrency
from ..functions.shuffle import select_if_needed as _sel
from ..functions.vector import list_column_to_matrix
from ..sketches.minhash import MinHasher, band_keys, exact_jaccard, shingle_hashes, word_hashes
from ..sketches.simhash import hamming_distance, prefix_blocks, simhash_text


class UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # keep the smaller id as root → survivor = cluster min
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            self.parent[hi] = lo


def _hashes_for(text: str | None, shingle: str, k: int) -> np.ndarray:
    if text is None:
        text = ""
    return word_hashes(text) if shingle == "word" else shingle_hashes(text, k)


def _real_hashes(text: str | None, shingle: str, k: int) -> np.ndarray:
    """Like _hashes_for but EMPTY for token-less text — empty docs must not
    count as Jaccard-1 pairs during exact verification (a brute-force
    oracle computing intersections finds no shared token for them)."""
    if not text or (shingle == "word" and not text.split()):
        return np.empty(0, dtype=np.uint64)
    return _hashes_for(text, shingle, k)


class MinHashBandStage:
    """Actor-pool stage: text -> exploded (id, band, key) triples."""

    def __init__(self, id_col: str, text_col: str, num_perm: int, bands: int, shingle: str, k: int, seed: int):
        self.id_col, self.text_col = id_col, text_col
        self.bands, self.shingle, self.k = bands, shingle, k
        self.hasher = MinHasher(num_perm=num_perm, seed=seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        out_ids = np.repeat(ids, self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int64), n)
        out_key = np.empty(n * self.bands, dtype=np.uint64)
        for i, t in enumerate(texts):
            sig = self.hasher.signature(_hashes_for(t, self.shingle, self.k))
            out_key[i * self.bands : (i + 1) * self.bands] = band_keys(sig, self.bands)
        return pa.Table.from_pydict(
            {
                "id": pa.array(out_ids),
                "band": pa.array(out_band),
                "key": pa.array(out_key.astype(np.int64)),  # reinterp: groupby key only
            }
        )


_EDGE_SCHEMA = pa.schema([("id", pa.int64()), ("rep", pa.int64())])


def _block_edges(tb: pa.Table) -> pa.Table:
    """All LSH buckets co-located in this block -> (id, rep=bucket-min)
    edges, one vectorized polars kernel for the whole block."""
    if tb.num_rows == 0:
        return pa.Table.from_pydict({"id": [], "rep": []}, schema=_EDGE_SCHEMA)
    u = pl.from_arrow(tb).unique(subset=["band", "key", "id"])
    reps = u.group_by(["band", "key"]).agg(pl.col("id").min().alias("rep"), pl.len().alias("n"))
    edges = (
        u.join(reps.filter(pl.col("n") >= 2), on=["band", "key"])
        .filter(pl.col("id") != pl.col("rep"))
        .select(["id", "rep"])
        .unique()
    )
    return edges.to_arrow().cast(_EDGE_SCHEMA)


def lsh_candidate_edges(ds, id_col: str, text_col: str, num_perm: int = 128, bands: int = 32, shingle: str = "char", k: int = 5, seed: int = 42, concurrency: int | None = None):
    """Dataset of candidate (id, rep) edges from MinHash LSH banding."""
    triples = _sel(ds, [id_col, text_col]).map_batches(
        MinHashBandStage,
        fn_constructor_args=(id_col, text_col, num_perm, bands, shingle, k, seed),
        batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
        concurrency=concurrency or sized_actor_concurrency(ds),
    )
    return local_group_map(triples, ["band", "key"], _block_edges)


def _collect_edges(edges_ds) -> list[tuple]:
    from ..pipelines.queries import as_table

    t = as_table(edges_ds)
    ids = t["id"].to_numpy(zero_copy_only=False)
    reps = t["rep"].to_numpy(zero_copy_only=False)
    return list({(int(a), int(b)) for a, b in zip(ids, reps)})


def _verify_edges(ds, id_col: str, text_col: str, edges: list[tuple], threshold: float, shingle: str, k: int) -> list[tuple]:
    """Exact-Jaccard check of candidate edges; gathers ONLY candidate rows."""
    cand = sorted({i for e in edges for i in e})
    if not cand:
        return []
    rows = broadcast_value_filter(_sel(ds, [id_col, text_col]), id_col, np.array(cand), keep=True)
    from ..pipelines.queries import as_table

    t = as_table(rows)
    texts = dict(zip(t[id_col].to_numpy(zero_copy_only=False), t[text_col].to_numpy(zero_copy_only=False)))
    sets = {i: _real_hashes(texts.get(i), shingle, k) for i in cand}
    return [
        (a, b)
        for a, b in edges
        if sets[a].size and sets[b].size and exact_jaccard(sets[a], sets[b]) >= threshold
    ]


def _survivors_from_edges(all_ids_ds_or_none, edges: list[tuple]) -> set:
    """Cluster the edge graph; non-survivors = every non-min cluster member."""
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    drop = set()
    roots: dict = {}
    for x in uf.parent:
        roots.setdefault(uf.find(x), []).append(x)
    for root, members in roots.items():
        keep = min(members)
        drop.update(m for m in members if m != keep)
    return drop


def _jaccard_verify_block(threshold: float, shingle: str, k: int):
    """verify_block for pair_payload_join: exact n-gram Jaccard per
    co-located candidate pair (token-less texts never match)."""

    def verify(_a_ids: np.ndarray, ta: list, tb: list) -> np.ndarray:
        out = np.zeros(len(ta), dtype=bool)
        for i, (x, y) in enumerate(zip(ta, tb)):
            hx, hy = _real_hashes(x, shingle, k), _real_hashes(y, shingle, k)
            out[i] = bool(hx.size and hy.size and exact_jaccard(hx, hy) >= threshold)
        return out

    return verify


def _cosine_verify_block(threshold: float):
    """verify_block for pair_payload_join: exact cosine per pair."""

    def verify(_a_ids: np.ndarray, va: list, vb: list) -> np.ndarray:
        ma = np.asarray(va, dtype=np.float64)
        mb = np.asarray(vb, dtype=np.float64)
        if ma.size == 0:
            return np.zeros(0, dtype=bool)
        denom = np.maximum(np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1), 1e-12)
        return (np.einsum("ij,ij->i", ma, mb) / denom) >= threshold

    return verify


# above this many candidate edges the driver gather/union-find plan is
# abandoned for the fully-distributed shuffle plan (dedup/distributed.py)
DRIVER_MAX_EDGES = 2_000_000


def _edges_to_pairs(edges_ds):
    """(id, rep) edge stream → (a, b) pairs with a = rep < b = id."""

    def conv(tb: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"a": tb["rep"], "b": tb["id"]}, schema=pa.schema([("a", pa.int64()), ("b", pa.int64())])
        )

    return edges_ds.map_batches(conv, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def _dedup_via_edges(
    ds,
    id_col: str,
    payload_col: str,
    edges_ds,
    verify_block,
    driver_max_edges: int,
    driver_verify,
):
    """Shared dedup tail with cost-based plan choice.

    Small candidate graphs (the normal regime — dup rate ≪ 100%) take the
    driver plan: collect int64 edges, broadcast-gather ONLY candidate
    payloads for exact verification, union-find, broadcast drop filter.
    Above ``driver_max_edges`` the distributed plan engages: partitioned
    pair verification (payload shuffles, never gathers), min-label
    propagation, shuffle anti-join — nothing corpus-sized ever touches
    the driver (the round-1 scale-killer at adversarial dup rates)."""
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return ds
    if n_edges <= driver_max_edges:
        edges = _collect_edges(edges_ds)
        if driver_verify is not None:
            edges = driver_verify(edges)
        drop = _survivors_from_edges(None, edges)
        if not drop:
            return ds
        return broadcast_value_filter(ds, id_col, np.array(sorted(drop)), keep=False)
    from .distributed import cluster_drop_ids, pair_payload_join, shuffle_anti_join

    pairs = _edges_to_pairs(edges_ds)
    if verify_block is not None:
        pairs = pair_payload_join(ds, pairs, id_col, payload_col, verify_block)
    drop_ids = cluster_drop_ids(pairs)
    return shuffle_anti_join(ds, id_col, drop_ids)


def minhash_lsh_dedup(
    ds,
    id_col: str,
    text_col: str,
    num_perm: int = 128,
    bands: int = 32,
    shingle: str = "char",
    k: int = 5,
    seed: int = 42,
    verify_threshold: float | None = None,
    driver_max_edges: int = DRIVER_MAX_EDGES,
):
    """Near-dup dedup: keep the min-id representative of each LSH cluster.

    ``verify_threshold`` switches on exact n-gram-Jaccard edge verification
    (the "n-gram Jaccard dedup" operator): only candidate pairs whose TRUE
    Jaccard ≥ threshold merge. Above ``driver_max_edges`` candidate edges
    the fully-distributed verify/cluster plan replaces the driver path
    (see :func:`_dedup_via_edges`).
    """
    edges_ds = lsh_candidate_edges(ds, id_col, text_col, num_perm, bands, shingle, k, seed)
    verify_block = (
        _jaccard_verify_block(verify_threshold, shingle, k) if verify_threshold is not None else None
    )
    driver_verify = (
        (lambda e: _verify_edges(ds, id_col, text_col, e, verify_threshold, shingle, k))
        if verify_threshold is not None
        else None
    )
    return _dedup_via_edges(ds, id_col, text_col, edges_ds, verify_block, driver_max_edges, driver_verify)


_PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _block_all_pairs(tb: pa.Table) -> pa.Table:
    """All (a < b) pairs per LSH bucket co-located in this block — unlike
    ``_block_edges`` no pair is lost to the representative chain, which
    matters whenever pairs are verified afterwards."""
    if tb.num_rows == 0:
        return pa.Table.from_pydict({"a": [], "b": []}, schema=_PAIR_SCHEMA)
    u = pl.from_arrow(tb).unique(subset=["band", "key", "id"])
    pairs = (
        u.join(u.rename({"id": "b"}), on=["band", "key"])
        .filter(pl.col("id") < pl.col("b"))
        .select(pl.col("id").alias("a"), "b")
        .unique()
    )
    return pairs.to_arrow().cast(_PAIR_SCHEMA)


def _lsh_all_pairs(ds, id_col, text_col, num_perm, bands, shingle, k, seed):
    """Materialized Dataset of candidate (a < b) pairs from MinHash LSH
    banding, all-pairs per bucket."""
    triples = _sel(ds, [id_col, text_col]).map_batches(
        MinHashBandStage,
        fn_constructor_args=(id_col, text_col, num_perm, bands, shingle, k, seed),
        batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
        concurrency=sized_actor_concurrency(ds),
    )
    return local_group_map(triples, ["band", "key"], _block_all_pairs).materialize()


def minhash_lsh_dedup_verified(
    ds,
    id_col: str,
    text_col: str,
    threshold: float,
    num_perm: int = 256,
    bands: int = 64,
    shingle: str = "word",
    k: int = 5,
    seed: int = 42,
    driver_max_edges: int = DRIVER_MAX_EDGES,
):
    """Near-dup dedup with EXACT connectivity semantics: clusters are the
    connected components of the true Jaccard ≥ threshold pair graph
    (all-pairs per bucket + per-pair exact verification), survivors are
    component minima — byte-matchable against a brute-force SQL oracle
    with a recursive-CTE closure (queries.dedup_minhash_word_docs).

    Contrast :func:`minhash_lsh_dedup` (verify_threshold), which verifies
    only (member, bucket-min) representative edges — cheaper (O(bucket)
    vs O(bucket²) candidate edges) but can sever a true pair whose bucket
    representative resembles neither member; its clusters are a refinement
    of this function's. Same cost-based driver/distributed tail."""
    pairs_ds = _lsh_all_pairs(ds, id_col, text_col, num_perm, bands, shingle, k, seed)
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return ds
    if n_pairs <= driver_max_edges:
        from ..pipelines.queries import as_table

        t = as_table(pairs_ds)
        cand = list(
            {(int(a), int(b)) for a, b in zip(t["a"].to_numpy(zero_copy_only=False), t["b"].to_numpy(zero_copy_only=False))}
        )
        kept = _verify_edges(ds, id_col, text_col, cand, threshold, shingle, k)
        drop = _survivors_from_edges(None, kept)
        if not drop:
            return ds
        return broadcast_value_filter(ds, id_col, np.array(sorted(drop)), keep=False)
    from .distributed import cluster_drop_ids, pair_payload_join, shuffle_anti_join

    verified = pair_payload_join(
        ds, pairs_ds, id_col, text_col, _jaccard_verify_block(threshold, shingle, k)
    )
    return shuffle_anti_join(ds, id_col, cluster_drop_ids(verified))


def neardup_pairs(
    ds,
    id_col: str,
    text_col: str,
    threshold: float,
    num_perm: int = 256,
    bands: int = 64,
    shingle: str = "word",
    k: int = 5,
    seed: int = 42,
    driver_max_pairs: int = DRIVER_MAX_EDGES,
):
    """All (id_a < id_b) pairs with exact Jaccard ≥ threshold, found via
    LSH candidates + exact verification. With these parameters the LSH
    recall at J=threshold≥0.5 is >1-1e-6 (1-(1-J^r)^b, r=4, b=64), so the
    result matches a brute-force pairwise oracle on non-adversarial data.

    Within-bucket pairing is all-pairs per bucket (not just to the min) so
    no pair is lost to the representative chain.
    """
    pairs_ds = _lsh_all_pairs(ds, id_col, text_col, num_perm, bands, shingle, k, seed)
    from ..pipelines.queries import as_table

    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return pa.Table.from_pydict({"a": [], "b": []}, schema=_PAIR_SCHEMA)
    if n_pairs > driver_max_pairs:
        # distributed exact verification: candidate payloads shuffle to
        # their pairs instead of gathering to the driver
        from .distributed import pair_payload_join

        verified = pair_payload_join(
            ds, pairs_ds, id_col, text_col, _jaccard_verify_block(threshold, shingle, k)
        )
        return as_table(verified).sort_by([("a", "ascending"), ("b", "ascending")])
    t = as_table(pairs_ds)
    cand = list(
        {(int(a), int(b)) for a, b in zip(t["a"].to_numpy(zero_copy_only=False), t["b"].to_numpy(zero_copy_only=False))}
    )
    kept = _verify_edges(ds, id_col, text_col, cand, threshold, shingle, k)
    kept.sort()
    return pa.Table.from_pydict(
        {
            "a": pa.array([a for a, _ in kept], type=pa.int64()),
            "b": pa.array([b for _, b in kept], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_fingerprints(ds, id_col: str, text_col: str, token_hash: str = "fnv"):
    """(id, simhash) fingerprint per row — stateless vectorized batch map.
    ``token_hash="md5"`` selects the SQL-reproducible variant (DuckDB
    ``md5_number_lower`` parity) used by the oracle-checked query."""

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        out = np.fromiter(
            (np.int64(np.uint64(simhash_text(t if t is not None else "", token_hash))) for t in texts),
            dtype=np.int64,
            count=len(texts),
        )
        return pa.Table.from_pydict({id_col: batch[id_col], "simhash": pa.array(out)})

    return _sel(ds, [id_col, text_col]).map_batches(fp, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def simhash_dedup(ds, id_col: str, text_col: str, max_hamming: int = 3, n_blocks: int = 4, driver_max_edges: int = DRIVER_MAX_EDGES, token_hash: str = "fnv"):
    """Near-dup dedup via SimHash: Manku-style prefix-block grouping finds
    every pair within ``max_hamming`` (requires max_hamming < n_blocks);
    within-bucket pairs are verified by exact Hamming distance."""
    if max_hamming >= n_blocks:
        raise ValueError("pigeonhole requires max_hamming < n_blocks")

    fps = simhash_fingerprints(ds, id_col, text_col, token_hash)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        fp = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        blocks = prefix_blocks(fp, n_blocks)  # (n, n_blocks)
        n = len(ids)
        return pa.Table.from_pydict(
            {
                "id": pa.array(np.repeat(ids, n_blocks)),
                "fp": pa.array(np.repeat(fp, n_blocks).astype(np.int64)),
                "block": pa.array(np.tile(np.arange(n_blocks, dtype=np.int64), n)),
                "key": pa.array(blocks.reshape(-1).astype(np.int64)),
            }
        )

    def block_bucket_edges(tb: pa.Table) -> pa.Table:
        """All (block, key) buckets in this shuffle block: self-join within
        buckets, verify candidate pairs by exact Hamming distance."""
        if tb.num_rows == 0:
            return pa.Table.from_pydict({"id": [], "rep": []}, schema=_EDGE_SCHEMA)
        u = pl.from_arrow(tb).unique(subset=["block", "key", "id"])
        j = (
            u.join(u.rename({"id": "id_b", "fp": "fp_b"}), on=["block", "key"])
            .filter(pl.col("id") < pl.col("id_b"))
            .select(["id", "fp", "id_b", "fp_b"])
            .unique(subset=["id", "id_b"])
        )
        if j.height == 0:
            return pa.Table.from_pydict({"id": [], "rep": []}, schema=_EDGE_SCHEMA)
        fa = j["fp"].to_numpy().astype(np.uint64)
        fb = j["fp_b"].to_numpy().astype(np.uint64)
        m = hamming_distance(fa, fb) <= max_hamming
        return pa.Table.from_pydict(
            {"id": j["id_b"].to_numpy()[m], "rep": j["id"].to_numpy()[m]}, schema=_EDGE_SCHEMA
        )

    edges_ds = local_group_map(
        fps.map_batches(explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True),
        ["block", "key"],
        block_bucket_edges,
    )
    # edges are already exact-Hamming-verified inside the buckets, so the
    # tail needs only clustering + drop (no payload re-verification)
    return _dedup_via_edges(ds, id_col, text_col, edges_ds, None, driver_max_edges, None)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


class HyperplaneLSHStage:
    """Actor-pool stage: embeddings -> (id, band, key) sign-LSH triples.
    Random hyperplanes are drawn once per actor from a fixed seed."""

    def __init__(self, id_col: str, vec_col: str, dim: int, n_bits: int, bands: int, seed: int):
        self.id_col, self.vec_col, self.bands = id_col, vec_col, bands
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, n_bits))
        self.rows = n_bits // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = list_column_to_matrix(batch[self.vec_col])
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        bits = (m @ self.planes) > 0  # (n, n_bits)
        n = len(ids)
        keys = np.zeros((n, self.bands), dtype=np.int64)
        for b in range(self.bands):
            seg = bits[:, b * self.rows : (b + 1) * self.rows]
            keys[:, b] = seg @ (1 << np.arange(self.rows, dtype=np.int64))
        return pa.Table.from_pydict(
            {
                "id": pa.array(np.repeat(ids, self.bands)),
                "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int64), n)),
                "key": pa.array(keys.reshape(-1)),
            }
        )


def embedding_neardup_pairs(
    ds, id_col: str, vec_col: str, dim: int, threshold: float = 0.95, n_bits: int = 128, bands: int = 16, seed: int = 42, driver_max_edges: int = DRIVER_MAX_EDGES
) -> pa.Table:
    """All (a < b) pairs with exact cosine ≥ threshold: hyperplane-LSH
    candidates (all-pairs per bucket) + exact verification over the
    gathered candidate vectors. Matches a brute-force pairwise oracle up
    to LSH recall (>99.98% at cos=0.95 with 16 bands × 8 bits)."""
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def block_pairs(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return pa.Table.from_pydict({"a": [], "b": []}, schema=pair_schema)
        u = pl.from_arrow(tb).unique(subset=["band", "key", "id"])
        pairs = (
            u.join(u.rename({"id": "b"}), on=["band", "key"])
            .filter(pl.col("id") < pl.col("b"))
            .select(pl.col("id").alias("a"), "b")
            .unique()
        )
        return pairs.to_arrow().cast(pair_schema)

    triples = _sel(ds, [id_col, vec_col]).map_batches(
        HyperplaneLSHStage,
        fn_constructor_args=(id_col, vec_col, dim, n_bits, bands, seed),
        batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
        concurrency=sized_actor_concurrency(ds),
    )
    pairs_tbl = local_group_map(triples, ["band", "key"], block_pairs).materialize()
    from ..pipelines.queries import as_table

    if pairs_tbl.count() > driver_max_edges:
        from .distributed import pair_payload_join

        verified = pair_payload_join(ds, pairs_tbl, id_col, vec_col, _cosine_verify_block(threshold))
        return as_table(verified).sort_by([("a", "ascending"), ("b", "ascending")])
    t = as_table(pairs_tbl)
    cand_pairs = list(
        {(int(a), int(b)) for a, b in zip(t["a"].to_numpy(zero_copy_only=False), t["b"].to_numpy(zero_copy_only=False))}
    )
    kept: list[tuple] = []
    if cand_pairs:
        cand = sorted({i for e in cand_pairs for i in e})
        rows = broadcast_value_filter(_sel(ds, [id_col, vec_col]), id_col, np.array(cand), keep=True)
        rt = as_table(rows)
        mat = list_column_to_matrix(rt[vec_col])
        ids = rt[id_col].to_numpy(zero_copy_only=False)
        norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        vec = {int(i): norm[j] for j, i in enumerate(ids)}
        kept = sorted((a, b) for a, b in cand_pairs if float(vec[a] @ vec[b]) >= threshold)
    return pa.Table.from_pydict(
        {"a": pa.array([a for a, _ in kept], type=pa.int64()), "b": pa.array([b for _, b in kept], type=pa.int64())}
    )


def embedding_cosine_dedup(ds, id_col: str, vec_col: str, dim: int, threshold: float = 0.95, n_bits: int = 128, bands: int = 16, seed: int = 42, driver_max_edges: int = DRIVER_MAX_EDGES):
    """Near-dup on embeddings: hyperplane-LSH buckets -> candidate edges ->
    exact cosine verification -> keep cluster min. Cost-based tail: above
    ``driver_max_edges`` the verification shuffles vectors to their pairs
    and clusters by label propagation instead of the driver gather."""
    triples = _sel(ds, [id_col, vec_col]).map_batches(
        HyperplaneLSHStage,
        fn_constructor_args=(id_col, vec_col, dim, n_bits, bands, seed),
        batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
        concurrency=sized_actor_concurrency(ds),
    )
    edges_ds = local_group_map(triples, ["band", "key"], _block_edges)

    def driver_verify(edges: list[tuple]) -> list[tuple]:
        if not edges:
            return edges
        cand = sorted({i for e in edges for i in e})
        rows = broadcast_value_filter(_sel(ds, [id_col, vec_col]), id_col, np.array(cand), keep=True)
        from ..pipelines.queries import as_table

        t = as_table(rows)
        mat = list_column_to_matrix(t[vec_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        vec = {int(i): norm[j] for j, i in enumerate(ids)}
        return [(a, b) for a, b in edges if float(vec[a] @ vec[b]) >= threshold]

    return _dedup_via_edges(
        ds, id_col, vec_col, edges_ds, _cosine_verify_block(threshold), driver_max_edges, driver_verify
    )
