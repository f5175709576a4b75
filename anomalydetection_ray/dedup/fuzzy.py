"""Edit-distance similarity join: segment-pigeonhole blocking + Myers
bit-parallel verification.

``edit_distance_pairs`` finds every pair of rows whose KEY strings are
within byte-level Levenshtein distance ``k`` — the record-linkage /
fuzzy-dedup primitive (titles, names, URLs, normalized snippets) the
exact/MinHash family cannot express: MinHash approximates set overlap,
while edit distance is positional and exact. Byte-level (UTF-8)
distance is the same definition DuckDB's and Postgres's
``levenshtein()`` use, so the operator is directly SQL-oracle-checkable.

Blocking is the PassJoin partition scheme (Li, Deng, Wang, Feng,
"PassJoin: A Partition-based Method for Similarity Joins", PVLDB 5(3),
2011): partition every string into ``k+1`` canonical segments — by the
pigeonhole principle, ``k`` edits leave at least one segment untouched,
and an untouched segment reappears in the other string shifted by at
most ``k`` bytes. Each string therefore emits its ``k+1`` segments as
INDEX keys, and every substring that could equal a segment of a
length-compatible partner (source length within ±k, position within ±k
of the canonical slot) as PROBE keys — O(k³) constant emissions per
row, independent of corpus size (PassJoin's multi-match-aware window
selection would cut this to O(k²); the loose window is a superset, so
only candidate volume, never correctness, is affected). Segment
content is compared by a 64-bit polynomial rolling hash over the flat
byte buffer (position-normalized, so equal substrings hash equally
anywhere) — a hash collision only adds a candidate; exact verification
removes it.

Verification is Myers' bit-parallel algorithm (G. Myers, "A fast
bit-vector algorithm for approximate string matching based on dynamic
programming", J. ACM 46(3), 1999, in Hyyrö's formulation), vectorized
with numpy across the candidate-pair batch: one uint64 column state per
pair, one fused pass per text position — no per-pair Python. Keys are
capped at 64 bytes (one machine word of pattern state); longer keys
raise loudly rather than silently truncating.

Two cost-gated plans, sharing every kernel (the exact_dedup pattern):

- small inputs (metadata estimate / ``size_hint_bytes`` under the
  budget): gather (id, key) once and run emission → expansion →
  verification in-process, skipping the sort's fixed overhead;
- at scale: emissions ((bkey, id, role), 17 B each) co-partition by
  block key (``local_group_map``), per-block vectorized index×probe
  expansion, ONE global pair-distinct (``sorted_distinct`` — clusters
  collide in many buckets), then two schema-pinned tagged-union
  co-partitions attach the two key strings and a map_batches verifies.
  Nothing
  O(corpus) touches the driver; the wide payload column never moves —
  only ids, block keys, and ≤64-byte key strings cross the wire.

Partitioning assumption (documented per SURVEY.md §2 custom-operator
contract): all emissions of one block key fit one partition. A hot
shared segment (constant prefixes, empty-ish keys) can flood a bucket;
the expansion guards with ``max_block_pairs`` and raises with the
dense-bucket size instead of quietly going quadratic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_B = np.uint64(1099511628211)  # FNV-64 prime; odd -> invertible mod 2^64
_BINV = np.uint64(pow(1099511628211, -1, 1 << 64))
_GOLD = np.uint64(0x9E3779B97F4A7C15)
_SPLIT1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLIT2 = np.uint64(0x94D049BB133111EB)
_ONE = np.uint64(1)
_ALLONES = np.uint64(0xFFFFFFFFFFFFFFFF)
MAX_KEY_BYTES = 64  # Myers single-word pattern bound

# B^j and B^{-j} for j in [0, MAX_KEY_BYTES]: slice hashes are
# position-normalized WITHIN a row, so 65 entries cover every offset
_PWB = np.ones(MAX_KEY_BYTES + 1, np.uint64)
_PWINV = np.ones(MAX_KEY_BYTES + 1, np.uint64)
with np.errstate(over="ignore"):  # mod-2^64 wraparound is the arithmetic
    for _j in range(1, MAX_KEY_BYTES + 1):
        _PWB[_j] = _PWB[_j - 1] * _B
        _PWINV[_j] = _PWINV[_j - 1] * _BINV
del _j


def _flat_bytes(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 bytes, zero-based int64 offsets) of a non-null
    string/binary column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = arr.cast(pa.large_binary())
    if len(arr) == 0:
        return np.zeros(0, np.uint8), np.zeros(1, np.int64)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    data_buf = arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None else np.zeros(0, np.uint8)
    )
    flat = np.ascontiguousarray(data[offs[0] : offs[-1]])
    return flat, (offs - offs[0]).astype(np.int64)


def _seg_bounds(l: np.ndarray, i: int, m: int) -> tuple[np.ndarray, np.ndarray]:
    """(start, length) of 0-based segment ``i`` in the canonical even
    partition of a length-``l`` string into ``m`` segments: the first
    ``l % m`` segments are one byte longer. Pure function of (l, i, m) —
    both roles must agree on it."""
    base = l // m
    r = l % m
    start = i * base + np.minimum(i, r)
    seglen = base + (i < r).astype(l.dtype)
    return start, seglen


class _RowHash:
    """Position-normalized polynomial substring hashes over a batch's
    flat byte buffer: hash(row, start, len) is a pure function of the
    slice CONTENT (equal substrings collide by construction, position
    and row notwithstanding), computed from one prefix-sum pass."""

    def __init__(self, flat: np.ndarray, offs: np.ndarray):
        n = flat.size
        row_lens = np.diff(offs)
        pos = np.arange(n, dtype=np.int64) - np.repeat(offs[:-1], row_lens)
        self._s0 = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(flat.astype(np.uint64) * _PWINV[pos], out=self._s0[1:])
        self._off = offs

    def slice_hash(self, rows: np.ndarray, start_in_row: np.ndarray, seglen: np.ndarray) -> np.ndarray:
        a = self._off[rows] + start_in_row
        return (self._s0[a + seglen] - self._s0[a]) * _PWB[start_in_row]


def _mix(h: np.ndarray, l: np.ndarray, i: int) -> np.ndarray:
    """Fold (source length, segment slot) into the content hash and
    finalize (splitmix64) so block keys spread across the sort range."""
    slot = np.uint64(((i + 1) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF)
    z = h ^ (l.astype(np.uint64) * _GOLD) ^ slot
    z = (z ^ (z >> np.uint64(30))) * _SPLIT1
    z = (z ^ (z >> np.uint64(27))) * _SPLIT2
    return z ^ (z >> np.uint64(31))


def _emissions_arrays(
    flat: np.ndarray, offs: np.ndarray, ids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(bkey, id, role) emission arrays for one batch — role 0 rows carry
    the string's k+1 canonical segments, role 1 rows every substring
    that could equal a segment of an edit-distance-k partner. Batch-local
    duplicate emissions (overlapping probe windows hitting the same
    content) are dropped before anything leaves the worker."""
    lens = np.diff(offs).astype(np.int64)
    n = lens.size
    m = k + 1
    if n == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64), np.empty(0, np.int8))
    rh = _RowHash(flat, offs)
    all_rows = np.arange(n, dtype=np.int64)
    bkeys, eids, roles = [], [], []
    for i in range(m):
        start, seglen = _seg_bounds(lens, i, m)
        bkeys.append(_mix(rh.slice_hash(all_rows, start, seglen), lens, i))
        eids.append(ids)
        roles.append(np.zeros(n, np.int8))
    for delta in range(-k, k + 1):
        src_l = lens + delta
        ok_l = src_l >= 0
        safe_l = np.maximum(src_l, 0)
        for i in range(m):
            p_i, seglen = _seg_bounds(safe_l, i, m)
            for shift in range(-k, k + 1):
                # feasibility prune (PassJoin §4 length-aware window): a
                # match of segment i at shift δ implies ed(prefixes) ≥ |δ|
                # and ed(suffixes) ≥ |Δ − δ| with Δ = lt − l = −delta
                # (length-difference lower bounds), and their sum cannot
                # exceed k — combos violating it can never host a true
                # match (provably necessary, so still lossless). Cuts
                # probe emissions 75 → 39 at k=2.
                if abs(shift) + abs(delta + shift) > k:
                    continue
                p = p_i + shift
                valid = ok_l & (p >= 0) & (p + seglen <= lens)
                if not valid.any():
                    continue
                rows = all_rows[valid]
                h = rh.slice_hash(rows, p[valid], seglen[valid])
                bkeys.append(_mix(h, src_l[valid], i))
                eids.append(ids[valid])
                roles.append(np.ones(rows.size, np.int8))
    bk = np.concatenate(bkeys)
    ei = np.concatenate(eids)
    ro = np.concatenate(roles)
    order = np.lexsort((ro, ei, bk))
    bk, ei, ro = bk[order], ei[order], ro[order]
    keep = np.ones(bk.size, bool)
    keep[1:] = (bk[1:] != bk[:-1]) | (ei[1:] != ei[:-1]) | (ro[1:] != ro[:-1])
    return bk[keep], ei[keep], ro[keep]


def _expand_pairs(
    bk: np.ndarray, ids: np.ndarray, role: np.ndarray, max_block_pairs: int,
    scope: str = "partition",
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct candidate (a < b) id pairs from index×probe matches
    within each block-key group — vectorized repeat/ramp expansion, no
    Python loop over groups. ``max_block_pairs`` caps the pairs THIS
    CALL materializes (``scope`` names the unit in the error: one
    co-partition on the distributed rung, the whole corpus on the
    driver rung — the cap protects the expanding process's memory, so
    its granularity legitimately follows the plan)."""
    if bk.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.lexsort((role, bk))
    bk, ids, role = bk[order], ids[order], role[order]
    new_grp = np.ones(bk.size, bool)
    new_grp[1:] = bk[1:] != bk[:-1]
    gid = np.cumsum(new_grp) - 1
    ngroups = int(gid[-1]) + 1
    is_idx = role == 0
    ci = np.bincount(gid[is_idx], minlength=ngroups).astype(np.int64)
    cp = np.bincount(gid[~is_idx], minlength=ngroups).astype(np.int64)
    per_group = ci * cp
    total = int(per_group.sum())
    if total > max_block_pairs:
        raise ValueError(
            f"edit_distance_pairs: candidate expansion of {total} pairs in one "
            f"{scope} exceeds max_block_pairs={max_block_pairs} (densest segment "
            f"bucket alone: {int(per_group.max())}). A hot shared segment — e.g. a "
            "constant prefix or near-empty keys — inflates candidates; normalize/"
            "lengthen the key column, raise max_block_pairs, or force the "
            "distributed plan (size_hint_bytes=0), which applies the cap per "
            "co-partition instead of corpus-wide"
        )
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    idx_rows = np.flatnonzero(is_idx)
    probe_ids = ids[~is_idx]
    probe_start = np.concatenate(([0], np.cumsum(cp)))[:-1]
    cpr = cp[gid[idx_rows]]
    nz = cpr > 0
    idx_rows, cpr = idx_rows[nz], cpr[nz]
    left = np.repeat(ids[idx_rows], cpr)
    base = np.repeat(probe_start[gid[idx_rows]], cpr)
    csum = np.concatenate(([0], np.cumsum(cpr)))
    ramp = np.arange(left.size, dtype=np.int64) - np.repeat(csum[:-1], cpr)
    right = probe_ids[base + ramp]
    keep = left != right
    a = np.minimum(left[keep], right[keep])
    b = np.maximum(left[keep], right[keep])
    if a.size:
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        u = np.ones(a.size, bool)
        u[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a, b = a[u], b[u]
    return a, b


def _lev_chunk(
    flat_a: np.ndarray, st_a: np.ndarray, la: np.ndarray,
    flat_b: np.ndarray, st_b: np.ndarray, lb: np.ndarray,
) -> np.ndarray:
    """Myers/Hyyrö bit-parallel Levenshtein for one chunk of pairs —
    uint64 column states vectorized across the chunk, one fused numpy
    pass per text position. Patterns are ≤ 64 bytes by module contract."""
    C = la.size
    peq = np.zeros((C, 256), np.uint64)
    if int(la.sum()):
        pair_of_byte = np.repeat(np.arange(C, dtype=np.int64), la)
        pos = np.arange(int(la.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(la)))[:-1], la
        )
        abytes = flat_a[np.repeat(st_a, la) + pos]
        np.bitwise_or.at(peq, (pair_of_byte, abytes.astype(np.int64)), _ONE << pos.astype(np.uint64))
    maxlb = int(lb.max()) if C else 0
    bmat = np.zeros((C, maxlb), np.int64)
    if maxlb:
        fill = np.arange(maxlb)[None, :] < lb[:, None]
        posb = np.arange(int(lb.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(lb)))[:-1], lb
        )
        bmat[fill] = flat_b[np.repeat(st_b, lb) + posb]
    m = la
    nonzero = m > 0
    safe_m = np.where(m >= 64, 0, m).astype(np.uint64)
    vp = np.where(m >= 64, _ALLONES, (_ONE << safe_m) - _ONE)
    vn = np.zeros(C, np.uint64)
    score = m.astype(np.int64).copy()
    hb = _ONE << np.maximum(m - 1, 0).astype(np.uint64)
    rows = np.arange(C)
    for j in range(maxlb):
        act = j < lb
        if not act.any():
            break
        eq = peq[rows, bmat[:, j]]
        d0 = (((eq & vp) + vp) ^ vp) | eq | vn
        hp = vn | ~(d0 | vp)
        hn = vp & d0
        inc = ((hp & hb) != 0).astype(np.int64) - ((hn & hb) != 0).astype(np.int64)
        x = (hp << _ONE) | _ONE
        nvp = (hn << _ONE) | ~(d0 | x)
        nvn = x & d0
        score = np.where(act & nonzero, score + inc, score)
        vp = np.where(act, nvp, vp)
        vn = np.where(act, nvn, vn)
    return np.where(nonzero, score, lb.astype(np.int64))


def levenshtein_bytes_batch(
    flat_a: np.ndarray, st_a: np.ndarray, la: np.ndarray,
    flat_b: np.ndarray, st_b: np.ndarray, lb: np.ndarray,
    chunk: int = 4096,
) -> np.ndarray:
    """Byte-level Levenshtein distance per (a, b) slice pair (gather
    form: start/length per side may point anywhere in each flat buffer).
    Chunked so the per-pair 2 KB Peq table stays within a few MB."""
    npairs = la.size
    out = np.zeros(npairs, np.int64)
    for c0 in range(0, npairs, chunk):
        c1 = min(c0 + chunk, npairs)
        out[c0:c1] = _lev_chunk(
            flat_a, st_a[c0:c1], la[c0:c1], flat_b, st_b[c0:c1], lb[c0:c1]
        )
    return out


_PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])
_OUT_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()), ("dist", pa.int64())])


def edit_distance_pairs(
    ds,
    id_col: str,
    key_col: str,
    k: int = 2,
    driver_merge_max_bytes: int = 256 << 20,
    size_hint_bytes: int | None = None,
    max_block_pairs: int = 16_000_000,
):
    """All (id_a < id_b, dist) pairs whose ``key_col`` strings are within
    byte-level Levenshtein distance ``k`` — exact (blocking is a proven
    superset, verification is exact), matching DuckDB's
    ``levenshtein(a, b) <= k`` over the non-null keys row for row.

    Contract: integer non-null ids (unique by caller contract, like the
    rest of the dedup family), keys ≤ ``MAX_KEY_BYTES`` (64) UTF-8
    bytes — longer keys raise (truncate/normalize upstream, where the
    caller controls semantics). Null keys never pair (SQL: levenshtein
    with NULL is NULL). ``size_hint_bytes`` ≤ 0 forces the distributed
    plan (plan-equivalence tests); otherwise plan choice follows the
    exact_dedup cost gate. Returns a Dataset (id_a, id_b, dist).
    """
    from ..functions.shuffle import metadata_size_estimate, select_if_needed
    from .neardup import sorted_distinct

    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    id_type = None
    try:
        from ..functions.shuffle import arrow_schema

        id_type = arrow_schema(ds).field(id_col).type
    except Exception:
        pass
    if id_type is not None and not pa.types.is_integer(id_type):
        raise ValueError(
            f"edit_distance_pairs requires an integer id column; {id_col!r} is {id_type}"
        )

    def _prep(tb: pa.Table) -> pa.Table:
        if tb[id_col].null_count:
            raise ValueError(
                f"null values in id column {id_col!r}; edit_distance_pairs requires non-null ids"
            )
        tb = tb.filter(pc.is_valid(tb[key_col]))
        key = tb[key_col].cast(pa.large_binary())
        blen = pc.binary_length(key)
        too_long = pc.greater(blen, MAX_KEY_BYTES)
        if pc.any(too_long).as_py():
            worst = pc.max(blen).as_py()
            raise ValueError(
                f"edit_distance_pairs: {pc.sum(too_long.cast(pa.int64())).as_py()} key(s) "
                f"exceed MAX_KEY_BYTES={MAX_KEY_BYTES} (longest: {worst} bytes); "
                "truncate or normalize the key column upstream"
            )
        return pa.table(
            {id_col: tb[id_col].cast(pa.int64()), key_col: key},
            schema=pa.schema([(id_col, pa.int64()), (key_col, pa.large_binary())]),
        )

    base = select_if_needed(ds, [id_col, key_col]).map_batches(
        _prep, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    if size_hint_bytes is not None and size_hint_bytes <= 0:
        est = None  # forced distributed rung
    elif size_hint_bytes is not None:
        est = size_hint_bytes
    else:
        est = metadata_size_estimate(ds)

    if est is not None and est <= driver_merge_max_bytes:
        import ray.data as rd

        tabs = [
            t for t in base.iter_batches(batch_format="pyarrow", batch_size=None) if t.num_rows
        ]
        if not tabs:
            return rd.from_arrow(pa.Table.from_pydict({f.name: [] for f in _OUT_SCHEMA}, schema=_OUT_SCHEMA))
        tb = pa.concat_tables(tabs, promote_options="default")
        ids = tb[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, offs = _flat_bytes(tb[key_col])
        bk, ei, ro = _emissions_arrays(flat, offs, ids, k)
        a, b = _expand_pairs(bk, ei, ro, max_block_pairs, scope="corpus (driver rung)")
        order = np.argsort(ids, kind="stable")
        sid = ids[order]
        pos_a = order[np.searchsorted(sid, a)]
        pos_b = order[np.searchsorted(sid, b)]
        lens = np.diff(offs)
        dist = levenshtein_bytes_batch(
            flat, offs[:-1][pos_a], lens[pos_a], flat, offs[:-1][pos_b], lens[pos_b]
        )
        keep = dist <= k
        out = pa.table(
            {"id_a": a[keep], "id_b": b[keep], "dist": dist[keep]}, schema=_OUT_SCHEMA
        )
        return rd.from_arrow(out)

    from ..functions.shuffle import local_group_map

    # the distributed rung consumes `base` from THREE lazy branches (the
    # emission scan plus the kv side of both key-attach unions); without
    # a materialize the read + _prep validation would re-execute once per
    # branch (round-5 review — the dedup/distributed.py precedent). The
    # materialized set is the narrow (id, ≤64-byte key) projection.
    base = base.materialize()

    def _emit(tb: pa.Table) -> pa.Table:
        em_schema = pa.schema([("bkey", pa.int64()), ("id", pa.int64()), ("role", pa.int8())])
        if tb.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in em_schema}, schema=em_schema)
        ids = tb[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, offs = _flat_bytes(tb[key_col])
        bk, ei, ro = _emissions_arrays(flat, offs, ids, k)
        return pa.table(
            {"bkey": bk.view(np.int64), "id": ei, "role": ro}, schema=em_schema
        )

    def _pairs_block(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in _PAIR_SCHEMA}, schema=_PAIR_SCHEMA)
        a, b = _expand_pairs(
            tb["bkey"].to_numpy(zero_copy_only=False),
            tb["id"].to_numpy(zero_copy_only=False),
            tb["role"].to_numpy(zero_copy_only=False),
            max_block_pairs,
        )
        return pa.table({"a": a, "b": b}, schema=_PAIR_SCHEMA)

    em = base.map_batches(_emit, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    pairs = sorted_distinct(
        local_group_map(em, ["bkey"], _pairs_block, keys_non_null=True), ["a", "b"]
    )

    # attach the two key strings with two schema-pinned tagged-union
    # co-partitions (rather than shuffle_hash_join, whose construction
    # probes input schemas — an empty transformed chain has none): union
    # (pairs, kv) into one explicit schema, co-partition by the id being
    # resolved, and run one vectorized polars join per block. Each id is
    # unique by contract, so the inner join never fans out.
    def _attach(pairs_ds, join_out: str, carry: list[tuple[str, pa.DataType]], key_out: str):
        u_schema = pa.schema(
            [("__j", pa.int64())]
            + carry
            + [("__k", pa.large_binary()), ("__side", pa.int8())]
        )
        out_schema = pa.schema(
            [(join_out, pa.int64())] + carry + [(key_out, pa.large_binary())]
        )

        def from_pairs(tb: pa.Table) -> pa.Table:
            n = tb.num_rows
            cols = [tb[join_out]]
            cols += [tb[c] for c, _ in carry]
            cols += [pa.nulls(n, pa.large_binary()), pa.nulls(n, pa.int8()).fill_null(0)]
            return pa.Table.from_arrays(cols, schema=u_schema)

        def from_kv(tb: pa.Table) -> pa.Table:
            n = tb.num_rows
            cols = [tb[id_col]]
            cols += [pa.nulls(n, t) for _, t in carry]
            cols += [tb[key_col], pa.nulls(n, pa.int8()).fill_null(1)]
            return pa.Table.from_arrays(cols, schema=u_schema)

        tagged = pairs_ds.map_batches(
            from_pairs, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).union(
            base.map_batches(from_kv, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        )

        def block(tb: pa.Table) -> pa.Table:
            import polars as pl

            if tb.num_rows == 0:
                return pa.Table.from_pydict(
                    {f.name: [] for f in out_schema}, schema=out_schema
                )
            df = pl.from_arrow(tb)
            left = df.filter(pl.col("__side") == 0).drop(["__k", "__side"])
            right = df.filter(pl.col("__side") == 1).select(["__j", "__k"])
            out = left.join(right, on="__j", how="inner").rename(
                {"__j": join_out, "__k": key_out}
            )
            return out.select([f.name for f in out_schema]).to_arrow().cast(out_schema)

        return local_group_map(tagged, ["__j"], block, keys_non_null=True)

    with_a = _attach(pairs, "a", [("b", pa.int64())], "__ka")
    joined = _attach(with_a, "b", [("a", pa.int64()), ("__ka", pa.large_binary())], "__kb")

    def _verify(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in _OUT_SCHEMA}, schema=_OUT_SCHEMA)
        fa, oa = _flat_bytes(tb["__ka"])
        fb, ob = _flat_bytes(tb["__kb"])
        dist = levenshtein_bytes_batch(fa, oa[:-1], np.diff(oa), fb, ob[:-1], np.diff(ob))
        keep = dist <= k
        a = tb["a"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        b = tb["b"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        return pa.table({"id_a": a, "id_b": b, "dist": dist[keep]}, schema=_OUT_SCHEMA)

    return joined.map_batches(_verify, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def fuzzy_dedup(
    ds,
    id_col: str,
    key_col: str,
    k: int = 2,
    driver_merge_max_bytes: int = 256 << 20,
    size_hint_bytes: int | None = None,
    max_block_pairs: int = 16_000_000,
):
    """DEDUP tail over :func:`edit_distance_pairs`: keep only the min-id
    row of every edit-distance-≤k connected component of key strings —
    the record-linkage dedup (near-identical titles/names/URLs) with the
    same survivor convention as the SimHash/MinHash family (component =
    transitive closure of the pair graph, survivor = min member id).

    Thin composition of already-verified pieces: the similarity join
    emits the exact pair graph, ``cluster_drop_ids`` contracts each edge
    block to a spanning star and finishes with one driver union-find (or
    min-label propagation above its budget — the contracted graph is
    bounded by the duplicated-row count, not the edge count), and
    ``shuffle_anti_join`` removes the drops without anything O(corpus)
    touching the driver."""
    from .distributed import cluster_drop_ids, shuffle_anti_join

    pairs = edit_distance_pairs(
        ds, id_col, key_col, k,
        driver_merge_max_bytes=driver_merge_max_bytes,
        size_hint_bytes=size_hint_bytes,
        max_block_pairs=max_block_pairs,
    )

    def as_edges(tb: pa.Table) -> pa.Table:
        return pa.table(
            {"a": tb["id_a"], "b": tb["id_b"]},
            schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
        )

    edges = pairs.map_batches(as_edges, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return shuffle_anti_join(ds, id_col, cluster_drop_ids(edges))
