"""Temporal operators Ray Data lacks natively: distributed as-of join
and gap-based sessionization.

Both compose the engine's hash-shuffle primitive (SURVEY.md §2 "custom
operators" path (a)): tag-and-union the sides into one schema →
``repartition(keys=[key])`` co-locates every row of a key → ONE
vectorized polars kernel per block (sort + ``join_asof`` / gap cumsum).
The partitioning assumption each relies on: all rows of a join/session
key fit one block — true whenever no single user/entity dominates the
corpus; salt hot keys upstream if that breaks.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from .shuffle import local_group_map, select_if_needed

_SIDE = "__side"


def _tagged_union(left_ds, left_cols: dict, right_ds, right_cols: dict, schema: pa.Schema):
    """Union two datasets into one shared schema with a side tag; columns
    absent on a side are typed nulls."""

    def norm(mapping):
        def fn(tb: pa.Table) -> pa.Table:
            n = tb.num_rows
            cols = []
            for f in schema:
                if f.name == _SIDE:
                    cols.append(pa.nulls(n, pa.int8()).fill_null(mapping["__side_val"]))
                elif f.name in mapping:
                    cols.append(tb[mapping[f.name]].cast(f.type) if tb[mapping[f.name]].type != f.type else tb[mapping[f.name]])
                else:
                    cols.append(pa.nulls(n, f.type))
            return pa.Table.from_arrays(cols, schema=schema)

        return fn

    lm = dict(left_cols, __side_val=0)
    rm = dict(right_cols, __side_val=1)
    return left_ds.map_batches(norm(lm), batch_format="pyarrow", batch_size=None, zero_copy_batch=True).union(
        right_ds.map_batches(norm(rm), batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def asof_join(
    left_ds,
    right_ds,
    key: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    strategy: str = "backward",
    dedupe_right: bool = True,
    right_key: str | None = None,
    num_blocks: int | None = None,
):
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` (backward; "forward" = least >=) sharing
    ``key``. Unmatched left rows keep null right values (left-join
    semantics, like DuckDB's ``ASOF LEFT JOIN``).

    ``dedupe_right=True`` collapses right rows sharing (key, ts) to their
    per-column MAX first — ties at the as-of instant are otherwise
    nondeterministic in ANY engine (and break oracle comparison).

    Distributed shape: tag-union → hash-shuffle by key (both sides
    co-locate) → per-block polars sort + ``join_asof``. Only the named
    columns travel.
    """
    left_schema = left_ds.schema().base_schema
    right_schema = right_ds.schema().base_schema
    ts_type = left_schema.field(left_ts).type
    out_left = [f for f in left_schema]
    schema = pa.schema(
        [(_SIDE, pa.int8())]
        + [(f.name, f.type) for f in out_left]
        + [("__rts", ts_type)]
        + [(f"__rv_{c}", right_schema.field(c).type) for c in right_values]
    )
    rk = right_key or key
    left_map = {f.name: f.name for f in out_left}
    right_map = {key: rk, "__rts": right_ts, **{f"__rv_{c}": c for c in right_values}}
    tagged = _tagged_union(
        select_if_needed(left_ds, [f.name for f in out_left]),
        left_map,
        select_if_needed(right_ds, [rk, right_ts] + right_values),
        right_map,
        schema,
    )
    out_schema = pa.schema(
        [(f.name, f.type) for f in out_left] + [(c, right_schema.field(c).type) for c in right_values]
    )
    rename_back = {f"__rv_{c}": c for c in right_values}

    def block(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in out_schema}, schema=out_schema)
        df = pl.from_arrow(tb)
        lhs = df.filter(pl.col(_SIDE) == 0).drop([_SIDE, "__rts"] + list(rename_back))
        rhs = df.filter(pl.col(_SIDE) == 1).select([key, "__rts"] + list(rename_back))
        if dedupe_right:
            rhs = rhs.group_by([key, "__rts"]).agg([pl.col(c).max() for c in rename_back])
        lhs = lhs.sort(left_ts)
        rhs = rhs.sort("__rts")
        j = lhs.join_asof(rhs, left_on=left_ts, right_on="__rts", by=key, strategy=strategy)
        j = j.rename(rename_back).select([f.name for f in out_schema])
        return j.to_arrow().cast(out_schema)

    return local_group_map(tagged, [key], block, num_blocks)


def rolling_window_agg(
    ds,
    key: str,
    ts_col: str,
    value_col: str,
    window,
    carry: list[str] | None = None,
    num_blocks: int | None = None,
):
    """Per-row trailing time-window aggregate (§2.9): for every event,
    the count and sum of the SAME KEY's events in ``[ts - window, ts]``
    (both ends inclusive — SQL ``RANGE BETWEEN window PRECEDING AND
    CURRENT ROW`` semantics, including same-timestamp peers).

    ``carry`` columns ride along through the shuffle unchanged (e.g. the
    event id) so callers never need a driver-side re-join. Hash-shuffle
    by key → per-block sort + two binary searches per row (vectorized
    ``np.searchsorted`` over the key's sorted timestamps) — O(n log n)
    per key, no per-row Python loop, no self-join blowup."""
    carry = carry or []
    need = list(dict.fromkeys([key, ts_col, value_col] + carry))
    base = ds.schema().base_schema
    out_schema = pa.schema(
        [
            (key, base.field(key).type),
            (ts_col, base.field(ts_col).type),
            (value_col, base.field(value_col).type),
        ]
        + [(c, base.field(c).type) for c in carry]
        + [
            ("w_count", pa.int64()),
            ("w_sum", pa.float64()),
        ]
    )
    win_us = int(np.timedelta64(window).astype("timedelta64[us]").astype(np.int64))

    def block(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in out_schema}, schema=out_schema)
        # sort by ALL carried columns, not just (key, ts): the range-
        # partition shuffle does not preserve row order among equal keys,
        # and within a same-timestamp tie group the cumsum accumulation
        # order changes w_sum in the last ulp — a total order makes the
        # result partitioning- and run-invariant
        df = pl.from_arrow(tb.select(need)).sort(need)
        keys_np = df[key].to_numpy()
        s = df[ts_col]
        # unit-safe epoch conversion: a raw Int64 cast yields the column's
        # NATIVE unit (ns for timestamp[ns] inputs — common from pandas),
        # silently shrinking the window 1000× against the µs constant
        # below (ADVICE round 2). Numeric ts columns pass through and are
        # interpreted as µs by contract.
        ts = s.dt.timestamp("us").to_numpy() if s.dtype.is_temporal() else s.cast(pl.Int64).to_numpy()
        vals = df[value_col].cast(pl.Float64).to_numpy()
        w_count = np.empty(len(ts), dtype=np.int64)
        w_sum = np.empty(len(ts), dtype=np.float64)
        # group boundaries of the sorted key column
        bounds = np.flatnonzero(np.concatenate([[True], keys_np[1:] != keys_np[:-1], [True]]))
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = ts[s:e]
            lo = np.searchsorted(seg, seg - win_us, side="left")
            hi = np.searchsorted(seg, seg, side="right")
            w_count[s:e] = hi - lo
            # cumsum PER KEY, not per block: a block-wide prefix sum makes
            # w_sum depend on unrelated keys in the same block through
            # float rounding, breaking partitioning-invariance of results
            csum = np.concatenate([[0.0], np.cumsum(vals[s:e])])
            w_sum[s:e] = csum[hi] - csum[lo]
        out = df.with_columns(
            w_count=pl.Series(w_count), w_sum=pl.Series(w_sum)
        )
        return out.select([f.name for f in out_schema]).to_arrow().cast(out_schema)

    return local_group_map(select_if_needed(ds, need), [key], block, num_blocks)


def lag_lead(
    ds,
    key: str,
    order_col: str,
    cols: list[str],
    lags: tuple[int, ...] = (1,),
    leads: tuple[int, ...] = (),
    carry: list[str] | None = None,
    num_blocks: int | None = None,
):
    """Per-key LAG/LEAD offsets (SQL ``LAG(c, n) OVER (PARTITION BY key
    ORDER BY order_col)``): for each column in ``cols`` and each offset,
    appends ``{c}_lag{n}`` / ``{c}_lead{n}`` holding the same key's value
    ``n`` rows earlier/later in ``order_col`` order (null past either end
    of the key's run — SQL default-NULL semantics).

    Same distribution shape as :func:`rolling_window_agg`: hash-shuffle
    co-locates each key, then ONE vectorized polars ``shift().over(key)``
    per block. The per-block sort is a TOTAL order over every selected
    column so results are invariant to block layout even when
    ``(key, order_col)`` pairs tie (ties then resolve by the remaining
    columns' values, not by shuffle arrival order)."""
    carry = carry or []
    need = list(dict.fromkeys([key, order_col] + list(cols) + carry))
    base = ds.schema().base_schema
    shifted: list[tuple[str, str, int]] = [(c, f"{c}_lag{n}", n) for c in cols for n in lags]
    shifted += [(c, f"{c}_lead{n}", -n) for c in cols for n in leads]
    dup = [name for _, name, _ in shifted if name in need]
    if dup:
        raise ValueError(f"lag/lead output columns collide with input columns: {dup}")
    out_schema = pa.schema(
        [(c, base.field(c).type) for c in need]
        + [(name, base.field(c).type) for c, name, _ in shifted]
    )

    def block(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in out_schema}, schema=out_schema)
        df = pl.from_arrow(tb.select(need)).sort(need)
        df = df.with_columns(
            [pl.col(c).shift(n).over(key).alias(name) for c, name, n in shifted]
        )
        return df.select([f.name for f in out_schema]).to_arrow().cast(out_schema)

    return local_group_map(select_if_needed(ds, need), [key], block, num_blocks)


def window_rank(
    ds,
    key: str,
    order_cols: list[str],
    kinds: tuple[str, ...] = ("row_number",),
    carry: list[str] | None = None,
    num_blocks: int | None = None,
):
    """Per-key ranking windows (SQL ``ROW_NUMBER()`` / ``RANK()`` /
    ``DENSE_RANK() OVER (PARTITION BY key ORDER BY order_cols)``), the
    §2.9 window family member LAG/LEAD and the rolling frames don't
    cover. Appends one int64 column per requested kind, named after it.

    ``RANK``/``DENSE_RANK`` are well-defined under order ties (tied rows
    share a rank). ``ROW_NUMBER`` is only deterministic when
    ``order_cols`` is a TOTAL order within each key — same contract the
    SQL function has; pass a tie-breaking unique column (e.g. the row
    id) last, exactly as you would in the ``OVER`` clause.

    Same distribution shape as :func:`lag_lead`: ONE range-partition
    shuffle co-locates each key, then one vectorized polars sort +
    ``over(key)`` rank kernel per block — no driver gather. Chained
    same-key window ops each pay the shuffle; compute multi-window
    results in one pass where possible (the driver query
    ``rolling_user_value`` chains three and is small by contract)."""
    carry = carry or []
    allowed = ("row_number", "rank", "dense_rank")
    bad = [k for k in kinds if k not in allowed]
    if bad:
        raise ValueError(f"unknown rank kinds {bad}; allowed: {allowed}")
    need = list(dict.fromkeys([key] + list(order_cols) + carry))
    base = ds.schema().base_schema
    dup = [k for k in kinds if k in need]
    if dup:
        raise ValueError(f"rank output columns collide with input columns: {dup}")
    out_schema = pa.schema(
        [(c, base.field(c).type) for c in need] + [(k, pa.int64()) for k in kinds]
    )

    def block(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in out_schema}, schema=out_schema)
        # total-order sort (all selected columns) so ROW_NUMBER ties that
        # order_cols alone would leave are still resolved identically at
        # any parallelism; rank/dense_rank read only the order_cols struct
        df = pl.from_arrow(tb.select(need)).sort(need)
        okey = pl.struct(list(order_cols)) if len(order_cols) > 1 else pl.col(order_cols[0])
        exprs = []
        for k in kinds:
            if k == "row_number":
                exprs.append(pl.int_range(1, pl.len() + 1, dtype=pl.Int64).over(key).alias(k))
            else:
                method = "min" if k == "rank" else "dense"
                exprs.append(okey.rank(method).over(key).cast(pl.Int64).alias(k))
        df = df.with_columns(exprs)
        return df.select([f.name for f in out_schema]).to_arrow().cast(out_schema)

    return local_group_map(select_if_needed(ds, need), [key], block, num_blocks)


def sessionize(
    ds,
    key: str,
    ts_col: str,
    gap,
    value_col: str | None = None,
    num_blocks: int | None = None,
):
    """Gap-based session windows (§2.9 beyond tumbling/sliding): per key,
    events sorted by time start a NEW session whenever the gap to the
    previous event exceeds ``gap`` (a ``datetime.timedelta`` or numpy
    timedelta). Output: one row per session —
    (key, session_id 1..n per key in time order, session_start,
    session_end, n_events[, sum_value]).

    Hash-shuffle by key → per-block polars sort + cumulative gap-break
    sum. Session numbering is deterministic: ties at the same timestamp
    share a session regardless of intra-tie order.
    """
    need = [key, ts_col] + ([value_col] if value_col else [])
    ts_type = ds.schema().base_schema.field(ts_col).type
    out_fields = [
        (key, ds.schema().base_schema.field(key).type),
        ("session_id", pa.int64()),
        ("session_start", ts_type),
        ("session_end", ts_type),
        ("n_events", pa.int64()),
    ]
    if value_col:
        out_fields.append(("sum_value", pa.float64()))
    out_schema = pa.schema(out_fields)
    gap_us = int(np.timedelta64(gap).astype("timedelta64[us]").astype(np.int64))

    def block(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in out_schema}, schema=out_schema)
        # total-order sort (see rolling_window_agg): sum_value must not
        # depend on intra-tie row order delivered by the shuffle
        df = pl.from_arrow(tb.select(need)).sort(need)
        brk = (
            (pl.col(ts_col).diff().over(key).dt.total_microseconds() > gap_us)
            .fill_null(True)
            .cast(pl.Int64)
        )
        df = df.with_columns(session_id=brk.cum_sum().over(key))
        aggs = [
            pl.col(ts_col).min().alias("session_start"),
            pl.col(ts_col).max().alias("session_end"),
            pl.len().cast(pl.Int64).alias("n_events"),
        ]
        if value_col:
            aggs.append(pl.col(value_col).sum().cast(pl.Float64).alias("sum_value"))
        out = df.group_by([key, "session_id"]).agg(aggs)
        return out.select([f.name for f in out_schema]).to_arrow().cast(out_schema)

    return local_group_map(select_if_needed(ds, need), [key], block, num_blocks)
