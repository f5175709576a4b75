"""Hash-shuffle building blocks for high-cardinality grouped work.

Ray Data's ``groupby().aggregate()`` materializes per-group state in Python
and collapses under millions of distinct groups (measured ~10× slower than
the pattern here on 300k distinct keys). The engine's wide-key operators
(uniqueness counts, LSH bucket grouping, exact dedup survivors) instead
use:

    ds.repartition(num_blocks, keys=K)    # hash shuffle: co-locate keys
      .map_batches(local_fn, batch_size=None)   # whole-block local groupby
                                                # (polars / arrow kernels)

which keeps the all-to-all exchange but runs the per-group logic as one
vectorized kernel per block. Requires ``ShuffleStrategy.HASH_SHUFFLE``
(set at package import in ``anomalydetection_ray/__init__``).

Low-cardinality groupbys (stats merge: partitions × columns; pricing
summaries: handful of groups) stay on the native
``groupby().aggregate()`` path — the combiner has already collapsed the
data, so the shuffle is kilobytes either way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc


def default_num_blocks(min_blocks: int = 8) -> int:
    """Shuffle fan-out: ~2 output blocks per CPU (cluster-wide)."""
    import ray

    from .. import tune_shuffle_to_cluster

    tune_shuffle_to_cluster()
    try:
        cpus = int(ray.cluster_resources().get("CPU", min_blocks))
    except Exception:
        cpus = min_blocks
    return max(min_blocks, cpus * 2)


def select_if_needed(ds, cols: list[str]):
    """``select_columns`` only when it would change the schema.

    A Project operator directly after ReadParquet PREVENTS read→map fusion
    in Ray Data — every decompressed block then round-trips through the
    object store before the map task sees it (measured ~40% of stats-pass
    wall time). Callers that already pruned columns at the read skip the
    no-op Project entirely."""
    try:
        schema = ds.schema(fetch_if_missing=False)
    except Exception:
        schema = None
    if schema is not None:
        names = getattr(schema, "names", None) or [f.name for f in schema.base_schema]
        if set(names) == set(cols):
            return ds
    return ds.select_columns(cols)


def arrow_schema(ds) -> pa.Schema:
    """The dataset's schema as a ``pyarrow.Schema``.

    Parquet reads and pyarrow ``map_batches`` outputs already carry one;
    pandas-block datasets (``from_pandas`` — test fixtures) carry a
    ``PandasBlockSchema`` whose object dtypes are ambiguous, so for those
    the first real batch is consulted (streaming — executes only until
    one batch exists; never happens on the parquet hot paths)."""
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base
    for tb in ds.iter_batches(batch_format="pyarrow", batch_size=1):
        return tb.schema
    return pa.schema([])


def default_actor_concurrency(min_actors: int = 2) -> int:
    """Actor-pool size for stateful map_batches stages: ~60% of cluster
    CPUs. Actors hold their CPU for the pipeline's lifetime, so sizing the
    pool to ALL CPUs starves concurrent read tasks and downstream shuffle
    aggregators — a hard deadlock on small clusters."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", min_actors))
    except Exception:
        cpus = min_actors
    return max(min_actors, int(cpus * 0.6))


def blocks_for_bytes(nbytes: int, bytes_per_block: int = 32 << 20) -> int:
    """Read fan-out sized to the INPUT: ~one block per 32 MB, capped at
    the cluster default. Ray's default heuristic splits even a 1 MB file
    into cpus×2 blocks, and a stage whose per-batch kernel has fixed
    setup cost (polars explode, model dispatch) then pays that cost
    dozens of times for kilobytes of work each."""
    return max(1, min(default_num_blocks(), -(-nbytes // bytes_per_block)))


def metadata_size_estimate(ds) -> int | None:
    """Size estimate that can NEVER trigger execution.

    ``Dataset.size_bytes()`` is metadata-only for a freshly-read or
    in-memory dataset, but on a transformed lazy plan Ray Data may
    execute the whole upstream pipeline just to learn the size — an
    extra full pass before the real job (ADVICE round 2). Only plans
    whose root is a bare Read / in-memory From operator are consulted;
    anything else returns None and callers fall back to their cap."""
    try:
        from ray.data._internal.logical.operators.read_operator import Read

        roots: list = [Read]
        try:
            from ray.data._internal.logical.operators.from_operators import AbstractFrom

            roots.append(AbstractFrom)
        except Exception:
            pass
        try:
            # a materialized dataset's size is exact block metadata — and
            # stage-boundary materialization (e.g. the curation flagship)
            # is exactly where right-sized actor pools matter most
            from ray.data._internal.logical.operators.input_data_operator import InputData

            roots.append(InputData)
        except Exception:
            pass
        roots = tuple(roots)
        dag = ds._logical_plan.dag
        if isinstance(dag, roots):
            return ds.size_bytes()
    except Exception:
        return None
    return None


def sized_actor_concurrency(ds, min_actors: int = 1, bytes_per_actor: int = 32 << 20) -> int:
    """Actor-pool size scaled to the INPUT: ~one actor per 32 MB of the
    metadata size estimate (:func:`metadata_size_estimate` — never
    executes), capped at :func:`default_actor_concurrency`. Spawning a
    full pool for a tiny input costs more than the work itself
    (~100 ms+ per actor); at 100 TB the estimate saturates the cap, so
    the large-scale plan is unchanged. Falls back to the cap when the
    input is a transformed plan with no safe estimate."""
    cap = default_actor_concurrency()
    est = metadata_size_estimate(ds)
    if est is None:
        return cap
    return max(min_actors, min(cap, -(-est // bytes_per_actor)))




def _null_fill_scalar(t: pa.DataType):
    """A type-matched constant for coalescing nulls into a sortable value,
    or None when the type has no obvious constant (caller sorts raw)."""
    try:
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return pa.scalar("", type=t)
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return pa.scalar(b"", type=t)
        if pa.types.is_boolean(t):
            return pa.scalar(False, type=t)
        if pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_temporal(t):
            return pa.scalar(0, type=t)
    except Exception:
        return None
    return None


# map_batches passes empty NON-dict batches through without calling the
# UDF (ray.data plan_udf_map_op: "For empty input blocks, we directly
# output them"), so a schema-less empty block — which Ray's sort emits
# for every empty range partition — survives a pyarrow-format UDF stage
# unchanged and then diverges from the stage's real output schema.
# Passing an int batch_size instead routes blocks through the Batcher,
# which absorbs empty blocks entirely (a task whose blocks are all empty
# emits NO output bundle). The value is far above any physical block's
# row count, so batches only ever merge whole blocks, never split one.
ABSORB_EMPTY_BATCH_SIZE = 1 << 30


def local_group_map(ds, keys: list[str], block_fn, num_blocks: int | None = None, keys_non_null: bool = False):
    """Co-partition by ``keys`` then apply ``block_fn(pa.Table) ->
    pa.Table`` once per whole block (all rows of any key are present).

    Partitioning is a range-partition SORT, not a hash shuffle: Ray's
    sort computes each row's output partition as a pure function of its
    key (searchsorted against sampled boundaries), so equal keys land in
    the same output block even under extreme skew (verified with a
    30M-copy hot value in tests/test_neardup.py), which is exactly the
    co-location contract this helper promises. The hash-shuffle
    repartition (``Dataset.repartition(keys=...)``) respawns its aggregator-actor pool
    on EVERY pipeline execution — measured ~7 s fixed cost per run at 32
    CPUs on a 4k-row input, and 28.6 s vs 3.3 s for the sort on a 58M-row
    distinct — so the sort wins at both ends of the scale. ``num_blocks``
    is accepted for API compatibility; the sort picks its own partition
    count from the input.

    Ray's sort REJECTS null keys (sample-boundary comparison raises
    TypeError), which the old hash shuffle tolerated, so by default each
    key column is duplicated into a null-coalesced ``__lgm{i}`` sort
    column (dropped before ``block_fn``). Null-group rows thereby sort
    where the fill constant sorts — possibly sharing a block with the
    real fill-value group, which is fine: the contract is only that each
    group is WHOLE in one block, and block fns distinguish null from ""
    themselves (polars group_by keeps them separate). Engine-internal
    callers whose keys are non-null by construction (content hashes, band
    keys, packed pair ids) pass ``keys_non_null=True`` to skip the
    duplicated key bytes on the wire.

    Empty range partitions of the sort carry NO schema (Ray builds them
    from an empty block builder), and ``map_batches`` passes empty
    non-dict batches through WITHOUT calling the UDF, so with
    ``batch_size=None`` those schema-less empties would survive the
    block-fn stage and trigger Ray's "RefBundle with a different schema"
    divergence warning on every downstream union (round-4 verdict #2).
    ``ABSORB_EMPTY_BATCH_SIZE`` routes blocks through the Batcher, which
    silently absorbs empty blocks; groups stay whole because the batch
    size exceeds any physical block's row count (batches only ever MERGE
    sorted partitions, never split one)."""
    del num_blocks
    import pyarrow.compute as pc

    if keys_non_null:
        return ds.sort(keys).map_batches(
            block_fn, batch_format="pyarrow", batch_size=ABSORB_EMPTY_BATCH_SIZE, zero_copy_batch=True
        )
    tmp = [f"__lgm{i}" for i in range(len(keys))]

    def add_sort_keys(tb: pa.Table) -> pa.Table:
        for name, k in zip(tmp, keys):
            arr = tb[k]
            fill = _null_fill_scalar(arr.type)
            filled = pc.coalesce(arr, fill) if fill is not None else arr
            tb = tb.append_column(name, filled)
        return tb

    def strip_and_apply(tb: pa.Table) -> pa.Table:
        return block_fn(tb.drop_columns(tmp))

    keyed = ds.map_batches(add_sort_keys, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return keyed.sort(tmp).map_batches(
        strip_and_apply, batch_format="pyarrow", batch_size=ABSORB_EMPTY_BATCH_SIZE, zero_copy_batch=True
    )


def _spec_value_cols(spec: dict[str, tuple[str | None, str]]) -> list[str]:
    """Input columns an agg spec touches ("count" needs none; corr/covar
    name a two-column tuple)."""
    cols: list[str] = []
    for col, op in spec.values():
        if op == "count" or not col:
            continue
        cols.extend(col) if isinstance(col, tuple) else cols.append(col)
    return cols

def driver_grouped_agg(
    ds,
    keys: list[str],
    spec: dict[str, tuple[str | None, str]],
    batch_size: int | None = None,
):
    """Low-cardinality grouped aggregate with NO shuffle.

    ``spec``: ``alias -> (column, op)`` with op in
    {"sum", "mean", "min", "max", "count", "std"} ("count" ignores the
    column; "std" is the SQL sample standard deviation via
    sum/sum-of-squares partials — fine away from the catastrophic-
    cancellation regime std << |mean|; use ``checks.stats.column_stats``
    (Chan moments) when that regime matters).

    Per-block polars partials (sum/count/min/max — mean decomposes into
    sum+count) stream to the driver and merge there in one grouped pass.
    This is the scale-correct plan whenever distinct(keys) is
    small-bounded (the FINAL table must fit one machine anyway): the
    exchange is (blocks × groups) partial rows — kilobytes — while the
    hash-shuffle path pays a fixed aggregator-actor spawn per pipeline
    (~3-4 s at 32 CPUs) that dwarfs small inputs. High-cardinality
    groupbys (dedup keys, templates) use grouped_sum / grouped_min.
    Returns a pandas DataFrame with columns ``keys + list(spec)``.
    """
    import pandas as pd

    partial_exprs = _agg_partial_exprs(spec)

    def partial(batch: pa.Table) -> pa.Table:
        out = pl.from_arrow(batch).group_by(keys).agg(partial_exprs)
        return out.to_arrow()

    need = list(dict.fromkeys(keys + _spec_value_cols(spec)))
    blocks = [
        tb
        for tb in select_if_needed(ds, need)
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
        if tb.num_rows
    ]
    if not blocks:
        return pd.DataFrame(columns=keys + list(spec))
    merged = pl.from_arrow(pa.concat_tables(blocks, promote_options="default"))
    out = merged.group_by(keys).agg(_agg_final_exprs(spec)).sort(keys)
    return out.to_pandas()


def _agg_partial_exprs(spec: dict[str, tuple[str | None, str]]):
    exprs = []
    for alias, (col, op) in spec.items():
        if op == "sum":
            exprs.append(pl.col(col).sum().alias(f"{alias}__sum"))
        elif op == "mean":
            exprs.append(pl.col(col).sum().alias(f"{alias}__sum"))
            exprs.append(pl.col(col).count().alias(f"{alias}__cnt"))
        elif op == "std":
            exprs.append(pl.col(col).sum().alias(f"{alias}__sum"))
            exprs.append((pl.col(col).cast(pl.Float64) ** 2).sum().alias(f"{alias}__sumsq"))
            exprs.append(pl.col(col).count().alias(f"{alias}__cnt"))
        elif op == "min":
            exprs.append(pl.col(col).min().alias(f"{alias}__min"))
        elif op == "max":
            exprs.append(pl.col(col).max().alias(f"{alias}__max"))
        elif op == "count":
            exprs.append(pl.len().alias(f"{alias}__cnt"))
        elif op in ("corr", "covar", "regr_slope", "regr_intercept", "regr_r2"):
            # Two-column co-moments. SQL CORR/COVAR_SAMP/REGR_* use only
            # rows where BOTH sides are non-null, so every partial is
            # masked by pairwise completeness (plain per-column sums would
            # silently include half-null rows and diverge from DuckDB).
            # regr ops name the column pair SQL-style: (y, x) — swap so
            # the internal x is always the regression x
            xc, yc = col
            if op.startswith("regr"):
                yc, xc = col
            both = pl.col(xc).is_not_null() & pl.col(yc).is_not_null()
            x = pl.when(both).then(pl.col(xc).cast(pl.Float64))
            y = pl.when(both).then(pl.col(yc).cast(pl.Float64))
            exprs.append(x.sum().alias(f"{alias}__sx"))
            exprs.append(y.sum().alias(f"{alias}__sy"))
            exprs.append((x * y).sum().alias(f"{alias}__sxy"))
            exprs.append(both.sum().alias(f"{alias}__cnt"))
            if op in ("corr", "regr_slope", "regr_intercept", "regr_r2"):
                exprs.append((x * x).sum().alias(f"{alias}__sxx"))
            if op in ("corr", "regr_r2"):
                exprs.append((y * y).sum().alias(f"{alias}__syy"))
        else:
            raise ValueError(f"unsupported op {op!r}")
    return exprs


def _agg_final_exprs(spec: dict[str, tuple[str | None, str]]):
    exprs = []
    for alias, (col, op) in spec.items():
        if op == "sum":
            exprs.append(pl.col(f"{alias}__sum").sum().alias(alias))
        elif op == "mean":
            exprs.append((pl.col(f"{alias}__sum").sum() / pl.col(f"{alias}__cnt").sum()).alias(alias))
        elif op == "std":
            n = pl.col(f"{alias}__cnt").sum()
            # cast BEFORE squaring: Int64 ** 2 stays Int64 in polars and
            # silently wraps once a group's sum exceeds ~3.04e9 (the
            # partial pass casts sumsq but this final expr didn't)
            s = pl.col(f"{alias}__sum").sum().cast(pl.Float64)
            var = (pl.col(f"{alias}__sumsq").sum() - s**2 / n) / (n - 1)
            # n == 1: SQL stddev_samp is NULL, not a 0/0 NaN
            exprs.append(pl.when(n > 1).then(var.sqrt()).alias(alias))
        elif op == "min":
            exprs.append(pl.col(f"{alias}__min").min().alias(alias))
        elif op == "max":
            exprs.append(pl.col(f"{alias}__max").max().alias(alias))
        elif op == "count":
            exprs.append(pl.col(f"{alias}__cnt").sum().alias(alias))
        elif op in ("corr", "covar", "regr_slope", "regr_intercept", "regr_r2"):
            n = pl.col(f"{alias}__cnt").sum()
            sx = pl.col(f"{alias}__sx").sum()
            sy = pl.col(f"{alias}__sy").sum()
            cov = (pl.col(f"{alias}__sxy").sum() - sx * sy / n) / (n - 1)
            # degenerate-group SQL parity (round-5 review; verified
            # against DuckDB): covar_samp is NULL at n<2 (0/0 NaN
            # otherwise); corr is additionally NULL when EITHER side is
            # constant; regr_slope/intercept are NULL when x is constant
            # (y constant is fine: slope 0); regr_r2 is NULL when x is
            # constant and exactly 1 when only y is
            if op == "covar":
                exprs.append(pl.when(n > 1).then(cov).alias(alias))
            elif op == "corr":
                vx = (pl.col(f"{alias}__sxx").sum() - sx**2 / n) / (n - 1)
                vy = (pl.col(f"{alias}__syy").sum() - sy**2 / n) / (n - 1)
                exprs.append(
                    pl.when((n > 1) & (vx > 0) & (vy > 0))
                    .then(cov / (vx.sqrt() * vy.sqrt()))
                    .alias(alias)
                )
            else:
                # least-squares fit of y on x (the (n-1) factors cancel in
                # slope and r2, so population/sample choice is irrelevant)
                sxx_c = pl.col(f"{alias}__sxx").sum() - sx**2 / n
                sxy_c = pl.col(f"{alias}__sxy").sum() - sx * sy / n
                slope = sxy_c / sxx_c
                if op == "regr_slope":
                    exprs.append(pl.when(sxx_c > 0).then(slope).alias(alias))
                elif op == "regr_intercept":
                    exprs.append(
                        pl.when(sxx_c > 0).then(sy / n - slope * sx / n).alias(alias)
                    )
                else:
                    syy_c = pl.col(f"{alias}__syy").sum() - sy**2 / n
                    exprs.append(
                        pl.when(sxx_c > 0)
                        .then(
                            pl.when(syy_c > 0)
                            .then(sxy_c**2 / (sxx_c * syy_c))
                            .otherwise(1.0)
                        )
                        .alias(alias)
                    )
    return exprs


def grouping_sets_agg(
    ds,
    keys: list[str],
    sets: list[tuple[str, ...]],
    spec: dict[str, tuple[str | None, str]],
    batch_size: int | None = None,
):
    """SQL ``GROUP BY GROUPING SETS (...)`` from ONE scan: aggregates at
    every requested key subset, with absent key columns NULL — DuckDB's
    grouping-sets row shape.

    Same no-shuffle plan as :func:`driver_grouped_agg` (low-cardinality
    contract: the FINEST level's distinct keys are small-bounded): the
    per-block partial pass runs ONCE grouped by ALL of ``keys``, and
    every set re-merges the same tiny partial table on the driver —
    mergeable partials (sum/count/min/max/sumsq/co-moments) make each
    set exact, mean/std/corr included, with no second scan of the
    corpus. Sets are emitted in caller order (duplicate sets duplicate
    rows, as in SQL); each set's rows sort by its own keys. Returns a
    pandas DataFrame with columns ``keys + list(spec)``."""
    import pandas as pd

    for s in sets:
        unknown = set(s) - set(keys)
        if unknown:
            raise ValueError(f"grouping set {s} names columns not in keys: {sorted(unknown)}")

    partial_exprs = _agg_partial_exprs(spec)

    def partial(batch: pa.Table) -> pa.Table:
        return pl.from_arrow(batch).group_by(keys).agg(partial_exprs).to_arrow()

    need = list(dict.fromkeys(keys + _spec_value_cols(spec)))
    blocks = [
        tb
        for tb in select_if_needed(ds, need)
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
        if tb.num_rows
    ]
    if not blocks:
        return pd.DataFrame(columns=keys + list(spec))
    merged = pl.from_arrow(pa.concat_tables(blocks, promote_options="default"))
    final_exprs = _agg_final_exprs(spec)
    levels = []
    for s in sets:
        cols = [k for k in keys if k in s]  # canonical key order within a set
        if cols:
            lvl = merged.group_by(cols).agg(final_exprs)
        else:
            lvl = merged.select(final_exprs)
        lvl = lvl.with_columns(
            [pl.lit(None).cast(merged.schema[k]).alias(k) for k in keys if k not in s]
        ).select(keys + list(spec))
        levels.append(lvl.sort(cols) if cols else lvl)
    return pl.concat(levels).to_pandas()


def rollup_agg(
    ds,
    keys: list[str],
    spec: dict[str, tuple[str | None, str]],
    batch_size: int | None = None,
):
    """SQL ``GROUP BY ROLLUP(keys...)``: every prefix level, finest
    first, down to the grand total — the prefix-sets special case of
    :func:`grouping_sets_agg` (one scan, driver re-merge per level)."""
    sets = [tuple(keys[:m]) for m in range(len(keys), -1, -1)]
    return grouping_sets_agg(ds, keys, sets, spec, batch_size=batch_size)


def cube_agg(
    ds,
    keys: list[str],
    spec: dict[str, tuple[str | None, str]],
    batch_size: int | None = None,
):
    """SQL ``GROUP BY CUBE(keys...)``: all 2^n key subsets from the same
    single scan (DuckDB's CUBE emission order: full set first, then
    dropping later keys first). The 2^n blow-up is in the tiny driver
    merge, never in corpus passes — n is bounded by the caller (>10
    keys is rejected as a misuse guard)."""
    if len(keys) > 10:
        raise ValueError(f"cube over {len(keys)} keys = {2 ** len(keys)} sets; use grouping_sets_agg")
    sets: list[tuple[str, ...]] = []
    for mask in range(2 ** len(keys) - 1, -1, -1):
        sets.append(tuple(k for i, k in enumerate(keys) if mask & (1 << (len(keys) - 1 - i))))
    return grouping_sets_agg(ds, keys, sets, spec, batch_size=batch_size)


def grouped_min(ds, keys: list[str], value_col: str, out_col: str, num_blocks: int | None = None, keys_non_null: bool = False):
    """MIN(value) GROUP BY keys for high-cardinality keys (e.g. exact-dedup
    survivor selection: min id per content fingerprint)."""

    def local(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return tb.select(keys).append_column(out_col, pa.array([], type=tb.schema.field(value_col).type))
        out = pl.from_arrow(tb.select(keys + [value_col])).group_by(keys).agg(
            pl.col(value_col).min().alias(out_col)
        )
        fields = [tb.schema.field(k) for k in keys] + [pa.field(out_col, tb.schema.field(value_col).type)]
        return out.to_arrow().cast(pa.schema(fields))

    return local_group_map(ds, keys, local, num_blocks, keys_non_null=keys_non_null)


def quantile_column_names(quantiles: list[float]) -> list[str]:
    """Collision-free output names for quantile columns: ``0.5 → q50``,
    ``0.95 → q95``, ``0.999 → q99_9``, ``0.29 → q29``. The previous
    ``int(q*100)`` truncation misnamed non-integral percents (0.29 →
    'q28') and collided distinct quantiles (0.99 and 0.999 both →
    'q99') — ADVICE round 2. Duplicate names are rejected up front."""
    names = [f"q{q * 100:g}".replace(".", "_").replace("-", "m") for q in quantiles]
    if len(set(names)) != len(names):
        raise ValueError(f"quantiles {quantiles} produce duplicate column names {names}")
    return names


def grouped_exact_quantiles(
    ds,
    keys: list[str],
    value_col: str,
    quantiles: list[float],
    num_blocks: int | None = None,
    mad_col: str | None = None,
):
    """EXACT per-group quantiles at scale: hash-shuffle ONLY
    (keys, value) — the value column is narrow (numbers), so the
    exchange is ~8-16 bytes/row even on a 100 TB corpus — then one
    vectorized np.percentile per group per block (all rows of a group are
    co-located). Linear interpolation, matching SQL ``quantile_cont``.
    For single-pass approximate quantiles over wide data use the KLL
    sketch path (checks/stats.py) instead.

    ``mad_col``: also emit the median absolute deviation
    (median(|x - median(x)|), SQL ``mad()``) per group — the robust
    scale estimate anomaly thresholds prefer over stddev under heavy
    tails. Co-location makes it FREE here: both medians compute inside
    the same block pass, no second corpus scan (the naive plan is two
    full passes — grouped median, broadcast, grouped median of
    deviations)."""
    qs = list(quantiles)
    qnames = quantile_column_names(qs)
    if mad_col in qnames or mad_col in keys:
        raise ValueError(f"mad_col {mad_col!r} collides with an output column")
    out_names = qnames + ([mad_col] if mad_col else [])

    def local(tb: pa.Table) -> pa.Table:
        schema = pa.schema(
            [tb.schema.field(k) for k in keys]
            + [pa.field(qn, pa.float64()) for qn in out_names]
        )
        if tb.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in schema}, schema=schema)
        df = pl.from_arrow(tb.select(keys + [value_col])).drop_nulls(value_col)
        rows = []
        for key_vals, g in df.group_by(keys):
            vals = g[value_col].to_numpy()
            rec = dict(zip(keys, key_vals))
            pct = np.percentile(vals, [q * 100 for q in qs]) if vals.size else [float("nan")] * len(qs)
            for qn, v in zip(qnames, pct):
                rec[qn] = float(v)
            if mad_col:
                rec[mad_col] = (
                    float(np.median(np.abs(vals - np.median(vals)))) if vals.size else float("nan")
                )
            rows.append(rec)
        return pa.Table.from_pylist(rows, schema=schema)

    return local_group_map(select_if_needed(ds, keys + [value_col]), keys, local, num_blocks)


def grouped_kll_quantiles(
    ds,
    keys: list[str],
    value_col: str,
    quantiles: list[float],
    k: int = 256,
    num_blocks: int | None = None,
):
    """APPROXIMATE per-group quantiles from mergeable KLL sketches — the
    scale path next to :func:`grouped_exact_quantiles`: the exact plan
    ships every row's (keys, value) pair (~16 B/row — 100s of GB of
    exchange at 100 TB), while this plan ships ONE ~k-item sketch per
    (group, block) (~2 KB each), so the exchange is
    O(groups × blocks × k) — independent of row count. Per block, one
    KLL per group it contains; the hash shuffle co-locates each group's
    sketches; one n-ary ``KLL.merge_many`` per group emits the quantile
    columns (same names as the exact op). Worst-case rank error is the
    sketch's O(1/k) guarantee — assert RANK ERROR, never value equality
    (SURVEY §7.4; k=256 measures ~0.01)."""
    from ..sketches.kll import KLL

    qs = list(quantiles)
    qnames = quantile_column_names(qs)

    def key_fields(tb: pa.Table) -> list[pa.Field]:
        return [tb.schema.field(kc) for kc in keys]

    def partial(tb: pa.Table) -> pa.Table:
        schema = pa.schema(key_fields(tb) + [pa.field("__kll", pa.binary())])
        if tb.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in schema}, schema=schema)
        df = pl.from_arrow(tb.select(keys + [value_col])).drop_nulls(value_col)
        rows = []
        for key_vals, g in df.group_by(keys):
            rec = dict(zip(keys, key_vals))
            rec["__kll"] = KLL(k).update(g[value_col].to_numpy()).to_bytes()
            rows.append(rec)
        return pa.Table.from_pylist(rows, schema=schema)

    def final(tb: pa.Table) -> pa.Table:
        schema = pa.schema(key_fields(tb) + [pa.field(qn, pa.float64()) for qn in qnames])
        if tb.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in schema}, schema=schema)
        rows = []
        for key_vals, g in pl.from_arrow(tb).group_by(keys):
            sk = KLL.merge_many(KLL.from_bytes(b) for b in g["__kll"].to_list())
            rec = dict(zip(keys, key_vals))
            for qn, v in zip(qnames, sk.quantiles(qs)):
                rec[qn] = float(v)
            rows.append(rec)
        return pa.Table.from_pylist(rows, schema=schema)

    parts = select_if_needed(ds, keys + [value_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    return local_group_map(parts, keys, final, num_blocks)


def robust_outlier_flags(
    ds,
    keys: list[str],
    value_col: str,
    threshold: float = 3.5,
    consistency: float = 1.4826,
    z_col: str = "robust_z",
    flag_col: str = "is_outlier",
    stats: pd.DataFrame | None = None,
    num_blocks: int | None = None,
):
    """Per-row ROBUST outlier flag from the group median/MAD z-score —
    the heavy-tail-safe anomaly rule (Iglewicz–Hoaglin modified z-score;
    reference analog: the mean±σ threshold of
    ``end_to_end_prediction.py:447-451``, which a single huge outlier can
    drag past every other anomaly; median/MAD has a 50% breakdown point).

    Two stages, both scale-safe:

    1. STATS — per-group median + MAD via :func:`grouped_exact_quantiles`
       (only (keys, value) — ~16 B/row — enters the exchange; both medians
       compute in one co-located pass). Groups ≪ rows, so the stats table
       is driver-small; pass ``stats`` (pandas: keys + ``med`` + ``mad``)
       to reuse a precomputed table and skip the pass.
    2. FLAG — the stats ship ONCE through the object store
       (:func:`~anomalydetection_ray.functions.relational.broadcast_join`,
       how='left') and every batch appends, in pure Arrow kernels:

       - ``z_col`` = (x − med) / (consistency · mad), NULL when mad == 0
         (or the group is absent from ``stats``);
       - ``flag_col`` (int32 0/1) = |x − med| > threshold · consistency ·
         mad — division-free, so degenerate mad=0 groups still flag every
         value off the median, matching
         ``ABS(x - med) > t * c * mad`` in SQL.

    consistency=1.4826 makes MAD estimate σ under normality; threshold=3.5
    is the standard modified-z cut. Rows with null values get null z/flag
    (SQL comparison semantics); an all-null group never enters the stats
    table, so its rows are exactly that null-value case, and rows whose
    group is absent from a user-supplied ``stats`` get null z/flag too —
    count non-flagged rows with ``flag IS DISTINCT FROM 1``, not
    ``flag = 0``."""
    from .relational import broadcast_join

    for c in (z_col, flag_col, "med", "mad"):
        if c in keys or c == value_col:
            raise ValueError(f"output/stat column {c!r} collides with an input column")
    if stats is None:
        st = (
            grouped_exact_quantiles(ds, keys, value_col, [0.5], num_blocks=num_blocks, mad_col="mad")
            .to_pandas()
            .rename(columns={"q50": "med"})
        )
    else:
        missing = {*keys, "med", "mad"} - set(stats.columns)
        if missing:
            raise ValueError(f"stats is missing columns {sorted(missing)}")
        st = stats[keys + ["med", "mad"]]
    joined = broadcast_join(ds, keys, st, keys, how="left")
    thr = float(threshold) * float(consistency)

    def flag(tb: pa.Table) -> pa.Table:
        dev = pc.subtract(pc.cast(tb[value_col], pa.float64()), tb["med"])
        scale = pc.multiply(tb["mad"], pa.scalar(float(consistency), type=pa.float64()))
        z = pc.divide(
            dev, pc.if_else(pc.equal(scale, 0.0), pa.scalar(None, type=pa.float64()), scale)
        )
        hit = pc.greater(
            pc.abs(dev), pc.multiply(tb["mad"], pa.scalar(thr, type=pa.float64()))
        )
        return (
            tb.drop_columns(["med", "mad"])
            .append_column(z_col, z)
            .append_column(flag_col, pc.cast(hit, pa.int32()))
        )

    return joined.map_batches(flag, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def impute_group_stat(
    ds,
    keys: list[str],
    value_col: str,
    stat: str = "median",
    out_col: str | None = None,
    stats: pd.DataFrame | None = None,
    num_blocks: int | None = None,
):
    """Null IMPUTATION with the group statistic — SQL
    ``COALESCE(x, stat(x) OVER (PARTITION BY keys))`` — the
    missing-data repair stage a feature pipeline runs before scoring.

    ``stat`` ∈ {'median', 'mean'}: median comes from the co-located
    :func:`grouped_exact_quantiles` pass (16 B/row exchange), mean from
    mergeable :func:`driver_grouped_agg` partials (no keyed shuffle at
    all). Either way the per-group fill table is driver-small and ships
    ONCE (``broadcast_join`` how='left'); the fill itself is one Arrow
    ``coalesce`` kernel per batch. Pass ``stats`` (pandas: keys +
    ``fill``) to impute from a REFERENCE period instead (train-time
    stats at serve time — the leakage-safe variant). Rows of groups with
    no known stat (absent from ``stats``, or all-null in-group) keep
    their nulls. ``out_col=None`` replaces ``value_col`` in place."""
    from .relational import broadcast_join

    dest = out_col or value_col
    if dest in keys:
        raise ValueError(f"output column {dest!r} collides with a key")
    if stats is None:
        if stat == "median":
            st = (
                grouped_exact_quantiles(ds, keys, value_col, [0.5], num_blocks=num_blocks)
                .to_pandas()
                .rename(columns={"q50": "fill"})
            )
        elif stat == "mean":
            st = driver_grouped_agg(ds, keys, {"fill": (value_col, "mean")})
        else:
            raise ValueError(f"stat must be 'median' or 'mean', got {stat!r}")
    else:
        missing = {*keys, "fill"} - set(stats.columns)
        if missing:
            raise ValueError(f"stats is missing columns {sorted(missing)}")
        st = stats[keys + ["fill"]]
    # an all-null group yields a NaN mean — drop it so its rows keep
    # their nulls instead of being "filled" with NaN
    st = st[st["fill"].notna()]
    joined = broadcast_join(ds, keys, st, keys, how="left")

    def fill(tb: pa.Table) -> pa.Table:
        v = pc.cast(tb[value_col], pa.float64())
        filled = pc.coalesce(v, tb["fill"])
        tb = tb.drop_columns(["fill"])
        if dest == value_col:
            return tb.set_column(tb.schema.get_field_index(value_col), value_col, filled)
        return tb.append_column(dest, filled)

    return joined.map_batches(fill, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def grouped_topk(
    ds,
    keys: list[str],
    order_col: str,
    k: int,
    tiebreak: list[str] | None = None,
    descending: bool = True,
    num_blocks: int | None = None,
):
    """Exact top-k rows per group (the windowed ``ROW_NUMBER() <= k``):
    per-batch PARTIAL top-k first (the combiner — at most k rows per
    group per block enter the exchange), then hash-shuffle + final
    per-group top-k. Deterministic under ties via ``tiebreak`` columns
    (ascending). NULL order values sort LAST (SQL's default ordering for
    ``ORDER BY x DESC`` — polars' default is nulls-FIRST, which would
    hand the top-k slots to null rows and evict real candidates in the
    combiner unrecoverably; round-5 review)."""
    tb_cols = tiebreak or []

    def topk_block(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return tb
        df = pl.from_arrow(tb)
        out = (
            df.sort(
                [order_col] + tb_cols,
                descending=[descending] + [False] * len(tb_cols),
                nulls_last=True,
            )
            .group_by(keys, maintain_order=True)
            .head(k)
        )
        return out.to_arrow().cast(tb.schema)

    partial = ds.map_batches(topk_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    return local_group_map(partial, keys, topk_block, num_blocks)


def grouped_sum(ds, keys: list[str], value_col: str, out_col: str, num_blocks: int | None = None, keys_non_null: bool = False):
    """SUM(value) GROUP BY keys for high-cardinality keys."""

    def local(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return tb.select(keys).append_column(out_col, pa.array([], type=pa.int64()))
        out = pl.from_arrow(tb.select(keys + [value_col])).group_by(keys).agg(
            pl.col(value_col).sum().alias(out_col)
        )
        # cast back: polars round-trips string -> large_string etc.
        fields = [tb.schema.field(k) for k in keys] + [pa.field(out_col, pa.int64())]
        return out.to_arrow().cast(pa.schema(fields))

    return local_group_map(ds, keys, local, num_blocks, keys_non_null=keys_non_null)


def dataset_heavy_hitters(ds, col: str, k: int = 256):
    """Distributed Misra-Gries heavy hitters over ``ds[col]``.

    No shuffle: each block reduces to an MG partial of at most ``k``
    ``(key, cnt)`` rows plus its trim error and row weight, and the
    driver absorbs the partial rows in one streamed pass — driver work
    is O(blocks × k), never O(distinct keys), so a 100 TB key column
    with billions of distinct values costs the driver the same as a
    small one. Nulls are excluded (no reference analog counts nulls as
    keys). Returns the merged :class:`MisraGries` sketch; the bound
    ``n(x) - err <= estimate(x) <= n(x)`` holds for every key
    regardless of block boundaries or merge order.
    """
    from ..sketches.heavy import MisraGries

    ds = select_if_needed(ds, [col])
    key_type = None

    def partial(tb: pa.Table) -> pa.Table:
        vals = tb[col].drop_null()
        n_b = len(vals)
        schema = pa.schema([("key", tb.schema.field(col).type), ("cnt", pa.int64()),
                            ("err", pa.int64()), ("n", pa.int64())])
        if n_b == 0:
            return schema.empty_table()
        mg = MisraGries(k).update(vals.to_numpy(zero_copy_only=False))
        m = len(mg.keys)
        if m == 0:  # total trim wipeout: carry err/n on one null-key row
            return pa.Table.from_pydict(
                {"key": pa.nulls(1, schema.field("key").type), "cnt": [0],
                 "err": [mg.err], "n": [n_b]}, schema=schema)
        err_col = np.zeros(m, dtype=np.int64)
        err_col[0] = mg.err
        n_col = np.zeros(m, dtype=np.int64)
        n_col[0] = n_b
        return pa.Table.from_pydict(
            {"key": pa.array(mg.keys).cast(schema.field("key").type),
             "cnt": pa.array(mg.counts.astype(np.int64)),
             "err": pa.array(err_col), "n": pa.array(n_col)}, schema=schema)

    out = MisraGries(k)
    err_total = 0
    n_total = 0
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    for tb in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        if tb.num_rows == 0:
            continue
        err_total += int(pc.sum(tb["err"]).as_py() or 0)
        n_total += int(pc.sum(tb["n"]).as_py() or 0)
        keyed = tb.filter(pc.is_valid(tb["key"]))
        if keyed.num_rows:
            out._absorb(keyed["key"].to_numpy(zero_copy_only=False),
                        keyed["cnt"].to_numpy(zero_copy_only=False))
    out.err += err_total
    out.n = n_total
    return out


def pivot_wide(
    ds,
    keys: list[str],
    pivot_col: str,
    pivot_values: list,
    value_col: str | None = None,
    agg: str = "count",
    prefix: str | None = None,
):
    """Grouped PIVOT (long -> wide): one output row per ``keys`` group,
    one aggregate column per ``pivot_values`` entry — SQL ``agg(value)
    FILTER (WHERE pivot_col = v)`` per value, or DuckDB ``PIVOT ... ON
    ... USING``.

    ``pivot_values`` is EXPLICIT by design: deriving it from the data
    would make the output schema a function of corpus content (unbounded
    width at scale, and a second pass to discover it); list the columns
    you want, or feed a bounded distinct you computed upstream.
    ``agg`` ∈ {"count", "sum", "min", "max", "mean"}; "count" counts
    matching rows and needs no ``value_col``. Missing combinations: 0
    for count and sum (polars' empty-sum convention — SQL FILTER yields
    NULL there, so COALESCE the oracle side), NULL/NaN for min/max/mean
    (matching SQL).

    One scan, NO shuffle: each pivot value becomes a synthesized
    column (the value where ``pivot_col`` matches, else null — an
    int64 indicator for count), and the whole pivot is ONE
    :func:`driver_grouped_agg` pass over those columns, inheriting its
    mergeable-partials plan and its low-cardinality-keys contract (the
    wide result must fit one machine anyway)."""
    if agg not in ("count", "sum", "min", "max", "mean"):
        raise ValueError(f"unsupported pivot agg {agg!r}")
    if agg != "count" and value_col is None:
        raise ValueError(f"agg {agg!r} needs a value_col")
    pfx = prefix if prefix is not None else (f"{value_col}_" if value_col else "n_")
    names = [f"{pfx}{v}" for v in pivot_values]
    if len(set(names)) != len(names) or set(names) & set(keys):
        raise ValueError(f"pivot output columns collide: {sorted(names)}")
    syn = [f"__pv_{i}" for i in range(len(pivot_values))]

    def widen(tb: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        piv = tb[pivot_col]
        if isinstance(piv, pa.ChunkedArray):
            piv = piv.combine_chunks()
        for i, v in enumerate(pivot_values):
            mask = pc.equal(piv, pa.scalar(v, type=piv.type))
            mask = pc.fill_null(mask, False)
            if agg == "count":
                col = pc.cast(mask, pa.int64())
            else:
                col = pc.if_else(mask, tb[value_col], pa.nulls(tb.num_rows, tb.schema.field(value_col).type))
            tb = tb.append_column(syn[i], col)
        return tb.select(keys + syn)

    wide = ds.map_batches(widen, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    spec = {name: (s, "sum" if agg == "count" else agg) for name, s in zip(names, syn)}
    out = driver_grouped_agg(wide, keys, spec)
    if agg == "count":
        for name in names:
            out[name] = out[name].fillna(0).astype("int64")
    return out


def global_value_ranks(ds, col: str):
    """Distributed GLOBAL ranking over one column, as a compact
    distinct-value lookup — the whole-dataset sibling of
    ``temporal.window_rank`` (SQL ``RANK()/DENSE_RANK()/PERCENT_RANK()/
    CUME_DIST() OVER (ORDER BY col)`` with no partition key).

    Plan: (1) ONE exchange reduces the corpus to globally-distinct
    ``(value, cnt)`` rows (``local_group_map`` — equal values co-locate,
    so after the per-block group count each value exists exactly once);
    (2) a range sort orders the distinct values and the result is
    MATERIALIZED so both following passes see identical block boundaries;
    (3) each batch emits one ``(min_v, cnt, ndist)`` partial — batches of
    the sorted distinct table hold disjoint value ranges, so the driver
    prefix-sum over O(batches) partials yields each batch's global row /
    distinct offsets; (4) a second pass over the SAME materialized blocks
    adds the offsets to local cumsums. Driver work is O(batches), never
    O(distinct); the corpus streams through once.

    Nulls are excluded (SQL window ORDER BY semantics are engine-specific
    for nulls; callers keep null rows unranked via the left-join apply).
    ``col`` must be numeric (the batch-boundary offset lookup keys on
    float64 mins; exact up to 2^53 for integer columns).
    Returns ``(ranks_ds, n_rows, n_distinct)`` where ``ranks_ds`` has one
    row per distinct value: ``(value, rank, dense_rank, cume_cnt)`` with
    ``rank`` = 1 + rows strictly below (SQL RANK over ties),
    ``cume_cnt`` = rows <= value (CUME_DIST numerator).
    """
    import pyarrow.compute as pc

    def _ranked_rows(tb: pa.Table) -> pa.Table:
        # exclude NaN along with null: NaN compares unequal to itself in
        # the broadcast lookup but polars joins NaN == NaN, so ranking it
        # made the two cost-gated apply plans disagree — NaN rows keep
        # null ranks everywhere instead
        mask = pc.is_valid(tb[col])
        if pa.types.is_floating(tb.schema.field(col).type):
            mask = pc.and_(mask, pc.invert(pc.is_nan(tb[col])))
        return tb.filter(mask)

    base = select_if_needed(ds, [col]).map_batches(
        _ranked_rows,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )

    def distinct_counts(tb: pa.Table) -> pa.Table:
        out = pl.from_arrow(tb.select([col])).group_by(col).agg(pl.len().cast(pl.Int64).alias("cnt"))
        fields = [tb.schema.field(col), pa.field("cnt", pa.int64())]
        return out.to_arrow().cast(pa.schema(fields))

    per_value = local_group_map(base, [col], distinct_counts, keys_non_null=True).sort(col)
    per_value = per_value.materialize()

    part_schema = pa.schema([("min_v", pa.float64()), ("cnt", pa.int64()), ("ndist", pa.int64())])

    def partial(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return part_schema.empty_table()
        v = tb[col].to_numpy(zero_copy_only=False)
        c = tb["cnt"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"min_v": [float(np.min(v))], "cnt": [int(c.sum())], "ndist": [len(v)]},
            schema=part_schema,
        )

    parts = [
        t
        for t in per_value.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    if not parts:
        import ray.data as rd

        try:
            col_type = arrow_schema(ds).field(col).type
        except (KeyError, AttributeError, TypeError):
            # a fully-empty pandas-backed dataset loses its schema
            col_type = pa.float64()
        empty = pa.table(
            {
                col: pa.array([], col_type),
                "rank": pa.array([], pa.int64()),
                "dense_rank": pa.array([], pa.int64()),
                "cume_cnt": pa.array([], pa.int64()),
            }
        )
        return rd.from_arrow(empty), 0, 0
    pdf = pa.concat_tables(parts).to_pandas().sort_values("min_v").reset_index(drop=True)
    n_rows = int(pdf["cnt"].sum())
    n_distinct = int(pdf["ndist"].sum())
    mins = pdf["min_v"].to_numpy()
    row_offs = np.concatenate([[0], np.cumsum(pdf["cnt"].to_numpy())[:-1]])
    d_offs = np.concatenate([[0], np.cumsum(pdf["ndist"].to_numpy())[:-1]])

    def add_offsets(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return pa.table(
                {
                    col: pa.array([], tb.schema.field(col).type),
                    "rank": pa.array([], pa.int64()),
                    "dense_rank": pa.array([], pa.int64()),
                    "cume_cnt": pa.array([], pa.int64()),
                }
            )
        v = tb[col].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="mergesort")
        c = tb["cnt"].to_numpy(zero_copy_only=False)[order]
        i = int(np.searchsorted(mins, float(v[order[0]]), side="right")) - 1
        if i < 0 or not np.isclose(mins[i], float(v[order[0]]), rtol=0, atol=0):
            raise RuntimeError(
                "global_value_ranks: batch boundaries changed between the "
                "offset pass and the apply pass (materialized sort no longer "
                "stable) — min %r not in the offset table" % float(v[order[0]])
            )
        local_prefix = np.concatenate([[0], np.cumsum(c)[:-1]])
        rank = row_offs[i] + local_prefix + 1
        drank = d_offs[i] + np.arange(len(v), dtype=np.int64) + 1
        cume = row_offs[i] + np.cumsum(c)
        out = pa.table(
            {
                col: tb[col].take(pa.array(order)),
                "rank": pa.array(rank.astype(np.int64)),
                "dense_rank": pa.array(drank),
                "cume_cnt": pa.array(cume.astype(np.int64)),
            }
        )
        return out

    ranks_ds = per_value.map_batches(add_offsets, batch_format="pyarrow", batch_size=None)
    return ranks_ds, n_rows, n_distinct


def with_global_rank(
    ds,
    col: str,
    kinds: tuple = ("rank", "percent_rank", "cume_dist"),
    driver_max_bytes: int = 64 << 20,
    prefix: str = "",
):
    """Append whole-dataset window-rank columns for ``col`` (SQL
    ``<kind>() OVER (ORDER BY col)``, kinds ⊆ {rank, dense_rank,
    percent_rank, cume_dist}) without ever materializing per-row ranks
    centrally: :func:`global_value_ranks` builds the distinct-value
    lookup, which is then applied broadcast-style (``ray.put`` once,
    searchsorted per batch) when it fits ``driver_max_bytes``, else via
    the generic co-partitioned :func:`~anomalydetection_ray.functions.
    relational.shuffle_hash_join` (left join — null / unseen values keep
    null ranks)."""
    import ray

    raw_names = ("rank", "dense_rank", "cume_cnt")
    in_names = set(arrow_schema(ds).names)
    taken = in_names & {f"__gvr_{k}" for k in raw_names}
    if taken:
        raise ValueError(f"input already has reserved rank columns {sorted(taken)}")
    # the FINAL names too: pa.Table.append_column happily duplicates a
    # field and the ambiguity only explodes far downstream (round-5
    # review — the check covered only the __gvr_ intermediates)
    clash = in_names & {f"{prefix}{k}" for k in kinds}
    if clash:
        raise ValueError(
            f"output rank columns {sorted(clash)} already exist; pass a prefix"
        )
    ranks_ds, n_rows, n_distinct = global_value_ranks(ds, col)
    # the lookup is exactly one value + three int64 ranks per distinct
    # value (~32 B); the transformed ranks_ds has no metadata size, so the
    # gate sizes from the distinct count the rank pass already computed
    if n_distinct * 32 > driver_max_bytes:
        from .relational import shuffle_hash_join

        def tag(tb: pa.Table) -> pa.Table:
            return tb.rename_columns([col] + [f"__gvr_{k}" for k in raw_names])

        def derive(tb: pa.Table) -> pa.Table:
            return _derive_rank_columns(tb, kinds, n_rows, prefix, raw_prefix="__gvr_")

        tagged = ranks_ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
        # left join: null col values never match and keep null ranks —
        # the same contract as the broadcast path's NaN-as-null misses
        joined = shuffle_hash_join(ds, col, tagged, col, how="left")
        return joined.map_batches(derive, batch_format="pyarrow", batch_size=None)

    lookup = pa.concat_tables(
        [t for t in ranks_ds.iter_batches(batch_format="pyarrow", batch_size=None) if t.num_rows]
    ) if n_rows else None
    if lookup is not None:
        vals = lookup[col].to_numpy(zero_copy_only=False)
        order = np.argsort(vals, kind="mergesort")
        store = ray.put(
            {
                "vals": vals[order],
                "rank": lookup["rank"].to_numpy(zero_copy_only=False)[order],
                "dense_rank": lookup["dense_rank"].to_numpy(zero_copy_only=False)[order],
                "cume_cnt": lookup["cume_cnt"].to_numpy(zero_copy_only=False)[order],
            }
        )
    else:
        store = ray.put(None)

    def apply(tb: pa.Table) -> pa.Table:
        s = ray.get(store)
        n = tb.num_rows
        rank = np.full(n, np.nan)
        drank = np.full(n, np.nan)
        cume = np.full(n, np.nan)
        if s is not None and n:
            v = tb[col].to_numpy(zero_copy_only=False)
            valid = pa.compute.is_valid(tb[col]).to_numpy(zero_copy_only=False)
            vv = v[valid]
            if len(vv):
                idx = np.searchsorted(s["vals"], vv)
                idx_c = np.minimum(idx, len(s["vals"]) - 1)
                hit = s["vals"][idx_c] == vv
                rank[valid] = np.where(hit, s["rank"][idx_c], np.nan)
                drank[valid] = np.where(hit, s["dense_rank"][idx_c], np.nan)
                cume[valid] = np.where(hit, s["cume_cnt"][idx_c], np.nan)
        cols = {"rank": rank, "dense_rank": drank, "cume_cnt": cume}
        t = tb
        for name, arr in cols.items():
            t = t.append_column(f"__gvr_{name}", pa.array(arr, pa.float64(), from_pandas=True))
        return _derive_rank_columns(t, kinds, n_rows, prefix, raw_prefix="__gvr_")

    return ds.map_batches(apply, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def _derive_rank_columns(tb: pa.Table, kinds, n_rows: int, prefix: str, raw_prefix: str = ""):
    """Turn raw (rank, dense_rank, cume_cnt) columns into the requested
    SQL window columns and drop the raw ones."""
    import pyarrow.compute as pc

    raw_names = {k: f"{raw_prefix}{k}" for k in ("rank", "dense_rank", "cume_cnt")}
    raw = {k: tb[name] for k, name in raw_names.items()}
    out = tb.drop_columns([name for name in raw_names.values() if name in tb.column_names])
    for k in kinds:
        if k in ("rank", "dense_rank"):
            col = pc.cast(raw[k], pa.int64())
        elif k == "percent_rank":
            denom = float(max(n_rows - 1, 1))
            col = pc.divide(pc.subtract(pc.cast(raw["rank"], pa.float64()), 1.0), denom)
        elif k == "cume_dist":
            col = pc.divide(pc.cast(raw["cume_cnt"], pa.float64()), float(max(n_rows, 1)))
        else:
            raise ValueError(f"unknown rank kind {k!r}")
        out = out.append_column(f"{prefix}{k}", col)
    return out


def equi_depth_buckets(ds, col: str, k: int, out_col: str | None = None, driver_max_bytes: int = 64 << 20):
    """Global equi-depth discretization: bucket i of k holds (about) the
    i-th n/k-quantile slice — ``bucket = CEIL(CUME_DIST() OVER (ORDER BY
    col) * k)``, the SQL-exact tie-stable formulation (ties share a
    cume_dist, hence a bucket, so the cut never splits equal values).
    A thin composition over :func:`with_global_rank`; null values get a
    null bucket. The standard feature-binning stage before histogram
    models / per-bucket stratification."""
    import pyarrow.compute as pc

    if k <= 0:
        raise ValueError("k must be positive")
    out_col = out_col or f"{col}_bucket"
    ranked = with_global_rank(
        ds, col, kinds=("cume_dist",), driver_max_bytes=driver_max_bytes, prefix="__edb_"
    )

    def bucketize(tb: pa.Table) -> pa.Table:
        b = pc.cast(pc.ceil(pc.multiply(tb["__edb_cume_dist"], float(k))), pa.int64())
        return tb.drop_columns(["__edb_cume_dist"]).append_column(out_col, b)

    return ranked.map_batches(bucketize, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
