"""Oracle tests mirroring the driver's correctness gate: every registered
query with SQL runs on Ray AND DuckDB at sf0.001 (fast) and must match on
row count, column names, and order-insensitive values.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by all values — order-insensitive compare."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    # normalize int-ish dtypes (duckdb may give int32/int64 variations)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df


def _query_items():
    from anomalydetection_ray.pipelines.queries import registry

    return [(name, fn, sql) for name, (fn, sql) in registry().items() if sql is not None]


@pytest.mark.parametrize("name,fn,sql", _query_items(), ids=[n for n, *_ in _query_items()])
def test_query_matches_oracle(ray_session, sf_smoke, name, fn, sql):
    ray_df = _canon(_to_pandas(fn(sf_smoke)))
    con = _duck(sf_smoke)
    duck_df = _canon(con.sql(sql).df())
    con.close()

    assert list(ray_df.columns) == list(duck_df.columns), (
        f"{name}: columns {list(ray_df.columns)} vs {list(duck_df.columns)}"
    )
    assert len(ray_df) == len(duck_df), f"{name}: rows {len(ray_df)} vs {len(duck_df)}"
    for c in ray_df.columns:
        a, b = ray_df[c].to_numpy(), duck_df[c].to_numpy()
        if np.issubdtype(a.dtype, np.floating):
            mismatch = ~(np.isclose(a, b, rtol=0, atol=1e-9) | (np.isnan(a) & np.isnan(b)))
        else:
            mismatch = a != b
        assert not mismatch.any(), f"{name}.{c}: first mismatch at {np.nonzero(mismatch)[0][:5]}: {a[mismatch][:5]} vs {b[mismatch][:5]}"


def _rows_only_items():
    from anomalydetection_ray.pipelines.queries import registry

    return [(name, fn) for name, (fn, sql) in registry().items() if sql is None]


@pytest.mark.parametrize("name,fn", _rows_only_items(), ids=[n for n, _ in _rows_only_items()])
def test_rows_only_query_runs(ray_session, sf_smoke, name, fn):
    """Driver-contract guard for queries WITHOUT a SQL oracle: each must
    execute at smoke scale and produce a named, non-degenerate schema
    (the driver records a rows-only check for these)."""
    import pyarrow as pa

    import ray.data as rd

    res = fn(sf_smoke)
    if isinstance(res, rd.Dataset):
        cols, n = res.schema().names, res.count()
    elif isinstance(res, pa.Table):
        cols, n = res.column_names, res.num_rows
    else:
        cols, n = list(res.columns), len(res)
    assert len(cols) > 0, name
    assert n >= 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert {"check", "partition", "passed", "metric"} <= set(df.columns)


def test_contract_shapes(ray_session):
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 10
