"""Distributed (non-broadcast) hash join — round-2 verdict item 7.

The shuffle plan must be semantically identical to the broadcast plan
(same output columns, same rows) on inner and left joins, including
null-key rows and column-name collisions, so the cost-based wrapper can
switch freely on size alone.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _mk_sides():
    import ray.data as rd

    left = pa.table(
        {
            "k": pa.array([1, 2, 2, 3, None, 5], type=pa.int64()),
            "lv": pa.array(["a", "b", "c", "d", "e", "f"]),
            "shared": pa.array([10, 20, 30, 40, 50, 60], type=pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array([2, 3, 3, None, 7], type=pa.int64()),
            "rv": pa.array([2.0, 3.0, 3.5, 9.9, 7.0]),
            "shared": pa.array([-1, -2, -3, -4, -5], type=pa.int64()),
        }
    )
    return rd.from_arrow(left).repartition(3), rd.from_arrow(right).repartition(2), left, right


def _canon(t: pa.Table):
    import pandas as pd

    df = t.to_pandas().reindex(sorted(t.column_names), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort", na_position="last").reset_index(
        drop=True
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_shuffle_join_matches_polars(ray_session, how):
    import polars as pl

    from anomalydetection_ray.functions.relational import shuffle_hash_join
    from anomalydetection_ray.pipelines.queries import as_table

    lds, rds, left, right = _mk_sides()
    got = as_table(shuffle_hash_join(lds, "k", rds, "rk", how=how))
    # expected: polars single-node join, right key dropped, collision suffixed
    want = (
        pl.from_arrow(left)
        .join(
            pl.from_arrow(right).rename({"shared": "shared_r"}),
            left_on="k",
            right_on="rk",
            how=how,
            nulls_equal=False,
        )
        .to_arrow()
    )
    assert sorted(got.column_names) == sorted(want.column_names)
    a, b = _canon(got), _canon(want.cast(got.select(want.column_names).schema))
    assert a.equals(b), f"\n{a}\nvs\n{b}"
    if how == "left":
        # null-key left rows must survive with null right columns
        assert got.num_rows >= left.num_rows


def test_cost_based_join_switches_plans(ray_session):
    from anomalydetection_ray.functions.relational import hash_join, shuffle_hash_join
    from anomalydetection_ray.pipelines.queries import as_table

    lds, rds, *_ = _mk_sides()
    bc = as_table(hash_join(lds, "k", rds, "rk", how="inner", broadcast_max_bytes=1 << 30))
    sh = as_table(hash_join(lds, "k", rds, "rk", how="inner", broadcast_max_bytes=-1))
    direct = as_table(shuffle_hash_join(lds, "k", rds, "rk", how="inner"))
    a, b, c = _canon(bc), _canon(sh), _canon(direct)
    assert sorted(bc.column_names) == sorted(sh.column_names)
    assert b.equals(c)
    assert len(a) == len(b)
    # value-equality between plans on the join payload columns
    for col in ("k", "lv", "rv"):
        assert np.array_equal(
            a[col].to_numpy(), b[col].to_numpy()
        ), col
