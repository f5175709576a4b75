"""Distributed set-op tests (functions/setops.py): SQL DISTINCT
semantics, multi-column keys, null keys, parallelism invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _got(ds):
    from anomalydetection_ray.pipelines.queries import as_table

    return sorted(map(tuple, as_table(ds).to_pandas().itertuples(index=False, name=None)), key=str)


def test_set_ops_match_python_sets(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.setops import (
        except_distinct,
        intersect_distinct,
        union_distinct,
    )

    rng = np.random.default_rng(2)
    a_vals = rng.integers(0, 60, 500)
    b_vals = rng.integers(30, 90, 500)
    a = rd.from_arrow(pa.table({"k": pa.array(a_vals, type=pa.int64())})).repartition(5)
    b = rd.from_arrow(pa.table({"k": pa.array(b_vals, type=pa.int64())})).repartition(3)
    sa, sb = set(a_vals.tolist()), set(b_vals.tolist())
    assert _got(intersect_distinct(a, b, ["k"])) == sorted([(v,) for v in sa & sb], key=str)
    assert _got(except_distinct(a, b, ["k"])) == sorted([(v,) for v in sa - sb], key=str)
    assert _got(union_distinct(a, b, ["k"])) == sorted([(v,) for v in sa | sb], key=str)


def test_set_ops_multi_column_and_parallelism(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.setops import intersect_distinct

    t1 = pa.table({"x": pa.array([1, 1, 2, 2, 3], type=pa.int64()), "y": ["a", "a", "b", "c", "d"]})
    t2 = pa.table({"x": pa.array([1, 2, 3], type=pa.int64()), "y": ["a", "c", "zzz"]})
    for parts in (1, 4):
        got = _got(
            intersect_distinct(
                rd.from_arrow(t1).repartition(parts), rd.from_arrow(t2).repartition(parts), ["x", "y"]
            )
        )
        assert got == [(1, "a"), (2, "c")]


def test_grouped_exact_quantiles_match_numpy(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.shuffle import grouped_exact_quantiles
    from anomalydetection_ray.pipelines.queries import as_table

    rng = np.random.default_rng(8)
    keys = rng.choice(["x", "y", "z"], size=5000)
    vals = rng.standard_normal(5000) * 100
    t = pa.table({"g": keys, "v": vals})
    out = (
        as_table(grouped_exact_quantiles(rd.from_arrow(t).repartition(7), ["g"], "v", [0.5, 0.9]))
        .to_pandas()
        .set_index("g")
    )
    for g in ("x", "y", "z"):
        sub = vals[keys == g]
        assert np.isclose(out.loc[g, "q50"], np.percentile(sub, 50))
        assert np.isclose(out.loc[g, "q90"], np.percentile(sub, 90))


def test_grouped_topk_exact_and_deterministic(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.shuffle import grouped_topk
    from anomalydetection_ray.pipelines.queries import as_table

    rng = np.random.default_rng(5)
    n = 3000
    t = pa.table(
        {
            "g": rng.choice(["a", "b"], size=n),
            "id": pa.array(range(n), type=pa.int64()),
            "v": pa.array(rng.integers(0, 50, n), type=pa.int64()),  # many ties
        }
    )
    import pandas as pd

    df = t.to_pandas()
    expect = (
        df.sort_values(["v", "id"], ascending=[False, True])
        .groupby("g", group_keys=False)
        .head(4)
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    for parts in (2, 9):
        got = (
            as_table(grouped_topk(rd.from_arrow(t).repartition(parts), ["g"], "v", k=4, tiebreak=["id"]))
            .to_pandas()
            .sort_values(["g", "v", "id"], ascending=[True, False, True])
            .reset_index(drop=True)[expect.columns.tolist()]
        )
        assert got.equals(expect)
