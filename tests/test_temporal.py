"""As-of join and sessionization tests (functions/temporal.py):
hand-computed expectations, left-join semantics, tie determinism, and
parallelism invariance."""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pytest


def _ts(*args):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=args[0])


def test_asof_join_backward_semantics(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import asof_join
    from anomalydetection_ray.pipelines.queries import as_table

    left = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 3], type=pa.int64()),
            "t": pa.array([_ts(10), _ts(20), _ts(5), _ts(10), _ts(10)], type=pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "rk": pa.array([1, 1, 2, 2], type=pa.int64()),
            "rt": pa.array([_ts(8), _ts(15), _ts(10), _ts(10)], type=pa.timestamp("us")),
            "v": pa.array([100.0, 200.0, 7.0, 9.0]),
        }
    )
    out = as_table(
        asof_join(
            rd.from_arrow(left).repartition(3),
            rd.from_arrow(right).repartition(2),
            key="k", left_ts="t", right_ts="rt", right_values=["v"], right_key="rk",
        )
    ).sort_by([("k", "ascending"), ("t", "ascending")])
    vals = out["v"].to_pylist()
    # k=1: t=5 -> no order yet (null); t=10 -> v@8=100; t=20 -> v@15=200
    # k=2: tie at rt=10 deduped to max -> 9; k=3: no right rows -> null
    assert vals == [None, 100.0, 200.0, 9.0, None]


def test_sessionize_numeric_epoch_us_ts(ray_session):
    """Numeric ts columns are epoch-µs by contract across the module
    (rolling_window_agg, range_join_agg); sessionize used to raise on
    them at the .dt accessor."""
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import sessionize
    from anomalydetection_ray.pipelines.queries import as_table

    m = 60_000_000  # one minute in µs
    t = pa.table({
        "u": pa.array([1, 1, 1], type=pa.int64()),
        "t": pa.array([0 * m, 5 * m, 45 * m], type=pa.int64()),
    })
    out = as_table(
        sessionize(rd.from_arrow(t), key="u", ts_col="t", gap=datetime.timedelta(minutes=30))
    ).to_pandas().sort_values("session_id")
    assert out["session_id"].tolist() == [1, 2]
    assert out["n_events"].tolist() == [2, 1]


def test_asof_join_right_value_collision_raises(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import asof_join

    left = pa.table({"k": [1], "t": [1], "v": [1.0]})
    right = pa.table({"k": [1], "t": [1], "v": [2.0]})
    with pytest.raises(ValueError, match="collide"):
        asof_join(rd.from_arrow(left), rd.from_arrow(right),
                  key="k", left_ts="t", right_ts="t", right_values=["v"])


def test_sessionize_gap_semantics(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import sessionize
    from anomalydetection_ray.pipelines.queries import as_table

    t = pa.table(
        {
            "u": pa.array([1, 1, 1, 1, 2, 2], type=pa.int64()),
            "t": pa.array(
                [_ts(0), _ts(5), _ts(45), _ts(50), _ts(0), _ts(0)], type=pa.timestamp("us")
            ),
            "v": pa.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0]),
        }
    )
    out = as_table(
        sessionize(
            rd.from_arrow(t).repartition(4), key="u", ts_col="t",
            gap=datetime.timedelta(minutes=30), value_col="v",
        )
    ).to_pandas().sort_values(["u", "session_id"]).reset_index(drop=True)
    # u=1: [0,5] then gap 40 -> [45,50]; u=2: tied timestamps share one session
    assert out["session_id"].tolist() == [1, 2, 1]
    assert out["n_events"].tolist() == [2, 2, 2]
    assert out["sum_value"].tolist() == [3.0, 12.0, 48.0]


def test_asof_and_sessionize_parallelism_invariant(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import asof_join, sessionize
    from anomalydetection_ray.pipelines.queries import as_table

    rng = np.random.default_rng(6)
    n = 4000
    base = datetime.datetime(2024, 1, 1)
    ev = pa.table(
        {
            "k": pa.array(rng.integers(0, 40, n), type=pa.int64()),
            "t": pa.array(
                [base + datetime.timedelta(seconds=int(s)) for s in rng.integers(0, 86400, n)],
                type=pa.timestamp("us"),
            ),
            "v": pa.array(rng.random(n)),
        }
    )
    rt = pa.table(
        {
            "k": pa.array(rng.integers(0, 40, 300), type=pa.int64()),
            "t": pa.array(
                [base + datetime.timedelta(seconds=int(s)) for s in rng.integers(0, 86400, 300)],
                type=pa.timestamp("us"),
            ),
            "w": pa.array(rng.random(300)),
        }
    )

    def run(parts):
        j = as_table(
            asof_join(
                rd.from_arrow(ev).repartition(parts), rd.from_arrow(rt).repartition(parts),
                key="k", left_ts="t", right_ts="t", right_values=["w"],
            )
        ).to_pandas().sort_values(["k", "t", "v"]).reset_index(drop=True)
        s = as_table(
            sessionize(
                rd.from_arrow(ev).repartition(parts), key="k", ts_col="t",
                gap=datetime.timedelta(hours=1), value_col="v",
            )
        ).to_pandas().sort_values(["k", "session_id"]).reset_index(drop=True)
        return j, s

    j2, s2 = run(2)
    j9, s9 = run(9)
    assert j2.equals(j9)
    assert s2.equals(s9)


def test_rolling_window_agg_hand_case(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import rolling_window_agg
    from anomalydetection_ray.pipelines.queries import as_table

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
            "t": pa.array([_ts(0), _ts(30), _ts(61), _ts(61), _ts(0)], type=pa.timestamp("us")),
            "v": pa.array([1.0, 2.0, 4.0, 8.0, 16.0]),
            "rid": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        }
    )
    out = (
        as_table(
            rolling_window_agg(
                rd.from_arrow(t).repartition(3), key="k", ts_col="t", value_col="v",
                window=datetime.timedelta(minutes=60), carry=["rid"],
            )
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    # rid0: only itself; rid1: 0+1; rid2/3: window [1,61] excludes t=0,
    # includes t=30 and BOTH t=61 peers (RANGE frame peer semantics)
    assert out["w_count"].tolist() == [1, 2, 3, 3, 1]
    assert out["w_sum"].tolist() == [1.0, 3.0, 14.0, 14.0, 16.0]


def test_rolling_window_parallelism_invariant(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import rolling_window_agg
    from anomalydetection_ray.pipelines.queries import as_table

    rng = np.random.default_rng(12)
    n = 3000
    base = datetime.datetime(2024, 1, 1)
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 25, n), type=pa.int64()),
            "t": pa.array(
                [base + datetime.timedelta(seconds=int(s)) for s in rng.integers(0, 86400, n)],
                type=pa.timestamp("us"),
            ),
            "v": pa.array(rng.random(n)),
            "rid": pa.array(range(n), type=pa.int64()),
        }
    )

    def run(parts):
        return (
            as_table(
                rolling_window_agg(
                    rd.from_arrow(t).repartition(parts), key="k", ts_col="t", value_col="v",
                    window=datetime.timedelta(hours=2), carry=["rid"],
                )
            )
            .to_pandas()
            .sort_values("rid")
            .reset_index(drop=True)
        )

    assert run(2).equals(run(11))


@pytest.mark.parametrize("nblocks", [1, 9])
def test_range_join_agg_duckdb_parity(ray_session, nblocks):
    import duckdb
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import range_join_agg
    from anomalydetection_ray.pipelines.queries import as_table

    rng = np.random.default_rng(23)
    base = datetime.datetime(2024, 3, 1)
    nl, nr = 400, 700
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 15, nl), type=pa.int64()),
            "t": pa.array(
                [base + datetime.timedelta(minutes=int(m)) for m in rng.integers(0, 5000, nl)],
                type=pa.timestamp("us"),
            ),
            "rid": pa.array(range(nl), type=pa.int64()),
        }
    )
    # right: a null value row and keys absent from the left both included
    rv = rng.random(nr) * 100
    rvals = pa.array([None if i % 97 == 0 else float(v) for i, v in enumerate(rv)])
    right = pa.table(
        {
            "rk": pa.array(rng.integers(0, 18, nr), type=pa.int64()),
            "rt": pa.array(
                [base + datetime.timedelta(minutes=int(m)) for m in rng.integers(0, 5000, nr)],
                type=pa.timestamp("us"),
            ),
            "val": rvals,
        }
    )
    got = (
        as_table(
            range_join_agg(
                rd.from_arrow(left).repartition(nblocks),
                rd.from_arrow(right).repartition(max(1, nblocks - 2)),
                key="k", left_ts="t", right_ts="rt",
                lo=datetime.timedelta(hours=-6), hi=datetime.timedelta(hours=1),
                right_value="val", right_key="rk", carry=["rid"],
            )
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute(
        """
        SELECT l.rid, COUNT(r.rt) AS rj_count,
               COALESCE(SUM(COALESCE(r.val, 0)), 0) AS rj_sum
        FROM l LEFT JOIN r
          ON r.rk = l.k AND r.rt BETWEEN l.t - INTERVAL 6 HOUR AND l.t + INTERVAL 1 HOUR
        GROUP BY l.rid ORDER BY l.rid
        """
    ).df()
    assert got["rj_count"].tolist() == want["rj_count"].tolist()
    np.testing.assert_allclose(got["rj_sum"].to_numpy(), want["rj_sum"].to_numpy(), rtol=0, atol=1e-9)
    # parallelism invariance: BIT-identical sums at a different layout
    got2 = (
        as_table(
            range_join_agg(
                rd.from_arrow(left).repartition(3), rd.from_arrow(right).repartition(7),
                key="k", left_ts="t", right_ts="rt",
                lo=datetime.timedelta(hours=-6), hi=datetime.timedelta(hours=1),
                right_value="val", right_key="rk", carry=["rid"],
            )
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    assert got.equals(got2)


def test_range_join_agg_edges(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import range_join_agg
    from anomalydetection_ray.pipelines.queries import as_table

    left = pa.table({"k": pa.array([1, 2], type=pa.int64()), "t": pa.array([100, 200], type=pa.int64())})
    right = pa.table({"k": pa.array([1], type=pa.int64()), "t": pa.array([100], type=pa.int64()), "v": pa.array([5.0])})
    # count-only (no right_value), integer µs timestamps, inclusive bounds
    out = (
        as_table(
            range_join_agg(
                rd.from_arrow(left), rd.from_arrow(right), key="k", left_ts="t", right_ts="t",
                lo=np.timedelta64(0, "us"), hi=np.timedelta64(0, "us"),
            )
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["rj_count"].tolist() == [1, 0]
    assert "rj_sum" not in out.columns

    # NULL keys never match the ON condition (SQL LEFT JOIN): the null
    # left row survives with count 0, the null right row matches nothing —
    # string keys exercise the object-array path
    left_n = pa.table(
        {"k": pa.array(["a", None, "b"]), "t": pa.array([100, 100, 100], type=pa.int64())}
    )
    right_n = pa.table(
        {"k": pa.array(["a", None]), "t": pa.array([100, 100], type=pa.int64()), "v": [5.0, 7.0]}
    )
    out_n = (
        as_table(
            range_join_agg(
                rd.from_arrow(left_n), rd.from_arrow(right_n), key="k", left_ts="t", right_ts="t",
                lo=np.timedelta64(0, "us"), hi=np.timedelta64(0, "us"), right_value="v",
            )
        )
        .to_pandas()
        .sort_values("k", na_position="first")
        .reset_index(drop=True)
    )
    assert out_n["rj_count"].tolist() == [0, 1, 0]
    assert out_n["rj_sum"].tolist() == [0.0, 5.0, 0.0]

    with pytest.raises(ValueError, match="empty range"):
        range_join_agg(
            rd.from_arrow(left), rd.from_arrow(right), key="k", left_ts="t", right_ts="t",
            lo=np.timedelta64(1, "us"), hi=np.timedelta64(0, "us"),
        )


def test_ewma_pandas_parity_and_layout_invariance(ray_session):
    """Per-key EWMA matches pandas ewm(alpha, adjust=False) on non-null
    rows (nulls emit null, state carries), and is bit-identical at any
    block layout."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import ewma

    rng = np.random.default_rng(23)
    n = 2500
    t = pa.table(
        {
            "u": pa.array(rng.integers(0, 40, n), type=pa.int64()),
            "ts": pa.array(rng.permutation(n), type=pa.int64()),
            "v": pa.array(
                [None if i % 31 == 0 else float(x) for i, x in enumerate(rng.normal(10, 3, n))],
                type=pa.float64(),
            ),
        }
    )
    outs = []
    for parts in (1, 4, 11):
        ds = ewma(rd.from_arrow(t).repartition(parts), "u", "ts", "v", alpha=0.2, out_col="e")
        df = (
            pa.concat_tables(
                [b for b in ds.iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows]
            )
            .to_pandas()
            .sort_values(["u", "ts"])
            .reset_index(drop=True)
        )
        outs.append(df)
    for df in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], df)

    got = outs[0]
    ref = t.to_pandas().sort_values(["u", "ts"]).reset_index(drop=True)
    ref["e"] = ref.groupby("u")["v"].transform(
        lambda s: s.ewm(alpha=0.2, adjust=False, ignore_na=False).mean()
    )
    nn = ref["v"].notna()
    np.testing.assert_allclose(got.loc[nn, "e"].to_numpy(), ref.loc[nn, "e"].to_numpy(), rtol=1e-12)
    assert got.loc[~nn, "e"].isna().all()  # null in -> null out


def test_funnel_counts_attrition_strict_order_and_layout(ray_session):
    """funnel_counts: real attrition, strict > (same-timestamp step does
    NOT count), out-of-order events don't count, null keys/ts dropped,
    block-layout invariance via the co-partition contract."""
    import datetime as dt

    import pandas as pd
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import funnel_counts

    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)
    rows = [
        # u1 completes the funnel in order
        (1, s(0), "view"), (1, s(1), "click"), (1, s(2), "purchase"),
        # u2 clicks at the SAME ts as its first view -> strict > rejects
        (2, s(0), "view"), (2, s(0), "click"), (2, s(5), "purchase"),
        # u3 purchase BEFORE click -> reaches step 2 only
        (3, s(0), "view"), (3, s(4), "click"), (3, s(2), "purchase"),
        # u4 view only
        (4, s(0), "view"),
        # u5 click/purchase but never views -> reaches nothing
        (5, s(0), "click"), (5, s(1), "purchase"),
        # u6: second view AFTER click still counts via first view
        (6, s(0), "view"), (6, s(3), "click"), (6, s(9), "view"), (6, s(4), "purchase"),
        # null user / null ts rows are dropped
        (None, s(0), "view"), (7, None, "view"),
        # noise event types never enter the exchange
        (1, s(0), "error"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    # viewers u1,u2,u3,u4,u6 = 5; click-after-first-view u1,u3,u6 = 3;
    # purchase-after-that u1,u6 = 2
    expect = {1: 5, 2: 3, 3: 2}
    for nb in (1, 4, 16):
        out = funnel_counts(
            rd.from_pandas(df).repartition(nb), ["view", "click", "purchase"]
        )
        got = dict(zip(out["step"], out["n_users"]))
        assert got == expect, (nb, got)
        assert list(out["step_name"]) == ["view", "click", "purchase"]

    # empty input
    out = funnel_counts(rd.from_pandas(df.iloc[:0]), ["view", "click"])
    assert list(out["n_users"]) == [0, 0]


def test_funnel_counts_conversion_window(ray_session):
    """within= bounds the conversion window from FUNNEL ENTRY (first-step
    time), inclusive; DuckDB interval-chain parity."""
    import datetime as dt

    import duckdb
    import pandas as pd
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import funnel_counts

    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(minutes=k)
    rows = [
        (1, s(0), "A"), (1, s(1), "B"), (1, s(2), "C"),      # all inside 10min
        (2, s(0), "A"), (2, s(5), "B"), (2, s(20), "C"),     # C outside window
        (3, s(0), "A"), (3, s(15), "B"), (3, s(16), "C"),    # B already outside
        (4, s(0), "A"), (4, s(10), "B"),                     # boundary: <= counts
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    for nb in (1, 5):
        out = funnel_counts(
            rd.from_pandas(df).repartition(nb), ["A", "B", "C"],
            within=dt.timedelta(minutes=10),
        )
        assert dict(zip(out["step"], out["n_users"])) == {1: 4, 2: 3, 3: 1}, nb

    want = duckdb.sql(
        """
        WITH s1 AS (SELECT user_id, MIN(ts) t1 FROM df WHERE event_type='A' GROUP BY user_id),
        s2 AS (SELECT e.user_id, MIN(e.ts) t, ANY_VALUE(s1.t1) t1 FROM df e JOIN s1 USING (user_id)
               WHERE e.event_type='B' AND e.ts > s1.t1
                 AND e.ts <= s1.t1 + INTERVAL 10 MINUTE GROUP BY e.user_id),
        s3 AS (SELECT e.user_id FROM df e JOIN s2 USING (user_id)
               WHERE e.event_type='C' AND e.ts > s2.t
                 AND e.ts <= s2.t1 + INTERVAL 10 MINUTE GROUP BY e.user_id)
        SELECT (SELECT COUNT(*) FROM s1) a, (SELECT COUNT(*) FROM s2) b, (SELECT COUNT(*) FROM s3) c
        """
    ).df()
    assert (int(want["a"][0]), int(want["b"][0]), int(want["c"][0])) == (4, 3, 1)


def _ref_cusum(vals, mu, sigma, k, h):
    """Python-loop CUSUM reference (the definitionally-correct recursion)."""
    import numpy as np

    sp = sn = 0.0
    out = []
    for x in vals:
        z = 0.0 if (sigma is None or sigma <= 0 or x is None or np.isnan(x)) else (x - mu) / sigma
        sp = max(0.0, sp + z - k)
        sn = max(0.0, sn - z - k)
        out.append((sp, sn, int(sp > h or sn > h)))
    return out


def test_cusum_matches_loop_reference_and_detects_shift(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import cusum_flags

    rng = np.random.default_rng(4)
    n_pre, n_post = 120, 40
    vals = np.concatenate([rng.normal(10.0, 2.0, n_pre), rng.normal(10.0 + 2.0 * 2.0, 2.0, n_post)])
    df = pd.DataFrame({"k": "a", "t": np.arange(n_pre + n_post, dtype=np.int64), "v": vals})
    baseline = pd.DataFrame({"k": ["a"], "mu": [10.0], "sigma": [2.0]})
    out = (
        cusum_flags(rd.from_arrow(pa.Table.from_pandas(df)).repartition(5), "k", "t", "v", baseline=baseline)
        .to_pandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    ref = _ref_cusum(vals, 10.0, 2.0, 0.5, 5.0)
    assert np.allclose(out["cusum_pos"], [r[0] for r in ref])
    assert np.allclose(out["cusum_neg"], [r[1] for r in ref])
    assert (out["cusum_alarm"].to_numpy() == [r[2] for r in ref]).all()
    # the 2sigma shift alarms, and only after it starts
    alarm_at = np.flatnonzero(out["cusum_alarm"].to_numpy())
    assert len(alarm_at) > 0 and alarm_at.min() >= n_pre


def test_cusum_self_baseline_nulls_and_layout_invariance(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import cusum_flags

    rng = np.random.default_rng(7)
    rows = []
    for key in ("a", "b", "c"):
        v = rng.normal(5.0, 1.0, 80)
        rows.append(pd.DataFrame({"k": key, "t": np.arange(80, dtype=np.int64), "v": v}))
    df = pd.concat(rows, ignore_index=True)
    df.loc[5, "v"] = np.nan  # null carries: z=0, statistic decays by k
    outs = []
    for parts in (1, 6):
        out = (
            cusum_flags(rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts), "k", "t", "v")
            .to_pandas()
            .sort_values(["k", "t"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # self-baseline equals an explicit baseline built from each key's stats
    bl = df.groupby("k")["v"].agg(mu="mean", sigma="std").reset_index()
    want = (
        cusum_flags(rd.from_arrow(pa.Table.from_pandas(df)), "k", "t", "v", baseline=bl)
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    assert np.allclose(outs[0]["cusum_pos"], want["cusum_pos"])
    assert np.allclose(outs[0]["cusum_neg"], want["cusum_neg"])
    # per-key loop reference, self-baseline
    for key, g in df.groupby("k"):
        mu, sigma = g["v"].mean(), g["v"].std(ddof=1)
        ref = _ref_cusum(g.sort_values("t")["v"].to_numpy(), mu, sigma, 0.5, 5.0)
        got = outs[0][outs[0]["k"] == key]
        assert np.allclose(got["cusum_pos"], [r[0] for r in ref])
    # baseline missing a key -> z=0 everywhere for it (stat = 0, no alarm)
    bl2 = bl[bl["k"] != "c"]
    out2 = cusum_flags(rd.from_arrow(pa.Table.from_pandas(df)), "k", "t", "v", baseline=bl2).to_pandas()
    c = out2[out2["k"] == "c"]
    assert (c["cusum_pos"] == 0).all() and (c["cusum_alarm"] == 0).all()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        cusum_flags(rd.from_arrow(pa.Table.from_pandas(df)), "k", "t", "v", h=0.0)
    with _pytest.raises(ValueError):
        cusum_flags(rd.from_arrow(pa.Table.from_pandas(df)), "k", "t", "v", baseline=pd.DataFrame({"k": []}))


# ------------------------------------------------ round-5 review regressions


def _ts5(sec):
    return None if sec is None else datetime.datetime(2020, 1, 1, 0, 0, 0) + datetime.timedelta(seconds=sec)


def test_rolling_window_null_ts_duckdb_parity(ray_session):
    """Null-ts rows are their OWN peer group (DuckDB RANGE semantics,
    probed) and must not corrupt non-null rows' windows — a NaN in the
    searchsorted array previously mis-counted the whole key silently."""
    import duckdb
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import rolling_window_agg
    from anomalydetection_ray.pipelines.queries import as_table

    t = pa.table({
        "k": pa.array(["a"] * 5 + ["b"] * 2, type=pa.string()),
        "ts": pa.array([_ts5(None), _ts5(0), _ts5(1), _ts5(None), _ts5(3)]
                       + [_ts5(0), _ts5(1)], type=pa.timestamp("us")),
        "v": pa.array([10.0, 1.0, 2.0, 20.0, 4.0, 7.0, None], type=pa.float64()),
    })
    out = as_table(
        rolling_window_agg(rd.from_arrow(t).repartition(3), "k", "ts", "v",
                           np.timedelta64(1500, "ms"))
    ).to_pandas().sort_values(["k", "ts", "v"], na_position="first").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.sql("""
      SELECT k, ts, v, COUNT(*) OVER w AS w_count,
             COALESCE(SUM(v) OVER w, 0) AS w_sum
      FROM t WINDOW w AS (PARTITION BY k ORDER BY ts
        RANGE BETWEEN INTERVAL 1500 MILLISECOND PRECEDING AND CURRENT ROW)
      ORDER BY k, ts NULLS FIRST, v
    """).df().reset_index(drop=True)
    con.close()
    assert out["w_count"].tolist() == want["w_count"].tolist()
    np.testing.assert_allclose(out["w_sum"].to_numpy(), want["w_sum"].to_numpy())


def test_rolling_window_null_value_does_not_poison_later_windows(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import rolling_window_agg
    from anomalydetection_ray.pipelines.queries import as_table

    t = pa.table({
        "k": pa.array(["a"] * 3, type=pa.string()),
        "ts": pa.array([_ts5(0), _ts5(10), _ts5(20)], type=pa.timestamp("us")),
        "v": pa.array([1.0, None, 2.0], type=pa.float64()),
    })
    out = as_table(
        rolling_window_agg(rd.from_arrow(t), "k", "ts", "v", np.timedelta64(5, "s"))
    ).to_pandas().sort_values("ts").reset_index(drop=True)
    # each window holds exactly its own row; row 3's sum must be 2.0
    # (not NaN from a poisoned cumsum) and row 2's null adds 0
    assert out["w_count"].tolist() == [1, 1, 1]
    np.testing.assert_allclose(out["w_sum"].to_numpy(), [1.0, 0.0, 2.0])


def test_rolling_window_numeric_null_keys_group_together(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import rolling_window_agg
    from anomalydetection_ray.pipelines.queries import as_table

    t = pa.table({
        "k": pa.array([None, None, None, 7], type=pa.int64()),
        "ts": pa.array([_ts5(0), _ts5(1), _ts5(2), _ts5(0)], type=pa.timestamp("us")),
        "v": pa.array([1.0, 1.0, 1.0, 5.0], type=pa.float64()),
    })
    out = as_table(
        rolling_window_agg(rd.from_arrow(t), "k", "ts", "v", np.timedelta64(10, "s"))
    ).to_pandas()
    nulls = out[out["k"].isna()].sort_values("ts")
    # SQL PARTITION BY groups nulls: the third null row sees all three
    # (previously each numeric-null key was a NaN singleton)
    assert nulls["w_count"].tolist() == [1, 2, 3]
    assert out[out["k"] == 7]["w_count"].tolist() == [1]


def test_rolling_window_collision_validation(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import rolling_window_agg

    t = pa.table({
        "k": pa.array(["a"], type=pa.string()),
        "ts": pa.array([_ts5(0)], type=pa.timestamp("us")),
        "v": pa.array([1.0]),
        "w_count": pa.array([9], type=pa.int64()),
    })
    with pytest.raises(ValueError, match="w_count"):
        rolling_window_agg(rd.from_arrow(t), "k", "ts", "v",
                           np.timedelta64(1, "s"), carry=["w_count"])
    with pytest.raises(ValueError, match="repeat"):
        rolling_window_agg(rd.from_arrow(t), "k", "ts", "v",
                           np.timedelta64(1, "s"), carry=["k"])


def test_range_join_agg_null_right_ts_excluded(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import range_join_agg
    from anomalydetection_ray.pipelines.queries import as_table

    left = pa.table({
        "k": pa.array(["a", "a"], type=pa.string()),
        "lts": pa.array([_ts5(0), _ts5(10)], type=pa.timestamp("us")),
    })
    right = pa.table({
        "k": pa.array(["a", "a", "a"], type=pa.string()),
        "rts": pa.array([_ts5(None), _ts5(1), _ts5(11)], type=pa.timestamp("us")),
        "val": pa.array([100.0, 5.0, 7.0], type=pa.float64()),
    })
    out = as_table(
        range_join_agg(rd.from_arrow(left), rd.from_arrow(right), "k", "lts", "rts",
                       np.timedelta64(0, "s"), np.timedelta64(2, "s"), right_value="val")
    ).to_pandas().sort_values("lts").reset_index(drop=True)
    # SQL BETWEEN is never true for a NULL rts: the 100.0 row matches
    # nothing (and previously corrupted BOTH rows' counts via NaN order)
    assert out["rj_count"].tolist() == [1, 1]
    np.testing.assert_allclose(out["rj_sum"].to_numpy(), [5.0, 7.0])


def test_asof_join_can_attach_right_ts5(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import asof_join
    from anomalydetection_ray.pipelines.queries import as_table

    left = pa.table({
        "k": pa.array(["a"], type=pa.string()),
        "lts": pa.array([_ts5(5)], type=pa.timestamp("us")),
    })
    right = pa.table({
        "k": pa.array(["a", "a"], type=pa.string()),
        "rts": pa.array([_ts5(1), _ts5(4)], type=pa.timestamp("us")),
        "price": pa.array([10.0, 20.0], type=pa.float64()),
    })
    out = as_table(
        asof_join(rd.from_arrow(left), rd.from_arrow(right), "k", "lts", "rts",
                  right_values=["rts", "price"])
    ).to_pandas()
    # right_values may name right_ts itself (previously a duplicate-
    # select crash): the matched right timestamp rides along
    assert out["price"].tolist() == [20.0]
    assert out["rts"].tolist() == [_ts5(4)]


def test_semdedup_cluster_col_collision_raises(ray_session):
    import ray.data as rd

    from anomalydetection_ray.dedup.semantic import semdedup

    vecs = pa.FixedSizeListArray.from_arrays(
        pa.array([1.0, 0.0, 0.0, 1.0], type=pa.float32()), 2
    )
    t = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "embedding": vecs,
        "cluster": pa.array([0, 0], type=pa.int64()),
    })
    with pytest.raises(ValueError, match="cluster_col"):
        semdedup(rd.from_arrow(t), "doc_id", k=1)


def test_knn_ivf_null_id_raises_loudly(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.similarity import knn_outlier_scores_ivf

    rng = np.random.default_rng(1)
    x = rng.standard_normal((20, 4)).astype(np.float32)
    vecs = pa.FixedSizeListArray.from_arrays(pa.array(x.ravel(), type=pa.float32()), 4)
    ids = list(range(19)) + [None]
    t = pa.table({"vec_id": pa.array(ids, type=pa.int64()), "embedding": vecs})
    with pytest.raises(Exception, match="null ids"):
        knn_outlier_scores_ivf(rd.from_arrow(t), "vec_id", k=2, n_cells=2, n_probe=2).to_pandas()


def test_sessionize_null_ts_matches_sql_oracle(ray_session):
    """Round-5 review: null-ts rows used to claim the LEADING session ids
    (one phantom singleton session each, real sessions renumbered). The
    oracle's CASE semantics (DuckDB-verified): nulls sort last, the first
    null-ts row joins the last real session (null gap → no break), each
    subsequent null row starts its own."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import sessionize
    from anomalydetection_ray.pipelines.queries import as_table

    ts = pa.array([None, None,
                   np.datetime64("2024-01-01T10:00:00", "us"),
                   np.datetime64("2024-01-01T10:10:00", "us"),
                   np.datetime64("2024-01-01T12:00:00", "us"), None],
                  type=pa.timestamp("us"))
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 1, 2], type=pa.int64()),
        "ts": ts,
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 9.0]),
    })
    out = as_table(sessionize(
        rd.from_arrow(t).repartition(2), "user_id", "ts",
        datetime.timedelta(minutes=30), value_col="value",
    )).to_pandas().sort_values(["user_id", "session_id"]).reset_index(drop=True)
    # DuckDB on the same VALUES (recorded in the fix commit):
    assert out["session_id"].tolist() == [1, 2, 3, 1]
    assert out["n_events"].tolist() == [2, 2, 1, 1]
    assert out["sum_value"].tolist() == [7.0, 6.0, 2.0, 9.0]
    # s2 = the 12:00 event + the first null row; bounds ignore the null
    assert str(out.loc[1, "session_start"]) == "2024-01-01 12:00:00"
    assert str(out.loc[1, "session_end"]) == "2024-01-01 12:00:00"


def test_cohort_retention_duckdb_parity(ray_session, sf_smoke):
    """Retention triangle vs the full SQL semantics (distinct activity
    periods -> per-user first period -> COUNT per (cohort, offset)) on
    the real events table, daily periods."""
    import duckdb
    import pandas as pd

    from anomalydetection_ray.functions.temporal import cohort_retention
    from anomalydetection_ray.sources import read_table

    got = cohort_retention(read_table(sf_smoke, "events"), "user_id", "ts", period="day")
    want = duckdb.sql(
        f"""
        WITH fe AS (
          SELECT DISTINCT user_id, date_trunc('day', ts) AS p
          FROM read_parquet('{sf_smoke}/events.parquet')
          WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        fu AS (SELECT user_id, MIN(p) AS cohort FROM fe GROUP BY user_id),
        act AS (
          SELECT f.cohort, date_diff('day', f.cohort, e.p) AS period_offset,
                 CAST(COUNT(*) AS BIGINT) AS n_active
          FROM fe e JOIN fu f USING (user_id) GROUP BY 1, 2
        ),
        cs AS (SELECT cohort, n_active AS cohort_size FROM act WHERE period_offset = 0)
        SELECT a.cohort, a.period_offset, a.n_active, c.cohort_size,
               ROUND(CAST(a.n_active AS DOUBLE) / c.cohort_size, 6) AS retention_rate
        FROM act a JOIN cs c USING (cohort) ORDER BY 1, 2
        """
    ).df()
    want["cohort"] = want["cohort"].astype("datetime64[us]")
    for c in ("period_offset", "n_active", "cohort_size"):
        want[c] = want[c].astype("int64")
    assert len(got) > 1  # the fixture spans multiple days
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_cohort_retention_weekly_and_nulls(ray_session):
    """Week periods truncate to Monday (DuckDB date_trunc('week')
    semantics); null keys and null timestamps are excluded entirely."""
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import cohort_retention

    ts = pa.array(
        [
            np.datetime64("2024-01-03T10:00:00", "us"),  # Wed, week of Mon 1/1
            np.datetime64("2024-01-10T09:00:00", "us"),  # week of 1/8 (offset 1)
            np.datetime64("2024-01-16T09:00:00", "us"),  # week of 1/15 (offset 2)
            np.datetime64("2024-01-09T12:00:00", "us"),  # u2 cohort week 1/8
            None,  # null ts dropped
            np.datetime64("2024-01-08T00:00:00", "us"),  # null user dropped
        ],
        type=pa.timestamp("us"),
    )
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2, None], type=pa.int64()),
            "ts": ts,
        }
    )
    out = cohort_retention(rd.from_arrow(t).repartition(3), "user_id", "ts", period="week")
    # DuckDB on the same VALUES: cohorts Mon 1/1 (u1) and Mon 1/8 (u2)
    assert [str(c) for c in out["cohort"]] == [
        "2024-01-01 00:00:00",
        "2024-01-01 00:00:00",
        "2024-01-01 00:00:00",
        "2024-01-08 00:00:00",
    ]
    assert out["period_offset"].tolist() == [0, 1, 2, 0]
    assert out["n_active"].tolist() == [1, 1, 1, 1]
    assert out["cohort_size"].tolist() == [1, 1, 1, 1]
    assert out["retention_rate"].tolist() == [1.0, 1.0, 1.0, 1.0]


def test_cohort_retention_empty_and_bad_period(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import cohort_retention

    t = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.timestamp("us")),
        }
    )
    out = cohort_retention(rd.from_arrow(t), "user_id", "ts")
    assert len(out) == 0
    assert list(out.columns) == [
        "cohort", "period_offset", "n_active", "cohort_size", "retention_rate",
    ]
    with pytest.raises(ValueError, match="period"):
        cohort_retention(rd.from_arrow(t), "user_id", "ts", period="month")


def test_cohort_retention_tz_aware_raises(ray_session):
    """Round-5 review: local days/weeks vary in length across DST, so the
    fixed-divisor offset would silently merge adjacent cells — tz-aware
    timestamps must raise, not mis-bin."""
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import cohort_retention

    t = pa.table(
        {
            "user_id": pa.array([1], pa.int64()),
            "ts": pa.array([0], pa.int64()).cast(pa.timestamp("us", tz="America/New_York")),
        }
    )
    with pytest.raises(Exception, match="naive timestamps"):
        cohort_retention(rd.from_arrow(t), "user_id", "ts")


def test_asof_join_kind_mismatch_raises(ray_session):
    """Round-5 review: a numeric-left / temporal-right ts pairing used to
    cast silently, comparing raw epoch integers against rescaled temporal
    values — must raise up front instead."""
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.temporal import asof_join

    left = pa.table(
        {"k": pa.array([1], pa.int64()), "lts": pa.array([1_000_000], pa.int64())}
    )
    right = pa.table(
        {
            "k": pa.array([1], pa.int64()),
            "rts": pa.array([np.datetime64("2024-01-01", "ns")], pa.timestamp("ns")),
            "v": pa.array([1.0]),
        }
    )
    with pytest.raises(ValueError, match="disagree in kind"):
        asof_join(rd.from_arrow(left), rd.from_arrow(right), "k", "lts", "rts", ["v"])
