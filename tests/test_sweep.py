"""Config-sweep runner (the reference's Optuna loop recast,
track_simclr_pcdarts.py:114-239): deterministic grid/random search,
per-trial lineage, planted-best recovery, resume."""

import json
import math
import os

import numpy as np
import pytest

from anomalydetection_ray.pipelines.sweep import (
    SweepResult,
    TrialRecord,
    grid_configs,
    random_configs,
    run_sweep,
)


def test_grid_order_deterministic_and_sorted():
    space = {"b": [1, 2], "a": ["x", "y", "z"]}
    got = grid_configs(space)
    assert len(got) == 6
    # sorted-key cartesian product: 'a' is the outer (slowest) axis
    assert got[0] == {"a": "x", "b": 1}
    assert got[1] == {"a": "x", "b": 2}
    assert got[-1] == {"a": "z", "b": 2}
    assert got == grid_configs(dict(reversed(list(space.items()))))
    with pytest.raises(ValueError, match="grid mode"):
        grid_configs({"lr": ("loguniform", 1e-4, 1e-1)})
    with pytest.raises(ValueError, match="non-empty"):
        grid_configs({"a": []})


def test_random_configs_deterministic_and_typed():
    space = {
        "lr": ("loguniform", 1e-4, 1e-1),
        "layers": ("int", 1, 4),
        "temp": ("uniform", 0.1, 1.0),
        "act": ["relu", "tanh"],
    }
    a = random_configs(space, 20, seed=7)
    b = random_configs(space, 20, seed=7)
    assert a == b
    c = random_configs(space, 20, seed=8)
    assert a != c
    for cfg in a:
        assert 1e-4 <= cfg["lr"] <= 1e-1
        assert cfg["layers"] in (1, 2, 3, 4) and isinstance(cfg["layers"], int)
        assert 0.1 <= cfg["temp"] <= 1.0
        assert cfg["act"] in ("relu", "tanh")
    # int bounds are inclusive both ends
    draws = {c["layers"] for c in random_configs({"layers": ("int", 1, 4)}, 200, seed=1)}
    assert draws == {1, 2, 3, 4}
    # a 3-tuple NOT headed by a distribution name is a categorical value
    # set — the same grammar grid mode applies (round-5 review)
    assert all(
        c["x"] in ("normal", 0, 1) for c in random_configs({"x": ("normal", 0, 1)}, 6, seed=2)
    )


def test_planted_best_recovered_with_lineage(tmp_path):
    """Plant a known optimum in a 2-axis grid; the sweep must select it
    and the lineage JSONL must hold exactly one record per trial with
    the trial's params and metric."""
    best = {"alpha": 0.3, "beta": 7}

    def trial(params):
        # smooth bowl, maximum exactly at the planted config
        return -((params["alpha"] - best["alpha"]) ** 2) - (params["beta"] - best["beta"]) ** 2

    space = {"alpha": [0.1, 0.2, 0.3, 0.4], "beta": [5, 6, 7, 8, 9]}
    out = run_sweep(trial, space, state_dir=str(tmp_path / "sweep"))
    assert isinstance(out, SweepResult)
    assert len(out.trials) == 20
    assert out.best_params == best
    assert out.best.metrics["value"] == 0.0

    lines = [
        json.loads(line)
        for line in open(tmp_path / "sweep" / "metrics.jsonl")
        if line.strip()
    ]
    assert len(lines) == 20
    units = [r["unit"] for r in lines]
    assert units == [f"trial-{i:05d}" for i in range(20)]
    for r in lines:
        m = r["metrics"]
        assert set(m["params"]) == {"alpha", "beta"}
        assert m["status"] == "ok" and "value" in m["trial_metrics"]


def test_sweep_resume_skips_completed_trials(tmp_path):
    calls = []

    def trial(params):
        calls.append(params["k"])
        if params["k"] == 3 and len(calls) <= 3:
            raise RuntimeError("boom on first pass")
        return float(params["k"])

    space = {"k": [1, 2, 3, 4]}
    sd = str(tmp_path / "s")
    first = run_sweep(trial, space, state_dir=sd)
    assert calls == [1, 2, 3, 4]
    assert [t.status for t in first.trials] == ["ok", "ok", "failed", "ok"]
    assert first.best_params == {"k": 4}

    # rerun: COMPLETED trials are read back from their markers without
    # re-invoking trial_fn, but the FAILED trial is retried (round-5
    # review — a transient failure must not be excluded forever), and
    # the transient error has cleared, so it now completes and rejoins
    # best selection
    second = run_sweep(trial, space, state_dir=sd)
    assert calls == [1, 2, 3, 4, 3]
    assert [t.resumed for t in second.trials] == [True, True, False, True]
    assert [t.status for t in second.trials] == ["ok", "ok", "ok", "ok"]
    assert second.best_params == {"k": 4}
    # one lineage record per EXECUTED trial: 4 from the first run + the
    # retry of the failed one
    lines = [line for line in open(os.path.join(sd, "metrics.jsonl")) if line.strip()]
    assert len(lines) == 5

    # third run: everything (including the recovered trial) resumes from
    # markers; trial_fn is never invoked again
    third = run_sweep(trial, space, state_dir=sd)
    assert calls == [1, 2, 3, 4, 3]
    assert all(t.resumed for t in third.trials)
    assert third.best_params == {"k": 4}


def test_sweep_error_and_nan_handling(tmp_path):
    def trial(params):
        if params["k"] == 2:
            raise ValueError("bad config")
        if params["k"] == 3:
            return float("nan")
        return float(params["k"])

    out = run_sweep(trial, {"k": [1, 2, 3]}, direction="max")
    assert [t.status for t in out.trials] == ["ok", "failed", "ok"]
    assert "ValueError" in out.trials[1].error
    # NaN metric cannot win; failed trial cannot win
    assert out.best_params == {"k": 1}

    with pytest.raises(ValueError, match="bad config"):
        run_sweep(trial, {"k": [2]}, on_error="raise")

    empty = run_sweep(trial, {"k": [2]}, on_error="record")
    assert empty.best is None and empty.best_params is None


def test_sweep_min_direction_and_dict_metrics():
    def trial(params):
        return {"loss": (params["h"] - 8) ** 2, "aux": "note-%d" % params["h"]}

    out = run_sweep(trial, {"h": [2, 4, 8, 16]}, metric="loss", direction="min")
    assert out.best_params == {"h": 8}
    assert out.best.metrics["aux"] == "note-8"
    # ties break on the LOWEST trial id
    tie = run_sweep(lambda p: 1.0, {"h": [1, 2, 3]}, direction="max")
    assert tie.best.trial_id == 0


def test_sweep_tunes_autoencoder_hyperparams(ray_session):
    """Integration (the verdict's named use-case): a grid over the
    distributed autoencoder's hidden width recovers the capacity that
    reconstructs a planted 2-D manifold best — each trial IS a
    distributed Ray Data training run; the sweep loop stays on the
    driver."""
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.autoencoder import NumpyAutoencoder

    rng = np.random.default_rng(0)
    z = rng.normal(size=(300, 2))
    basis = rng.normal(size=(2, 6))
    x = z @ basis  # rank-2 data in 6 dims: hidden=2 suffices, hidden=1 can't
    ds = rd.from_arrow(pa.table({"embedding": [row.tolist() for row in x]}))

    def trial(params):
        model, losses = NumpyAutoencoder.train_distributed(
            ds, hidden=params["hidden"], epochs=60, lr=0.05, seed=0
        )
        return {"loss": losses[-1]}

    out = run_sweep(trial, {"hidden": [1, 2]}, metric="loss", direction="min")
    assert out.best_params == {"hidden": 2}
    l1 = next(t.metrics["loss"] for t in out.trials if t.params["hidden"] == 1)
    l2 = out.best.metrics["loss"]
    assert l2 < l1 * 0.5, (l1, l2)


def test_sweep_stale_marker_params_mismatch_reruns(tmp_path):
    """Rerunning with an EDITED space against the same state_dir must
    re-execute trials whose stored params no longer match, not silently
    resume the old sweep's results (round-5 review)."""
    from anomalydetection_ray.pipelines.sweep import run_sweep

    calls = []

    def fn(p):
        calls.append(dict(p))
        return {"value": float(p["x"])}

    s = str(tmp_path / "st")
    r1 = run_sweep(fn, {"x": [1, 2]}, state_dir=s)
    assert [t.resumed for t in r1.trials] == [False, False]
    # same space resumes
    r2 = run_sweep(fn, {"x": [1, 2]}, state_dir=s)
    assert [t.resumed for t in r2.trials] == [True, True]
    # edited space re-runs with the NEW params
    r3 = run_sweep(fn, {"x": [10, 2]}, state_dir=s)
    assert [t.resumed for t in r3.trials] == [False, True]
    assert r3.trials[0].params == {"x": 10}
    assert calls.count({"x": 10}) == 1


def test_sweep_numpy_params_and_metrics_are_json_safe(tmp_path):
    import numpy as np

    from anomalydetection_ray.pipelines.sweep import run_sweep

    space = {"n": list(np.arange(1, 3))}  # np.int64 values
    r = run_sweep(
        lambda p: {"value": np.float64(p["n"]), "vec": np.array([1.0, 2.0])},
        space,
        state_dir=str(tmp_path / "st"),
    )
    assert [t.status for t in r.trials] == ["ok", "ok"]
    assert r.best_params["n"] == 2
    # markers parse back
    r2 = run_sweep(lambda p: {"value": 0.0}, space, state_dir=str(tmp_path / "st"))
    assert all(t.resumed for t in r2.trials)
    assert r2.trials[1].metrics["vec"] == [1.0, 2.0]


def test_grid_accepts_string_tuple_axes():
    from anomalydetection_ray.pipelines.sweep import grid_configs

    cfgs = grid_configs({"act": ("relu", "tanh"), "n": [1]})
    assert cfgs == [{"act": "relu", "n": 1}, {"act": "tanh", "n": 1}]
    import pytest

    with pytest.raises(ValueError, match="distribution spec"):
        grid_configs({"lr": ("loguniform", 1e-4, 1e-1)})


def test_lineage_tolerates_truncated_trailing_line(tmp_path):
    import json
    import os

    from anomalydetection_ray.state import RunState

    st = RunState(str(tmp_path))
    st.lineage_append({"unit": "a", "ok": 1})
    with open(os.path.join(str(tmp_path), "metrics.jsonl"), "a") as f:
        f.write('{"unit": "tri')  # crash mid-append
    recs = st.lineage()
    assert recs == [{"unit": "a", "ok": 1}]
    # appending after the torn line must seal the tear with a newline —
    # writing straight after it would merge the NEW record into the torn
    # text and silently lose it (round-5 review); only the torn record
    # itself is lost
    st.lineage_append({"unit": "b"})
    assert {r.get("unit") for r in st.lineage()} == {"a", "b"}


def test_random_accepts_string_tuple_axes():
    """The same space must be valid in BOTH modes (round-5 review: a
    ('relu', 'tanh') tuple categorical was grid-only and random mode
    raised 'unknown spec' on it)."""
    from anomalydetection_ray.pipelines.sweep import random_configs

    cfgs = random_configs({"act": ("relu", "tanh"), "lr": ("loguniform", 1e-4, 1e-1)}, 8, seed=3)
    assert len(cfgs) == 8
    assert all(c["act"] in ("relu", "tanh") for c in cfgs)
    assert all(1e-4 <= c["lr"] <= 1e-1 for c in cfgs)
    # the exact 3-tuple distribution grammar is untouched
    import pytest

    with pytest.raises(ValueError, match="unknown spec"):
        random_configs({"x": 7}, 2)
    with pytest.raises(ValueError, match="non-empty"):
        random_configs({"x": ()}, 2)


def test_sweep_resume_keeps_param_types(tmp_path):
    """Round-5 review: resumed trials must report the in-memory params,
    not the JSON-normalized marker copy — a resume used to turn tuple
    params into lists in best_params."""
    def trial(params):
        return float(sum(params["layers"]))

    space = {"layers": [(64, 32), (128,)]}
    sd = str(tmp_path / "s")
    first = run_sweep(trial, space, state_dir=sd)
    second = run_sweep(trial, space, state_dir=sd)
    assert all(t.resumed for t in second.trials)
    assert second.best_params == first.best_params == {"layers": (128,)}
    assert isinstance(second.best_params["layers"], tuple)
