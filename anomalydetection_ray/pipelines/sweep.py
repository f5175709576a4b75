"""Deterministic config-sweep runner — the reference's hyperparameter
search workflow recast as an engine primitive.

Reference parity: ``track_simclr_pcdarts.py:114-239`` wraps an Optuna
study — ``objective(trial)`` samples hyperparameters
(``trial.suggest_categorical/int/float``), trains, logs every trial to
MLflow, and the driver picks ``study.best_trial`` (same shape in
``track_vae_pcdarts.py``). This module keeps the workflow (sample →
evaluate → record → select best) and swaps the machinery for the
engine's idioms:

- **Deterministic** search: a grid (sorted-key cartesian product) or a
  seeded random sampler — no TPE, so a rerun visits byte-identical
  configs in byte-identical order (Optuna's sampler is stateful and
  irreproducible across interruptions).
- **Per-trial lineage** through :class:`~..state.checkpoint.RunState`
  (the engine's MLflow analog): each finished trial appends one JSONL
  record and writes an atomic ``_DONE`` marker, so an interrupted sweep
  RESUMES — completed trials are read back from their markers, not
  re-evaluated (Optuna restarts the study from scratch).
- Trials run sequentially on the driver BY DESIGN: each trial is itself
  a distributed Ray Data pipeline (a suite run, a dedup pass, an
  autoencoder fit), so the cluster's parallelism lives inside the
  trial; racing whole trials against each other would just make two
  pipelines fight for the same CPUs.

The search *space* grammar covers what the reference tunes:
``{"lr": ("loguniform", 1e-5, 1e-1), "layers": ("int", 1, 4),
"temp": ("uniform", 0.1, 1.0), "act": ["relu", "tanh"]}`` — lists are
categorical (grid axes), tuples are random-mode distributions.
"""

from __future__ import annotations

import itertools
import math
from dataclasses import dataclass, field

import numpy as np

from ..state.checkpoint import RunState


@dataclass
class TrialRecord:
    trial_id: int
    params: dict
    metrics: dict = field(default_factory=dict)
    status: str = "ok"  # "ok" | "failed"
    error: str | None = None
    resumed: bool = False


@dataclass
class SweepResult:
    trials: list[TrialRecord]
    metric: str
    direction: str

    @property
    def best(self) -> TrialRecord | None:
        """The completed trial optimizing ``metric`` (NaN/missing and
        failed trials never win); ties break on the LOWEST trial id so
        the winner is independent of evaluation order."""
        sign = 1.0 if self.direction == "max" else -1.0
        cands = [
            t
            for t in self.trials
            if t.status == "ok"
            and isinstance(t.metrics.get(self.metric), (int, float))
            and not math.isnan(float(t.metrics[self.metric]))
        ]
        if not cands:
            return None
        return max(cands, key=lambda t: (sign * float(t.metrics[self.metric]), -t.trial_id))

    @property
    def best_params(self) -> dict | None:
        b = self.best
        return None if b is None else b.params


def grid_configs(space: dict) -> list[dict]:
    """Sorted-key cartesian product of categorical axes. Every axis must
    be a list/tuple of VALUES (distribution specs are random-mode only).
    Key order and per-axis value order fix the trial order, so trial ids
    are stable across runs — the resume contract depends on this."""
    keys = sorted(space)
    axes = []
    for k in keys:
        v = space[k]
        # only the EXACT spec grammar is rejected — a 3-tuple headed by a
        # distribution name. ('relu', 'tanh') is a legitimate categorical
        # axis in tuple form (round-5 review: any string-headed tuple was
        # rejected, contradicting the list/tuple-of-values docstring).
        if (
            isinstance(v, tuple)
            and len(v) == 3
            and v[0] in ("int", "uniform", "loguniform")
        ):
            raise ValueError(
                f"axis {k!r} is a distribution spec {v!r}; grid mode needs explicit value lists"
            )
        if not isinstance(v, (list, tuple)) or len(v) == 0:
            raise ValueError(f"axis {k!r} must be a non-empty list of values")
        axes.append(list(v))
    return [dict(zip(keys, combo)) for combo in itertools.product(*axes)]


def random_configs(space: dict, n_trials: int, seed: int = 0) -> list[dict]:
    """``n_trials`` deterministic draws. Spec grammar (Optuna's suggest_*
    surface, ``track_simclr_pcdarts.py:118-125``): a list is categorical
    (``suggest_categorical``), ``("int", lo, hi)`` inclusive ints
    (``suggest_int``), ``("uniform", lo, hi)`` (``suggest_float``),
    ``("loguniform", lo, hi)`` (``suggest_float(log=True)``). One rng
    stream in sorted-key order keeps draws independent of dict order."""
    rng = np.random.default_rng(seed)
    keys = sorted(space)
    out = []
    for _ in range(n_trials):
        cfg = {}
        for k in keys:
            v = space[k]
            # same categorical grammar as grid mode (round-5 review: a
            # ('relu', 'tanh') tuple axis was grid-only): anything
            # list-like that is NOT the exact 3-tuple distribution spec
            # is a categorical value set.
            if isinstance(v, tuple) and not (
                len(v) == 3 and v[0] in ("int", "uniform", "loguniform")
            ):
                v = list(v)
            if isinstance(v, list):
                if len(v) == 0:
                    raise ValueError(f"axis {k!r} must be a non-empty list of values")
                cfg[k] = v[int(rng.integers(0, len(v)))]
            elif isinstance(v, tuple) and len(v) == 3 and v[0] == "int":
                cfg[k] = int(rng.integers(int(v[1]), int(v[2]) + 1))
            elif isinstance(v, tuple) and len(v) == 3 and v[0] == "uniform":
                cfg[k] = float(rng.uniform(float(v[1]), float(v[2])))
            elif isinstance(v, tuple) and len(v) == 3 and v[0] == "loguniform":
                lo, hi = math.log(float(v[1])), math.log(float(v[2]))
                cfg[k] = float(math.exp(rng.uniform(lo, hi)))
            else:
                raise ValueError(f"axis {k!r}: unknown spec {v!r}")
        out.append(cfg)
    return out


def run_sweep(
    trial_fn,
    space: dict,
    *,
    mode: str = "grid",
    n_trials: int | None = None,
    seed: int = 0,
    metric: str = "value",
    direction: str = "max",
    state_dir: str | None = None,
    on_error: str = "record",
) -> SweepResult:
    """Evaluate ``trial_fn(params) -> float | dict`` over the space and
    select the best trial by ``metric``/``direction``.

    A float return becomes ``{"value": x}``. With ``state_dir``, each
    trial checkpoints through :class:`RunState` — reruns SKIP completed
    trials (their metrics are read from the ``_DONE`` marker and flagged
    ``resumed=True``) and the lineage JSONL gains exactly one record per
    newly-executed trial, tagged with the trial id and params. A failing
    trial is recorded (``status="failed"``) and excluded from best
    selection under ``on_error="record"`` (Optuna's trial-pruning
    analog); ``on_error="raise"`` propagates. A failed marker does not
    count as completed: the next rerun RETRIES that trial and
    overwrites its marker, so transient failures cannot silently
    exclude a config forever.
    """
    if direction not in ("max", "min"):
        raise ValueError("direction must be 'max' or 'min'")
    if on_error not in ("record", "raise"):
        raise ValueError("on_error must be 'record' or 'raise'")
    if mode == "grid":
        configs = grid_configs(space)
        if n_trials is not None:
            configs = configs[:n_trials]
    elif mode == "random":
        if n_trials is None:
            raise ValueError("random mode needs n_trials")
        configs = random_configs(space, n_trials, seed)
    else:
        raise ValueError("mode must be 'grid' or 'random'")

    state = RunState(state_dir) if state_dir else None
    trials: list[TrialRecord] = []
    for i, params in enumerate(configs):
        unit = f"trial-{i:05d}"
        if state is not None:
            done = state.done_metrics(unit)
            if done is not None:
                m = done.get("metrics", {})
                # a marker only resumes a trial whose params MATCH the
                # current config at this position — rerunning with an
                # edited space/seed against the same state_dir otherwise
                # silently returns the OLD sweep's results (round-5
                # review). Compare in JSON form (the marker round-trips
                # tuples to lists and numpy scalars to python). A
                # status='failed' marker does NOT resume: a transient
                # failure (OOM, preemption — exactly what state_dir
                # exists to survive) would otherwise be skipped forever
                # and silently excluded from best selection; the retry
                # overwrites the marker either way (round-5 review).
                if (
                    _jsonable(m.get("params")) == _jsonable(params)
                    and m.get("status", "ok") != "failed"
                ):
                    trials.append(
                        TrialRecord(
                            trial_id=i,
                            # report the in-memory params, not the
                            # JSON-normalized marker copy — a resume must
                            # not turn tuples into lists in best_params
                            # (round-5 review; the match above guarantees
                            # they are the same values)
                            params=params,
                            metrics=m.get("trial_metrics", {}),
                            status=m.get("status", "ok"),
                            error=m.get("error"),
                            resumed=True,
                        )
                    )
                    continue
        rec = TrialRecord(trial_id=i, params=params)
        try:
            out = trial_fn(dict(params))
            rec.metrics = {"value": float(out)} if not isinstance(out, dict) else {
                k: (float(v) if isinstance(v, (int, float, np.floating, np.integer)) else v)
                for k, v in out.items()
            }
        except Exception as exc:  # noqa: BLE001 - trial isolation is the point
            if on_error == "raise":
                raise
            rec.status, rec.error = "failed", f"{type(exc).__name__}: {exc}"
        trials.append(rec)
        if state is not None:
            # _jsonable: numpy scalars/arrays in params or metrics must
            # not crash json.dump AFTER the trial succeeded (round-5
            # review — that aborted the sweep and lost the marker,
            # defeating on_error='record')
            state.mark_done(
                unit,
                {
                    "trial_id": i,
                    "params": _jsonable(rec.params),
                    "trial_metrics": _jsonable(rec.metrics),
                    "status": rec.status,
                    "error": rec.error,
                },
            )
    return SweepResult(trials=trials, metric=metric, direction=direction)


def _jsonable(v):
    """Canonical JSON-safe form: numpy scalars -> python, arrays/tuples ->
    lists, dicts recursed. Doubles as the marker-vs-config comparison
    normalizer (a JSON round-trip applies exactly these conversions)."""
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, np.ndarray):
        return [_jsonable(x) for x in v.tolist()]
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.bool_,)):
        return bool(v)
    return v
