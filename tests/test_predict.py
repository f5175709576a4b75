"""End-to-end log → anomaly pipeline tests (reference flagship parity,
`end_to_end_prediction.py` steps 1-7) plus the CLI wrapper."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest


def _write_log(path: str, n: int = 3000, seed: int = 7) -> dict:
    """Deterministic BGL-ish log: `-` marker = normal, `ALARM` = anomaly.
    Templates repeat (so the frequency filter keeps them); anomalies carry
    a rare verbose tail so hashed-feature L2 norms separate classes."""
    rng = np.random.default_rng(seed)
    n_anom = 0
    lines = []
    for i in range(n):
        anom = rng.random() < 0.05
        node = f"R{i % 4:02d}-M1-N{i % 8}"
        ts = 1117838570 + i
        if anom:
            n_anom += 1
            content = (
                f"data TLB error interrupt rptr {i} fault address {i * 7} "
                "machine check interrupt storm detected on torus sender x plus unit"
            )
            marker = "ALARM"
        else:
            content = f"instruction cache parity error corrected count {i % 3}"
            marker = "-"
        lines.append(
            f"{marker} {ts} 2005.06.03 {node} 2005-06-03-15.42.50 {node} RAS KERNEL "
            f"{'FATAL' if anom else 'INFO'} {content}"
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return {"n": n, "n_anom": n_anom}


@pytest.fixture(scope="module")
def log_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("logs")
    path = str(d / "bgl.log")
    info = _write_log(path)
    return path, info


def test_end_to_end_predict(ray_session, log_file, tmp_path):
    from anomalydetection_ray.pipelines.predict import PredictConfig, end_to_end_predict

    path, info = log_file
    out = str(tmp_path / "out")
    res = end_to_end_predict(path, out, PredictConfig())
    assert res.n_rows == info["n"]  # frequency filter keeps repeated templates
    final = pq.read_table(res.final_path).to_pandas()
    assert {"label", "log", "template", "params", "anomaly_score", "anomaly_prediction"} <= set(final.columns)
    # p95 threshold → ~5% flagged
    rate = final["anomaly_prediction"].mean()
    assert 0.02 < rate < 0.08, rate
    # the verbose rare anomaly templates score above the common one
    assert res.metrics["recall"] > 0.9, res.metrics
    assert res.metrics["precision"] > 0.9, res.metrics
    # metrics.json written with eval keys (A5 parity)
    with open(os.path.join(out, "metrics.json")) as f:
        m = json.load(f)
    assert {"accuracy", "precision", "recall", "f1_score", "threshold"} <= set(m)


def test_predict_deterministic_and_resume(ray_session, log_file, tmp_path):
    from anomalydetection_ray.pipelines.predict import PredictConfig, end_to_end_predict

    path, _ = log_file
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    r1 = end_to_end_predict(path, out1, PredictConfig())
    r2 = end_to_end_predict(path, out2, PredictConfig())
    assert r1.threshold == r2.threshold
    f1 = pq.read_table(r1.final_path).to_pandas().sort_values("log").reset_index(drop=True)
    f2 = pq.read_table(r2.final_path).to_pandas().sort_values("log").reset_index(drop=True)
    assert f1.equals(f2)

    # resume: scored checkpoint reused, same threshold/result
    scored = os.path.join(out1, "scored", "parquet")
    t0 = max(os.path.getmtime(os.path.join(scored, f)) for f in os.listdir(scored))
    r3 = end_to_end_predict(path, out1, PredictConfig())
    t1 = max(os.path.getmtime(os.path.join(scored, f)) for f in os.listdir(scored))
    assert t0 == t1 and r3.threshold == r1.threshold
    # the recomputed final stage REPLACES its output (write_parquet
    # appends UUID-named files; without the wipe a resumed run doubled
    # every row, metric and report)
    assert r3.n_rows == r1.n_rows
    f3 = pq.read_table(r3.final_path).to_pandas().sort_values("log").reset_index(drop=True)
    assert f3.equals(f1)
    # crash between the scored write and its _DONE marker: the re-run must
    # rewrite the partial scored shards, not append a second copy
    os.remove(os.path.join(out1, "scored", "_DONE"))
    r4 = end_to_end_predict(path, out1, PredictConfig())
    assert r4.n_rows == r1.n_rows and r4.threshold == r1.threshold


def test_predict_kll_threshold_close_to_exact(ray_session, log_file, tmp_path):
    from anomalydetection_ray.pipelines.predict import PredictConfig, end_to_end_predict

    path, _ = log_file
    r_exact = end_to_end_predict(path, str(tmp_path / "e"), PredictConfig(threshold_mode="exact"))
    r_kll = end_to_end_predict(path, str(tmp_path / "k"), PredictConfig(threshold_mode="kll"))
    # KLL(512) rank error ≪ 1%; thresholds must be near-identical ranks
    scores = pq.read_table(r_exact.final_path, columns=["anomaly_score"]).to_pandas()["anomaly_score"].to_numpy()
    rank_exact = (scores <= r_exact.threshold).mean()
    rank_kll = (scores <= r_kll.threshold).mean()
    assert abs(rank_exact - rank_kll) < 0.02


def test_predict_auto_threshold_is_cost_based(ray_session, log_file, tmp_path):
    """Default mode picks the plan from the scored checkpoint's size
    estimate (round-2 verdict item 5): exact under the byte cap, the
    streamed KLL sketch above it — never an unconditional full collect."""
    from anomalydetection_ray.pipelines.predict import PredictConfig, end_to_end_predict

    path, _ = log_file
    assert PredictConfig().threshold_mode == "auto"
    r_small = end_to_end_predict(path, str(tmp_path / "a"), PredictConfig())
    r_exact = end_to_end_predict(path, str(tmp_path / "e"), PredictConfig(threshold_mode="exact"))
    assert r_small.threshold == r_exact.threshold  # tiny input → exact plan
    r_big = end_to_end_predict(
        path, str(tmp_path / "b"), PredictConfig(threshold_exact_max_bytes=-1)
    )
    r_kll = end_to_end_predict(path, str(tmp_path / "k"), PredictConfig(threshold_mode="kll"))
    assert r_big.threshold == r_kll.threshold  # over the cap → sketch plan


def test_predict_sampling_and_limits(ray_session, log_file, tmp_path):
    from anomalydetection_ray.pipelines.predict import PredictConfig, end_to_end_predict

    path, info = log_file
    res = end_to_end_predict(
        path, str(tmp_path / "s"), PredictConfig(sample_ratio=0.5, min_sample_rows=10)
    )
    assert 0.35 * info["n"] < res.n_rows < 0.65 * info["n"]
    # below the min-rows floor the sample is skipped entirely (reference
    # floor semantics, end_to_end_prediction.py:271)
    res2 = end_to_end_predict(
        path, str(tmp_path / "f"), PredictConfig(sample_ratio=0.5, min_sample_rows=10**9)
    )
    assert res2.n_rows == info["n"]


def test_cli_predict_and_validate(ray_session, log_file, tmp_path):
    """CLI smoke: reuses the running Ray session (no shutdown on exit)."""
    import ray

    from anomalydetection_ray.__main__ import main
    from anomalydetection_ray.corpus import generate_corpus

    path, _ = log_file
    rc = main(["predict", str(path), "--out", str(tmp_path / "p"), "--max-lines", "500"])
    assert rc == 0 and ray.is_initialized()
    assert os.path.exists(tmp_path / "p" / "metrics.json")

    d = str(tmp_path / "corpus")
    generate_corpus(d, n_rows=800, n_repos=40, seed=3, rows_per_file=200)
    rc = main([
        "validate", f"{d}/corpus", "--out", str(tmp_path / "v"),
        "--repos-dim", f"{d}/repos.parquet", "--sharded", "--n-shards", "2",
    ])
    assert rc == 0 and ray.is_initialized()
    assert os.path.exists(tmp_path / "v" / "verdicts.parquet")


def test_cli_validate_tolerance_flag(ray_session, tmp_path):
    from anomalydetection_ray.__main__ import main
    from anomalydetection_ray.corpus import generate_corpus

    d = str(tmp_path / "c")
    generate_corpus(d, n_rows=600, n_repos=30, seed=5, rows_per_file=300)
    # absurd p95 bound must fail the suite (exit code 1)
    rc = main([
        "validate", f"{d}/corpus", "--out", str(tmp_path / "v"),
        "--tolerance", "p95:0:1.0:content",
    ])
    assert rc == 1


def test_predict_mined_template_mode(ray_session, log_file, tmp_path):
    """template_mode="mined" routes step 1 through the sharded evolving
    miner: per-line templates are the group-merged ones, and the pipeline
    still separates classes."""
    from anomalydetection_ray.pipelines.predict import PredictConfig, end_to_end_predict

    path, info = log_file
    res = end_to_end_predict(
        path, str(tmp_path / "out"), PredictConfig(template_mode="mined"), resume=False
    )
    assert res.n_rows == info["n"]
    final = pq.read_table(res.final_path).to_pandas()
    tpls = set(final["template"])
    # the normal generator's varying count digit is wildcarded by the
    # miner exactly as by the mask; the anomalous tail mines to one
    # template with wildcards at the varying numeric positions
    assert any("instruction cache parity error corrected count <*>" in t for t in tpls)
    mined_anom = final.loc[final["label"] == 1, "template"].unique()
    assert len(mined_anom) == 1 and "<*>" in mined_anom[0]


def test_report_artifacts(ray_session, log_file, tmp_path):
    """S9 analog: tabular score-distribution + top-templates report
    artifacts are written and internally consistent."""
    import pandas as pd
    from anomalydetection_ray.pipelines.predict import PredictConfig, end_to_end_predict

    path, info = log_file
    out = str(tmp_path / "out")
    res = end_to_end_predict(path, out, PredictConfig(), resume=False)
    dist = pq.read_table(os.path.join(out, "report", "score_distribution.parquet")).to_pandas()
    # histogram mass equals row count; every (label, prediction) cell of
    # the confusion matrix appears
    assert dist["count"].sum() == res.n_rows
    cells = set(map(tuple, dist[["label", "prediction"]].drop_duplicates().itertuples(index=False, name=None)))
    m = res.metrics
    expect = set()
    for (y, p), c in {(1, 1): m["tp"], (0, 1): m["fp"], (0, 0): m["tn"], (1, 0): m["fn"]}.items():
        if c:
            expect.add((y, p))
    assert cells == expect
    per_cell = dist.groupby(["label", "prediction"])["count"].sum().to_dict()
    assert per_cell.get((1, 1), 0) == m["tp"] and per_cell.get((0, 0), 0) == m["tn"]

    top = pq.read_table(os.path.join(out, "report", "top_templates.parquet")).to_pandas()
    assert (top.groupby("anomaly_prediction").size() <= 10).all()
    assert (top["cnt"] > 0).all()


def test_versioned_baseline_discovery(ray_session, tmp_path):
    """S7 analog: versioned snapshots under one root; the suite resolves
    a directory baseline to the LATEST snapshot."""
    from anomalydetection_ray.corpus import generate_corpus
    from anomalydetection_ray.pipelines.validate import (
        SuiteConfig,
        find_latest_snapshot,
        run_suite,
        write_baseline_versioned,
    )

    d = str(tmp_path / "c")
    generate_corpus(d, n_rows=800, n_repos=40, seed=13, rows_per_file=400)
    root = str(tmp_path / "snapshots")
    assert find_latest_snapshot(root) is None
    p0 = write_baseline_versioned(f"{d}/corpus", root)
    p1 = write_baseline_versioned(f"{d}/corpus", root)
    assert os.path.basename(p0) == "baseline-0000.parquet"
    assert os.path.basename(p1) == "baseline-0001.parquet"
    assert find_latest_snapshot(root) == p1
    # run_suite accepts the ROOT directory and scores vs the latest
    res = run_suite(f"{d}/corpus", str(tmp_path / "out"), SuiteConfig(), baseline_snapshot=root)
    drift = res.verdicts[res.verdicts["check"] == "drift"]
    assert len(drift) and drift["passed"].all()  # same corpus -> no drift


def test_cli_dedup_and_mine_templates(ray_session, tmp_path):
    """CLI surfaces for the engine-added operators: dedup survivors and
    mined templates, parquet in → parquet out."""
    import pyarrow as pa
    from anomalydetection_ray.__main__ import main

    src = str(tmp_path / "docs.parquet")
    texts = ["alpha beta gamma delta"] * 3 + ["totally different content here"] + ["core file 1", "core file 2"]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(6), type=pa.int64()), "text": texts}), src
    )
    out = str(tmp_path / "survivors")
    assert main(["dedup", src, "--out", out, "--method", "exact"]) == 0
    surv = pq.read_table(out).to_pandas()
    assert sorted(surv["doc_id"]) == [0, 3, 4, 5]  # exact dups collapse, near-dups kept

    tout = str(tmp_path / "templates.parquet")
    assert main(["mine-templates", src, "--out", tout]) == 0
    tpl = pq.read_table(tout).to_pandas().set_index("template")["cnt"].to_dict()
    assert tpl["core file <*>"] == 2
    assert tpl["alpha beta gamma delta"] == 3


def test_cli_versioned_baseline(ray_session, tmp_path):
    from anomalydetection_ray.__main__ import main
    from anomalydetection_ray.corpus import generate_corpus

    d = str(tmp_path / "c")
    generate_corpus(d, n_rows=400, n_repos=30, seed=3, rows_per_file=400)
    root = str(tmp_path / "snaps")
    assert main(["baseline", f"{d}/corpus", "--out", root, "--versioned"]) == 0
    assert main(["baseline", f"{d}/corpus", "--out", root, "--versioned"]) == 0
    assert sorted(os.listdir(root)) == ["baseline-0000.parquet", "baseline-0001.parquet"]


def test_cli_score_all_methods(ray_session, tmp_path, capsys):
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from anomalydetection_ray.__main__ import main

    rng = np.random.default_rng(12)
    x = rng.standard_normal((300, 8))
    x[:6] += 12.0  # planted outliers
    src = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(300, dtype=np.int64)),
                "embedding": pa.array([r.tolist() for r in x], type=pa.list_(pa.float64())),
            }
        ),
        src,
    )
    for method in ("l2", "mahalanobis", "iforest"):
        out = str(tmp_path / f"scored_{method}")
        assert main(["score", src, "--out", out, "--method", method]) == 0
        info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert info["rows"] == 300 and info["anomalies"] >= 6
        import ray.data as rd

        got = rd.read_parquet(out).to_pandas()
        assert set(["vec_id", "anomaly_score", "anomaly_prediction"]) <= set(got.columns)
        # the planted outliers must be flagged for the multivariate scorers
        if method == "mahalanobis":
            assert got.sort_values("vec_id")["anomaly_prediction"].to_numpy()[:6].all()


def test_stale_scored_marker_triggers_recompute(ray_session, log_file, tmp_path):
    """Round-5 review: a marker whose recorded row count disagrees with
    the shards on disk (crash between the payload wipe and mark_done)
    must NOT be trusted on resume — the scored stage recomputes."""
    import glob
    import os

    from anomalydetection_ray.pipelines.predict import PredictConfig, end_to_end_predict

    path, info = log_file
    out = str(tmp_path / "stale")
    r1 = end_to_end_predict(path, out, PredictConfig())
    # simulate the partial-payload state: remove one scored shard while
    # the old marker still vouches for the full row count
    shards = glob.glob(os.path.join(out, "scored", "parquet", "*.parquet"))
    assert shards
    os.remove(shards[0])
    r2 = end_to_end_predict(path, out, PredictConfig(), resume=True)
    assert r2.n_rows == r1.n_rows  # recomputed, not served from partial data
    assert r2.metrics["tp"] == r1.metrics["tp"]


def test_max_lines_zero_means_zero(ray_session, log_file):
    """Round-5 review: max_lines=0 used to read the WHOLE log (falsy
    check); it must mean zero rows."""
    from anomalydetection_ray.sources.logs import read_log_lines

    path, _ = log_file
    assert read_log_lines(path, max_lines=0).count() == 0
    assert read_log_lines(path, max_lines=None).count() > 0


def test_corrupt_done_marker_means_not_done(tmp_path):
    """Round-5 review: a truncated/corrupt _DONE marker must read as
    not-done (recompute), not crash every rerun."""
    from anomalydetection_ray.state import RunState

    st = RunState(str(tmp_path))
    st.mark_done("u", {"rows": 3})
    assert st.done_metrics("u") is not None
    # corrupt it the way a power loss would
    with open(os.path.join(str(tmp_path), "u", "_DONE"), "w") as f:
        f.write('{"unit": "u", "metr')
    assert st.done_metrics("u") is None
    assert not st.is_done_compat("u")
    # invalidate() drops a marker so recompute can never resurrect it
    st.mark_done("u", {"rows": 3})
    st.invalidate("u")
    assert st.done_metrics("u") is None
    st.invalidate("u")  # idempotent on a missing marker
