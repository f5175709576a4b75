"""Degenerate-input hardening for the validation suite — the shapes a
100 TB run inevitably contains (empty partitions, single rows, pure-dup
shards, heavy unicode, null-riddled keys) must flow through BOTH suite
runners without crashing and with correct verdicts."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

COLS = ["repo", "path", "commit", "lang", "content"]


def _mk(tmp_path, name, rows):
    d = tmp_path / name
    d.mkdir()
    t = pa.table({c: pa.array([r[i] for r in rows], type=pa.string()) for i, c in enumerate(COLS)})
    pq.write_table(t, str(d / "part-0.parquet"))
    return str(d)


@pytest.mark.parametrize("sharded", [False, True])
def test_empty_corpus(ray_session, tmp_path, sharded):
    from anomalydetection_ray.pipelines.validate import SuiteConfig, run_suite, run_suite_sharded

    d = _mk(tmp_path, "empty", [])
    runner = run_suite_sharded if sharded else run_suite
    res = runner(d, str(tmp_path / f"out{sharded}"), SuiteConfig(), resume=False)
    assert res.passed and len(res.verdicts) == 0
    for v in res.violations.values():
        assert v.num_rows == 0


@pytest.mark.parametrize("sharded", [False, True])
def test_all_duplicate_corpus(ray_session, tmp_path, sharded):
    from anomalydetection_ray.pipelines.validate import SuiteConfig, run_suite, run_suite_sharded

    d = _mk(tmp_path, "dups", [("r", "p", "c", "py", "x")] * 40)
    runner = run_suite_sharded if sharded else run_suite
    res = runner(d, str(tmp_path / f"out{sharded}"), SuiteConfig(), resume=False)
    assert not res.passed
    assert res.violations["uniqueness"].num_rows == 40  # every copy reported


def test_unicode_and_single_row(ray_session, tmp_path):
    from anomalydetection_ray.pipelines.validate import SuiteConfig, run_suite

    uni = _mk(tmp_path, "uni", [("r", f"p{i}", "c", "zh", "漢字テキスト🚀" * 40) for i in range(15)])
    res = run_suite(uni, str(tmp_path / "out_u"), SuiteConfig(), resume=False)
    assert res.passed
    one = _mk(tmp_path, "one", [("r", "p", "c", "py", "hello")])
    res1 = run_suite(one, str(tmp_path / "out_1"), SuiteConfig(), resume=False)
    assert res1.passed


def test_null_riddled_rows(ray_session, tmp_path):
    from anomalydetection_ray.pipelines.validate import SuiteConfig, run_suite

    rows = [("r", None, "c", None, None), (None, "p", "c", None, ""), ("r2", "p2", None, "py", "ok")]
    d = _mk(tmp_path, "nulls", rows)
    res = run_suite(d, str(tmp_path / "out_n"), SuiteConfig(max_null_rate=1.0), resume=False)
    # null lang + empty/null content rows are row-rule violations; no crash
    assert not res.passed
    assert res.violations["rowrules"].num_rows >= 2
