"""Schema validation + schema drift (checks/schema.py): spec coercion,
verdict semantics, and suite integration (explicit expectation and
baseline-snapshot drift), all metadata-only."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anomalydetection_ray.checks.schema import (
    schema_spec,
    schema_verdicts,
    spec_from_any,
    spec_from_stats,
)
from anomalydetection_ray.corpus import generate_corpus


@pytest.fixture(scope="module")
def clean_corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus_schema"))
    man = generate_corpus(d, n_rows=1500, n_repos=60, seed=42, rows_per_file=500)
    return d, man

ACTUAL = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
    ]
)


def test_statuses():
    expected = [
        ("repo", "string"),
        ("path", "string"),
        ("commit", "string"),
        ("lang", "string"),
        ("content", "string"),  # type_changed
        ("size", "int64"),  # missing
    ]
    v = schema_verdicts(ACTUAL, expected).set_index("column")
    assert v.loc["repo", "passed"] and v.loc["lang", "passed"]
    assert not v.loc["content", "passed"] and "type_changed" in v.loc["content", "detail"]
    assert not v.loc["size", "passed"] and v.loc["size", "metric"] == -1.0
    assert (v["check"] == "schema").all()


def test_actual_side_frame_without_position():
    # an actual-side spec FRAME lacking 'position' must normalize like
    # the expected side does (used to AttributeError on float(ar.position))
    import pandas as pd

    act = pd.DataFrame({"column": ["repo", "lang"], "dtype": ["string", "string"]})
    v = schema_verdicts(act, [("repo", "string"), ("lang", "string")]).set_index("column")
    assert v["passed"].all()
    assert v.loc["repo", "metric"] == 0.0 and v.loc["lang", "metric"] == 1.0


def test_added_columns_and_order():
    base = [("repo", "string"), ("path", "string"), ("commit", "string"), ("lang", "string")]
    v = schema_verdicts(ACTUAL, base).set_index("column")
    assert not v.loc["content", "passed"] and "added" in v.loc["content", "detail"]
    v2 = schema_verdicts(ACTUAL, base, allow_added=True)
    assert v2["passed"].all()
    swapped = [("path", "string"), ("repo", "string")] + base[2:] + [("content", "large_string")]
    v3 = schema_verdicts(ACTUAL, swapped, check_order=True).set_index("column")
    assert set(v3[~v3["passed"]].index) == {"repo", "path"}
    # same expectation without order checking passes
    assert schema_verdicts(ACTUAL, swapped)["passed"].all()


def test_spec_coercion_and_guards():
    assert list(spec_from_any(ACTUAL)["column"]) == [f.name for f in ACTUAL]
    df = schema_spec(ACTUAL).drop(columns=["position"])
    assert list(spec_from_any(df)["position"]) == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError, match="duplicate"):
        schema_verdicts(ACTUAL, [("repo", "string"), ("repo", "string")])
    with pytest.raises(ValueError, match="pairs"):
        spec_from_any(["repo", "path"])
    stats = pd.DataFrame(
        {"part": ["py", "go", "py"], "column": ["repo", "repo", "lang"],
         "dtype": ["string", "string", "string"]}
    )
    sp = spec_from_stats(stats)
    assert list(sp["column"]) == ["repo", "lang"] and (sp["position"] == -1).all()


def test_suite_explicit_expected_schema(ray_session, clean_corpus, tmp_path):
    from anomalydetection_ray.pipelines.validate import SuiteConfig, run_suite

    d, _ = clean_corpus
    ok = run_suite(
        f"{d}/corpus",
        str(tmp_path / "ok"),
        SuiteConfig(
            expected_schema=[
                ("repo", "string"), ("path", "string"), ("commit", "string"),
                ("lang", "string"), ("content", "string"),
            ]
        ),
        resume=False,
    )
    sv = ok.verdicts[ok.verdicts["check"] == "schema"]
    assert len(sv) == 5 and sv["passed"].all() and ok.passed

    bad = run_suite(
        f"{d}/corpus",
        str(tmp_path / "bad"),
        SuiteConfig(
            expected_schema=[
                ("repo", "string"), ("path", "string"), ("commit", "string"),
                ("lang", "int64"), ("stars", "int64"),
            ]
        ),
        resume=False,
    )
    sv = bad.verdicts[bad.verdicts["check"] == "schema"].set_index("column")
    assert not bad.passed
    assert "type_changed" in sv.loc["lang", "detail"]
    assert "missing" in sv.loc["stars", "detail"]
    assert "added" in sv.loc["content", "detail"]  # content not declared


def test_suite_schema_drift_vs_snapshot(ray_session, clean_corpus, tmp_path):
    from anomalydetection_ray.pipelines.validate import SuiteConfig, run_suite, write_baseline

    d, _ = clean_corpus
    snap = str(tmp_path / "baseline.parquet")
    write_baseline(f"{d}/corpus", snap)

    # unchanged corpus: schema_drift rows exist and all pass
    res = run_suite(f"{d}/corpus", str(tmp_path / "same"), baseline_snapshot=snap, resume=False)
    sd = res.verdicts[res.verdicts["check"] == "schema_drift"]
    assert len(sd) == 5 and sd["passed"].all()

    # tamper with the snapshot: pretend the baseline had an extra column
    # and a different content dtype — the live run must flag both
    base = pq.read_table(snap).to_pandas()
    extra = base[base["column"] == "repo"].copy()
    extra["column"] = "stars"
    extra["dtype"] = "int64"
    tampered = pd.concat([base, extra], ignore_index=True)
    tampered.loc[tampered["column"] == "content", "dtype"] = "large_string"
    snap2 = str(tmp_path / "baseline2.parquet")
    pq.write_table(pa.Table.from_pandas(tampered, preserve_index=False), snap2)

    res2 = run_suite(f"{d}/corpus", str(tmp_path / "drifted"), baseline_snapshot=snap2, resume=False)
    sd2 = res2.verdicts[res2.verdicts["check"] == "schema_drift"].set_index("column")
    assert not res2.passed
    assert "missing" in sd2.loc["stars", "detail"]  # vanished since baseline
    assert "type_changed" in sd2.loc["content", "detail"]
    assert sd2.loc["repo", "passed"] and sd2.loc["lang", "passed"]
