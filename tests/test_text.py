"""Text-function unit tests + a planted-PII curation-gate equivalence test.

The synthetic corpus contains zero email/URL/IP hits by construction, so the
curation pipeline's PII gate is vacuous at driver-test scale; here we plant
PII and degenerate-repetition docs into a scratch corpus and assert both the
batch kernels and the full curation pipeline (Ray vs its own DuckDB oracle)
react to them.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anomalydetection_ray.functions.text import (
    pii_pattern_counts_batch,
    repetition_batch,
)


def test_pii_pattern_counts_planted():
    batch = pa.Table.from_pydict(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "contact me at alice@example.com or bob.smith+x@sub.domain.org",
                "see https://example.com/path?q=1 and http://foo.bar",
                "server at 10.0.0.1 and 192.168.1.255 responded",
                "perfectly clean text with no personal identifiers at all",
            ],
        }
    )
    out = pii_pattern_counts_batch(batch)
    assert out["n_emails"].to_pylist() == [2, 0, 0, 0]
    assert out["n_urls"].to_pylist() == [0, 2, 0, 0]
    assert out["n_ips"].to_pylist() == [0, 0, 2, 0]


def test_repetition_batch_degenerate():
    batch = pa.Table.from_pydict(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "spam " * 40,  # 40 tokens, 1 distinct
                " ".join(f"w{i}" for i in range(40)),  # all distinct
                None,
            ],
        }
    )
    out = repetition_batch(batch)
    ratios = out["distinct_ratio"].to_pylist()
    assert ratios[0] == pytest.approx(1 / 40)
    assert ratios[1] == 1.0
    assert out["n_tokens_r"].to_pylist()[2] == 0
    assert out["top_token_share"].to_pylist()[0] == 1.0


def test_curation_gate_drops_pii_and_repetition(ray_session, tmp_path):
    """Plant PII-bearing and repetitive docs; the curation pipeline must
    drop them, and the Ray result must still match its composed DuckDB
    oracle on the planted corpus (the gate has real effect here, unlike
    on the synthetic testdata where PII is vacuously absent)."""
    from anomalydetection_ray.pipelines.queries import registry

    fn, sql = registry()["curation_pipeline_docs"]

    clean = " ".join(f"tok{i}" for i in range(30))
    rows = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                clean,  # kept
                clean + " email hit alice@example.com now",  # PII -> dropped
                "dup " * 40,  # distinct_ratio 1/40 -> dropped
                "short text",  # < 24 tokens -> dropped
                clean + " extra",  # kept (not a near-dup at J>=0.8? 30/31 ~ 0.97 -> near-dup of doc 0)
            ],
            "lang": ["en"] * 5,
        }
    )
    pq.write_table(pa.Table.from_pandas(rows), str(tmp_path / "documents.parquet"))

    res = fn(str(tmp_path))
    got = res.to_pandas().sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.sql(sql).df().sort_values("doc_id").reset_index(drop=True)

    # PII doc, repetitive doc, short doc all gone; doc 4 collapses into 0
    assert got["doc_id"].tolist() == [0]
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].astype(str), want[sorted(want.columns)].astype(str)
    )
