"""End-to-end curation pipeline (pipelines/curate.py) + CLI subcommand."""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _plant_corpus(path):
    clean = " ".join(f"tok{i}" for i in range(30))
    other = " ".join(f"word{i}" for i in range(40))
    bench_text = " ".join(f"bench{i}" for i in range(30))
    leak = " ".join(f"bench{i}" for i in range(5, 20)) + " " + " ".join(f"x{i}" for i in range(12))
    # mojibake: the cp1252-damaged form of a clean accented sentence
    # (tokens distinct so the repetition gate keeps it)
    true_acc = " ".join(f"caf{chr(0xE9)}{i}" for i in range(30))
    damaged = true_acc.encode("utf-8").decode("cp1252")
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
            "text": [
                clean,                                   # kept
                clean,                                   # exact dup -> dropped
                other,                                   # kept (second lang)
                clean + " me@example.com",               # PII -> dropped
                "dup " * 40,                             # repetition -> dropped
                "too short",                             # < min_tokens -> dropped
                leak,                                    # bench leak -> dropped
                damaged,                                 # kept, normalized
            ],
            "lang": ["en", "en", "de", "en", "en", "en", "en", "fr"],
        }
    )
    pq.write_table(pa.Table.from_pandas(rows), os.path.join(path, "documents.parquet"))
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame({"text": [bench_text]})),
        os.path.join(path, "bench.parquet"),
    )
    return true_acc


def test_curate_corpus_end_to_end(ray_session, tmp_path):
    from anomalydetection_ray.pipelines.curate import curate_corpus

    true_acc = _plant_corpus(str(tmp_path))
    out = str(tmp_path / "curated")
    summary = curate_corpus(
        os.path.join(str(tmp_path), "documents.parquet"), out,
        bench_path=os.path.join(str(tmp_path), "bench.parquet"),
    )
    assert summary["rows_in"] == 8
    assert summary["rows_out"] == 3
    assert sorted(summary["partitions"]) == ["de", "en", "fr"]
    import ray.data as rd

    back = rd.read_parquet(out).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == [1, 3, 8]
    # mojibake repaired + whitespace collapsed in the written output
    fr = back.loc[back["doc_id"] == 8, "text"].iloc[0]
    assert fr == true_acc.strip()
    # resume run: everything skipped, files untouched
    before = {d: sorted(os.listdir(os.path.join(out, d))) for d in os.listdir(out)}
    summary2 = curate_corpus(
        os.path.join(str(tmp_path), "documents.parquet"), out,
        bench_path=os.path.join(str(tmp_path), "bench.parquet"),
    )
    assert all(p["skipped"] for p in summary2["partitions"].values())
    after = {d: sorted(os.listdir(os.path.join(out, d))) for d in os.listdir(out)}
    assert before == after
    # round-5 review: a fully-resumed run must still report the true
    # surviving corpus (marker-recorded counts), not rows_out=0
    assert summary2["rows_out"] == summary["rows_out"] == 3
    assert all(p["rows"] == 1 for p in summary2["partitions"].values())


def test_curate_bench_normalized_like_corpus(ray_session, tmp_path):
    """Round-5 review: the bench set must pass through the SAME
    normalization as the corpus — a mojibake benchmark doc whose damaged
    form appears verbatim in the corpus must still be caught after the
    corpus copy is repaired."""
    from anomalydetection_ray.pipelines.curate import curate_corpus

    true_acc = " ".join(f"caf{chr(0xE9)}{i}" for i in range(30))
    damaged = true_acc.encode("utf-8").decode("cp1252")
    clean = " ".join(f"tok{i}" for i in range(30))
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [clean, damaged],  # damaged normalizes to true_acc
            "lang": ["en", "fr"],
        }
    )
    pq.write_table(pa.Table.from_pandas(rows), os.path.join(str(tmp_path), "d.parquet"))
    # the bench carries the SAME damaged text: raw-vs-normalized hashing
    # used to miss this overlap entirely
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame({"text": [damaged]})),
        os.path.join(str(tmp_path), "b.parquet"),
    )
    out = str(tmp_path / "curated_bn")
    summary = curate_corpus(
        os.path.join(str(tmp_path), "d.parquet"), out,
        bench_path=os.path.join(str(tmp_path), "b.parquet"),
    )
    assert summary["rows_out"] == 1  # the leaked doc is gone
    import ray.data as rd

    back = rd.read_parquet(out).to_pandas()
    assert back["doc_id"].tolist() == [1]


def test_curate_unpartitioned_and_bloom(ray_session, tmp_path):
    from anomalydetection_ray.pipelines.curate import curate_corpus

    _plant_corpus(str(tmp_path))
    out = str(tmp_path / "flat")
    summary = curate_corpus(
        os.path.join(str(tmp_path), "documents.parquet"), out,
        partition_col=None,
        bench_path=os.path.join(str(tmp_path), "bench.parquet"),
        decon_mode="bloom",
    )
    assert summary["rows_out"] == 3
    import ray.data as rd

    assert rd.read_parquet(out).count() == 3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dedup"):
        curate_corpus(os.path.join(str(tmp_path), "documents.parquet"), out, dedup="fuzzy")


def test_curate_never_materializes_whole_corpus():
    """Scale contract (round-4 verdict #1): the curation flagship must
    stream into its sinks — a full-dataset .materialize() would force
    the whole curated corpus through object-store memory/spill just to
    count rows. Row counts come from parquet footer metadata instead."""
    import inspect

    from anomalydetection_ray.pipelines import curate

    assert ".materialize()" not in inspect.getsource(curate)


def test_curate_cli(ray_session, tmp_path, capsys):
    from anomalydetection_ray.__main__ import main

    _plant_corpus(str(tmp_path))
    out = str(tmp_path / "cli_out")
    rc = main([
        "curate", os.path.join(str(tmp_path), "documents.parquet"),
        "--out", out,
        "--bench", os.path.join(str(tmp_path), "bench.parquet"),
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows_out"] == 3 and summary["rows_in"] == 8
    assert os.path.exists(os.path.join(out, "lang=en", "_DONE"))


def test_curate_strip_substrings_stage(ray_session, tmp_path):
    """ExactSubstr stage: a shared banner spanning two otherwise-distinct
    kept docs is cut from BOTH; short remainders drop."""
    from anomalydetection_ray.pipelines.curate import curate_corpus

    banner = "=== COMMON GENERATED BANNER DO NOT EDIT === "
    a = banner + " ".join(f"alpha{i}" for i in range(40))
    b = banner + " ".join(f"beta{i}" for i in range(40))
    c = " ".join(f"gamma{i}" for i in range(40))
    rows = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [a, b, c],
        "lang": ["en", "en", "en"],
    })
    pq.write_table(pa.Table.from_pandas(rows), os.path.join(str(tmp_path), "d.parquet"))
    out = str(tmp_path / "stripped")
    summary = curate_corpus(
        os.path.join(str(tmp_path), "d.parquet"), out,
        dedup="exact", strip_substr_k=16, strip_min_remaining=50,
    )
    assert summary["rows_out"] == 3
    import ray.data as rd

    back = rd.read_parquet(out).to_pandas().sort_values("doc_id")
    assert list(back.columns.sort_values()) == ["doc_id", "lang", "text"]
    for t in back["text"]:
        assert "COMMON GENERATED BANNER" not in t
    assert back.loc[back["doc_id"] == 3, "text"].iloc[0].startswith("gamma0")


def test_curate_refresh_with_snapshot(ray_session, tmp_path):
    """Refresh run: docs the first run already kept are not re-admitted;
    genuinely new docs flow through."""
    from anomalydetection_ray.pipelines.curate import curate_corpus

    _plant_corpus(str(tmp_path))
    first_out = str(tmp_path / "run1")
    curate_corpus(
        os.path.join(str(tmp_path), "documents.parquet"), first_out,
        bench_path=os.path.join(str(tmp_path), "bench.parquet"),
    )
    # delta input: one doc run1 kept (same content, new id) + one new doc
    delta = pd.DataFrame({
        "doc_id": [100, 101],
        "text": [" ".join(f"tok{i}" for i in range(30)),     # run1 kept this content
                 " ".join(f"novel{i}" for i in range(30))],  # new
        "lang": ["en", "en"],
    })
    pq.write_table(pa.Table.from_pandas(delta), os.path.join(str(tmp_path), "delta.parquet"))
    out2 = str(tmp_path / "run2")
    summary = curate_corpus(
        os.path.join(str(tmp_path), "delta.parquet"), out2,
        snapshot_path=first_out,
    )
    assert summary["rows_out"] == 1
    import ray.data as rd

    back = rd.read_parquet(out2).to_pandas()
    assert back["doc_id"].tolist() == [101]


def test_curate_quality_gate(ray_session, tmp_path):
    """Learned quality gate: a trained NumpyLogReg snapshot drops planted
    junk the heuristic gate admits, keeps clean prose, and the scratch
    probability column never reaches the sink."""
    import numpy as np

    from anomalydetection_ray.functions.quality_classifier import NumpyLogReg
    from anomalydetection_ray.pipelines.curate import curate_corpus

    rng = np.random.default_rng(7)
    clean_vocab = [f"prose{i}" for i in range(40)]
    junk_vocab = [f"spam{i}" for i in range(40)]
    train_texts, train_y = [], []
    for i in range(120):
        words = clean_vocab if i % 2 == 0 else junk_vocab
        train_texts.append(" ".join(rng.choice(words, size=30)))
        train_y.append(1 if i % 2 == 0 else 0)
    # unigram features: held-out docs recombine the vocab into UNSEEN
    # bigrams (noise buckets under an overfit lr=30/l2=0 model), while
    # every unigram is shared with training — the generalizing signal
    model = NumpyLogReg.train(
        train_texts, np.array(train_y, dtype=np.float64),
        sizes=(1,), n_buckets=1024, epochs=80, lr=30.0, l2=0.0,
    )
    snap = str(tmp_path / "quality.npz")
    model.save_snapshot(snap)

    # both corpus docs pass the HEURISTIC gate (long, distinct, no PII);
    # only the learned gate separates them
    corpus = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [" ".join(rng.choice(clean_vocab, size=30)),
                 " ".join(rng.choice(junk_vocab, size=30))],
        "lang": ["en", "en"],
    })
    pq.write_table(pa.Table.from_pandas(corpus), os.path.join(str(tmp_path), "docs.parquet"))

    out = str(tmp_path / "qcurated")
    summary = curate_corpus(
        os.path.join(str(tmp_path), "docs.parquet"), out,
        quality_snapshot=snap, min_quality=0.5, dedup="none", normalize=False,
    )
    assert summary["rows_in"] == 2
    assert summary["rows_out"] == 1
    import ray.data as rd

    back = rd.read_parquet(out).to_pandas()
    assert back["doc_id"].tolist() == [1]
    assert "__qprob" not in back.columns
