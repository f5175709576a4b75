"""Distributed logistic-regression quality classifier (round 5): the
fastText-style curated-vs-junk gate. Contracts under test:

- the distributed trainer's weights match the gathered single-process
  trainer to float-summation precision, at ANY block layout;
- the learned probability actually separates planted clean prose from
  planted junk (the model is real, not a shape);
- snapshots round-trip through suffix-less paths; actors load once;
- the scoring stage refuses output-column collisions and survives
  empty blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


_CLEAN_WORDS = ("the quick brown fox jumps over lazy dogs while reading "
                "clear helpful prose about science history and art").split()
_JUNK_WORDS = ("click buy cheap viagra casino winner prize xxx free "
               "subscribe deal offer zzz qqq spam").split()


def _mk_docs(n: int = 240, seed: int = 11):
    rng = np.random.default_rng(seed)
    texts, labels = [], []
    for i in range(n):
        good = i % 2 == 0
        words = _CLEAN_WORDS if good else _JUNK_WORDS
        texts.append(" ".join(rng.choice(words, size=20)))
        labels.append(1 if good else 0)
    return texts, labels


def _to_ds(texts, labels, num_blocks: int = 6):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "label": pa.array(labels, type=pa.int64()),
    })
    return rd.from_arrow(t).repartition(num_blocks)


def test_distributed_matches_gathered_trainer(ray_session):
    from anomalydetection_ray.functions.quality_classifier import NumpyLogReg

    texts, labels = _mk_docs(n=160)
    kw = dict(sizes=(1, 2), n_buckets=512, epochs=40, lr=2.0, l2=1e-4, seed=17)
    ref = NumpyLogReg.train(texts, np.array(labels, dtype=np.float64), **kw)
    got, losses = NumpyLogReg.train_distributed(_to_ds(texts, labels, 5), **kw)
    np.testing.assert_allclose(got.w, ref.w, atol=1e-9)
    assert abs(got.b - ref.b) < 1e-9
    # loss curve decreases (loss is measured BEFORE each update)
    assert losses[0] > losses[-1]
    assert len(losses) == 40


def test_layout_invariance(ray_session):
    from anomalydetection_ray.functions.quality_classifier import NumpyLogReg

    texts, labels = _mk_docs(n=120)
    kw = dict(sizes=(1,), n_buckets=256, epochs=25, lr=2.0, l2=0.0, seed=17)
    a, _ = NumpyLogReg.train_distributed(_to_ds(texts, labels, 2), **kw)
    b, _ = NumpyLogReg.train_distributed(_to_ds(texts, labels, 9), **kw)
    np.testing.assert_allclose(a.w, b.w, atol=1e-9)
    assert abs(a.b - b.b) < 1e-9


def test_planted_separation_and_stage(ray_session, tmp_path):
    from anomalydetection_ray.functions.quality_classifier import (
        NumpyLogReg,
        score_quality,
    )
    from anomalydetection_ray.pipelines.queries import as_table

    texts, labels = _mk_docs(n=240)
    # lr=30/l2=0: the planted vocabularies are disjoint, so the data is
    # separable and the GD margin grows without an L2 cap — 80 epochs
    # reach full >0.9 / <0.1 separation (lr=2.0 + l2 leaves probs ~0.6)
    model, _ = NumpyLogReg.train_distributed(
        _to_ds(texts, labels), n_buckets=1024, epochs=80, lr=30.0, l2=0.0
    )
    snap = str(tmp_path / "quality.snap")  # suffix-less: np.savez trap
    model.save_snapshot(snap)

    out = (
        as_table(score_quality(_to_ds(texts, labels), snap))
        .to_pandas()
        .sort_values("doc_id")
    )
    p = out["quality_prob"].to_numpy()
    y = np.array(labels)
    # full separation on the planted vocabularies
    assert p[y == 1].min() > 0.9
    assert p[y == 0].max() < 0.1
    # exact AUC 1.0: every clean doc outscores every junk doc
    assert p[y == 1].min() > p[y == 0].max()


def test_snapshot_roundtrip_and_empty_texts(tmp_path):
    from anomalydetection_ray.functions.quality_classifier import NumpyLogReg

    texts, labels = _mk_docs(n=40)
    m = NumpyLogReg.train(texts, np.array(labels, dtype=np.float64),
                          n_buckets=128, epochs=10)
    snap = str(tmp_path / "m.snap")
    m.save_snapshot(snap)
    m2 = NumpyLogReg.load_snapshot(snap)
    np.testing.assert_array_equal(m.w, m2.w)
    assert (m.b, m.sizes, m.n_buckets, m.token_hash, m.seed) == (
        m2.b, m2.sizes, m2.n_buckets, m2.token_hash, m2.seed
    )
    # empty / whitespace-only docs score at the bias (no grams), not crash
    p = m2.predict_proba(pa.array(["", "   ", "the quick fox"]))
    assert p.shape == (3,)
    assert np.isfinite(p).all()


def test_stage_rejects_collision_and_null_labels(ray_session, tmp_path):
    import ray.data as rd

    from anomalydetection_ray.functions.quality_classifier import (
        LogRegScoreStage,
        NumpyLogReg,
    )

    texts, labels = _mk_docs(n=20)
    m = NumpyLogReg.train(texts, np.array(labels, dtype=np.float64),
                          n_buckets=64, epochs=5)
    snap = str(tmp_path / "m.npz")
    m.save_snapshot(snap)
    stage = LogRegScoreStage(snap)
    tb = pa.table({"text": ["a"], "quality_prob": [0.5]})
    with pytest.raises(ValueError, match="already exists"):
        stage(tb)
    # empty block keeps schema + appends the typed output column
    out = stage(pa.table({"text": pa.array([], type=pa.string())}))
    assert out.column_names == ["text", "quality_prob"]
    assert out.num_rows == 0

    bad = rd.from_arrow(pa.table({
        "text": ["x", "y"], "label": pa.array([1, None], type=pa.int64())
    }))
    with pytest.raises(Exception, match="contains nulls"):
        NumpyLogReg.train_distributed(bad, n_buckets=32, epochs=1)


def test_stage_scores_null_text_as_null(ray_session, tmp_path):
    """Round-5 review: a NULL doc has no content to judge — the stage
    emits a null probability (absent input → absent output), while empty
    STRINGS still score at the bias by design."""
    from anomalydetection_ray.functions.quality_classifier import (
        LogRegScoreStage,
        NumpyLogReg,
    )

    texts, labels = _mk_docs(n=30)
    m = NumpyLogReg.train(texts, np.array(labels, dtype=np.float64),
                          n_buckets=64, epochs=5)
    snap = str(tmp_path / "m.npz")
    m.save_snapshot(snap)
    stage = LogRegScoreStage(snap)
    out = stage(pa.table({"text": pa.array([texts[0], None, ""], type=pa.string())}))
    p = out["quality_prob"]
    assert p[0].is_valid and p[2].is_valid
    assert not p[1].is_valid


def test_dense_train_empty_set_raises():
    """Round-5 review: the dense path must fail as loudly as the
    distributed one — an empty labeled sample used to return a vacuous
    all-0.5 scorer."""
    import numpy as np
    import pytest

    from anomalydetection_ray.functions.quality_classifier import NumpyLogReg

    with pytest.raises(ValueError, match="empty training set"):
        NumpyLogReg.train([], np.array([]))
