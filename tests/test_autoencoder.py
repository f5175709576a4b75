"""Learned-model stage (numpy MLP autoencoder) — round-2 verdict item 6.

The contract under test: weights persist to a snapshot file, every actor
loads the snapshot exactly ONCE (in __init__, never per batch), and the
reconstruction-error score actually separates inliers from outliers.
"""

from __future__ import annotations

import os

import pytest
import numpy as np
import pyarrow as pa


def _mk_vectors(n_in: int = 300, n_out: int = 12, dim: int = 16, seed: int = 3):
    """Inliers on a 2-D subspace + far-off-subspace outliers."""
    rng = np.random.default_rng(seed)
    basis = rng.standard_normal((2, dim))
    inliers = rng.standard_normal((n_in, 2)) @ basis
    outliers = rng.standard_normal((n_out, dim)) * 4.0
    x = np.vstack([inliers, outliers]).astype(np.float32)
    labels = np.array([0] * n_in + [1] * n_out)
    return x, labels


def _to_ds(x: np.ndarray, num_blocks: int = 8):
    import ray.data as rd

    col = pa.FixedSizeListArray.from_arrays(
        pa.array(x.ravel(), type=pa.float32()), x.shape[1]
    )
    t = pa.table({"vec_id": pa.array(range(len(x)), type=pa.int64()), "embedding": col})
    return rd.from_arrow(t).repartition(num_blocks)


def test_autoencoder_scores_separate_outliers(ray_session, tmp_path):
    from anomalydetection_ray.functions.autoencoder import (
        NumpyAutoencoder,
        score_with_autoencoder,
    )
    from anomalydetection_ray.pipelines.queries import as_table

    x, labels = _mk_vectors()
    model = NumpyAutoencoder.train(x[labels == 0], hidden=4, epochs=300, seed=0)
    snap = str(tmp_path / "ae.npz")
    model.save_snapshot(snap)

    out = as_table(score_with_autoencoder(_to_ds(x), snap)).to_pandas().sort_values("vec_id")
    err = out["recon_error"].to_numpy()
    assert np.median(err[labels == 1]) > 5 * np.median(err[labels == 0])


def test_snapshot_roundtrip_is_exact(tmp_path):
    from anomalydetection_ray.functions.autoencoder import NumpyAutoencoder

    x, _ = _mk_vectors(n_in=50, n_out=0)
    model = NumpyAutoencoder.train(x, hidden=4, epochs=20, seed=1)
    snap = str(tmp_path / "ae.npz")
    model.save_snapshot(snap)
    loaded = NumpyAutoencoder.load_snapshot(snap)
    assert loaded.dim == model.dim
    np.testing.assert_array_equal(model.reconstruction_error(x), loaded.reconstruction_error(x))


def _make_marker_hook(marker_dir: str):
    """Closure (cloudpickle serializes it BY VALUE — a module-level test
    function would pickle by reference and fail to import on workers)."""

    def hook() -> None:
        import os
        import uuid

        os.makedirs(marker_dir, exist_ok=True)
        with open(os.path.join(marker_dir, uuid.uuid4().hex), "w") as f:
            f.write(str(os.getpid()))

    return hook


def test_weights_load_once_per_actor(ray_session, tmp_path):
    """The snapshot read happens in __init__ (once per actor), not per
    batch: with 8 input blocks and a 2-actor pool the marker count is the
    actor count, never the block count."""
    from anomalydetection_ray.functions.autoencoder import (
        AutoencoderScoreStage,
        NumpyAutoencoder,
    )
    from anomalydetection_ray.pipelines.queries import as_table

    x, _ = _mk_vectors()
    model = NumpyAutoencoder.train(x[:50], hidden=4, epochs=20, seed=0)
    snap = str(tmp_path / "ae.npz")
    model.save_snapshot(snap)
    marker_dir = str(tmp_path / "loads")

    n_blocks = 8
    ds = _to_ds(x, num_blocks=n_blocks)
    out = as_table(
        ds.map_batches(
            AutoencoderScoreStage,
            fn_constructor_kwargs={
                "snapshot_path": snap,
                "load_hook": _make_marker_hook(marker_dir),
            },
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
            concurrency=2,
        )
    )
    assert out.num_rows == len(x)
    n_loads = len(os.listdir(marker_dir))
    assert 1 <= n_loads <= 2, f"expected <=2 loads (one per actor), saw {n_loads}"
    assert n_loads < n_blocks


def test_train_distributed_matches_driver_train(ray_session):
    """Full-batch gradients are row sums, so the distributed per-epoch
    partial-sum update must reproduce the driver trainer's weights up to
    block summation order (~1e-12)."""
    import ray.data as rd

    from anomalydetection_ray.functions.autoencoder import NumpyAutoencoder

    rng = np.random.default_rng(3)
    x = rng.standard_normal((400, 12))
    tbl = pa.table(
        {"embedding": pa.array([list(map(float, r)) for r in x], type=pa.list_(pa.float64()))}
    )
    ds = rd.from_arrow([tbl.slice(i, 100) for i in range(0, 400, 100)])
    m_d, losses = NumpyAutoencoder.train_distributed(ds, epochs=40, seed=0)
    m_l = NumpyAutoencoder.train(x, hidden=8, epochs=40, seed=0)
    for a, b in ((m_d.w1, m_l.w1), (m_d.b1, m_l.b1), (m_d.w2, m_l.w2), (m_d.b2, m_l.b2)):
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12)
    assert len(losses) == 40 and losses[-1] < losses[0]


def test_train_distributed_empty_raises(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.autoencoder import NumpyAutoencoder

    empty = pa.table({"embedding": pa.array([], type=pa.list_(pa.float64()))})
    with pytest.raises(ValueError, match="empty"):
        NumpyAutoencoder.train_distributed(rd.from_arrow(empty), epochs=1)


def test_snapshot_path_symmetry_without_npz_suffix(tmp_path):
    """save_snapshot must honor the caller's EXACT path — np.savez used
    to silently append '.npz' to suffix-less paths, so loading the same
    path raised FileNotFoundError (round-5 review)."""
    import numpy as np

    from anomalydetection_ray.functions.autoencoder import NumpyAutoencoder

    rng = np.random.default_rng(0)
    x = rng.standard_normal((30, 4))
    model = NumpyAutoencoder.train(x, hidden=3, epochs=2, seed=1)
    p = str(tmp_path / "model.snap")  # deliberately no .npz
    model.save_snapshot(p)
    assert (tmp_path / "model.snap").exists()
    back = NumpyAutoencoder.load_snapshot(p)
    np.testing.assert_array_equal(back.w1, model.w1)


def test_score_stage_rejects_existing_out_col(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from anomalydetection_ray.functions.autoencoder import NumpyAutoencoder, score_with_autoencoder

    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 4))
    model = NumpyAutoencoder.train(x, hidden=3, epochs=2, seed=1)
    snap = str(tmp_path / "m.npz")
    model.save_snapshot(snap)
    vecs = pa.FixedSizeListArray.from_arrays(pa.array(x.ravel(), type=pa.float64()), 4)
    t = pa.table({"embedding": vecs, "recon_error": pa.array([0.0] * 16)})
    with pytest.raises(Exception, match="already exists"):
        score_with_autoencoder(rd.from_arrow(t), snap).to_pandas()


def test_score_stage_absorbs_empty_blocks(ray_session, tmp_path):
    """An empty input block must not bypass the UDF and emit a
    schema-less 0-row block missing recon_error (round-5 review: the
    RefBundle schema-divergence this engine's shim warns about)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.autoencoder import NumpyAutoencoder, score_with_autoencoder

    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 4))
    model = NumpyAutoencoder.train(x, hidden=3, epochs=2, seed=1)
    snap = str(tmp_path / "m.npz")
    model.save_snapshot(snap)
    vecs = pa.FixedSizeListArray.from_arrays(pa.array(x.ravel(), type=pa.float64()), 4)
    full = pa.table({"embedding": vecs})
    empty = full.slice(0, 0)
    ds = rd.from_arrow([full, empty])
    scored = score_with_autoencoder(ds, snap)
    blocks = [
        b for b in scored.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    for b in blocks:
        if b.num_rows == 0 and b.num_columns == 0:
            continue  # fully-absorbed empties vanish; none may carry a WRONG schema
        assert "recon_error" in b.column_names, b.schema
    assert sum(b.num_rows for b in blocks) == 8
