"""Multivariate anomaly scorers (functions/anomaly.py): Mahalanobis
matches the direct numpy computation at any block layout; the isolation
forest is deterministic, layout-invariant, and separates planted
outliers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _embedding_table(n=600, d=6, n_out=8, seed=3):
    rng = np.random.default_rng(seed)
    # correlated inliers so full-covariance Mahalanobis differs from
    # per-dimension z-scores
    a = rng.standard_normal((d, d))
    cov = a @ a.T / d + np.eye(d) * 0.1
    x = rng.multivariate_normal(np.arange(d, dtype=float), cov, size=n)
    x[:n_out] += 25.0  # planted far outliers
    ids = np.arange(n, dtype=np.int64)
    return (
        pa.table(
            {
                "vec_id": ids,
                "embedding": pa.array([r.tolist() for r in x], type=pa.list_(pa.float64())),
            }
        ),
        x,
        n_out,
    )


@pytest.mark.parametrize("nblocks", [1, 7])
def test_mahalanobis_matches_numpy(ray_session, nblocks):
    import ray.data as rd

    from anomalydetection_ray.functions.anomaly import mahalanobis_scores

    t, x, n_out = _embedding_table()
    ds = rd.from_arrow(t).repartition(nblocks)
    scored, mean, cov = mahalanobis_scores(ds, "embedding", carry=["vec_id"], ridge=0.0)
    df = scored.to_pandas().sort_values("vec_id").reset_index(drop=True)

    want_mean = x.mean(axis=0)
    want_cov = np.cov(x, rowvar=False, ddof=1)
    assert np.allclose(mean, want_mean)
    assert np.allclose(cov, want_cov, atol=1e-9)
    prec = np.linalg.inv(want_cov)
    dev = x - want_mean
    want = np.einsum("ij,ij->i", dev @ prec, dev)
    assert np.allclose(df["maha_sq"].to_numpy(), want, rtol=1e-9)
    # every planted outlier outranks every inlier
    assert df["maha_sq"].to_numpy()[:n_out].min() > df["maha_sq"].to_numpy()[n_out:].max()


def test_mahalanobis_guards(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.anomaly import mahalanobis_scores

    one = pa.table({"embedding": pa.array([[1.0, 2.0]], type=pa.list_(pa.float64()))})
    with pytest.raises(ValueError):
        mahalanobis_scores(rd.from_arrow(one), "embedding")


def test_isolation_forest_scores_and_invariance(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.anomaly import isolation_forest_scores

    t, _x, n_out = _embedding_table(n=500, n_out=6, seed=9)
    outs = []
    for nblocks in (1, 5):
        ds = rd.from_arrow(t).repartition(nblocks)
        scored, forest = isolation_forest_scores(
            ds, "vec_id", "embedding", n_trees=60, sample_size=128, seed=7
        )
        df = scored.to_pandas().sort_values("vec_id").reset_index(drop=True)
        outs.append(df["iforest_score"].to_numpy())
    # layout-invariant (hash-rate sample + sorted sample => same forest)
    assert np.array_equal(outs[0], outs[1])
    s = outs[0]
    assert ((s > 0) & (s < 1)).all()
    # planted outliers isolate early: their mean score clearly exceeds the
    # inlier mean, and most land in the global top decile
    thr = np.quantile(s, 0.9)
    assert (s[:n_out] >= thr).mean() >= 0.8
    assert s[:n_out].mean() > s[n_out:].mean() + 0.1


def test_iforest_c_normalizer_exact_small_values():
    # c(2) = 1 exactly (H(1) = 1, sklearn's convention); the ln
    # approximation gave 0.154 and inflated 2-point-leaf scores
    from anomalydetection_ray.functions.anomaly import _c

    assert _c(1) == 0.0
    assert _c(2) == 1.0
    # c is monotonically increasing past 2 and matches the published
    # closed form where the approximation is valid
    import numpy as np

    assert _c(3) == 2.0 * (np.log(2.0) + 0.5772156649015329) - 4.0 / 3.0
    assert _c(2) < _c(3) < _c(4) < _c(256)


def test_isolation_forest_fit_shapes():
    from anomalydetection_ray.functions.anomaly import (
        isolation_forest_fit,
        isolation_forest_score_matrix,
    )

    rng = np.random.default_rng(0)
    sample = rng.standard_normal((300, 4))
    f = isolation_forest_fit(sample, n_trees=25, sample_size=64, seed=1)
    assert len(f.roots) == 25
    # constant-column sample still builds (splits on the varying dims)
    sample2 = np.hstack([sample[:, :1] * 0 + 3.0, sample[:, 1:]])
    f2 = isolation_forest_fit(sample2, n_trees=5, sample_size=32, seed=2)
    s = isolation_forest_score_matrix(f2, sample2[:10])
    assert s.shape == (10,) and ((s > 0) & (s < 1)).all()
    # fully constant sample degenerates to single-leaf trees, scores equal
    const = np.ones((50, 3))
    f3 = isolation_forest_fit(const, n_trees=4, sample_size=16, seed=3)
    s3 = isolation_forest_score_matrix(f3, const[:5])
    assert np.allclose(s3, s3[0])
    with pytest.raises(ValueError):
        isolation_forest_fit(np.empty((0, 3)))
