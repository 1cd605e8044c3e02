"""HDBSCAN vs sklearn across cluster geometries — the from-scratch
implementation (ops/hdbscan.py) must track sklearn's HDBSCAN labels and
its approximate_predict must be self-consistent."""

import numpy as np
import pytest

sk_hdbscan = pytest.importorskip("sklearn.cluster")
from sklearn.metrics import adjusted_rand_score  # noqa: E402

from poppunk_tpu.ops.hdbscan import HDBSCAN  # noqa: E402


def _compare(X, min_samples, min_cluster_size, min_ari=0.9):
    from sklearn.cluster import HDBSCAN as SkHDBSCAN

    ours = HDBSCAN(min_samples=min_samples,
                   min_cluster_size=min_cluster_size).fit(X)
    sk = SkHDBSCAN(min_samples=min_samples,
                   min_cluster_size=min_cluster_size).fit(X)
    ari = adjusted_rand_score(ours.labels_, sk.labels_)
    assert ari > min_ari, ari
    return ours


def test_three_blobs():
    from sklearn.datasets import make_blobs

    X, _ = make_blobs(n_samples=600, centers=3, cluster_std=0.4,
                      random_state=4)
    _compare(X, 10, 20)


def test_moons_with_noise():
    from sklearn.datasets import make_moons

    X, _ = make_moons(n_samples=500, noise=0.06, random_state=1)
    rng = np.random.default_rng(2)
    noise = rng.uniform(X.min(), X.max(), (50, 2))
    _compare(np.vstack([X, noise]), 8, 25, min_ari=0.8)


def test_anisotropic():
    from sklearn.datasets import make_blobs

    X, _ = make_blobs(n_samples=500, centers=2, random_state=7)
    X = X @ np.array([[0.6, -0.6], [-0.2, 0.8]])
    _compare(X, 10, 20)


def test_approximate_predict_consistency():
    from sklearn.datasets import make_blobs

    X, _ = make_blobs(n_samples=400, centers=3, cluster_std=0.3,
                      random_state=11)
    model = HDBSCAN(min_samples=10, min_cluster_size=20).fit(X)
    # points the model was fitted on predict their own labels
    pred, _ = model.approximate_predict(X)
    core = model.labels_ != -1
    agree = (pred[core] == model.labels_[core]).mean()
    assert agree > 0.95, agree
    # far-away points are noise
    far = X.max(axis=0) + 50.0
    pred_far, _ = model.approximate_predict(far[None, :])
    assert pred_far[0] == -1
