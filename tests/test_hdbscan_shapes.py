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


def test_boruvka_matches_prim():
    """Device Boruvka MST (the n >= 4096 path) must produce the same
    mutual-reachability MST weight multiset — and the same clustering —
    as the host Prim oracle, including under exact duplicate points."""
    from poppunk_tpu.ops import hdbscan as H

    rng = np.random.default_rng(3)
    n = 1200
    centers = np.array([[0.02, 0.05], [0.12, 0.25], [0.3, 0.5]])
    X = np.abs(centers[rng.integers(0, 3, n)] + rng.normal(0, 0.012, (n, 2)))
    X[100:150] = X[0:50]  # exact ties stress the cut-rule tie-breaking
    core, _ = H.core_distances(X, 10)

    prim = H.mutual_reachability_mst(X, core)  # n < 4096 -> host Prim
    bor = H.boruvka_mst_device(X.astype(np.float32), core.astype(np.float32))
    assert bor.shape == prim.shape
    assert np.allclose(np.sort(bor[:, 2]), np.sort(prim[:, 2]), atol=1e-5)

    def labels_from(mst):
        order = np.argsort(mst[:, 2], kind="stable")
        merges = H.single_linkage(mst[order], n)
        ct = H.condense_tree(merges, n, 15)
        return H.labels_from_selection(ct, n, H.select_clusters_eom(ct, n))[0]

    assert adjusted_rand_score(labels_from(prim), labels_from(bor)) > 0.999


def test_predict_uses_min_mr_neighbour():
    """A query whose Euclidean-nearest fitted point is noise (huge core
    distance) must join via a slightly-farther cluster member with
    smaller mutual reachability — reference hdbscan's
    _find_neighbor_and_lambda semantics, not nearest-point-label."""
    from sklearn.datasets import make_blobs

    X, _ = make_blobs(n_samples=300, centers=2, cluster_std=0.3,
                      random_state=7, center_box=(-4, 4))
    # an isolated noise point, then a query right next to it but still
    # near cluster territory
    iso = X.mean(axis=0) + np.array([12.0, 12.0])
    Xf = np.vstack([X, iso])
    ours = HDBSCAN(min_samples=8, min_cluster_size=20).fit(Xf)
    assert ours.labels_[-1] == -1  # the planted point is noise
    q = iso + np.array([0.05, 0.05])
    labels, _ = ours.approximate_predict(q[None, :])
    # nearest neighbour is the noise point; min-mr semantics may still
    # land on noise here (all mr huge) — the CONTRACT is it must equal
    # a per-neighbour min over mr, not label-of-nearest. Check against
    # the explicit oracle:
    d = np.sqrt(((ours._X - q) ** 2).sum(axis=1))
    k = min(ours.min_samples, len(d))
    nbrs = np.argsort(d)[:k]
    core_q = np.sort(d)[k - 1]
    mr = np.maximum(np.maximum(d[nbrs], core_q), ours._core[nbrs])
    want_nn = nbrs[np.argmin(mr)]
    want_label = ours.labels_[want_nn]
    if want_label >= 0:
        lam = 1.0 / max(mr.min(), 1e-300)
        if lam < ours._cluster_birth_lambda.get(int(want_label), 0.0):
            want_label = -1
    assert labels[0] == want_label


def test_predict_chunking_equal():
    from sklearn.datasets import make_blobs

    X, _ = make_blobs(n_samples=400, centers=3, cluster_std=0.5,
                      random_state=3)
    ours = HDBSCAN(min_samples=10, min_cluster_size=20).fit(X)
    rng = np.random.default_rng(5)
    Y = rng.uniform(X.min(), X.max(), (97, 2))
    l1, p1 = ours.approximate_predict(Y)
    l2, p2 = ours.approximate_predict(Y, _chunk=64)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(p1, p2)


def test_duplicate_heavy_stability_finite():
    """>= 2*min_cluster_size exact duplicates force zero-distance splits
    (infinite birth lambda); stabilities must stay finite and selection
    sane (previously -inf)."""
    from poppunk_tpu.ops.hdbscan import (compute_stability, condense_tree,
                                         mutual_reachability_mst,
                                         single_linkage, core_distances)

    rng = np.random.default_rng(11)
    a = np.tile(np.array([[0.0, 0.0]]), (30, 1))
    b = np.tile(np.array([[5.0, 5.0]]), (30, 1))
    X = np.vstack([a, b, rng.normal(2.5, 0.1, (20, 2))])
    core, _ = core_distances(X, 5)
    mst = mutual_reachability_mst(X, core)
    slt = single_linkage(mst, X.shape[0])
    tree = condense_tree(slt, X.shape[0], min_cluster_size=10)
    stab = compute_stability(tree, X.shape[0])
    assert all(np.isfinite(v) for v in stab.values()), stab
    labels = HDBSCAN(min_samples=5, min_cluster_size=10).fit(X).labels_
    assert labels.max() >= 1  # both duplicate blobs become clusters
