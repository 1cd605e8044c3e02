"""SCE embedding: clusters separated in distance space must stay separated
in the 2-D embedding (silhouette-style check), and the .dot output parses."""

import numpy as np


def two_cluster_distmat(n1=20, n2=20, seed=0):
    rng = np.random.default_rng(seed)
    n = n1 + n2
    labels = np.array([0] * n1 + [1] * n2)
    base = np.where(labels[:, None] == labels[None, :], 0.05, 0.6)
    noise = rng.random((n, n)) * 0.02
    D = base + (noise + noise.T) / 2
    np.fill_diagonal(D, 0)
    return D.astype(np.float32), labels


def test_sce_separates_clusters():
    from poppunk_tpu.embedding import sce_embedding

    D, labels = two_cluster_distmat()
    Y = sce_embedding(D, perplexity=10, knn=10, max_iter=200_000)
    c0 = Y[labels == 0].mean(0)
    c1 = Y[labels == 1].mean(0)
    between = np.linalg.norm(c0 - c1)
    within = max(
        np.linalg.norm(Y[labels == 0] - c0, axis=1).mean(),
        np.linalg.norm(Y[labels == 1] - c1, axis=1).mean(),
    )
    assert between > 1.5 * within


def test_generate_embedding_dot(tmp_path):
    import os

    from poppunk_tpu.embedding import generate_embedding

    D, _ = two_cluster_distmat(8, 8)
    out = str(tmp_path / "embed")
    os.makedirs(out)
    labels = [f"s{i}" for i in range(16)]
    fn = generate_embedding(labels, D, 5, out, overwrite=True, kNN=5,
                            maxIter=10_000)
    assert os.path.isfile(fn)
    text = open(fn).read()
    assert text.startswith("graph G {")
    for lab in labels:
        assert f'"{lab}"' in text
    # idempotent no-overwrite
    fn2 = generate_embedding(labels, D, 5, out, overwrite=False)
    assert fn2 == fn


def test_sampled_repulsion_branch(monkeypatch):
    """The n > DENSE_LIMIT path (every scale-tier --mandrake run) must
    separate clusters too — forced here by lowering the limit."""
    import poppunk_tpu.embedding as emb

    monkeypatch.setattr(emb, "DENSE_LIMIT", 16)
    D, labels = two_cluster_distmat()
    Y = emb.sce_embedding(D, perplexity=10, knn=10, max_iter=200_000)
    c0 = Y[labels == 0].mean(0)
    c1 = Y[labels == 1].mean(0)
    between = np.linalg.norm(c0 - c1)
    within = max(
        np.linalg.norm(Y[labels == 0] - c0, axis=1).mean(),
        np.linalg.norm(Y[labels == 1] - c1, axis=1).mean(),
    )
    assert between > 1.5 * within
