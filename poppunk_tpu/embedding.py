"""Stochastic cluster embedding (SCE / mandrake) in JAX.

The reference shells out to the external C++/CUDA ``SCE.wtsne`` package
(PopPUNK/mandrake.py:67-110): an asynchronous per-edge SGD over a kNN graph
of accessory distances. That access pattern (billions of single-pair
updates) is hostile to TPUs, so this is re-designed as *batched* SGD under
one jit: every step applies the attractive gradient over all kNN edges at
once (segment-sum) and a resampled set of repulsive pairs, with the same
Student-t kernel and linearly decaying learning rate. maxIter counts
single-pair updates for CLI compatibility and is converted to batched
epochs.

Output: a graphviz .dot of node positions named
``<p>_perplexity<P>_accessory_mandrake.dot`` (mandrake.py:62), coordinates
scaled 5x as the reference writes them.
"""

import os
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _perplexity_probabilities(dists, perplexity):
    """Per-row bandwidth calibration: binary-search beta so the conditional
    distribution over the kNN has the requested perplexity (standard t-SNE
    input calibration). dists: [n, k]."""
    n, k = dists.shape
    target = np.log(max(min(perplexity, k - 1), 1))
    d2 = dists ** 2

    def row_probs(row):
        beta_lo, beta_hi, beta = 0.0, np.inf, 1.0
        for _ in range(50):
            p = np.exp(-row * beta)
            s = p.sum()
            if s <= 0:
                p = np.ones_like(row) / row.shape[0]
                break
            p /= s
            h = -(p * np.log(p + 1e-12)).sum()
            if abs(h - target) < 1e-4:
                break
            if h > target:
                beta_lo = beta
                beta = beta * 2 if beta_hi == np.inf else (beta + beta_hi) / 2
            else:
                beta_hi = beta
                beta = (beta + beta_lo) / 2
        return p

    P = np.stack([row_probs(d2[i]) for i in range(n)])
    return P


# Above this many points the dense [n, n] gradient (exact t-SNE repulsion,
# which XLA evaluates as fused elementwise + reductions — fast on TPU) gives
# way to sampled repulsion (LargeVis/SCE estimator).
DENSE_LIMIT = 8192


@partial(jax.jit, static_argnames=("n", "epochs"))
def _sce_optimize_dense(key, Pmat, n, epochs, eta0=200.0):
    """Exact t-SNE gradient descent with momentum, adaptive gains and early
    exaggeration (sklearn-style schedule), fully on device under one scan.

    Pmat: dense symmetric affinity matrix [n, n], rows need not be
    normalised (normalised globally here).
    """
    key, init_key = jax.random.split(key)
    Y0 = jax.random.normal(init_key, (n, 2), jnp.float32) * 1e-4
    P = Pmat / jnp.maximum(Pmat.sum(), 1e-12)
    exagg_end = epochs // 4
    eye = jnp.eye(n, dtype=bool)

    def step(carry, it):
        Y, V, gains = carry
        exagg = jnp.where(it < exagg_end, 12.0, 1.0)
        momentum = jnp.where(it < exagg_end, 0.5, 0.8)

        d = Y[:, None, :] - Y[None, :, :]  # [n, n, 2]
        q = 1.0 / (1.0 + (d ** 2).sum(-1))  # [n, n]
        q = jnp.where(eye, 0.0, q)
        Z = jnp.maximum(q.sum(), 1e-12)
        PQ = (exagg * P - q / Z) * q  # [n, n]
        g = 4.0 * (PQ[:, :, None] * d).sum(axis=1)  # dKL/dY

        # adaptive gains (sklearn _gradient_descent)
        same_sign = jnp.sign(g) == jnp.sign(V)
        gains = jnp.clip(
            jnp.where(same_sign, gains * 0.8, gains + 0.2), 0.01, None)
        V = momentum * V - eta0 * gains * g
        Y = Y + V
        Y = Y - Y.mean(0)
        return (Y, V, gains), None

    (Y, _, _), _ = jax.lax.scan(
        step, (Y0, jnp.zeros_like(Y0), jnp.ones_like(Y0)), jnp.arange(epochs)
    )
    return Y


@partial(jax.jit, static_argnames=("n", "epochs", "n_repu"))
def _sce_optimize_sampled(key, I, J, P, n, epochs, n_repu=8, eta0=None):
    """Sampled-repulsion variant for large n: attraction over the kNN edge
    list, repulsion from freshly sampled pairs with a self-normalising Z
    estimate (the LargeVis/SCE estimator), momentum SGD + exaggeration."""
    key, init_key = jax.random.split(key)
    Y0 = jax.random.normal(init_key, (n, 2), jnp.float32) * 1e-4
    if eta0 is None:
        eta0 = 200.0

    P = P / P.sum()
    exagg_end = epochs // 4
    n_samples = n * n_repu

    def step(carry, it):
        Y, V, key = carry
        exagg = jnp.where(it < exagg_end, 12.0, 1.0)
        momentum = jnp.where(it < exagg_end, 0.5, 0.8)

        # attraction along kNN edges: 4 * exagg * P_ij q_ij (y_i - y_j)
        d = Y[I] - Y[J]  # [E, 2]
        q = 1.0 / (1.0 + (d ** 2).sum(-1))  # [E]
        grad_att = (exagg * P * q)[:, None] * d  # [E, 2]
        g = jnp.zeros_like(Y)
        g = g.at[I].add(grad_att)
        g = g.at[J].add(-grad_att)

        # repulsion from sampled pairs: -(q^2/Z)(y_i - y_j), Z estimated
        # from the same sample (self-normalising)
        key, k1 = jax.random.split(key)
        rep = jax.random.randint(k1, (n_samples, 2), 0, n)
        dr = Y[rep[:, 0]] - Y[rep[:, 1]]
        qr = 1.0 / (1.0 + (dr ** 2).sum(-1))
        n_pairs = n * (n - 1.0)
        Zest = jnp.maximum(qr.mean() * n_pairs, 1e-12)
        grad_rep = (qr ** 2)[:, None] * dr * (n_pairs / n_samples / Zest)
        g = g.at[rep[:, 0]].add(-grad_rep)
        g = g.at[rep[:, 1]].add(grad_rep)

        V = momentum * V - eta0 * 4.0 * g
        Y = Y + V
        Y = Y - Y.mean(0)
        return (Y, V, key), None

    (Y, _, _), _ = jax.lax.scan(
        step, (Y0, jnp.zeros_like(Y0), key), jnp.arange(epochs)
    )
    return Y


def sce_embedding_condensed(acc_vec, n, perplexity, knn=50,
                            max_iter=10_000_000, seed=42):
    """2-D SCE embedding straight from a condensed accessory-distance
    vector (no n x n square materialised)."""
    from .ops.sparse_knn import knn_from_condensed

    knn = min(knn, n - 1)
    I, J, dists = knn_from_condensed(acc_vec, n, knn)
    return _sce_from_knn(I, J, dists, n, knn, perplexity, max_iter, seed)


def sce_embedding(acc_mat, perplexity, knn=50, max_iter=10_000_000, seed=42):
    """2-D SCE embedding of a square accessory-distance matrix."""
    from .ops.sparse_knn import get_knn_distances

    n = acc_mat.shape[0]
    knn = min(knn, n - 1)
    I, J, dists = get_knn_distances(acc_mat, knn)
    return _sce_from_knn(I, J, dists, n, knn, perplexity, max_iter, seed)


def _sce_from_knn(I, J, dists, n, knn, perplexity, max_iter, seed):
    P = _perplexity_probabilities(
        np.asarray(dists).reshape(n, knn), perplexity
    ).reshape(-1)

    # reference maxIter counts single-edge updates; we do all E edges/epoch
    epochs = int(min(max(max_iter // max(len(I), 1), 250), 1000))
    if n <= DENSE_LIMIT:
        Pmat = np.zeros((n, n), dtype=np.float32)
        Pmat[np.asarray(I), np.asarray(J)] += P
        Pmat[np.asarray(J), np.asarray(I)] += P  # symmetrise
        Y = _sce_optimize_dense(
            jax.random.PRNGKey(seed), jnp.asarray(Pmat), n=n, epochs=epochs)
    else:
        Y = _sce_optimize_sampled(
            jax.random.PRNGKey(seed),
            jnp.asarray(I, jnp.int32),
            jnp.asarray(J, jnp.int32),
            jnp.asarray(P, jnp.float32),
            n=n, epochs=epochs,
        )
    return np.asarray(Y)


def generate_embedding(seq_labels, acc_mat, perplexity, out_prefix, overwrite,
                       kNN=50, maxIter=10_000_000, n_threads=1, seed=42,
                       condensed=False):
    """Write the embedding .dot (generate_embedding, mandrake.py:22-120).

    ``acc_mat`` is a square accessory matrix, or with condensed=True the
    condensed i<j vector (no square ever materialised)."""
    mandrake_filename = os.path.join(
        out_prefix,
        os.path.basename(out_prefix)
        + "_perplexity" + str(perplexity) + "_accessory_mandrake.dot",
    )
    if os.path.isfile(mandrake_filename) and not overwrite:
        sys.stderr.write(
            "Mandrake analysis already exists; add --overwrite to replace\n"
        )
        return mandrake_filename

    sys.stderr.write("Running SCE embedding\n")
    if condensed:
        embedding = sce_embedding_condensed(
            np.asarray(acc_mat), len(seq_labels), perplexity, knn=kNN,
            max_iter=maxIter, seed=seed)
    else:
        embedding = sce_embedding(np.asarray(acc_mat), perplexity, knn=kNN,
                                  max_iter=maxIter, seed=seed)
    write_mandrake_dot(seq_labels, embedding, mandrake_filename)
    return mandrake_filename


def embedding_from_knn(I, J, dists, n, knn, perplexity, max_iter=10_000_000,
                       seed=42):
    """2-D SCE embedding straight from a kNN triple — the scale tier's
    entry (poppunk_tpu/scale.py accumulates the accessory kNN inside the
    distance pass, so no square accessory matrix ever exists; the
    reference's mandrake needs one, mandrake.py:60-67)."""
    return _sce_from_knn(I, J, dists, n, knn, perplexity, max_iter, seed)


def write_mandrake_dot(seq_labels, embedding, mandrake_filename):
    """The reference's .dot output (mandrake.py:112-120)."""
    with open(mandrake_filename, "w") as n_file:
        n_file.write("graph G { ")
        for s, seq_label in enumerate(seq_labels):
            n_file.write(
                f'"{seq_label}"[x="{str(5 * float(embedding[s][0]))}"'
                f',y="{str(5 * float(embedding[s][1]))}"]; '
            )
        n_file.write("}\n")
