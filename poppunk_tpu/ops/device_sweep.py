"""Boundary sweep scored entirely on device.

TPU-idiomatic replacement for the host incremental-network scoring of the
refine search (growNetwork, PopPUNK/refine.py:375-474): instead of growing
one graph and re-scoring it per boundary offset, ALL offsets are scored in
one jit — for each offset t the active-edge adjacency is scattered dense
and the score

    transitivity * (1 - density),
    transitivity = 6*triangles / (2*wedges) = sum(A * (A@A)) / sum(d(d-1))

comes out of a single [n, n] matmul on the MXU (A * A@A summed gives
6*triangles directly — no A^3 needed). A lax.scan over offsets keeps peak
memory at two [n, n] f32 buffers; counts stay exact in f32 up to 2^24.

This path covers score_idx = 0 (the default) up to n = 32768 vertices
(dense [n, n] HBM). Beyond that, and for the betweenness-weighted scores
(idx 1/2), the sparse native engine takes over (native/graph_core.cpp via
network/incremental.py: one O(E^1.5) compact-forward triangle pass +
OpenMP Brandes) — no [n, n] buffers at any n.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n", "n_offsets"))
def _sweep_scores(i_vec, j_vec, idx_vec, n, n_offsets):
    i_vec = i_vec.astype(jnp.int32)
    j_vec = j_vec.astype(jnp.int32)
    idx_vec = idx_vec.astype(jnp.int32)
    possible = 0.5 * n * (n - 1)

    def score_at(_, t):
        active = (idx_vec <= t).astype(jnp.float32)
        A = jnp.zeros((n, n), jnp.float32)
        # duplicate-safe: max instead of add
        A = A.at[i_vec, j_vec].max(active)
        A = A.at[j_vec, i_vec].max(active)
        deg = A.sum(axis=1)
        n_edges = deg.sum() / 2.0
        density = n_edges / possible
        wedges2 = (deg * (deg - 1.0)).sum()  # 2 * wedges
        paths = (A * jnp.dot(A, A, preferred_element_type=jnp.float32)).sum()
        transitivity = jnp.where(wedges2 > 0, paths / wedges2, 0.0)
        return None, -(transitivity * (1.0 - density))

    _, scores = jax.lax.scan(score_at, None,
                             jnp.arange(n_offsets, dtype=jnp.int32))
    return scores


def sweep_scores_device(n_vertices, i_vec, j_vec, idx_vec, n_offsets):
    """-(score) per offset, matching grow_network_scores with score_idx=0.

    i_vec/j_vec/idx_vec: edges with the first offset index at which each
    becomes active (the thresholdIterate output).
    """
    if len(i_vec) == 0:
        return np.ones(n_offsets)
    scores = _sweep_scores(
        jnp.asarray(np.asarray(i_vec)), jnp.asarray(np.asarray(j_vec)),
        jnp.asarray(np.asarray(idx_vec)), int(n_vertices), int(n_offsets))
    return np.asarray(scores, dtype=np.float64)


# Above this vertex count the dense [n, n] buffers exceed sensible HBM use
# (n=32768 -> 4.3 GB x2); fall back to the host incremental path.
DEVICE_SWEEP_MAX_N = 32768


def use_device_sweep(n_vertices, score_idx):
    import jax

    return (score_idx == 0 and n_vertices <= DEVICE_SWEEP_MAX_N
            and jax.default_backend() != "cpu")
