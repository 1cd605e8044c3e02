"""Connected components: scipy host path + JAX label propagation device path.

The reference computes components with graph-tool's label_components /
cugraph connected_components (PopPUNK/network.py:1538,1529). Host path here
is scipy.sparse.csgraph; the device path is iterative min-label propagation
(each step every vertex takes the minimum label among itself and its
neighbours) which vmaps across boundary-sweep grid points in the refine
search and shards across devices for huge graphs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse
import scipy.sparse.csgraph


def connected_components(G):
    """(labels int64[n], sizes int64[n_comp]) — labels are arbitrary ids
    ordered by first occurrence (scipy convention, same as graph-tool's).

    Prefers the native union-find (bit-equal labels, pinned in
    test_network.py; O(n+m) host memory where the scipy COO->CSR route
    peaks at ~10x the edge bytes); scipy is the fallback."""
    nat = _native_labels(G.n_vertices, G.edges[:, 0], G.edges[:, 1])
    if nat is not None:
        return nat
    n_comp, labels = scipy.sparse.csgraph.connected_components(
        G.adjacency(), directed=False
    )
    sizes = np.bincount(labels, minlength=n_comp)
    return labels, sizes


def _native_labels(n, i_vec, j_vec):
    from .incremental import components_native

    try:
        return components_native(n, i_vec, j_vec)
    except IndexError:
        raise
    except Exception:  # noqa: BLE001 — any load/ABI issue: scipy path
        return None


def components_from_edges(n, edges):
    """Components from a raw edge array without building a Graph."""
    edges = np.asarray(edges).reshape(-1, 2)
    nat = _native_labels(n, edges[:, 0], edges[:, 1])
    if nat is not None:
        return nat
    edges = edges.astype(np.int64)
    data = np.ones(edges.shape[0], dtype=np.int8)
    mat = scipy.sparse.coo_matrix(
        (data, (edges[:, 0], edges[:, 1])), shape=(n, n)
    )
    n_comp, labels = scipy.sparse.csgraph.connected_components(mat, directed=False)
    return labels, np.bincount(labels, minlength=n_comp)


# ---------------------------------------------------------------------------
# Device path: min-label propagation over a (padded, masked) edge array.
# ---------------------------------------------------------------------------

def label_prop_step(labels, src, dst, mask):
    """One propagation sweep: scatter-min labels across active edges."""
    li = labels[src]
    lj = labels[dst]
    lo = jnp.minimum(li, lj)
    big = jnp.iinfo(labels.dtype).max
    lo_masked = jnp.where(mask, lo, big)
    labels = labels.at[src].min(lo_masked)
    labels = labels.at[dst].min(lo_masked)
    return labels


def connected_components_device(n, src, dst, mask, max_iters=None):
    """Min-label propagation to a fixed point.

    src/dst: int32[E] (padded is fine — mask out); mask: bool[E].
    Returns int32[n] component labels (min vertex id in component).

    Convergence: each sweep at least halves the distance of every vertex to
    its component minimum along some shortest path, so ceil(log2(n)) + 1
    doubling sweeps bound the iteration when combined with pointer-jumping;
    plain propagation needs O(diameter) sweeps — we run a while_loop with a
    changed-flag so typical graphs (small diameter) exit early.
    """
    labels0 = jnp.arange(n, dtype=jnp.int32)
    if max_iters is None:
        max_iters = n  # worst-case path graph

    def cond(state):
        labels, prev_changed, it = state
        return prev_changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        new = label_prop_step(labels, src, dst, mask)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0))
    )
    return labels


def count_components_device(labels):
    """Number of distinct labels (components) in an int32 label vector."""
    n = labels.shape[0]
    is_root = labels == jnp.arange(n, dtype=labels.dtype)
    return is_root.sum(dtype=jnp.int32)
