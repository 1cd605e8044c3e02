"""Device NJ must produce the same tree metric as the host numpy NJ."""

import numpy as np
import pytest

from poppunk_tpu.ops.nj_device import neighbor_joining_device
from poppunk_tpu.trees import _adjacency, neighbor_joining


def patristic_matrix(root, labels):
    """All-pairs path distances between the labelled leaves."""
    import heapq

    adj, registry = _adjacency(root)
    name_to_id = {node.label: nid for nid, node in registry.items()
                  if node.label}
    n = len(labels)
    out = np.zeros((n, n))
    for a_idx, a in enumerate(labels):
        src = name_to_id[a]
        dist = {src: 0.0}
        heap = [(0.0, src)]
        while heap:
            d, u = heapq.heappop(heap)
            if d > dist.get(u, np.inf):
                continue
            for v, w in adj[u]:
                nd = d + w
                if nd < dist.get(v, np.inf):
                    dist[v] = nd
                    heapq.heappush(heap, (nd, v))
        for b_idx, b in enumerate(labels):
            out[a_idx, b_idx] = dist[name_to_id[b]]
    return out


@pytest.mark.parametrize("n,seed", [(8, 0), (20, 1), (45, 2)])
def test_matches_host_nj(n, seed):
    rng = np.random.default_rng(seed)
    pts = rng.random((n, 3))
    D = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    labels = [f"s{i}" for i in range(n)]
    t_host = neighbor_joining(D.copy(), labels)
    t_dev = neighbor_joining_device(D.copy(), labels)
    p_host = patristic_matrix(t_host, labels)
    p_dev = patristic_matrix(t_dev, labels)
    np.testing.assert_allclose(p_dev, p_host, rtol=1e-4, atol=1e-5)


def test_additive_tree_recovered():
    """On an exactly additive (tree) metric, NJ recovers the generating
    tree: patristic distances equal the input matrix."""
    rng = np.random.default_rng(3)
    # random caterpillar tree metric
    n = 12
    from poppunk_tpu.trees import Node

    leaves = [Node(f"s{i}", float(rng.random() + 0.1)) for i in range(n)]
    root = Node()
    cur = root
    for i, leaf in enumerate(leaves[:-1]):
        nxt = Node(None, float(rng.random() * 0.5 + 0.05)) \
            if i < n - 2 else leaves[-1]
        cur.add_child(leaf)
        cur.add_child(nxt)
        cur = nxt
    labels = [f"s{i}" for i in range(n)]
    D = patristic_matrix(root, labels)
    t_dev = neighbor_joining_device(D, labels)
    np.testing.assert_allclose(patristic_matrix(t_dev, labels), D,
                               rtol=1e-4, atol=1e-5)
