"""Tree-building tests: NJ must exactly recover additive (tree-metric)
distances; MST conversion must preserve path lengths and leaf sets."""

import numpy as np

from poppunk_tpu.trees import (
    Node,
    generate_nj_tree,
    midpoint_root,
    mst_to_phylogeny,
    neighbor_joining,
    parse_newick,
    to_newick,
)


def patristic_distances(newick, labels):
    """Leaf-to-leaf path lengths from a newick string."""
    root = parse_newick(newick)
    # adjacency over parsed nodes
    adj = {}

    def walk(node, parent):
        adj.setdefault(id(node), [])
        if parent is not None:
            w = node.edge_length or 0.0
            adj[id(node)].append((id(parent), w))
            adj[id(parent)].append((id(node), w))
        for c in node.children:
            walk(c, node)

    walk(root, None)
    leaf_ids = {}

    def collect(node):
        if not node.children and node.label is not None:
            leaf_ids[node.label] = id(node)
        for c in node.children:
            collect(c)

    collect(root)
    n = len(labels)
    D = np.zeros((n, n))
    for i, a in enumerate(labels):
        # BFS from leaf a
        dist = {leaf_ids[a]: 0.0}
        stack = [leaf_ids[a]]
        while stack:
            u = stack.pop()
            for v, w in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + w
                    stack.append(v)
        for j, b in enumerate(labels):
            D[i, j] = dist[leaf_ids[b]]
    return D


def random_additive_matrix(n, seed=0):
    """Distances generated from a random binary tree (exactly additive)."""
    rng = np.random.default_rng(seed)
    labels = [f"t{i}" for i in range(n)]
    nodes = [Node(lab, float(rng.uniform(0.05, 1.0))) for lab in labels]
    while len(nodes) > 2:
        i, j = rng.choice(len(nodes), 2, replace=False)
        if i == j:
            continue
        i, j = sorted((i, j))
        parent = Node(None, float(rng.uniform(0.05, 1.0)))
        parent.add_child(nodes[i])
        parent.add_child(nodes[j])
        nodes[i] = parent
        nodes.pop(j)
    root = Node()
    for nd in nodes:
        root.add_child(nd)
    newick = to_newick(root)
    return patristic_distances(newick, labels), labels


def test_nj_recovers_additive_distances():
    D, labels = random_additive_matrix(12, seed=3)
    tree = neighbor_joining(D.copy(), labels)
    D2 = patristic_distances(to_newick(tree), labels)
    assert np.allclose(D, D2, atol=1e-6)


def test_nj_midpoint_preserves_distances():
    D, labels = random_additive_matrix(10, seed=7)
    tree = midpoint_root(neighbor_joining(D.copy(), labels))
    D2 = patristic_distances(to_newick(tree), labels)
    assert np.allclose(D, D2, atol=1e-6)


def test_generate_nj_tree_string(tmp_path):
    D, labels = random_additive_matrix(8, seed=1)
    s = generate_nj_tree(D, labels, str(tmp_path))
    assert s.endswith(";")
    for lab in labels:
        assert lab in s


def test_mst_to_phylogeny():
    from poppunk_tpu.network.graph import Graph

    # path graph 0-1-2-3 with weights
    edges = np.array([[0, 1], [1, 2], [2, 3]])
    weights = np.array([0.1, 0.2, 0.3])
    G = Graph(4, edges, weights)
    names = ["a", "b", "c", "d"]
    newick = mst_to_phylogeny(G, names)
    D = patristic_distances(newick, names)
    assert np.isclose(D[0, 1], 0.1)
    assert np.isclose(D[0, 3], 0.6)
    assert np.isclose(D[1, 2], 0.2)
    # all names appear as leaves
    for nm in names:
        assert nm in newick
