"""Incremental network scoring for the boundary sweep.

The reference's growNetwork (PopPUNK/refine.py:375-474) builds a graph-tool
graph once and re-summarises after each batch of added edges; component
counting, density, transitivity are all recomputed full each time. Here the
sweep is scored *incrementally*: union-find components with size tracking,
running wedge/triangle counts via adjacency sets — O(E * avg_deg) for the
whole sweep instead of O(grid * (V + E)) full recomputes. Betweenness
(score_idx > 0) is recomputed per evaluated offset via Brandes, as in the
reference.
"""

import numpy as np

from .graph import Graph
from .summary import betweenness_max_per_component


class IncrementalNetwork:
    def __init__(self, n_vertices):
        self.n = n_vertices
        self.parent = np.arange(n_vertices, dtype=np.int64)
        self.size = np.ones(n_vertices, dtype=np.int64)
        self.n_components = n_vertices
        self.adj = [set() for _ in range(n_vertices)]
        self.n_edges = 0
        self.wedges = 0  # sum deg*(deg-1)/2
        self.triangles = 0

    def _find(self, x):
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def add_edge(self, u, v):
        u = int(u)
        v = int(v)
        if u == v or v in self.adj[u]:
            return
        # components
        ru, rv = self._find(u), self._find(v)
        if ru != rv:
            if self.size[ru] < self.size[rv]:
                ru, rv = rv, ru
            self.parent[rv] = ru
            self.size[ru] += self.size[rv]
            self.n_components -= 1
        # clustering counts
        self.wedges += len(self.adj[u]) + len(self.adj[v])
        small, large = (self.adj[u], self.adj[v]) if len(self.adj[u]) < len(self.adj[v]) else (self.adj[v], self.adj[u])
        self.triangles += sum(1 for x in small if x in large)
        self.adj[u].add(v)
        self.adj[v].add(u)
        self.n_edges += 1

    def add_edges(self, us, vs):
        for u, v in zip(us, vs):
            self.add_edge(u, v)

    def metrics(self):
        density = self.n_edges / (0.5 * self.n * (self.n - 1)) if self.n > 1 else 0.0
        transitivity = (
            3.0 * self.triangles / self.wedges if self.wedges > 0 else 0.0
        )
        return self.n_components, density, transitivity

    def to_graph(self):
        edges = [(u, v) for u in range(self.n) for v in self.adj[u] if v > u]
        return Graph(self.n, np.array(edges, dtype=np.int64).reshape(-1, 2))

    def component_labels(self):
        return np.array([self._find(v) for v in range(self.n)], dtype=np.int64)

    def score(self, score_idx=0, betweenness_sample=100, rng=None):
        """Network score as in networkSummary (network.py:1303-1307)."""
        comps, density, transitivity = self.metrics()
        base = transitivity * (1.0 - density)
        if score_idx == 0:
            return base
        G = self.to_graph()
        labels = self.component_labels()
        uniq, labels = np.unique(labels, return_inverse=True)
        sizes = np.bincount(labels)
        maxima, comp_sizes = betweenness_max_per_component(
            G, labels, sizes, sample_sources=betweenness_sample, rng=rng
        )
        if len(maxima) > 1:
            mean_bt = float(np.mean(maxima))
            wmean_bt = float(np.average(maxima, weights=comp_sizes))
        elif len(maxima) == 1:
            mean_bt = wmean_bt = float(maxima[0])
        else:
            mean_bt = wmean_bt = 0.0
        return base * (1.0 - (mean_bt if score_idx == 1 else wmean_bt))


def grow_network_scores(n_vertices, i_vec, j_vec, idx_vec, n_offsets,
                        score_idx=0, betweenness_sample=100,
                        write_clusters=None, sample_names=None, rng=None):
    """Score the network at every sweep offset (growNetwork equivalent,
    PopPUNK/refine.py:375-474). Returns -score per offset.

    With ``write_clusters`` set to an output prefix, clusters are written at
    each offset having at least one non-trivial cluster (multi_refine path).
    """
    import os

    from .clusters import print_clusters

    net = IncrementalNetwork(n_vertices)
    scores = np.ones(n_offsets)
    order = np.argsort(idx_vec, kind="stable")
    i_vec = np.asarray(i_vec)[order]
    j_vec = np.asarray(j_vec)[order]
    idx_vec = np.asarray(idx_vec)[order]
    pos = 0
    for off in range(n_offsets):
        end = pos
        while end < idx_vec.shape[0] and idx_vec[end] <= off:
            end += 1
        net.add_edges(i_vec[pos:end], j_vec[pos:end])
        pos = end
        s = net.score(score_idx, betweenness_sample, rng=rng)
        scores[off] = -s
        if write_clusters and net.n_components < n_vertices:
            o_prefix = os.path.join(
                write_clusters,
                os.path.basename(write_clusters) + f"_boundary{off + 1}",
            )
            print_clusters(
                net.to_graph(), sample_names, out_prefix=o_prefix,
                write_unwords=False,
            )
    return scores
