// Native incremental network scoring for the boundary sweep.
//
// C++ twin of poppunk_tpu/network/incremental.py (itself replacing the
// reference's growNetwork + graph-tool recomputation, PopPUNK/refine.py
// :375-474): edges arrive sorted by sweep offset; union-find tracks
// components, adjacency sets keep running wedge/triangle counts, and the
// score  transitivity * (1 - density)  is emitted per offset. Used as the
// host fast path when the device sweep is unavailable (CPU backend or
// score_idx > 0 fallbacks keep Python/Brandes).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libgraph_core.so graph_core.cpp
// Called from poppunk_tpu/network/incremental.py via ctypes.

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct Sweep {
  int64_t n;
  std::vector<int64_t> parent, size;
  std::vector<std::vector<int32_t>> adj;  // sorted neighbour lists
  int64_t n_components, n_edges;
  double wedges2;  // sum deg*(deg-1) (2x wedges)
  double triangles;

  explicit Sweep(int64_t n_)
      : n(n_), parent(n_), size(n_, 1), adj(n_), n_components(n_),
        n_edges(0), wedges2(0.0), triangles(0.0) {
    for (int64_t i = 0; i < n; ++i) parent[i] = i;
  }

  int64_t find(int64_t x) {
    int64_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int64_t next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
  }

  static bool contains(const std::vector<int32_t> &v, int32_t x) {
    auto it = std::lower_bound(v.begin(), v.end(), x);
    return it != v.end() && *it == x;
  }

  static void insert(std::vector<int32_t> &v, int32_t x) {
    v.insert(std::lower_bound(v.begin(), v.end(), x), x);
  }

  void add_edge(int32_t u, int32_t v) {
    if (u == v || contains(adj[u], v)) return;
    int64_t ru = find(u), rv = find(v);
    if (ru != rv) {
      if (size[ru] < size[rv]) std::swap(ru, rv);
      parent[rv] = ru;
      size[ru] += size[rv];
      --n_components;
    }
    // wedges: every existing neighbour of u (and of v) forms a new wedge
    wedges2 += 2.0 * (double)(adj[u].size() + adj[v].size());
    // triangles: common neighbours (sorted intersection)
    const auto &a = adj[u].size() < adj[v].size() ? adj[u] : adj[v];
    const auto &b = adj[u].size() < adj[v].size() ? adj[v] : adj[u];
    if (a.size() * 16 < b.size()) {
      for (int32_t x : a) triangles += contains(b, x);
    } else {
      auto ia = a.begin();
      auto ib = b.begin();
      while (ia != a.end() && ib != b.end()) {
        if (*ia < *ib) ++ia;
        else if (*ib < *ia) ++ib;
        else { triangles += 1.0; ++ia; ++ib; }
      }
    }
    insert(adj[u], v);
    insert(adj[v], u);
    ++n_edges;
  }

  double score0() const {
    double density = n > 1 ? (double)n_edges / (0.5 * (double)n * (double)(n - 1)) : 0.0;
    double transitivity = wedges2 > 0 ? 3.0 * triangles / (0.5 * wedges2) : 0.0;
    return transitivity * (1.0 - density);
  }
};

}  // namespace

extern "C" {

// Edges (i, j) with their first-active offset idx (any order); emits
// -(score0) at each of n_offsets sweep positions.
void sweep_scores_native(const int32_t *i_vec, const int32_t *j_vec,
                         const int32_t *idx_vec, int64_t n_edges_in,
                         int32_t n_vertices, int32_t n_offsets,
                         double *out_scores) {
  // counting sort by offset
  std::vector<int64_t> order(n_edges_in);
  {
    std::vector<int64_t> counts(n_offsets + 1, 0);
    for (int64_t e = 0; e < n_edges_in; ++e) {
      int32_t t = idx_vec[e];
      if (t < 0) t = 0;
      if (t >= n_offsets) t = n_offsets - 1;
      ++counts[t + 1];
    }
    for (int32_t t = 0; t < n_offsets; ++t) counts[t + 1] += counts[t];
    std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
    for (int64_t e = 0; e < n_edges_in; ++e) {
      int32_t t = idx_vec[e];
      if (t < 0) t = 0;
      if (t >= n_offsets) t = n_offsets - 1;
      order[cursor[t]++] = e;
    }
  }

  Sweep sweep(n_vertices);
  int64_t pos = 0;
  for (int32_t t = 0; t < n_offsets; ++t) {
    while (pos < n_edges_in) {
      int64_t e = order[pos];
      int32_t off = idx_vec[e];
      if (off < 0) off = 0;
      if (off >= n_offsets) off = n_offsets - 1;
      if (off > t) break;
      sweep.add_edge(i_vec[e], j_vec[e]);
      ++pos;
    }
    out_scores[t] = -sweep.score0();
  }
}

}  // extern "C"
