"""Network layer tests: components, summary stats vs networkx oracles,
cluster naming semantics, cliques, MST."""

import os

import numpy as np
import pytest

from poppunk_tpu.network.graph import Graph, save_network, load_network_file
from poppunk_tpu.network.components import (
    connected_components,
    connected_components_device,
    components_from_edges,
)
from poppunk_tpu.network.summary import (
    network_summary,
    transitivity_from_adjacency,
    brandes_betweenness,
)
from poppunk_tpu.network.clusters import print_clusters
from poppunk_tpu.network.cliques import extract_references
from poppunk_tpu.network.mst import minimum_spanning_tree

RNG = np.random.default_rng(99)


def random_graph(n=60, p=0.08, weights=False, rng=RNG):
    i, j = np.triu_indices(n, 1)
    mask = rng.random(i.shape[0]) < p
    edges = np.stack([i[mask], j[mask]], axis=1)
    w = rng.random(mask.sum()) if weights else None
    return Graph(n, edges, w)


class TestComponents:
    def test_simple(self):
        G = Graph(6, [(0, 1), (1, 2), (3, 4)])
        labels, sizes = connected_components(G)
        assert len(sizes) == 3
        assert labels[0] == labels[1] == labels[2]
        assert labels[3] == labels[4]
        assert labels[5] not in (labels[0], labels[3])

    def test_vs_networkx(self):
        nx = pytest.importorskip("networkx")
        G = random_graph()
        labels, sizes = connected_components(G)
        g = nx.Graph()
        g.add_nodes_from(range(G.n_vertices))
        g.add_edges_from(map(tuple, G.edges.tolist()))
        assert len(sizes) == nx.number_connected_components(g)

    def test_native_union_find_matches_scipy(self):
        # connected_components prefers the native union-find (O(n+m)
        # host memory); labels must be BIT-equal to the scipy
        # first-occurrence convention, not just the same partition
        import scipy.sparse.csgraph

        from poppunk_tpu.network.incremental import components_native

        for seed in range(5):
            rng = np.random.default_rng(seed)
            G = random_graph(80, 0.04, rng=rng)
            n_comp, labels = scipy.sparse.csgraph.connected_components(
                G.adjacency(), directed=False)
            sizes = np.bincount(labels, minlength=n_comp)
            nat = components_native(G.n_vertices, G.edges[:, 0],
                                    G.edges[:, 1])
            if nat is None:
                pytest.skip("native graph core unavailable")
            np.testing.assert_array_equal(nat[0], labels)
            np.testing.assert_array_equal(nat[1], sizes)
        # isolated vertices + empty graph
        nat = components_native(4, np.zeros(0), np.zeros(0))
        if nat is not None:
            np.testing.assert_array_equal(nat[0], np.arange(4))
        # out-of-range endpoints raise instead of corrupting memory
        with pytest.raises(IndexError):
            components_native(4, np.array([0]), np.array([4]))

    def test_device_label_prop(self):
        import jax.numpy as jnp

        G = random_graph()
        labels, sizes = connected_components(G)
        src = jnp.asarray(G.edges[:, 0].astype(np.int32))
        dst = jnp.asarray(G.edges[:, 1].astype(np.int32))
        mask = jnp.ones(G.n_edges, dtype=bool)
        dev = np.asarray(
            connected_components_device(G.n_vertices, src, dst, mask)
        )
        # same partition (label values differ)
        for comp in range(len(sizes)):
            members = np.flatnonzero(labels == comp)
            assert len(set(dev[members].tolist())) == 1
        assert len(np.unique(dev)) == len(sizes)


class TestSummary:
    def test_transitivity_vs_networkx(self):
        nx = pytest.importorskip("networkx")
        for _ in range(5):
            G = random_graph(40, 0.15)
            g = nx.Graph()
            g.add_nodes_from(range(G.n_vertices))
            g.add_edges_from(map(tuple, G.edges.tolist()))
            want = nx.transitivity(g)
            got = transitivity_from_adjacency(G.adjacency())
            assert abs(got - want) < 1e-9

    def test_betweenness_vs_networkx(self):
        nx = pytest.importorskip("networkx")
        G = random_graph(30, 0.12)
        g = nx.Graph()
        g.add_nodes_from(range(G.n_vertices))
        g.add_edges_from(map(tuple, G.edges.tolist()))
        want = nx.betweenness_centrality(g, normalized=True)
        A = G.adjacency()
        bc = brandes_betweenness(A, np.arange(G.n_vertices))
        n = G.n_vertices
        got = bc / ((n - 1) * (n - 2))
        for v in range(n):
            assert abs(got[v] - want[v]) < 1e-9, v

    def test_summary_shape(self):
        G = random_graph(50, 0.1)
        metrics, scores = network_summary(G)
        assert len(metrics) == 5 and len(scores) == 3
        assert 0 <= metrics[1] <= 1
        assert scores[0] == pytest.approx(metrics[2] * (1 - metrics[1]))


class TestPrintClusters:
    def names(self, n):
        return [f"s{i}" for i in range(n)]

    def test_basic_numbering(self, tmp_path):
        # two components: sizes 3 and 2 -> clusters 1 and 2 by size
        G = Graph(5, [(0, 1), (1, 2), (3, 4)])
        clustering, merged = print_clusters(
            G, self.names(5), out_prefix=str(tmp_path / "t")
        )
        assert clustering["s0"] == clustering["s1"] == clustering["s2"] == 1
        assert clustering["s3"] == clustering["s4"] == 2
        assert merged == []
        csv = (tmp_path / "t_clusters.csv").read_text().splitlines()
        assert csv[0] == "Taxon,Cluster"
        assert len(csv) == 6

    def test_old_names_kept(self, tmp_path):
        G = Graph(5, [(0, 1), (1, 2), (3, 4)])
        print_clusters(G, self.names(5), out_prefix=str(tmp_path / "old"))
        # add a query joining the smaller cluster: names must be stable
        G2 = Graph(6, [(0, 1), (1, 2), (3, 4), (4, 5)])
        clustering, merged = print_clusters(
            G2,
            self.names(5) + ["q0"],
            out_prefix=str(tmp_path / "new"),
            old_cluster_file=str(tmp_path / "old_clusters.csv"),
        )
        assert clustering["s0"] == "1"
        assert clustering["s3"] == clustering["q0"] == "2"
        assert merged == []

    def test_merge_detected(self, tmp_path):
        G = Graph(5, [(0, 1), (1, 2), (3, 4)])
        print_clusters(G, self.names(5), out_prefix=str(tmp_path / "old"))
        # query connects both old clusters -> merge "1_2" (order by first
        # old cluster found), query reported
        G2 = Graph(6, [(0, 1), (1, 2), (3, 4), (2, 5), (3, 5)])
        clustering, merged = print_clusters(
            G2,
            self.names(5) + ["q0"],
            out_prefix=str(tmp_path / "new"),
            old_cluster_file=str(tmp_path / "old_clusters.csv"),
        )
        assert set(clustering["q0"].split("_")) == {"1", "2"}
        # the reference appends query_only once per joined old cluster, so
        # duplicates are expected (network.py:1600-1603)
        assert set(merged) == {"q0"}

    def test_novel_cluster_gets_new_id(self, tmp_path):
        G = Graph(5, [(0, 1), (1, 2), (3, 4)])
        print_clusters(G, self.names(5), out_prefix=str(tmp_path / "old"))
        G2 = Graph(7, [(0, 1), (1, 2), (3, 4), (5, 6)])
        clustering, _ = print_clusters(
            G2,
            self.names(5) + ["q0", "q1"],
            out_prefix=str(tmp_path / "new"),
            old_cluster_file=str(tmp_path / "old_clusters.csv"),
        )
        assert clustering["q0"] == clustering["q1"] == "3"


class TestCliques:
    def test_extract_references_covers_components(self, tmp_path):
        G = random_graph(50, 0.1)
        names = [f"s{i}" for i in range(50)]
        ref_idx, ref_names, ref_file, G_ref = extract_references(
            G, names, str(tmp_path / "db")
        )
        labels, sizes = connected_components(G)
        # every component keeps at least one reference
        for comp in range(len(sizes)):
            members = set(np.flatnonzero(labels == comp).tolist())
            assert members & ref_idx, comp
        # reference subgraph has the same number of reference components
        # as components containing references (not split)
        ref_sorted = sorted(ref_idx)
        ref_labels, ref_sizes = connected_components(G_ref)
        full_comps = {labels[v] for v in ref_idx}
        assert len(ref_sizes) == len(full_comps)

    def test_triangle_reduces(self, tmp_path):
        # a triangle + pendant: clique pruning keeps 1 from the triangle
        G = Graph(4, [(0, 1), (1, 2), (0, 2), (2, 3)])
        ref_idx, _, _, _ = extract_references(
            G, [f"s{i}" for i in range(4)], str(tmp_path / "db")
        )
        assert len(ref_idx) < 4


class TestMST:
    def test_spanning(self):
        G = random_graph(40, 0.2, weights=True)
        labels, sizes = connected_components(G)
        mst = minimum_spanning_tree(G)
        # connects everything the original connects (plus seed links)
        mlabels, msizes = connected_components(mst)
        assert len(msizes) <= len(sizes)
        # a spanning forest of each component: E >= V - #comp
        assert mst.n_edges >= G.n_vertices - len(msizes)

    def test_weighted_path(self):
        G = Graph(3, [(0, 1), (1, 2), (0, 2)], weights=[1.0, 1.0, 5.0])
        mst = minimum_spanning_tree(G)
        assert mst.n_edges == 2
        assert set(map(tuple, np.sort(mst.edges, axis=1).tolist())) == {(0, 1), (1, 2)}


class TestPersistence:
    def test_npz_roundtrip(self, tmp_path):
        G = random_graph(20, 0.2, weights=True)
        fn = save_network(G, prefix=str(tmp_path / "db"), suffix="_graph")
        G2 = load_network_file(fn)
        assert G2.n_vertices == G.n_vertices
        assert np.array_equal(G2.edges, G.edges)
        assert np.allclose(G2.weights, G.weights)

    def test_graphml_roundtrip(self, tmp_path):
        G = random_graph(10, 0.3, weights=True)
        labels = [f"iso{i}" for i in range(10)]
        fn = save_network(
            G, prefix=str(tmp_path / "db"), suffix="_cytoscape", use_graphml=True,
            vertex_labels=labels,
        )
        G2 = load_network_file(fn)
        assert G2.n_vertices == G.n_vertices
        assert G2.vertex_labels == labels
        assert np.array_equal(np.sort(G2.edges, axis=0), np.sort(G.edges, axis=0))


class TestGtFormat:
    """graph-tool .gt binary interop (PopPUNK/network.py:120-176,
    1855-1874 — the reference's default network format)."""

    def test_gt_golden_bytes(self, tmp_path):
        """Byte-exact fixture hand-assembled from the published format
        description: degree full u64, neighbor indices compact (u1 at
        N=3), weight property in adjacency order. Catches reader/writer
        bugs that a self-round-trip cancels out."""
        import struct

        from poppunk_tpu.network.gt_format import read_gt, write_gt

        expect = (
            b"\xe2\x9b\xbe gt"          # magic
            + bytes([1])                  # version
            + bytes([0])                  # little endian
            + struct.pack("<Q", 0)        # empty comment
            + bytes([0])                  # undirected
            + struct.pack("<Q", 3)        # N
            + struct.pack("<Q", 2)        # deg(v0) — full u64
            + bytes([1, 2])               # targets, u1 (N < 2^8)
            + struct.pack("<Q", 0)        # deg(v1)
            + struct.pack("<Q", 0)        # deg(v2)
            + struct.pack("<Q", 1)        # one property map
            + bytes([2])                  # edge property
            + struct.pack("<Q", 6) + b"weight"
            + bytes([4])                  # value type: double
            + struct.pack("<d", 1.5) + struct.pack("<d", 2.5)
        )
        fn = str(tmp_path / "golden.gt")
        write_gt(fn, 3, np.array([[0, 1], [0, 2]]),
                 weights=np.array([1.5, 2.5]), comment="")
        with open(fn, "rb") as f:
            assert f.read() == expect
        n, edges, directed, props = read_gt(fn)
        assert n == 3 and not directed
        assert edges.tolist() == [[0, 1], [0, 2]]
        np.testing.assert_array_equal(props[(2, "weight")], [1.5, 2.5])

    def test_gt_big_endian_golden_bytes(self, tmp_path):
        """Big-endian files (written on s390x etc.; the format stores
        the flag, PopPUNK/network.py reads either) — every multi-byte
        int and double must honour the declared order."""
        import struct

        from poppunk_tpu.network.gt_format import read_gt

        raw = (
            b"\xe2\x9b\xbe gt" + bytes([1])
            + bytes([1])                  # BIG endian
            + struct.pack(">Q", 2) + b"hi"  # comment
            + bytes([0])                  # undirected
            + struct.pack(">Q", 300)      # N = 300 -> u2 indices
            + struct.pack(">Q", 2)        # deg(v0)
            + struct.pack(">H", 257) + struct.pack(">H", 1)
            + struct.pack(">Q", 0) * 299  # deg(v1..v299)
            + struct.pack(">Q", 2)        # two property maps
            + bytes([2])                  # edge prop
            + struct.pack(">Q", 6) + b"weight"
            + bytes([4])                  # double
            + struct.pack(">d", 0.25) + struct.pack(">d", -3.0)
            + bytes([0])                  # graph prop
            + struct.pack(">Q", 4) + b"name"
            + bytes([6])                  # string
            + struct.pack(">Q", 3) + b"abc"
        )
        fn = str(tmp_path / "be.gt")
        with open(fn, "wb") as f:
            f.write(raw)
        n, edges, directed, props = read_gt(fn)
        assert n == 300 and not directed
        assert edges.tolist() == [[0, 257], [0, 1]]
        np.testing.assert_array_equal(props[(2, "weight")], [0.25, -3.0])
        assert props[(0, "name")] == ["abc"]

    def test_gt_u4_index_width(self, tmp_path):
        """N > 2^16 switches neighbour indices to u4 (the write path's
        _index_dtype and the read path must agree at every width)."""
        import struct

        from poppunk_tpu.network.gt_format import read_gt, write_gt

        n = 70_000
        edges = np.array([[0, 65_599], [1, 69_999], [65_599, 2]])
        fn = str(tmp_path / "u4.gt")
        write_gt(fn, n, edges, weights=np.array([1.0, 2.0, 3.0]),
                 comment="")
        with open(fn, "rb") as f:
            data = f.read()
        # neighbour bytes for v0 sit right after its u64 degree:
        # magic+ver+endian(8) + comment len(8) + directed(1) + N(8)
        off = 8 + 8 + 1 + 8 + 8
        assert struct.unpack_from("<I", data, off)[0] == 65_599
        n2, e2, _, props = read_gt(fn)
        assert n2 == n
        assert sorted(map(tuple, e2.tolist())) == sorted(
            map(tuple, edges.tolist()))
        got = {tuple(e): w for e, w in
               zip(e2.tolist(), props[(2, "weight")])}
        assert got[(0, 65_599)] == 1.0 and got[(65_599, 2)] == 3.0

    def test_gt_multiple_property_maps(self, tmp_path):
        """Graph + vertex + several edge maps of mixed scalar/string/
        vector types, all parsed in file order."""
        import struct

        from poppunk_tpu.network.gt_format import read_gt

        def s(txt):
            b = txt.encode()
            return struct.pack("<Q", len(b)) + b

        raw = (
            b"\xe2\x9b\xbe gt" + bytes([1, 0])
            + struct.pack("<Q", 0)        # comment
            + bytes([0])                  # undirected
            + struct.pack("<Q", 3)
            + struct.pack("<Q", 2) + bytes([1, 2])   # v0 -> 1, 2
            + struct.pack("<Q", 0) + struct.pack("<Q", 0)
            + struct.pack("<Q", 5)        # five property maps
            + bytes([0]) + s("title") + bytes([6]) + s("net")
            + bytes([1]) + s("label") + bytes([6]) + s("a") + s("b") + s("c")
            + bytes([1]) + s("size") + bytes([2])     # int32_t
            + struct.pack("<iii", 7, 8, 9)
            + bytes([2]) + s("weight") + bytes([4])
            + struct.pack("<dd", 1.0, 2.0)
            + bytes([2]) + s("vec") + bytes([11])     # vector<double>
            + struct.pack("<Q", 2) + struct.pack("<dd", 0.5, 1.5)
            + struct.pack("<Q", 1) + struct.pack("<d", 9.0)
        )
        fn = str(tmp_path / "multi.gt")
        with open(fn, "wb") as f:
            f.write(raw)
        n, edges, _, props = read_gt(fn)
        assert n == 3 and edges.shape == (2, 2)
        assert props[(0, "title")] == ["net"]
        assert props[(1, "label")] == ["a", "b", "c"]
        np.testing.assert_array_equal(props[(1, "size")], [7, 8, 9])
        np.testing.assert_array_equal(props[(2, "weight")], [1.0, 2.0])
        assert [v.tolist() for v in props[(2, "vec")]] == [[0.5, 1.5],
                                                           [9.0]]

    def test_gt_unsupported_type_bails_keeps_parsed(self, tmp_path,
                                                    capsys):
        """A python::object (or long double) map cannot be sized, so the
        reader keeps everything parsed so far, warns, and drops the
        rest — without corrupting the structure section."""
        import struct

        from poppunk_tpu.network.gt_format import read_gt

        def s(txt):
            b = txt.encode()
            return struct.pack("<Q", len(b)) + b

        raw = (
            b"\xe2\x9b\xbe gt" + bytes([1, 0])
            + struct.pack("<Q", 0) + bytes([0]) + struct.pack("<Q", 2)
            + struct.pack("<Q", 1) + bytes([1])       # v0 -> 1
            + struct.pack("<Q", 0)
            + struct.pack("<Q", 3)
            + bytes([2]) + s("weight") + bytes([4]) + struct.pack("<d", 4.0)
            + bytes([0]) + s("blob") + bytes([14])    # python::object
            + b"\x00unsizable-pickle-bytes"
            + bytes([2]) + s("late") + bytes([4]) + struct.pack("<d", 1.0)
        )
        fn = str(tmp_path / "bail.gt")
        with open(fn, "wb") as f:
            f.write(raw)
        n, edges, _, props = read_gt(fn)
        assert n == 2 and edges.tolist() == [[0, 1]]
        np.testing.assert_array_equal(props[(2, "weight")], [4.0])
        assert (0, "blob") not in props and (2, "late") not in props
        err = capsys.readouterr().err
        assert "stopped reading .gt property maps" in err
        assert "weight" in err  # says what WAS kept

    def test_gt_truncation_fuzz(self, tmp_path):
        """Every proper prefix of a valid file either raises ValueError
        (structure cut short) or returns with the property section
        dropped — never crashes, never fabricates structure."""
        import struct

        from poppunk_tpu.network.gt_format import read_gt, write_gt

        fn = str(tmp_path / "full.gt")
        write_gt(fn, 5, np.array([[0, 1], [0, 4], [2, 3]]),
                 weights=np.array([1.0, 2.0, 3.0]), comment="xyz")
        with open(fn, "rb") as f:
            data = f.read()
        full = read_gt(fn)
        tfn = str(tmp_path / "trunc.gt")
        # the structure section ends where properties begin
        struct_end = len(data) - (8 + 1 + 8 + 6 + 1 + 3 * 8)
        for cut in range(len(data)):
            with open(tfn, "wb") as f:
                f.write(data[:cut])
            try:
                n, edges, directed, props = read_gt(tfn)
            except ValueError:
                assert cut < struct_end, cut
                continue
            # parsed fine: the structure must match the full file's
            assert n == full[0] and edges.tolist() == full[1].tolist()

    def test_gt_directed_rejected(self, tmp_path):
        import struct

        from poppunk_tpu.network.graph import Graph

        raw = (b"\xe2\x9b\xbe gt" + bytes([1, 0]) + struct.pack("<Q", 0)
               + bytes([1]) + struct.pack("<Q", 1) + struct.pack("<Q", 0)
               + struct.pack("<Q", 0))
        fn = str(tmp_path / "directed.gt")
        with open(fn, "wb") as f:
            f.write(raw)
        with pytest.raises(ValueError, match="directed"):
            Graph.load_gt(fn)

    def test_gt_roundtrip(self, tmp_path):
        G = random_graph(25, 0.2, weights=True)
        fn = save_network(G, prefix=str(tmp_path / "db"), suffix="_graph",
                          use_gt=True)
        # the native format stays the primary artefact; .gt is additional
        assert fn.endswith(".graph.npz") and os.path.isfile(fn)
        fn = fn[: -len(".graph.npz")] + ".gt"
        G2 = load_network_file(fn)
        assert G2.n_vertices == G.n_vertices
        # edge set equal regardless of per-vertex grouping order
        want = {tuple(sorted(e)) for e in G.edges.tolist()}
        got = {tuple(sorted(e)) for e in G2.edges.tolist()}
        assert got == want
        # weights follow their edges
        w_want = {tuple(sorted(e)): w
                  for e, w in zip(G.edges.tolist(), G.weights)}
        w_got = {tuple(sorted(e)): w
                 for e, w in zip(G2.edges.tolist(), G2.weights)}
        for k in want:
            assert abs(w_want[k] - w_got[k]) < 1e-12

    def test_gt_matches_npz_twin(self, tmp_path):
        G = random_graph(40, 0.1, weights=False)
        fn_gt = save_network(G, prefix=str(tmp_path / "a"), suffix="_graph",
                             use_gt=True)
        fn_gt = fn_gt[: -len(".graph.npz")] + ".gt"
        fn_npz = save_network(G, prefix=str(tmp_path / "b"), suffix="_graph")
        G_gt = load_network_file(fn_gt)
        G_npz = load_network_file(fn_npz)
        assert G_gt.n_vertices == G_npz.n_vertices
        assert ({tuple(sorted(e)) for e in G_gt.edges.tolist()}
                == {tuple(sorted(e)) for e in G_npz.edges.tolist()})

    def test_gt_wide_vertex_ids(self, tmp_path):
        # index width switches at 256 vertices (u1 -> u2)
        from poppunk_tpu.network.graph import Graph

        edges = np.array([[0, 300], [299, 300], [1, 2]])
        G = Graph(400, edges)
        fn = str(tmp_path / "wide.gt")
        G.save_gt(fn)
        G2 = Graph.load_gt(fn)
        assert G2.n_vertices == 400
        assert ({tuple(sorted(e)) for e in G2.edges.tolist()}
                == {tuple(sorted(e)) for e in edges.tolist()})

    def test_bad_magic_rejected(self, tmp_path):
        fn = str(tmp_path / "x.gt")
        with open(fn, "wb") as f:
            f.write(b"not a gt file")
        import pytest

        from poppunk_tpu.network.graph import Graph

        with pytest.raises(ValueError, match="magic"):
            Graph.load_gt(fn)


class TestCsvGzFormat:
    """cugraph edge-list .csv.gz interop (PopPUNK/network.py:138-146,
    1875-1877 — the reference's GPU-mode network format)."""

    def test_csv_gz_roundtrip(self, tmp_path):
        G = random_graph(30, 0.2, weights=True)
        fn = str(tmp_path / "db_graph.csv.gz")
        G.save_csv_gz(fn)
        G2 = load_network_file(fn)
        assert np.array_equal(G2.edges, G.edges)
        assert np.allclose(G2.weights, G.weights)

    def test_reads_cugraph_src_dst_headers(self, tmp_path):
        import gzip

        fn = str(tmp_path / "g_graph.csv.gz")
        with gzip.open(fn, "wt") as f:
            f.write("src,dst\n0,1\n1,2\n")
        G = load_network_file(fn)
        assert G.n_vertices == 3
        assert G.weights is None
        assert {tuple(e) for e in G.edges.tolist()} == {(0, 1), (1, 2)}
