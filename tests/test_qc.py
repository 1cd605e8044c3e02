"""QC module tests: oracle checks against straightforward reimplementations
and invariants (pruned matrices match direct recomputation)."""

import numpy as np
import pytest

from poppunk_tpu import qc
from poppunk_tpu.pairs import all_pairs, n_pairs


def test_prune_distance_matrix(tmp_path):
    n = 10
    names = [f"s{i}" for i in range(n)]
    rng = np.random.default_rng(0)
    X = rng.random((n_pairs(n), 2)).astype(np.float32)
    out = str(tmp_path / "pruned.dists")
    new_names, new_X = qc.prune_distance_matrix(names, ["s3", "s7"], X, out)
    assert new_names == [s for s in names if s not in ("s3", "s7")]
    assert new_X.shape == (n_pairs(8), 2)
    # oracle: direct row-by-row filter
    i, j = all_pairs(n)
    keep = np.array([
        names[a] not in ("s3", "s7") and names[b] not in ("s3", "s7")
        for a, b in zip(i, j)
    ])
    assert np.array_equal(new_X, X[keep])
    # pickle written
    from poppunk_tpu.utils import read_pickle

    rlist, qlist, self_flag, loaded = read_pickle(out)
    assert rlist == new_names and self_flag
    assert np.array_equal(loaded, new_X)


def test_prune_query_distance_matrix():
    refs = ["r0", "r1", "r2"]
    queries = ["q0", "q1", "q2"]
    X = np.arange(18, dtype=np.float32).reshape(9, 2)
    assign = np.arange(9)
    passing, newX, newA = qc.prune_query_distance_matrix(
        refs, queries, {"q1"}, X, assign
    )
    assert passing == ["q0", "q2"]
    assert np.array_equal(newX, X[[0, 1, 2, 6, 7, 8]])
    assert np.array_equal(newA, assign[[0, 1, 2, 6, 7, 8]])
    with pytest.raises(RuntimeError):
        qc.prune_query_distance_matrix(refs, queries, {"r0"}, X)


def test_qc_dist_mat_flags_outlier():
    # 6 samples; sample 5 far from everyone
    n = 6
    names = [f"s{i}" for i in range(n)]
    i, j = all_pairs(n)
    X = np.full((n_pairs(n), 2), 0.01, np.float32)
    bad = (i == 5) | (j == 5)
    X[bad] = [0.5, 0.9]
    qc_dict = dict(qc.DEFAULT_QC, max_pi_dist=0.1, max_a_dist=0.5, prop_zero=1)
    retained, failed = qc.qc_dist_mat(X, names, names, None, qc_dict)
    assert set(failed) == {"s5"}
    assert retained == names[:5]


def test_qc_dist_mat_zero_proportion():
    n = 8
    names = [f"s{i}" for i in range(n)]
    i, j = all_pairs(n)
    X = np.full((n_pairs(n), 2), 0.02, np.float32)
    # sample 0 identical to everything -> all its distances zero
    X[(i == 0) | (j == 0)] = 0.0
    qc_dict = dict(qc.DEFAULT_QC, max_pi_dist=1, max_a_dist=1, prop_zero=0.2)
    retained, failed = qc.qc_dist_mat(X, names, names, None, qc_dict)
    assert "s0" in failed


def test_auto_dist_find():
    # the reference detector needs L >= 100 * r distances (below that the
    # 1%-of-bins step floors to zero and it reports "no outlier", exactly
    # like the reference qc.py:254-257); at the default r = 50 that means
    # >= 5000 pairs, so this fixture uses 30k
    rng = np.random.default_rng(1)
    core = np.concatenate([
        rng.normal(0.02, 0.002, 30000).clip(0),
        rng.normal(0.4, 0.01, 300).clip(0),  # outlier cloud
    ])
    acc = np.concatenate([
        rng.normal(0.1, 0.01, 30000).clip(0),
        rng.normal(0.8, 0.01, 300).clip(0),
    ])
    X = np.stack([core, acc], axis=1)
    qc_dict = dict(qc.DEFAULT_QC)
    max_pi, max_a = qc.auto_dist_find(X, qc_dict)
    # cutoff lands at the edge of the main population, below the outliers
    assert 0.02 < max_pi < 0.4
    assert 0.1 < max_a < 0.8


def test_sketch_qc(tmp_path, monkeypatch):
    import h5py

    prefix = str(tmp_path / "qcdb")
    import os

    os.makedirs(prefix)
    with h5py.File(prefix + "/qcdb.h5", "w") as f:
        g = f.create_group("sketches")
        for name, length, missing in [
            ("a", 2_000_000, 0),
            ("b", 2_010_000, 100),
            ("c", 100_000, 0),        # short outlier
            ("d", 2_005_000, 500_000), # too many Ns
        ]:
            s = g.create_group(name)
            s.attrs["length"] = length
            s.attrs["missing_bases"] = missing

    qc_dict = dict(qc.DEFAULT_QC, length_sigma=1)
    retained, failed = qc.sketch_qc(prefix, ["a", "b", "c", "d"], qc_dict)
    assert "c" in failed and "d" in failed
    assert retained == ["a", "b"]
    # explicit range
    qc_dict = dict(qc.DEFAULT_QC, length_range=[1_000_000, 3_000_000])
    retained, failed = qc.sketch_qc(prefix, ["a", "b", "c", "d"], qc_dict)
    assert "c" in failed and retained[:2] == ["a", "b"]


def test_qc_query_assignments(tmp_path):
    clust = tmp_path / "clusters.csv"
    clust.write_text(
        "Taxon,Cluster\nr0,1\nr1,1\nr2,2\nr3,3\n"
    )
    rlist = ["r0", "r1", "r2", "r3"]
    qlist = ["q0", "q1"]
    # q0 links clusters 1,2,3 (rows 0..3); q1 links only cluster 1
    assignments = np.array([-1, 1, -1, -1,  -1, -1, 1, 1])
    retained, failed = qc.qc_query_assignments(
        rlist, qlist, assignments, 2, str(clust)
    )
    assert "q0" in failed
    assert retained == ["q1"]


class TestInputValidation:
    def test_empty_rfile(self, tmp_path):
        from poppunk_tpu.io.hdf5db import construct_database

        empty = str(tmp_path / "empty.txt")
        open(empty, "w").close()
        with pytest.raises(RuntimeError, match="No samples"):
            construct_database(empty, [13], 8, str(tmp_path / "db"))

    def test_malformed_and_duplicate_rfile(self, tmp_path):
        from poppunk_tpu.utils import read_rfile

        bad = str(tmp_path / "bad.txt")
        open(bad, "w").write("noseparator\n")
        with pytest.raises(RuntimeError, match="misformatted"):
            read_rfile(bad)
        dup = str(tmp_path / "dup.txt")
        open(dup, "w").write("a\t/x.fa\na\t/y.fa\n")
        with pytest.raises(RuntimeError, match="duplicate"):
            read_rfile(dup)
