"""Reference-schema `random` HDF5 group (pp-sketchlib RandomMC table,
copied verbatim by the reference on join/remove —
PopPUNK/sketchlib.py:278-322)."""

import h5py
import numpy as np
import pytest

from poppunk_tpu.io.hdf5db import add_random, db_h5_path, write_sketches
from poppunk_tpu.sketch.minhash import Sketch
from poppunk_tpu.sketch.random_match import random_jaccard

KLIST = [13, 17, 21]


def make_db(tmp_path, n=6):
    rng = np.random.default_rng(0)
    sketches = []
    for i in range(n):
        freq = rng.dirichlet([10, 10, 10, 10])
        sketches.append(Sketch(
            name=f"s{i}",
            usigs={k: rng.integers(0, 2**63, 14 * 2, dtype=np.uint64)
                   for k in KLIST},
            sketchsize64=2, bbits=14, length=int(rng.integers(40_000, 60_000)),
            missing_bases=0, base_freq=freq,
        ))
    prefix = str(tmp_path / "db")
    write_sketches(prefix, sketches)
    return prefix


def test_table_schema(tmp_path):
    prefix = make_db(tmp_path)
    add_random(prefix, sequence_names=[f"s{i}" for i in range(6)], klist=KLIST)
    with h5py.File(db_h5_path(prefix), "r") as db:
        grp = db["random"]
        assert grp.attrs["k_min"] == 13 and grp.attrs["k_max"] == 21
        names = [n.decode() if isinstance(n, bytes) else n
                 for n in grp["table_keys"][:]]
        assert names == [f"s{i}" for i in range(6)]
        assign = grp["table_values"][:]
        assert assign.dtype == np.uint16 and assign.shape == (6,)
        centroids = grp["cluster_centroids"][:]
        n_clusters = centroids.shape[0]
        assert centroids.shape == (n_clusters, 4)
        assert assign.max() < n_clusters
        for k in KLIST:
            table = grp["matches"][str(k)][:]
            assert table.shape == (n_clusters, n_clusters)
            assert np.all(table >= 0) and np.all(table < 1)
            # symmetric: chance depends only on the unordered cluster pair
            np.testing.assert_allclose(table, table.T, atol=1e-7)


def test_table_values_match_bernoulli_model(tmp_path):
    prefix = make_db(tmp_path)
    add_random(prefix, sequence_names=[f"s{i}" for i in range(6)], klist=KLIST)
    with h5py.File(db_h5_path(prefix), "r") as db:
        grp = db["random"]
        assign = grp["table_values"][:]
        centroids = grp["cluster_centroids"][:]
        lengths = np.array([db["sketches"][f"s{i}"].attrs["length"]
                            for i in range(6)], dtype=np.float64)
        c_len = np.array([lengths[assign == c].mean()
                          for c in range(centroids.shape[0])])
        table = grp["matches"]["17"][:]
        for a in range(centroids.shape[0]):
            for b in range(centroids.shape[0]):
                want = random_jaccard(17, c_len[a], c_len[b],
                                      centroids[a], centroids[b], use_rc=True)
                assert abs(table[a, b] - want) < 1e-6


def test_too_few_genomes_skips(tmp_path, capsys):
    prefix = make_db(tmp_path, n=2)
    add_random(prefix, sequence_names=["s0", "s1"], klist=KLIST)
    with h5py.File(db_h5_path(prefix), "r") as db:
        assert "random" not in db


def test_join_copies_group(tmp_path):
    """join_dbs keeps/recomputes the random group like the reference."""
    from poppunk_tpu.io.hdf5db import join_dbs

    p1 = make_db(tmp_path / "a", n=4)
    p2 = make_db(tmp_path / "b", n=3)
    # disambiguate names in db b
    with h5py.File(db_h5_path(p2), "r+") as db:
        for i in range(3):
            db["sketches"].move(f"s{i}", f"t{i}")
    add_random(p1, sequence_names=[f"s{i}" for i in range(4)], klist=KLIST)
    out = str(tmp_path / "joined")
    join_dbs(p1, p2, out,
             update_random={"threads": 1, "strand_preserved": False})
    with h5py.File(db_h5_path(out), "r") as db:
        assert "random" in db
        assert db["random"]["table_keys"].shape == (7,)


def test_identical_freqs_no_nan(tmp_path):
    """Identical base frequencies collapse the k-means init centroids;
    the empty cluster must be dropped, not persisted as NaN rows in the
    matches table."""
    rng = np.random.default_rng(3)
    freq = np.array([0.25, 0.25, 0.25, 0.25])
    sketches = [Sketch(
        name=f"s{i}",
        usigs={k: rng.integers(0, 2**63, 14 * 2, dtype=np.uint64)
               for k in KLIST},
        sketchsize64=2, bbits=14, length=50_000,
        missing_bases=0, base_freq=freq.copy(),
    ) for i in range(6)]
    prefix = str(tmp_path / "dup")
    write_sketches(prefix, sketches)
    add_random(prefix, sequence_names=[f"s{i}" for i in range(6)],
               klist=KLIST)
    with h5py.File(db_h5_path(prefix), "r") as db:
        for k in KLIST:
            table = np.asarray(db[f"random/matches/{k}"])
            assert np.isfinite(table).all(), table
            assert table.shape[0] == table.shape[1] == 1  # one cluster


def test_add_random_counts_db_when_names_none(tmp_path, capsys):
    rng = np.random.default_rng(4)
    sketches = [Sketch(
        name=f"s{i}",
        usigs={k: rng.integers(0, 2**63, 14 * 2, dtype=np.uint64)
               for k in KLIST},
        sketchsize64=2, bbits=14, length=50_000,
        missing_bases=0, base_freq=rng.dirichlet([10] * 4),
    ) for i in range(2)]
    prefix = str(tmp_path / "tiny")
    write_sketches(prefix, sketches)
    add_random(prefix, klist=KLIST)  # names=None: count from the db
    with h5py.File(db_h5_path(prefix), "r") as db:
        assert "random" not in db
