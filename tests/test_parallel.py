"""Multi-device sharding tests on the virtual 8-CPU mesh: the sharded
distance path must agree exactly with the single-chip path, for every mesh
shape and for awkward (non-divisible) shapes."""

import numpy as np
import pytest

import jax

from poppunk_tpu.ops.distances import pairwise_block, plane_geometry
from poppunk_tpu.parallel import (get_mesh, sharded_pairwise_block,
                                  sharded_query_dists, sharded_self_dists)

KLIST = (15, 18, 21)
SS64 = 16
BBITS = 4


def synth(n, seed):
    rng = np.random.default_rng(seed)
    _, wp, _ = plane_geometry(SS64, BBITS)
    w32 = 2 * SS64
    planes = np.zeros((n, len(KLIST), BBITS, wp), dtype=np.uint32)
    planes[..., :w32] = rng.integers(0, 2**32, (n, len(KLIST), BBITS, w32),
                                     dtype=np.uint32)
    lengths = rng.integers(1_000_000, 2_000_000, n).astype(np.int32)
    freqs = rng.dirichlet(np.ones(4), n).astype(np.float32)
    return planes, lengths, freqs


@pytest.mark.parametrize("n_q", [1, 2, 4])
def test_sharded_matches_single_chip(n_q):
    assert len(jax.devices()) == 8
    mesh = get_mesh(8, n_q=n_q)
    pq, lq, fq = synth(10, 1)
    pr, lr, fr = synth(23, 2)
    got = sharded_pairwise_block(mesh, pq, pr, lq, lr, fq, fr, KLIST,
                                 SS64, BBITS, use_pallas=False)
    want = np.asarray(pairwise_block(pq, pr, lq, lr, fq, fr, KLIST,
                                     SS64, BBITS, use_pallas=False))
    assert got.shape == want.shape == (10, 23, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sharded_query_chunking():
    mesh = get_mesh(8, n_q=2)
    pq, lq, fq = synth(30, 3)
    pr, lr, fr = synth(17, 4)
    got = sharded_pairwise_block(mesh, pq, pr, lq, lr, fq, fr, KLIST,
                                 SS64, BBITS, use_pallas=False, q_chunk=4)
    want = np.asarray(pairwise_block(pq, pr, lq, lr, fq, fr, KLIST,
                                     SS64, BBITS, use_pallas=False))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sharded_sketch_api(population_dir, tmp_path):
    """End-to-end: sharded self/query dists from real sketches equal the
    single-chip query_db output."""
    from poppunk_tpu.io.hdf5db import construct_database, read_sketches
    from poppunk_tpu.ops.distances import query_db

    d, rfile = population_dir
    db = str(tmp_path / "pardb")
    klist = [15, 19, 23]
    construct_database(rfile, klist, 16, db)
    sketches = read_sketches(db)
    mesh = get_mesh(8, n_q=2)

    got_self = sharded_self_dists(sketches, klist, mesh, use_pallas=False)
    want_self = query_db(sketches, None, klist, self_mode=True,
                         use_pallas=False)
    np.testing.assert_allclose(got_self, np.asarray(want_self), atol=1e-4)

    refs, queries = sketches[:9], sketches[9:]
    got_qr = sharded_query_dists(refs, queries, klist, mesh,
                                 use_pallas=False)
    want_qr = query_db(refs, queries, klist, use_pallas=False)
    np.testing.assert_allclose(got_qr, np.asarray(want_qr), atol=1e-4)
