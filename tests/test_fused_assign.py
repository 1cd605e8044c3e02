"""Fused distance+classification (ops/fused_assign): the classifier that
runs inside the distance jit must agree exactly with the two-pass route
(query_db then model.assign) — for refine boundaries at every slope, for
threshold models, for BGMM, on the single-device path, the sharded mesh
path and the condensed self path."""

import numpy as np
import pytest

from poppunk_tpu.models.bgmm import BGMMFit
from poppunk_tpu.models.refine import RefineFit
from poppunk_tpu.ops.distances import pairwise_block, plane_geometry, query_db
from poppunk_tpu.ops.fused_assign import model_post_spec
from poppunk_tpu.parallel import get_mesh, sharded_pairwise_block

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


def refine_model(slope=2, threshold=False):
    m = RefineFit("/tmp/unused_refine")
    m.scale = np.array([0.7, 0.9])
    m.optimal_x = 0.4
    m.optimal_y = 0.6
    m.core_boundary = 0.4
    m.accessory_boundary = 0.6
    m.slope = slope
    m.fitted = True
    if threshold:
        m.scale = np.array([1.0, 1.0])
        m.slope = 0
        m.threshold = True
        m.core_boundary = 0.25
        m.optimal_x = 0.25
        m.optimal_y = np.nan
        m.accessory_boundary = np.nan
    return m


def bgmm_model(seed=5):
    rng = np.random.default_rng(seed)
    m = BGMMFit("/tmp/unused_bgmm")
    k = 3
    m.weights = rng.dirichlet(np.ones(k))
    m.means = rng.uniform(0.05, 0.9, (k, 2))
    a = rng.normal(size=(k, 2, 2)) * 0.05
    m.covariances = np.einsum("kij,klj->kil", a, a) + 0.01 * np.eye(2)
    m.scale = np.array([0.8, 1.1])
    m.within_label = 0
    m.between_label = 1
    m.fitted = True
    return m


@pytest.mark.parametrize("slope", [0, 1, 2])
def test_boundary_fused_matches_host(slope):
    model = refine_model(slope=slope)
    pq, lq, fq = synth(7, 1)
    pr, lr, fr = synth(13, 2)
    spec = model_post_spec(model, slope=slope)
    dists, assign = pairwise_block(pq, pr, lq, lr, fq, fr, KLIST, SS64,
                                   BBITS, use_pallas=False, use_mesh=False,
                                   post_spec=spec)
    want_d = pairwise_block(pq, pr, lq, lr, fq, fr, KLIST, SS64, BBITS,
                            use_pallas=False, use_mesh=False)
    np.testing.assert_array_equal(dists, np.asarray(want_d))
    want = model.assign(np.asarray(want_d).reshape(-1, 2), slope=slope)
    np.testing.assert_array_equal(assign.reshape(-1), want)


def test_threshold_model_fused():
    model = refine_model(threshold=True)
    pq, lq, fq = synth(5, 3)
    pr, lr, fr = synth(9, 4)
    spec = model_post_spec(model)  # slope resolves to the model's (0)
    dists, assign = pairwise_block(pq, pr, lq, lr, fq, fr, KLIST, SS64,
                                   BBITS, use_pallas=False, use_mesh=False,
                                   post_spec=spec)
    want = model.assign(np.asarray(dists).reshape(-1, 2))
    np.testing.assert_array_equal(assign.reshape(-1), want)


def test_bgmm_fused_matches_host():
    model = bgmm_model()
    pq, lq, fq = synth(6, 5)
    pr, lr, fr = synth(11, 6)
    spec = model_post_spec(model)
    dists, assign = pairwise_block(pq, pr, lq, lr, fq, fr, KLIST, SS64,
                                   BBITS, use_pallas=False, use_mesh=False,
                                   post_spec=spec)
    want = model.assign(np.asarray(dists).reshape(-1, 2), progress=False)
    np.testing.assert_array_equal(assign.reshape(-1), want)


@pytest.mark.parametrize("kind", ["boundary", "bgmm"])
def test_fused_sharded_matches_single(kind):
    model = refine_model() if kind == "boundary" else bgmm_model()
    spec = model_post_spec(model)
    pq, lq, fq = synth(10, 7)
    pr, lr, fr = synth(23, 8)
    mesh = get_mesh(8, n_q=2)
    d_mesh, a_mesh = sharded_pairwise_block(
        mesh, pq, pr, lq, lr, fq, fr, KLIST, SS64, BBITS, use_pallas=False,
        post_spec=spec)
    d_one, a_one = pairwise_block(pq, pr, lq, lr, fq, fr, KLIST, SS64,
                                  BBITS, use_pallas=False, use_mesh=False,
                                  post_spec=spec)
    np.testing.assert_allclose(d_mesh, np.asarray(d_one), atol=1e-4)
    # classifications may only differ where the distances differ in the
    # last float bit ON the decision boundary — synthetic data is far from
    # boundaries, so demand equality
    np.testing.assert_array_equal(a_mesh, np.asarray(a_one))


def test_fused_self_mode(population_dir, tmp_path):
    """Condensed i<j self path with a fused classifier, from real
    sketches."""
    from poppunk_tpu.io.hdf5db import construct_database, read_sketches

    d, rfile = population_dir
    db = str(tmp_path / "fuseddb")
    klist = [15, 19, 23]
    construct_database(rfile, klist, 16, db)
    sketches = read_sketches(db)
    model = refine_model()
    spec = model_post_spec(model)
    dists, assign = query_db(sketches, None, klist, self_mode=True,
                             use_pallas=False, post_spec=spec)
    want_d = query_db(sketches, None, klist, self_mode=True,
                      use_pallas=False)
    np.testing.assert_array_equal(dists, want_d)
    np.testing.assert_array_equal(assign, model.assign(dists))
