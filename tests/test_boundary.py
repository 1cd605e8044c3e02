"""Boundary op tests — modelled on the reference's test/test-refine.py,
which validates the native kernels against brute-force NumPy oracles."""

import numpy as np

from poppunk_tpu.ops import boundary
from poppunk_tpu.pairs import all_pairs, n_pairs

RNG = np.random.default_rng(15)


def within_boundary_oracle(dists, x_max, y_max, slope=2):
    """Brute-force sign oracle (port of the reference test's
    withinBoundary)."""
    boundary_test = np.ones(dists.shape[0])
    for row in range(boundary_test.size):
        if slope == 2:
            in_tri = (
                dists[row, 1] * x_max + dists[row, 0] * y_max - x_max * y_max
            )
        elif slope == 0:
            in_tri = dists[row, 0] - x_max
        elif slope == 1:
            in_tri = dists[row, 1] - y_max
        if in_tri == 0:
            boundary_test[row] = 0
        elif in_tri < 0:
            boundary_test[row] = -1
    return boundary_test


class TestAssignThreshold:
    def test_fixed_cases(self):
        X = np.array([[0.1, 0.15], [0.5, 0.6], [0.3, 0.7], [0.05, 0.05]])
        for slope, x_max, y_max in [(2, 0.4, 0.4), (0, 0.3, 0), (1, 0, 0.5)]:
            got = boundary.assign_threshold(X, slope, x_max, y_max)
            want = within_boundary_oracle(X, x_max, y_max, slope)
            assert np.array_equal(got, want), (slope, got, want)

    def test_random(self):
        X = RNG.random((n_pairs(100), 2)).astype(np.float32)
        for slope in (0, 1, 2):
            got = boundary.assign_threshold(X, slope, 0.5, 0.5)
            want = within_boundary_oracle(X, 0.5, 0.5, slope)
            assert np.array_equal(got, want)


class TestEdges:
    def test_edge_iterate_matches_assign(self):
        n = 40
        X = RNG.random((n_pairs(n), 2)).astype(np.float32)
        edges = boundary.edge_iterate(X, 2, 0.5, 0.5)
        assign = boundary.assign_threshold(X, 2, 0.5, 0.5)
        i, j = all_pairs(n)
        inside = assign <= 0
        expect = np.stack([i[inside], j[inside]], axis=1)
        assert np.array_equal(edges, expect)

    def test_generate_tuples_self(self):
        n = 12
        assignments = RNG.integers(-1, 2, n_pairs(n))
        edges = boundary.generate_tuples(assignments, -1, self=True)
        i, j = all_pairs(n)
        mask = assignments == -1
        assert np.array_equal(edges, np.stack([i[mask], j[mask]], axis=1))

    def test_generate_tuples_query(self):
        num_ref, num_q = 7, 3
        assignments = RNG.integers(-1, 2, num_ref * num_q)
        edges = boundary.generate_tuples(
            assignments, -1, self=False, num_ref=num_ref
        )
        expect = []
        for row in np.flatnonzero(assignments == -1):
            r = row % num_ref
            q = row // num_ref + num_ref
            expect.append((min(r, q), max(r, q)))
        assert np.array_equal(edges, np.array(expect).reshape(-1, 2))

    def test_generate_all_tuples(self):
        edges = boundary.generate_all_tuples(5, self=True)
        i, j = all_pairs(5)
        assert np.array_equal(edges, np.stack([i, j], axis=1))
        qedges = boundary.generate_all_tuples(3, 2, self=False)
        assert qedges.shape == (6, 2)
        assert (qedges[:, 1] >= 3).all()


class TestThresholdIterate:
    """Port of the reference's check_res logic (test-refine.py:84-138):
    sweep output must equal repeated static assignment at each offset."""

    def test_1d(self):
        n = 100
        X = RNG.random((n_pairs(n), 2)).astype(np.float32)
        # strictly positive start: an offset through the origin degenerates
        # the boundary (line_dist radial special case, boundary.cpp:46-48)
        offsets = np.linspace(0.05, 0.5, 10)
        x0, y0, x1, y1 = 0.0, 0.0, 0.6, 0.6
        i_vec, j_vec, idx_vec = boundary.threshold_iterate_1d(
            X, offsets, 2, x0, y0, x1, y1
        )
        # pairs should be unique
        assert len(set(zip(i_vec.tolist(), j_vec.tolist()))) == len(i_vec)
        # cumulative edges at each offset == static edge_iterate
        x_max, y_max = boundary._boundary_params(offsets, 2, x0, y0, x1, y1)
        for off in range(len(offsets)):
            got = {
                (i, j)
                for i, j, ix in zip(i_vec, j_vec, idx_vec)
                if ix <= off
            }
            expect_edges = boundary.edge_iterate(
                X, 2, float(x_max[off]), float(y_max[off])
            )
            expect = set(map(tuple, expect_edges.tolist()))
            assert got == expect, off

    def test_1d_slope0(self):
        n = 60
        X = RNG.random((n_pairs(n), 2)).astype(np.float32)
        offsets = np.linspace(0.05, 0.7, 8)
        i_vec, j_vec, idx_vec = boundary.threshold_iterate_1d(
            X, offsets, 0, 0.0, 0.0, 1.0, 1.0
        )
        x_max, y_max = boundary._boundary_params(offsets, 0, 0.0, 0.0, 1.0, 1.0)
        for off in range(len(offsets)):
            got = {
                (i, j) for i, j, ix in zip(i_vec, j_vec, idx_vec) if ix <= off
            }
            expect = set(
                map(tuple, boundary.edge_iterate(X, 0, float(x_max[off]), 0).tolist())
            )
            assert got == expect

    def test_2d(self):
        n = 60
        X = RNG.random((n_pairs(n), 2)).astype(np.float32)
        x_range = np.linspace(0.1, 0.9, 7)
        y_max = 0.5
        i_vec, j_vec, idx_vec = boundary.threshold_iterate_2d(X, x_range, y_max)
        for off in range(len(x_range)):
            got = {
                (i, j) for i, j, ix in zip(i_vec, j_vec, idx_vec) if ix <= off
            }
            expect = set(
                map(
                    tuple,
                    boundary.edge_iterate(X, 2, float(x_range[off]), y_max).tolist(),
                )
            )
            assert got == expect


class TestKnnFromCondensed:
    def test_matches_square_path(self):
        import numpy as np

        from poppunk_tpu.ops.sparse_knn import (get_knn_distances,
                                                knn_from_condensed)
        from poppunk_tpu.pairs import condensed_to_square

        rng = np.random.default_rng(5)
        for n, k in [(30, 5), (101, 10), (64, 63)]:
            vec = rng.random(n * (n - 1) // 2)
            square = condensed_to_square(vec, n)
            r1, c1, d1 = get_knn_distances(square, k)
            r2, c2, d2 = knn_from_condensed(vec, n, k, chunk=17)
            assert np.array_equal(r1, r2)
            assert np.array_equal(c1, c2)
            assert np.allclose(d1, d2)


class TestFastSweep:
    def test_matches_faithful_sweep(self):
        import numpy as np

        from poppunk_tpu.network.incremental import grow_network_scores
        from poppunk_tpu.ops.boundary import (threshold_iterate_1d,
                                              threshold_iterate_1d_fast)

        rng = np.random.default_rng(9)
        n = 120
        P = n * (n - 1) // 2
        X = rng.random((P, 2)).astype(np.float32) * 0.5
        mean0 = np.array([0.1, 0.1])
        mean1 = np.array([0.4, 0.4])
        offsets = np.linspace(-0.05, 0.5, 25)
        slow = threshold_iterate_1d(X, offsets, 2, mean0[0], mean0[1],
                                    mean1[0], mean1[1])
        fast = threshold_iterate_1d_fast(X, offsets, 2, mean0[0], mean0[1],
                                         mean1[0], mean1[1])
        # identical activation sets up to fp rounding at boundary-grazing
        # pairs: compare network scores, which is what the sweep feeds
        s_slow = grow_network_scores(n, *slow, len(offsets))
        s_fast = grow_network_scores(n, *fast, len(offsets))
        np.testing.assert_allclose(s_fast, s_slow, atol=1e-6)

        # and the pair/offset assignments themselves almost all agree
        def as_dict(res):
            return {(int(a), int(b)): int(o)
                    for a, b, o in zip(res[0], res[1], res[2])}

        d_slow, d_fast = as_dict(slow), as_dict(fast)
        assert set(d_slow) == set(d_fast)
        diff = sum(1 for k in d_slow if d_slow[k] != d_fast[k])
        assert diff <= max(2, len(d_slow) // 500), diff
