"""Batched device Brandes (ops/brandes_device) vs the host oracle
(network/summary.brandes_betweenness numpy path — itself the pinned
oracle of the native OpenMP engine)."""

import numpy as np
import pytest
import scipy.sparse

from poppunk_tpu.ops.brandes_device import (brandes_batched_device,
                                            pack_components)


def _numpy_brandes(A, sources):
    import poppunk_tpu.network.summary as summary
    import poppunk_tpu.network.incremental as incremental

    real = incremental.brandes_native
    try:
        incremental.brandes_native = lambda *a, **k: None
        return summary.brandes_betweenness(A, np.asarray(sources))
    finally:
        incremental.brandes_native = real


def _random_adj(n, p, rng):
    A = rng.random((n, n)) < p
    A = np.triu(A, 1)
    A = (A | A.T).astype(np.float32)
    return A


class TestKernelVsOracle:
    @pytest.mark.parametrize("n,p", [(24, 0.15), (48, 0.08), (64, 0.3)])
    def test_single_component_all_sources(self, n, p):
        rng = np.random.default_rng(n)
        A = _random_adj(n, p, rng)
        want = _numpy_brandes(scipy.sparse.csr_matrix(A), np.arange(n))
        m = 64  # padded
        Ap = np.zeros((1, m, m), np.float32)
        Ap[0, :n, :n] = A
        src = np.full((1, m), -1, np.int32)
        src[0, :n] = np.arange(n)
        got = np.asarray(brandes_batched_device(Ap, src))[0, :n]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_sampled_sources_with_weights(self):
        rng = np.random.default_rng(3)
        n = 40
        A = _random_adj(n, 0.12, rng)
        sources = rng.choice(n, size=11, replace=False)
        scale = n / 11
        want = _numpy_brandes(scipy.sparse.csr_matrix(A), sources) * scale
        Ap = A[None]
        src = sources[None].astype(np.int32)
        w = np.full((1, 11), scale, np.float32)
        got = np.asarray(brandes_batched_device(Ap, src, w))[0]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_multi_component_pack(self):
        """Three components of different sizes + dust that must be
        dropped (size <= 3)."""
        rng = np.random.default_rng(7)
        sizes = [30, 17, 9, 3, 2]
        offs = np.cumsum([0] + sizes)
        n = offs[-1]
        i_l, j_l = [], []
        for k, s in enumerate(sizes):
            A = _random_adj(s, 0.5, rng)
            # ensure connectivity: a ring
            for v in range(s):
                A[v, (v + 1) % s] = A[(v + 1) % s, v] = 1
            a, b = np.nonzero(np.triu(A, 1))
            i_l.append(a + offs[k])
            j_l.append(b + offs[k])
        i = np.concatenate(i_l)
        j = np.concatenate(j_l)
        labels = np.concatenate([np.full(s, k) for k, s in
                                 enumerate(sizes)])
        adj, local_of, comps = pack_components(i, j, labels, pad_to=32)
        assert adj.shape[0] == 3 and adj.shape[1] == 32
        assert all(local_of[offs[3]:] == -1)
        S = max(len(v) for v in comps)
        src = np.full((3, S), -1, np.int32)
        for c, verts in enumerate(comps):
            src[c, :len(verts)] = np.arange(len(verts))
        got = np.asarray(brandes_batched_device(adj, src))
        for c, verts in enumerate(comps):
            s = len(verts)
            mask = (i < offs[c + 1]) & (i >= offs[c])
            A = np.zeros((s, s), np.float32)
            A[i[mask] - offs[c], j[mask] - offs[c]] = 1
            A = A + A.T
            want = _numpy_brandes(scipy.sparse.csr_matrix(A),
                                  np.arange(s))
            np.testing.assert_allclose(got[c, :s], want, rtol=1e-5,
                                       atol=1e-5)
            assert np.all(got[c, s:] == 0)

    def test_disconnected_and_empty(self):
        # two cliques in one "component slot" padded apart: unreachable
        # pairs contribute nothing
        A = np.zeros((1, 8, 8), np.float32)
        for a in range(3):
            for b in range(3):
                if a != b:
                    A[0, a, b] = 1
                    A[0, 4 + a, 4 + b] = 1
        src = np.arange(8, dtype=np.int32)[None]
        got = np.asarray(brandes_batched_device(A, src))
        np.testing.assert_allclose(got, 0.0, atol=1e-6)  # cliques: bc 0
        # no sources at all
        got = np.asarray(brandes_batched_device(
            A, np.full((1, 4), -1, np.int32)))
        np.testing.assert_allclose(got, 0.0, atol=1e-6)

    def test_path_graph_exact(self):
        """Path graph has known betweenness: interior vertex k of an
        n-path gets 2*k*(n-1-k) (double-counting)."""
        n = 9
        A = np.zeros((1, 16, 16), np.float32)
        for v in range(n - 1):
            A[0, v, v + 1] = A[0, v + 1, v] = 1
        src = np.full((1, 16), -1, np.int32)
        src[0, :n] = np.arange(n)
        got = np.asarray(brandes_batched_device(A, src))[0, :n]
        want = np.array([2.0 * k * (n - 1 - k) for k in range(n)])
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
