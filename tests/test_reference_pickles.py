"""Loading reference-written _fit.pkl artefacts (published databases).

The reference pickles live library objects: an hdbscan.HDBSCAN for
DBSCAN fits (PopPUNK/models.py:613-630), an
sklearn.mixture.BayesianGaussianMixture for BGMM (:341-354), [None] for
refine/threshold (:996-1007), a plain parameter list for lineage
(:1240-1263).  ``hdbscan`` is not importable here at all and sklearn
classes skew across versions, so models/compat.py stubs foreign classes
and reconstructs from the npz.  These tests hand-construct pickles that
byte-mimic each reference ``save()`` — including a genuine
``chdbscan\\nHDBSCAN`` global in the stream — and drive them through
``load_cluster_fit``.
"""

import os
import pickle
import sys
import types

import numpy as np
import pytest
import scipy.sparse

from poppunk_tpu.models import load_cluster_fit
from poppunk_tpu.models.compat import (ForeignStub, is_foreign,
                                       tolerant_pickle_load)


def _artefacts(tmp_path, name):
    d = tmp_path / name
    d.mkdir()
    base = str(d / name)
    return str(d), base + "_fit.pkl", base + "_fit.npz"


def _pickle_with_fake_module(obj_state, module, qualname, fit_type,
                             pkl_file, construct="setstate"):
    """Pickle [instance-of(module.qualname), fit_type] exactly as the
    reference does, by registering a throwaway module so the stream's
    GLOBAL opcode names a class this environment cannot re-import."""
    created = []
    parts = module.split(".")
    for i in range(1, len(parts) + 1):
        m = ".".join(parts[:i])
        if m not in sys.modules:
            sys.modules[m] = types.ModuleType(m)
            created.append(m)
    klass = type(qualname, (), {"__module__": module})
    setattr(sys.modules[module], qualname, klass)
    try:
        inst = klass()
        inst.__dict__.update(obj_state)
        with open(pkl_file, "wb") as f:
            pickle.dump([inst, fit_type], f)
    finally:
        for m in created:
            del sys.modules[m]
        if not created:  # module pre-existed; remove just the attribute
            delattr(sys.modules[module], qualname)
    # re-loading must now hit the stub path
    with open(pkl_file, "rb") as f:
        with pytest.raises(Exception):
            pickle.load(f)


class TestForeignDBSCAN:
    def _make(self, tmp_path, with_tree=True):
        """A reference-style DBSCAN artefact dir whose pkl holds a fake
        hdbscan.HDBSCAN carrying real training state."""
        from poppunk_tpu.ops.hdbscan import HDBSCAN

        rng = np.random.default_rng(42)
        X = np.vstack([
            rng.normal([0.1, 0.15], 0.01, (120, 2)),
            rng.normal([0.5, 0.6], 0.02, (120, 2)),
        ]).clip(1e-4, None)
        ours = HDBSCAN(min_samples=10, min_cluster_size=10).fit(X)
        assert ours.labels_.max() >= 1  # both blobs found

        # hdbscan-style condensed tree record array from our fit
        ct = ours._condensed
        tree = np.empty(len(ct.parent), dtype=[
            ("parent", np.int64), ("child", np.int64),
            ("lambda_val", np.float64), ("child_size", np.int64)])
        tree["parent"], tree["child"] = ct.parent, ct.child
        tree["lambda_val"], tree["child_size"] = ct.lambda_val, ct.child_size

        state = {
            "labels_": ours.labels_,
            "probabilities_": ours.probabilities_,
            "_raw_data": X,
            "min_samples": 10,
            "min_cluster_size": 10,
        }
        if with_tree:
            state["_condensed_tree"] = tree

        out, pkl_file, npz_file = _artefacts(
            tmp_path, "tree" if with_tree else "notree")
        _pickle_with_fake_module(state, "hdbscan", "HDBSCAN", "dbscan",
                                 pkl_file)

        # npz exactly per reference models.py:618-628
        labs = ours.labels_
        k = labs.max() + 1
        means = np.array([X[labs == i].mean(axis=0) for i in range(k)])
        np.savez(npz_file, n_clusters=k,
                 within=int(np.argmin(means.sum(axis=1))),
                 between=int(np.argmax(means.sum(axis=1))),
                 means=means,
                 maxs=np.array([X[labs == i].max(axis=0) for i in range(k)]),
                 mins=np.array([X[labs == i].min(axis=0) for i in range(k)]),
                 scale=np.array([1.0, 1.0]), assign_points=True,
                 use_gpu=False)
        return out, pkl_file, npz_file, ours, X

    def test_loads_and_predicts_like_the_original(self, tmp_path):
        out, pkl_file, npz_file, ours, X = self._make(tmp_path)
        model = load_cluster_fit(pkl_file, npz_file, out_prefix=out)
        assert model.type == "dbscan" and model.fitted
        assert model.within_label == int(np.load(npz_file)["within"])
        # rebuilt predictor reproduces the original on new points
        rng = np.random.default_rng(7)
        Y = np.vstack([rng.normal([0.1, 0.15], 0.01, (50, 2)),
                       rng.normal([0.5, 0.6], 0.02, (50, 2)),
                       [[0.3, 0.9]]]).clip(1e-4, None)
        want = ours.approximate_predict(Y)[0]
        got = model.hdb.approximate_predict(Y)[0]
        np.testing.assert_array_equal(got, want)

    def test_loads_without_condensed_tree(self, tmp_path):
        out, pkl_file, npz_file, ours, X = self._make(tmp_path,
                                                      with_tree=False)
        model = load_cluster_fit(pkl_file, npz_file, out_prefix=out)
        assert model.fitted
        # no thresholds -> still assigns (no noise gate)
        labels, _ = model.hdb.approximate_predict(X[:10])
        np.testing.assert_array_equal(labels, ours.labels_[:10])

    def test_dataless_pickle_loads_but_refuses_assignment(self, tmp_path):
        out, pkl_file, npz_file, _, _ = self._make(tmp_path)
        _pickle_with_fake_module({"min_samples": 10}, "hdbscan", "HDBSCAN",
                                 "dbscan", pkl_file)
        model = load_cluster_fit(pkl_file, npz_file, out_prefix=out)
        assert model.fitted  # npz parameters all present
        with pytest.raises(RuntimeError, match="re-fit"):
            model.hdb.approximate_predict(np.zeros((1, 2)))


class TestForeignBGMM:
    def _npz(self, npz_file):
        means = np.array([[0.05, 0.05], [0.5, 0.5]])
        covs = np.array([np.eye(2) * 1e-4, np.eye(2) * 1e-2])
        np.savez(npz_file, weights=np.array([0.5, 0.5]), means=means,
                 covariances=covs, within=0, between=1,
                 scale=np.array([1.0, 1.0]))

    def test_real_sklearn_object_unpickles(self, tmp_path):
        """A same-version sklearn BGMM (the lucky case) loads normally."""
        from sklearn.mixture import BayesianGaussianMixture

        out, pkl_file, npz_file = _artefacts(tmp_path, "skl")
        dpgmm = BayesianGaussianMixture(n_components=2)
        dpgmm.fit(np.random.default_rng(0).normal(0.3, 0.1, (50, 2)))
        with open(pkl_file, "wb") as f:
            pickle.dump([dpgmm, "bgmm"], f)
        self._npz(npz_file)
        model = load_cluster_fit(pkl_file, npz_file, out_prefix=out)
        assert model.type == "bgmm" and model.fitted
        y = model.assign(np.array([[0.04, 0.06], [0.5, 0.5]]))
        assert y[0] == 0 and y[1] == 1

    def test_version_skewed_sklearn_class_stubs(self, tmp_path):
        """A BGMM pickled by an sklearn whose internal class path no
        longer exists (version skew) still loads via the stub."""
        out, pkl_file, npz_file = _artefacts(tmp_path, "skew")
        _pickle_with_fake_module(
            {"weights_": np.array([0.5, 0.5])},
            "sklearn.mixture._bayesian_mixture_v0",
            "BayesianGaussianMixture", "bgmm", pkl_file)
        self._npz(npz_file)
        model = load_cluster_fit(pkl_file, npz_file, out_prefix=out)
        assert model.fitted
        y = model.assign(np.array([[0.04, 0.06], [0.5, 0.5]]))
        assert y[0] == 0 and y[1] == 1


class TestRefineAndThreshold:
    def _write(self, tmp_path, name, x, y, core, acc):
        out, pkl_file, npz_file = _artefacts(tmp_path, name)
        with open(pkl_file, "wb") as f:
            pickle.dump([None, "refine"], f)  # models.py:1006-1007
        np.savez(npz_file, intercept=np.array([x, y]),
                 core_acc_intercepts=np.array([core, acc]),
                 scale=np.array([1.0, 1.0]), indiv_fitted=False)
        return out, pkl_file, npz_file

    def test_refine(self, tmp_path):
        out, pkl, npz = self._write(tmp_path, "ref", 0.2, 0.3, 0.25, 0.35)
        model = load_cluster_fit(pkl, npz, out_prefix=out)
        assert model.type == "refine" and model.fitted
        assert model.optimal_x == 0.2 and model.optimal_y == 0.3

    def test_threshold(self, tmp_path):
        """A threshold fit is a refine save with NaN accessory values
        (models.py:955-976): must load with the threshold flag set."""
        out, pkl, npz = self._write(tmp_path, "thr", 0.15, np.nan,
                                    0.15, np.nan)
        model = load_cluster_fit(pkl, npz, out_prefix=out)
        assert model.fitted and getattr(model, "threshold", False)
        y = model.assign(np.array([[0.1, 0.9], [0.2, 0.1]]))
        assert y[0] == -1 and y[1] == 1  # within iff core < 0.15


class TestLineage:
    def test_reference_payload(self, tmp_path):
        out, pkl_file, npz_file = _artefacts(tmp_path, "lin")
        # models.py:1255-1263: [[ranks, max_search_depth, reciprocal_only,
        #                        count_unique_distances, dist_col,
        #                        resolution], type]
        with open(pkl_file, "wb") as f:
            pickle.dump([[[1, 2], 25, False, False, 0, 1e-10], "lineage"], f)
        n = 6
        rng = np.random.default_rng(3)
        row = np.repeat(np.arange(n), 2)
        col = (row + rng.integers(1, n - 1, row.shape[0])) % n
        data = rng.uniform(0.01, 0.2, row.shape[0])
        base = os.path.join(out, os.path.basename(out))
        scipy.sparse.save_npz(base + "_sparse_dists.npz",
                              scipy.sparse.coo_matrix(
                                  (data, (row, col)), shape=(n, n)))
        model = load_cluster_fit(pkl_file, npz_file, out_prefix=out)
        assert model.type == "lineage" and model.fitted
        assert model.ranks == [1, 2] and model.dist_col == 0


def test_tolerant_unpickler_passes_trusted_payloads_through():
    """numpy/scipy payloads unpickle normally (never stubbed)."""
    import io

    arr = np.arange(4)
    sp = scipy.sparse.coo_matrix(np.eye(3))
    buf = io.BytesIO(pickle.dumps([arr, sp, {"k": (1, "s")}]))
    got_arr, got_sp, got_d = tolerant_pickle_load(buf)
    np.testing.assert_array_equal(got_arr, arr)
    assert (got_sp.toarray() == np.eye(3)).all()
    assert got_d == {"k": (1, "s")}


def test_foreign_stub_repr_and_state():
    stub_cls = type("Weird", (ForeignStub,),
                    {"__foreign_module__": "gone", "__foreign_qualname__":
                     "Weird", "__module__": "gone"})
    obj = stub_cls("arg")
    obj.__setstate__({"a": 1})
    assert is_foreign(obj) and obj.a == 1 and "gone" in repr(obj)
    obj2 = stub_cls()
    obj2.__setstate__(({"x": 2}, {"y": 3}))
    assert obj2.x == 2 and obj2.y == 3
