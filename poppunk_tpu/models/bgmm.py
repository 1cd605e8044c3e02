"""BGMM model: 2-D Bayesian Gaussian mixture fit + assignment.

Reference behaviour (PopPUNK/models.py:283-464 + PopPUNK/bgmm.py):
- fit on the (subsampled, max-scaled) distance cloud with K components
  (VB-GMM, see vbgmm.py);
- within-strain component = the used component whose mean is nearest the
  origin (bgmm.py:71-97); between = most-assigned component;
- assignment of all pairs = argmax of weighted Gaussian log-likelihood
  (bgmm.py:100-174) — computed here as one batched jit on device instead of
  the reference's SharedMemory thread pool;
- artefacts: _fit.npz (weights/means/covariances/within/between/scale) +
  _fit.pkl (models.py:341-354).
"""

import os
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np

from .base import ClusterFit


def log_likelihood_device(X, weights, means, covariances, scale):
    """Weighted Gaussian mixture log-likelihood (jnp twin of
    PopPUNK/bgmm.py:100-174). Returns (logprob, lpr)."""
    X = X / scale
    chol = jnp.linalg.cholesky(covariances)  # [K, d, d]
    logdet = 2.0 * jnp.log(jnp.diagonal(chol, axis1=1, axis2=2)).sum(-1)
    d = X.shape[1]

    def comp(cholk, mu):
        y = jax.scipy.linalg.solve_triangular(cholk, (X - mu).T, lower=True)
        return (y ** 2).sum(0)

    maha = jax.vmap(comp, in_axes=(0, 0), out_axes=1)(chol, means)  # [n, K]
    log_prob = -0.5 * (maha + d * jnp.log(2 * jnp.pi) + logdet[None, :])
    lpr = log_prob + jnp.log(weights)[None, :]
    logprob = jax.scipy.special.logsumexp(lpr, axis=1)
    return logprob, lpr


@jax.jit
def _assign_chunk(X, weights, means, covariances, scale):
    _, lpr = log_likelihood_device(X, weights, means, covariances, scale)
    return jnp.argmax(lpr, axis=1)


@jax.jit
def _responsibility_chunk(X, weights, means, covariances, scale):
    logprob, lpr = log_likelihood_device(X, weights, means, covariances, scale)
    return jnp.exp(lpr - logprob[:, None])


def find_within_label(means, assignments, rank=0):
    """Used component with mean nearest the origin
    (PopPUNK/bgmm.py:71-97)."""
    dists = {}
    norms = np.linalg.norm(np.asarray(means), axis=1)
    for comp, dist in enumerate(norms):
        if np.any(np.asarray(assignments) == comp):
            dists[comp] = dist
    sorted_dists = sorted(dists.items(), key=lambda kv: kv[1])
    return sorted_dists[rank][0]


def find_between_label_bgmm(means, assignments):
    """Most-assigned component (PopPUNK/bgmm.py:48-69)."""
    assignments = np.asarray(assignments)
    counts = [(c, int((assignments == c).sum())) for c in range(len(means))]
    return max(counts, key=lambda kv: kv[1])[0]


class BGMMFit(ClusterFit):
    def __init__(self, out_prefix, max_samples=100000, max_batch_size=100000,
                 assign_points=True, seed=42):
        ClusterFit.__init__(self, out_prefix, seed=seed)
        self.type = "bgmm"
        self.preprocess = True
        self.max_samples = max_samples
        self.max_batch_size = max_batch_size
        self.assign_points = assign_points

    def fit(self, X, max_components):
        from .vbgmm import fit_vbgmm

        ClusterFit.fit(self, X)
        result = fit_vbgmm(
            jax.random.PRNGKey(self.seed),
            self.subsampled_X,
            k=int(max_components),
        )
        self.weights = np.asarray(result["weights"], dtype=np.float64)
        self.means = np.asarray(result["means"], dtype=np.float64)
        self.covariances = np.asarray(result["covariances"], dtype=np.float64)
        self.fitted = True

        if self.assign_points:
            y = self.assign(X, max_batch_size=self.max_batch_size)
        else:
            y = self.assign(self.subsampled_X * self.scale,
                            max_batch_size=self.max_batch_size)
        self.within_label = find_within_label(self.means, y)
        self.between_label = find_between_label_bgmm(self.means, y)
        return y

    def assign(self, X, max_batch_size=100000, values=False, progress=True):
        if not self.fitted:
            raise RuntimeError("Trying to assign using an unfitted model")
        if progress:
            sys.stderr.write("Assigning distances with BGMM model\n")
        w = jnp.asarray(self.weights, jnp.float32)
        m = jnp.asarray(self.means, jnp.float32)
        c = jnp.asarray(self.covariances, jnp.float32)
        s = jnp.asarray(self.scale, jnp.float32)
        fn = _responsibility_chunk if values else _assign_chunk
        outs = []
        for start in range(0, X.shape[0], max_batch_size):
            chunk = jnp.asarray(X[start : start + max_batch_size], jnp.float32)
            outs.append(np.asarray(fn(chunk, w, m, c, s)))
        out = np.concatenate(outs)
        return out if values else out.astype(int)

    def save(self):
        if not self.fitted:
            raise RuntimeError("Trying to save unfitted model")
        np.savez(
            self._artefact("_fit.npz"),
            weights=self.weights,
            means=self.means,
            covariances=self.covariances,
            within=self.within_label,
            between=self.between_label,
            scale=self.scale,
        )
        with open(self._artefact("_fit.pkl"), "wb") as f:
            # the reference pickles the sklearn object; we store the raw
            # parameter dict (same file naming / [obj, type] structure)
            pickle.dump(
                [
                    {
                        "weights": self.weights,
                        "means": self.means,
                        "covariances": self.covariances,
                    },
                    self.type,
                ],
                f,
            )

    def load(self, fit_npz, fit_obj):
        self.weights = fit_npz["weights"]
        self.means = fit_npz["means"]
        self.covariances = fit_npz["covariances"]
        self.scale = fit_npz["scale"]
        self.within_label = int(fit_npz["within"])
        self.between_label = int(fit_npz["between"])
        self.fitted = True

    def plot(self, X, y):
        from ..plotting import plot_contours, plot_results  # lazy

        ClusterFit.plot(self, X)
        used = np.unique(y).size
        sys.stderr.write(
            f"Fit summary:\n\tNumber of components used\t{used}\n"
        )
        try:
            plot_results(
                X, y, self.means, self.covariances, self.scale,
                "DPGMM fit", self._artefact("_DPGMM_fit"),
            )
            subsampled_y = self.assign(self.subsampled_X * self.scale,
                                       progress=False) \
                if hasattr(self, "subsampled_X") else y
            plot_contours(self, subsampled_y,
                          "DPGMM assignment boundary",
                          self._artefact("_DPGMM_fit_contours"))
        except Exception as e:  # plotting must never kill a fit
            sys.stderr.write(f"Plotting failed: {e}\n")
