"""Per-pair core/accessory distances from per-k Jaccards.

Model (reference: PopPUNK/sketchlib.py:475-482,635-670):

    pr(k) = (1 - a) * (1 - c)^k
    log pr = log(1-a) + k * log(1-c),   with log(1-a) <= 0, log(1-c) <= 0

i.e. a box-constrained 2-parameter linear least squares on y = log(jaccard)
vs k. The reference delegates the production fit to pp-sketchlib's C++
regression and keeps a scipy replica (fitKmerCurve) for plots; here the fit
is a *closed form* evaluated for every pair at once on device (XLA fuses it
into the distance kernel epilogue):

- only ks with jaccard > 0 participate (weight mask);
- unconstrained solution via 2x2 normal equations;
- if it violates the box, the three boundary candidates (b0=0, b1=0, both 0)
  are scored by SSE and the feasible minimiser wins (exact active-set for a
  2D box — same optimum scipy's trust-region finds);
- pairs with fewer than 2 usable ks get core = accessory = 1 (unrelated).

Returns (core, accessory) = (1 - exp(slope), 1 - exp(intercept)).
"""

import jax.numpy as jnp
import numpy as np


def _fit_math(xp, jaccards, klist):
    """Shared numpy/jax implementation. jaccards: [..., K]; klist: [K]."""
    j = jaccards
    k = klist.astype(j.dtype)
    w = (j > 0).astype(j.dtype)
    # log of masked-out entries must not produce nan gradients/values
    y = xp.log(xp.where(j > 0, j, 1.0))

    sw = w.sum(axis=-1)
    sk = (w * k).sum(axis=-1)
    skk = (w * k * k).sum(axis=-1)
    sy = (w * y).sum(axis=-1)
    sky = (w * k * y).sum(axis=-1)
    syy = (w * y * y).sum(axis=-1)

    det = sw * skk - sk * sk
    safe_det = xp.where(xp.abs(det) > 1e-12, det, 1.0)
    b1_u = (sw * sky - sk * sy) / safe_det
    b0_u = xp.where(sw > 0, (sy - b1_u * sk) / xp.maximum(sw, 1.0), 0.0)

    def sse(b0, b1):
        return (
            syy
            - 2 * b0 * sy
            - 2 * b1 * sky
            + b0 * b0 * sw
            + 2 * b0 * b1 * sk
            + b1 * b1 * skk
        )

    # Candidate solutions (always feasible after clamping)
    cand_b0 = [
        xp.zeros_like(b0_u),  # b0 = 0 (slope-only)
        xp.where(sw > 0, xp.minimum(sy / xp.maximum(sw, 1.0), 0.0), 0.0),  # b1 = 0
        xp.zeros_like(b0_u),  # both 0
    ]
    cand_b1 = [
        xp.where(skk > 0, xp.minimum(sky / xp.maximum(skk, 1e-12), 0.0), 0.0),
        xp.zeros_like(b1_u),
        xp.zeros_like(b1_u),
    ]
    best_b0 = cand_b0[0]
    best_b1 = cand_b1[0]
    best_sse = sse(best_b0, best_b1)
    for b0c, b1c in zip(cand_b0[1:], cand_b1[1:]):
        s = sse(b0c, b1c)
        take = s < best_sse
        best_b0 = xp.where(take, b0c, best_b0)
        best_b1 = xp.where(take, b1c, best_b1)
        best_sse = xp.where(take, s, best_sse)

    feasible_u = (b0_u <= 0) & (b1_u <= 0) & (xp.abs(det) > 1e-12)
    b0 = xp.where(feasible_u, b0_u, best_b0)
    b1 = xp.where(feasible_u, b1_u, best_b1)

    core = 1.0 - xp.exp(b1)
    acc = 1.0 - xp.exp(b0)

    degenerate = sw < 2
    core = xp.where(degenerate, 1.0, core)
    acc = xp.where(degenerate, 1.0, acc)
    return core, acc


def fit_kmer_curve_np(jaccards, klist):
    """NumPy oracle. jaccards: [..., K] -> (core, accessory) each [...]."""
    return _fit_math(np, np.asarray(jaccards, dtype=np.float64), np.asarray(klist, dtype=np.float64))


def fit_kmer_curve(jaccards, klist):
    """JAX version (jit/vmap friendly)."""
    return _fit_math(jnp, jaccards, jnp.asarray(klist))
