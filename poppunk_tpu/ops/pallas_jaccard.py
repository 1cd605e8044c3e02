"""Pallas TPU kernel for sketch bin-match counting.

The hot loop of the whole framework (the reference's equivalent is the
OpenMP/CUDA popcount loop inside pp-sketchlib, called from
PopPUNK/sketchlib.py:528). For a (TQ x TR) tile of genome pairs at one
k-mer length, computes

    matches[q, r] = popcount( AND_p ~(Xq[q, p, :] ^ Xr[r, p, :]) ) - pad

entirely in VMEM on the VPU. The AND over bit planes is accumulated
plane-by-plane so the live intermediate is a single [TR, Wp] tile; popcount
uses the native TPU ``population_count``.

Grid: (K, nq/TQ, nr/TR); the K axis rides the grid so each tile's operands
stay small enough for double buffering in VMEM. (Fusing K inside the tile
to reuse operands was measured and rejected: at production geometry the
[tq,K,P,Wp]+[tr,K,P,Wp] operands need 45 MB of scoped VMEM against the
16 MB limit, and the unrolled variant's compile time explodes.)

Zero padding of the word axis adds a constant (subtracted here) — see
ops/distances.py plane layout notes.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_TQ = 64
DEFAULT_TR = 128


def _match_kernel(q_ref, r_ref, out_ref, *, bbits, pad_bits, tq, wp):
    """q_ref [1,P,TQ,Wp] u32; r_ref [1,P,TR,Wp] u32; out_ref [1,TQ,TR] i32.

    Plane-major operand layout: the [TR, Wp] slice for each plane is
    contiguous in VMEM (vreg-aligned loads; measured +11% over the
    sample-major [TR, P, Wp] layout on v5e). The query loop is fully
    unrolled (ILP across iterations, ~4x over a rolled fori_loop). The
    popcount runs on the OR-of-diffs directly — per word
    popcount(~w) = 32 - popcount(w), so the match count is a constant
    minus the diff popcount, saving the NOT over the whole tile (+3%).
    Sweep on v5e at production geometry (P=14, Wp=384):
    (tq,tr) 32,128/64,128/128,128 -> 63.0/63.8/63.9 Mpairs/s; tr=256
    exceeds VMEM. tq=64, tr=128 is the optimum (tq=128 compiles far
    longer for +0.1).
    """
    total = wp * 32 - pad_bits
    for q in range(tq):
        # AND_p ~(x_p ^ r_p) == ~(OR_p (x_p ^ r_p)): one op per plane saved
        diff = q_ref[0, 0, q, :][None, :] ^ r_ref[0, 0, :, :]
        for p in range(1, bbits):
            diff |= q_ref[0, p, q, :][None, :] ^ r_ref[0, p, :, :]
        counts = jax.lax.population_count(diff).astype(jnp.int32)
        out_ref[0, q, :] = total - counts.sum(axis=1)


@functools.partial(jax.jit, static_argnames=("pad_bits", "tq", "tr",
                                              "interpret", "plane_major"))
def match_counts_pallas(planes_q, planes_r, pad_bits, tq=DEFAULT_TQ,
                        tr=DEFAULT_TR, interpret=False, plane_major=False):
    """[nq,K,P,Wp] x [nr,K,P,Wp] uint32 -> int32[nq,nr,K].

    nq/nr are padded up to tile multiples internally; the padded region is
    computed then sliced off (its values are garbage-free: zero-padded
    sketches simply yield full-match counts, discarded by the slice).

    plane_major=True means the operands are ALREADY in the kernel's
    [K, P, n, Wp] device layout and no transpose is materialised — the
    scale pipeline keeps sketches resident this way, since transposing
    the full reference tensor per call doubles its HBM footprint.
    """
    if plane_major:
        K, P, nq, Wp = planes_q.shape
        nr = planes_r.shape[2]
    else:
        nq, K, P, Wp = planes_q.shape
        nr = planes_r.shape[0]
    nq_p = ((nq + tq - 1) // tq) * tq
    nr_p = ((nr + tr - 1) // tr) * tr
    if plane_major:
        if nq_p != nq:
            planes_q = jnp.pad(
                planes_q, ((0, 0), (0, 0), (0, nq_p - nq), (0, 0)))
        if nr_p != nr:
            planes_r = jnp.pad(
                planes_r, ((0, 0), (0, 0), (0, nr_p - nr), (0, 0)))
        q_t, r_t = planes_q, planes_r
    else:
        if nq_p != nq:
            planes_q = jnp.pad(
                planes_q, ((0, nq_p - nq), (0, 0), (0, 0), (0, 0)))
        if nr_p != nr:
            planes_r = jnp.pad(
                planes_r, ((0, nr_p - nr), (0, 0), (0, 0), (0, 0)))

        # plane-major device layout [K, P, n, Wp]; the transpose is one
        # HBM pass per call, negligible against the O(nq*nr) tile compute
        q_t = planes_q.transpose(1, 2, 0, 3)
        r_t = planes_r.transpose(1, 2, 0, 3)

    grid = (K, nq_p // tq, nr_p // tr)
    out = pl.pallas_call(
        functools.partial(_match_kernel, bbits=P, pad_bits=pad_bits, tq=tq,
                          wp=Wp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, P, tq, Wp), lambda k, qi, ri: (k, 0, qi, 0)),
            pl.BlockSpec((1, P, tr, Wp), lambda k, qi, ri: (k, 0, ri, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, tr), lambda k, qi, ri: (k, qi, ri)),
        out_shape=jax.ShapeDtypeStruct((K, nq_p, nr_p), jnp.int32),
        interpret=interpret,
    )(q_t, r_t)
    return jnp.moveaxis(out, 0, -1)[:nq, :nr]
