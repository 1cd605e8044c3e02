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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Opt-in kernel selection, read ONCE at import (a per-call env read inside
# jitted trace bodies would go stale against jit's cache): set
# POPPUNK_TPU_KERNEL=packed to route every device distance pass through
# the packed-lane formulation. Default stays the standard per-k kernel
# until a real-chip A/B (bench.py --kernel-ab) says otherwise.
KERNEL_CHOICE = os.environ.get("POPPUNK_TPU_KERNEL", "standard").lower()
if KERNEL_CHOICE not in ("standard", "packed"):
    raise ValueError(
        f"POPPUNK_TPU_KERNEL={KERNEL_CHOICE!r}: expected 'standard' or "
        "'packed'")

DEFAULT_TQ = 64
DEFAULT_TR = 128
# packed-lane kernel: wider lane rows (G k-mer lengths back-to-back) need
# a narrower query tile for the double-buffered operands to fit VMEM
PACKED_TQ = 32
PACKED_TR = 128
_LANES = 128


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


# ---------------------------------------------------------------------------
# Packed-lane formulation (experimental alternative to match_counts_pallas)
#
# The standard kernel pads each k-mer length's w32 useful words up to a
# 128-lane multiple (production geometry: 312 -> 384, 19% of every VPU op
# wasted on padding). Here G k-mer lengths are packed back-to-back along
# the lane axis (G * w32 rounded up once: G=2 at production is 624 -> 640,
# 2.5% waste), the OR-of-diffs accumulates as a balanced tree (breaks the
# serial plane chain), and the per-k lane sums come from ONE [TR, L] @
# [L, G] f32 matmul on the MXU (exact: every partial sum < 2^24) instead
# of unaligned lane slices.


def _lane_groups(w32, k, vmem_budget=12 * 2**20, bbits=14,
                 tq=PACKED_TQ, tr=PACKED_TR):
    """Pick the k-mer group width G: the largest divisor-padded group
    whose packed lane width minimises padding waste while the double-
    buffered tile operands stay under the VMEM budget."""
    best = None
    for g in range(1, k + 1):
        lanes = ((g * w32 + _LANES - 1) // _LANES) * _LANES
        kg = -(-k // g)  # groups incl. a zero-padded remainder group
        occupancy = (k * w32) / (kg * lanes)  # useful fraction of lane work
        vmem = 2 * (bbits * (tq + tr) * lanes * 4)
        if vmem > vmem_budget:
            continue
        key = (round(occupancy, 4), g)
        if best is None or key > best[0]:
            best = (key, g, lanes, kg)
    if best is None:
        raise ValueError(
            f"packed kernel: even g=1 (lanes="
            f"{((w32 + _LANES - 1) // _LANES) * _LANES}) exceeds the "
            f"{vmem_budget >> 20} MiB VMEM budget at tq={tq}, tr={tr} — "
            "pass smaller tiles or use the standard kernel")
    _, g, lanes, kg = best
    return g, lanes, kg


def _match_kernel_packed(q_ref, r_ref, seg_ref, out_ref, *, bbits, tq,
                         w32, g):
    """q_ref [1,P,TQ,L] u32; r_ref [1,P,TR,L] u32; seg_ref [L,G] f32
    (0/1 lane->k-group membership); out_ref [1,TQ,TR,G] i32.

    matches[q, r, g] = g's w32*32 sketch bits minus the diff popcount of
    its lane segment; segment sums ride the MXU via seg_ref. Pad lanes
    (zero in both operands) contribute 0 diff bits to no segment.

    MAINTENANCE: CPU interpret-mode tests cannot surface Mosaic lowering
    errors (e.g. the u32->f32 convert gap the i32 hop below works
    around); after editing this kernel, smoke-compile it on the real
    chip with ``python bench.py --kernel-ab``."""
    total = jnp.float32(w32 * 32)
    for q in range(tq):
        diffs = [q_ref[0, p, q, :][None, :] ^ r_ref[0, p, :, :]
                 for p in range(bbits)]
        while len(diffs) > 1:  # balanced OR tree: log2(P) depth, not P
            nxt = [a | b for a, b in zip(diffs[::2], diffs[1::2])]
            if len(diffs) % 2:
                nxt.append(diffs[-1])
            diffs = nxt
        # Mosaic has no u32->f32 convert; popcounts are <= 32, so the
        # i32 hop is exact
        counts = (jax.lax.population_count(diffs[0])
                  .astype(jnp.int32).astype(jnp.float32))
        segsum = jax.lax.dot_general(
            counts, seg_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [TR, G], exact < 2^24
        out_ref[0, q, :, :] = (total - segsum).astype(jnp.int32)


def pack_lane_groups(planes, w32, g, lanes, kg, plane_major=False):
    """[n,K,P,Wp] (or [K,P,n,Wp]) u32 -> plane-major packed [KG,P,n,L]:
    each group row holds G k-mer lengths' w32 useful words back-to-back,
    zero-padded to L lanes (remainder groups zero-padded with whole
    k-slots). One relayout pass in HBM."""
    if not plane_major:
        planes = planes.transpose(1, 2, 0, 3)  # [K, P, n, Wp]
    K, P, n, _ = planes.shape
    useful = planes[..., :w32]  # [K, P, n, w32]
    if kg * g != K:
        useful = jnp.pad(useful, ((0, kg * g - K), (0, 0), (0, 0), (0, 0)))
    packed = useful.reshape(kg, g, P, n, w32)
    packed = jnp.moveaxis(packed, 1, 3)  # [KG, P, n, G, w32]
    packed = packed.reshape(kg, P, n, g * w32)
    if lanes != g * w32:
        packed = jnp.pad(packed, ((0, 0),) * 3 + ((0, lanes - g * w32),))
    return packed


@functools.partial(jax.jit, static_argnames=("w32", "g", "tq", "tr",
                                              "interpret", "plane_major"))
def match_counts_pallas_packed(planes_q, planes_r, w32, g=None,
                               tq=PACKED_TQ, tr=PACKED_TR,
                               interpret=False, plane_major=False):
    """Packed-lane twin of match_counts_pallas: same contract
    ([nq,K,P,Wp] x [nr,K,P,Wp] u32 -> i32[nq,nr,K]; or plane-major
    [K,P,n,Wp] inputs), parameterised by the useful word count w32
    instead of pad_bits (pad_bits == (Wp - w32) * 32)."""
    if plane_major:
        K, P, nq, _ = planes_q.shape
        nr = planes_r.shape[2]
    else:
        nq, K, P, _ = planes_q.shape
        nr = planes_r.shape[0]
    if g is None:
        g, lanes, kg = _lane_groups(w32, K, bbits=P, tq=tq, tr=tr)
    else:
        lanes = ((g * w32 + _LANES - 1) // _LANES) * _LANES
        kg = -(-K // g)
    q_t = pack_lane_groups(planes_q, w32, g, lanes, kg, plane_major)
    r_t = pack_lane_groups(planes_r, w32, g, lanes, kg, plane_major)
    nq_p = ((nq + tq - 1) // tq) * tq
    nr_p = ((nr + tr - 1) // tr) * tr
    if nq_p != nq:
        q_t = jnp.pad(q_t, ((0, 0), (0, 0), (0, nq_p - nq), (0, 0)))
    if nr_p != nr:
        r_t = jnp.pad(r_t, ((0, 0), (0, 0), (0, nr_p - nr), (0, 0)))
    # pad lanes (index >= g*w32) have lane_k >= g and match no column
    lane_k = jnp.arange(lanes, dtype=jnp.int32) // w32
    seg = (lane_k[:, None] == jnp.arange(g, dtype=jnp.int32)[None, :]
           ).astype(jnp.float32)

    grid = (kg, nq_p // tq, nr_p // tr)
    out = pl.pallas_call(
        functools.partial(_match_kernel_packed, bbits=P, tq=tq, w32=w32,
                          g=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, P, tq, lanes), lambda k, qi, ri: (k, 0, qi, 0)),
            pl.BlockSpec((1, P, tr, lanes), lambda k, qi, ri: (k, 0, ri, 0)),
            pl.BlockSpec((lanes, g), lambda k, qi, ri: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, tr, g),
                               lambda k, qi, ri: (k, qi, ri, 0)),
        out_shape=jax.ShapeDtypeStruct((kg, nq_p, nr_p, g), jnp.int32),
        interpret=interpret,
    )(q_t, r_t, seg)
    # [KG, nq, nr, G] -> [nq, nr, KG*G] -> drop the zero-padded k slots
    out = jnp.moveaxis(out, 0, 2).reshape(nq_p, nr_p, kg * g)
    return out[:nq, :nr, :K]


_PLANE_MAJOR_NOTE = [False]


def match_counts_device(planes_q, planes_r, pad_bits, plane_major=False):
    """Kernel dispatcher for the device distance paths: the standard
    per-k-tile kernel, or (POPPUNK_TPU_KERNEL=packed) the packed-lane
    formulation — same contract either way.

    plane_major callers keep the REFERENCE tensor resident in the
    kernel's layout precisely so no per-call full-tensor relayout ever
    happens (at 65k genomes that relayout is a measured
    RESOURCE_EXHAUSTED); the packed kernel would repack it every call,
    so those callers stay on the standard kernel until pre-packed
    residency lands (the follow-up if the on-chip A/B wins)."""
    if KERNEL_CHOICE == "packed":
        if plane_major:
            if not _PLANE_MAJOR_NOTE[0]:
                _PLANE_MAJOR_NOTE[0] = True
                import sys
                sys.stderr.write(
                    "POPPUNK_TPU_KERNEL=packed: plane-major (resident "
                    "reference) passes stay on the standard kernel — "
                    "packing would relayout the full reference tensor "
                    "per dispatch\n")
        else:
            wp = planes_q.shape[-1]
            return match_counts_pallas_packed(planes_q, planes_r,
                                              wp - pad_bits // 32)
    return match_counts_pallas(planes_q, planes_r, pad_bits,
                               plane_major=plane_major)
