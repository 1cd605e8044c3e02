"""External ntHash anchors verifiable offline.

These tests pin our hash stack against the PUBLISHED ntHash v1 spec
(Mohamadi, Chu, Vandervalk, Birol 2016, Bioinformatics 32(22);
github.com/bcgsc/ntHash v1.x), not against this repo's own output:

1. the per-base seed constants are the published ntHash v1 values
   (frozen here as hex literals from the ntHash source);
2. a k=1 window's forward hash IS the base's seed (rotation by 0) —
   ties every downstream hash to the published constants;
3. the paper's rolling recurrence
       fh(j+1) = rol1(fh(j)) ^ rolk(seed[s_j]) ^ seed[s_{j+k}]
   is implemented HERE, independently, straight from the formula, and
   must reproduce our closed-form prefix-XOR implementation exactly;
4. NTC64 canonical semantics: hashing the reverse complement yields the
   same canonical multiset, position-reversed.

Together with tests/test_reference_fixture.py (the reference's own
committed json_sketch.txt), these are the offline-knowable external
conformance anchors; tests/conformance/ pins the full pipeline as a
self-generated regression fixture (see its provenance docstring).
"""

import numpy as np

from poppunk_tpu.sketch.nthash import (
    SEED_A, SEED_C, SEED_G, SEED_T, encode_bases, nthash_canonical,
    nthash_forward)

# ntHash v1 published per-base seeds (bcgsc/ntHash nthash.hpp: seedA,
# seedC, seedG, seedT).
PUBLISHED = {
    "A": 0x3C8BFBB395C60474,
    "C": 0x3193C18562A02B4C,
    "G": 0x20323ED082572324,
    "T": 0x295549F54BE24456,
}


def _rol64(x, s):
    s %= 64
    x = int(x) & 0xFFFFFFFFFFFFFFFF
    return ((x << s) | (x >> (64 - s))) & 0xFFFFFFFFFFFFFFFF if s else x


def test_seed_constants_are_published_nthash_v1():
    assert int(SEED_A) == PUBLISHED["A"]
    assert int(SEED_C) == PUBLISHED["C"]
    assert int(SEED_G) == PUBLISHED["G"]
    assert int(SEED_T) == PUBLISHED["T"]


def test_k1_forward_hash_is_the_seed():
    """fh of a single base = rol0(seed[base]) = the published constant."""
    codes = encode_bases(np.frombuffer(b"ACGT", dtype=np.uint8))
    h, valid = nthash_forward(codes, 1)
    assert valid.all()
    assert [int(x) for x in h] == [PUBLISHED[b] for b in "ACGT"]


def _paper_rolling_forward(codes, k):
    """The ntHash paper's recurrence, implemented from the formula alone.

    Base case (eq. 1): fh(0) = XOR_i rol(seed[s_i], k-1-i).
    Roll (eq. 3):      fh(j+1) = rol1(fh(j)) ^ rolk(seed[s_j])
                                             ^ seed[s_{j+k}].
    """
    seeds = [PUBLISHED["A"], PUBLISHED["C"], PUBLISHED["G"], PUBLISHED["T"]]
    n = len(codes)
    out = np.zeros(n - k + 1, dtype=np.uint64)
    h = 0
    for i in range(k):
        h ^= _rol64(seeds[codes[i]], k - 1 - i)
    out[0] = h
    for j in range(n - k):
        h = _rol64(h, 1) ^ _rol64(seeds[codes[j]], k) ^ seeds[codes[j + k]]
        out[j + 1] = h
    return out


def test_vectorised_forward_matches_paper_recurrence():
    rng = np.random.default_rng(1234)
    for k in (3, 13, 17, 28, 31, 64, 65, 100):
        codes = rng.integers(0, 4, 400).astype(np.uint8)
        want = _paper_rolling_forward(codes, k)
        got, valid = nthash_forward(codes, k)
        assert valid.all()
        np.testing.assert_array_equal(got, want)


def test_canonical_is_strand_symmetric():
    """NTC64(x) = min(fh, rh): the canonical hashes of the reverse
    complement are the forward hashes reversed (paper section 2:
    strand-neutral k-mer hashing)."""
    rng = np.random.default_rng(7)
    comp = np.array([3, 2, 1, 0], dtype=np.uint8)
    for k in (13, 29, 64, 70):
        codes = rng.integers(0, 4, 500).astype(np.uint8)
        rc = comp[codes[::-1]]
        h_fwd, _ = nthash_canonical(codes, k)
        h_rc, _ = nthash_canonical(rc, k)
        np.testing.assert_array_equal(h_fwd, h_rc[::-1])


def test_canonical_is_min_of_both_strand_forward_hashes():
    """rh(x) must equal fh(revcomp(x)) at the mirrored position, so the
    canonical hash can be cross-derived from two *forward* runs."""
    rng = np.random.default_rng(99)
    comp = np.array([3, 2, 1, 0], dtype=np.uint8)
    k = 21
    codes = rng.integers(0, 4, 300).astype(np.uint8)
    rc = comp[codes[::-1]]
    fh, _ = nthash_forward(codes, k)
    fh_rc, _ = nthash_forward(rc, k)
    want = np.minimum(fh, fh_rc[::-1])
    got, _ = nthash_canonical(codes, k)
    np.testing.assert_array_equal(got, want)
