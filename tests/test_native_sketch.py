"""Native C++ sketch core must be bit-identical to the numpy path
(the kernel-oracle strategy of the reference's test-refine.py, applied to
our native code)."""

import numpy as np
import pytest

from poppunk_tpu.sketch.minhash import SketchParams, sketch_codes
from poppunk_tpu.sketch.native import native_available, sketch_codes_native

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native sketch core not built")

PARAMS = SketchParams(klist=(13, 17, 21), sketchsize64=16, bbits=8)


def _compare(codes, params=PARAMS):
    got, got_dense = sketch_codes_native(codes, params)
    want, want_dense = sketch_codes(codes, params, use_native=False)
    assert got_dense == want_dense
    assert sorted(got) == sorted(want)
    for k in want:
        assert np.array_equal(got[k], want[k]), f"k={k}"


def test_random_sequence():
    rng = np.random.default_rng(0)
    _compare(rng.integers(0, 4, 100_000).astype(np.uint8))


def test_with_invalid_bases():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, 50_000).astype(np.uint8)
    # sprinkle Ns and contig separators
    pos = rng.choice(50_000, 500, replace=False)
    codes[pos] = 4
    _compare(codes)


def test_invalid_runs_and_edges():
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, 5_000).astype(np.uint8)
    codes[:30] = 4          # invalid prefix
    codes[-25:] = 4         # invalid suffix
    codes[2000:2100] = 4    # long invalid run
    _compare(codes)


def test_forward_only_strand():
    rng = np.random.default_rng(3)
    params = SketchParams(klist=(15,), sketchsize64=8, bbits=6, use_rc=False)
    _compare(rng.integers(0, 4, 40_000).astype(np.uint8), params)


def test_densified_short_sequence():
    rng = np.random.default_rng(4)
    # few k-mers vs many bins -> densification definitely triggers
    params = SketchParams(klist=(13,), sketchsize64=32, bbits=8)
    _compare(rng.integers(0, 4, 600).astype(np.uint8), params)


def test_too_short_raises():
    codes = np.zeros(5, dtype=np.uint8)
    with pytest.raises(ValueError):
        sketch_codes_native(codes, SketchParams(klist=(13,), sketchsize64=4,
                                                bbits=4))


def test_speedup_measured():
    import time

    rng = np.random.default_rng(6)
    codes = rng.integers(0, 4, 1_000_000).astype(np.uint8)
    params = SketchParams(klist=(13, 17, 21, 25), sketchsize64=156, bbits=14)
    t0 = time.perf_counter()
    sketch_codes_native(codes, params)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    sketch_codes(codes, params, use_native=False)
    numpy_t = time.perf_counter() - t0
    assert native_t < numpy_t, (native_t, numpy_t)


def _read_like_codes(rng, n_kmers_rep, seed_len=3_000):
    """Synthetic 'reads': a genome duplicated several times (k-mers with
    multiplicity >= copies) plus unique error k-mers (multiplicity 1)."""
    genome = rng.integers(0, 4, seed_len).astype(np.uint8)
    sep = np.array([4], dtype=np.uint8)
    parts = []
    for _ in range(n_kmers_rep):
        parts.extend([genome, sep])
    errors = rng.integers(0, 4, 2_000).astype(np.uint8)
    parts.append(errors)
    return np.concatenate(parts)


@pytest.mark.parametrize("exact", [True, False])
@pytest.mark.parametrize("min_count", [2, 3])
def test_read_filter_bit_identical(exact, min_count):
    """Read k-mer filtering (exact and count-min) in the native core must
    reproduce the numpy reader.py path exactly."""
    rng = np.random.default_rng(7)
    codes = _read_like_codes(rng, 4)
    params = SketchParams(klist=(13, 17, 21), sketchsize64=16, bbits=8,
                          min_count=min_count, exact_counter=exact)
    got, got_dense = sketch_codes_native(codes, params, reads=True)
    want, want_dense = sketch_codes(codes, params, reads=True,
                                    use_native=False)
    assert got_dense == want_dense
    for k in want:
        assert np.array_equal(got[k], want[k]), f"k={k}"


def test_read_filter_changes_sketch():
    """Filtering must actually drop the unique error k-mers: the filtered
    sketch differs from the unfiltered one."""
    rng = np.random.default_rng(8)
    codes = _read_like_codes(rng, 3)
    base = SketchParams(klist=(17,), sketchsize64=16, bbits=8)
    filt = SketchParams(klist=(17,), sketchsize64=16, bbits=8, min_count=2,
                        exact_counter=True)
    plain, _ = sketch_codes_native(codes, base, reads=True)
    filtered, _ = sketch_codes_native(codes, filt, reads=True)
    assert not np.array_equal(plain[17], filtered[17])


@pytest.mark.parametrize("with_invalid", [False, True])
def test_codon_phased_bit_identical(with_invalid):
    """Codon-phased spaced seeds in the native core must reproduce the
    numpy _phase_hashes path exactly."""
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, 30_000).astype(np.uint8)
    if with_invalid:
        pos = rng.choice(30_000, 300, replace=False)
        codes[pos] = 4
    params = SketchParams(klist=(5, 7, 9), sketchsize64=16, bbits=8,
                          codon_phased=True)
    got, got_dense = sketch_codes_native(codes, params)
    want, want_dense = sketch_codes(codes, params, use_native=False)
    assert got_dense == want_dense
    for k in want:
        assert np.array_equal(got[k], want[k]), f"k={k}"


def test_codon_phased_reads_filter_bit_identical():
    """Codon-phased + read multiplicity filtering, native vs numpy."""
    rng = np.random.default_rng(10)
    codes = _read_like_codes(rng, 3)
    params = SketchParams(klist=(5, 7), sketchsize64=16, bbits=8,
                          codon_phased=True, min_count=2,
                          exact_counter=True)
    got, _ = sketch_codes_native(codes, params, reads=True)
    want, _ = sketch_codes(codes, params, reads=True, use_native=False)
    for k in want:
        assert np.array_equal(got[k], want[k]), f"k={k}"


def test_simd_threshold_and_lane_boundaries():
    """Sizes straddling the AVX-512 path's 64-window threshold and the
    8-lane segment boundaries (n = 8*seg + r for every r) must all be
    bit-identical to the numpy twin — off-by-ones in the lane partition
    or the interleaved tail padding would show here."""
    rng = np.random.default_rng(7)
    for n in [70, 75, 92, 93, 94, 95, 96, 97, 120, 127, 128, 129,
              1001, 1007, 1008, 1009]:
        codes = rng.integers(0, 4, n).astype(np.uint8)
        if n > 100:
            codes[n // 2] = 4  # invalid in the middle of a lane
        _compare(codes)


@pytest.mark.parametrize("min_count", [2, 5])
def test_read_filter_exact_large_candidate_set(min_count):
    """Stress the candidate-verified exact filter (the open-addressing
    count map must grow several times: ~50k distinct k-mers, mixed
    multiplicities) against the numpy exact path — bit identity."""
    rng = np.random.default_rng(41)
    sep = np.array([4], np.uint8)
    frequent = rng.integers(0, 4, 50_000).astype(np.uint8)
    parts = []
    for _ in range(max(2, min_count)):
        parts.extend([frequent, sep])
    # unique noise reads (multiplicity 1: must all be dropped)
    for _ in range(20):
        parts.extend([rng.integers(0, 4, 2_000).astype(np.uint8), sep])
    # a mid-band: multiplicity exactly min_count - 1 (dropped)
    mid = rng.integers(0, 4, 5_000).astype(np.uint8)
    for _ in range(min_count - 1):
        parts.extend([mid, sep])
    codes = np.concatenate(parts)
    params = SketchParams(klist=(15, 19), sketchsize64=16, bbits=8,
                          min_count=min_count, exact_counter=True)
    got, got_dense = sketch_codes_native(codes, params, reads=True)
    want, want_dense = sketch_codes(codes, params, reads=True,
                                    use_native=False)
    assert got_dense == want_dense
    for k in want:
        assert np.array_equal(got[k], want[k]), f"k={k}"
