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
