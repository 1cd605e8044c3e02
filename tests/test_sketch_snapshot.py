"""Bit-level regression snapshot of the sketching stack.

Sketching is pure integer arithmetic (ntHash, binning, densification,
packing) and therefore exactly reproducible; this pins the output so any
silent change to the hash/densify/pack pipeline — which would invalidate
every existing database — fails loudly. Update the constant only for a
deliberate, documented format change (and bump SKETCH_VERSION with it)."""

import hashlib

import numpy as np

from poppunk_tpu.sketch.minhash import SketchParams, sketch_codes

SNAPSHOT_SHA256 = \
    "d7a542e9d80d5ce1d825573b31730f96d8f755bc6a46a65539c4a01dbc7b3641"


def _digest(usigs):
    h = hashlib.sha256()
    for k in sorted(usigs):
        h.update(usigs[k].tobytes())
    return h.hexdigest()


def test_sketch_bits_pinned():
    rng = np.random.default_rng(123456)
    codes = rng.integers(0, 5, 500_000).astype(np.uint8)  # incl. invalid
    params = SketchParams(klist=(13, 17, 21), sketchsize64=32, bbits=12)
    usigs, _ = sketch_codes(codes, params)
    assert _digest(usigs) == SNAPSHOT_SHA256

    numpy_usigs, _ = sketch_codes(codes, params, use_native=False)
    assert _digest(numpy_usigs) == SNAPSHOT_SHA256
