"""Format-compatibility against the reference's real pp-sketchlib sketch
(test/json_sketch.txt — a 2.2 Mbp S. pneumoniae genome sketched at
k=13..28, sketch size 9984, bbits 14). Our HDF5 schema, plane packing and
distance engine must consume it directly."""

import json
import os

import numpy as np
import pytest

FIXTURE = "/root/reference/test/json_sketch.txt"

pytestmark = pytest.mark.skipif(not os.path.isfile(FIXTURE),
                                reason="reference fixture not available")


@pytest.fixture(scope="module")
def ref_sketch(tmp_path_factory):
    from poppunk_tpu.io.hdf5db import read_sketches
    from poppunk_tpu.web import sketch_to_hdf5

    doc = json.load(open(FIXTURE))
    out = str(tmp_path_factory.mktemp("fixture") / "refdb")
    names = sketch_to_hdf5({"ref_sample": doc}, out)
    assert names == ["ref_sample"]
    return read_sketches(out, names)[0]


def test_geometry(ref_sketch):
    assert ref_sketch.sketchsize64 == 156
    assert ref_sketch.bbits == 14
    assert ref_sketch.length == 2221315
    assert sorted(ref_sketch.usigs) == [13, 16, 19, 22, 25, 28]
    for k, usigs in ref_sketch.usigs.items():
        assert usigs.shape == (156 * 14,)
        assert usigs.dtype == np.uint64


def test_self_distance_zero(ref_sketch):
    """A pp-sketchlib sketch against itself: perfect bin matches at every
    k => Jaccard 1 => core = accessory = 0."""
    from poppunk_tpu.ops.distances import query_db

    klist = sorted(ref_sketch.usigs)
    j = query_db([ref_sketch, ref_sketch], None, klist, self_mode=True,
                 jaccard=True, random_correct=False, use_pallas=False)
    np.testing.assert_allclose(np.asarray(j)[0], 1.0, atol=1e-6)
    d = query_db([ref_sketch, ref_sketch], None, klist, self_mode=True,
                 random_correct=False, use_pallas=False)
    np.testing.assert_allclose(np.asarray(d)[0], 0.0, atol=1e-6)


def test_against_perturbed_copy(ref_sketch):
    """Flipping a fraction of sketch bins lowers the Jaccard accordingly —
    checks the bin-match counting against pp-sketchlib's packing."""
    from poppunk_tpu.ops.distances import query_db
    from poppunk_tpu.sketch.minhash import Sketch, pack_bbits, unpack_bbits

    rng = np.random.default_rng(0)
    k = 19
    vals = unpack_bbits(ref_sketch.usigs[k], 156, 14)
    n_flip = len(vals) // 4
    idx = rng.choice(len(vals), n_flip, replace=False)
    vals2 = vals.copy()
    vals2[idx] ^= np.uint64(0x1FFF)  # change those bins' values
    other = Sketch(name="mut", usigs={k: pack_bbits(vals2, 156, 14)},
                   sketchsize64=156, bbits=14, length=ref_sketch.length,
                   missing_bases=0, base_freq=ref_sketch.base_freq)
    me = Sketch(name="me", usigs={k: ref_sketch.usigs[k]},
                sketchsize64=156, bbits=14, length=ref_sketch.length,
                missing_bases=0, base_freq=ref_sketch.base_freq)
    j = np.asarray(query_db([me, other], None, [k], self_mode=True,
                            jaccard=True, random_correct=False,
                            use_pallas=False))[0, 0]
    # raw bin agreement is 75%; collision-corrected Jaccard
    expected = (0.75 - 2.0 ** -14) / (1 - 2.0 ** -14)
    assert abs(j - expected) < 0.01
