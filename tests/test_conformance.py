"""pp-sketchlib conformance harness (tests/conformance/).

The committed FASTA/FASTQ inputs and expected.json pin the full
sketch -> distance pipeline at production geometry (sketchsize64=156,
bbits=14, k=13..28) for both the native C++ core and the numpy twin;
when a pp_sketchlib wheel is importable the same harness cross-validates
bit-exactness against the reference implementation itself
(PopPUNK/sketchlib.py:348-434, 635-670). One-command form:
``python tests/conformance/validate.py``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "conformance"))

import validate  # noqa: E402


def test_pipeline_matches_frozen_fixture():
    exp = validate.load_expected()
    assert validate.check_ours(exp) == []


def test_pp_sketchlib_cross_check_if_available():
    import pytest

    exp = validate.load_expected()
    res = validate.check_pp_sketchlib(exp)
    if res is None:
        pytest.skip("pp_sketchlib wheel not importable in this sandbox")
    assert res == []
