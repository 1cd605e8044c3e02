"""Codon-phased spaced-seed sketching (--codon-phased): hashing every
third base makes the sketch robust to third-position (synonymous)
mutations — the seed's purpose (reference kmerGroup, __main__.py:81)."""

import numpy as np
import pytest

from poppunk_tpu.sketch.minhash import SketchParams, Sketch, sketch_codes
from poppunk_tpu.ops.jaccard_np import jaccard_from_matches, match_counts_np


def _jaccard(u1, u2, ss64, bbits):
    return jaccard_from_matches(match_counts_np(u1, u2, ss64, bbits),
                                ss64, bbits)


def test_third_position_invariance():
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 60_000).astype(np.uint8)
    mutated = genome.copy()
    # mutate ONLY positions in one phase class (codon third positions)
    third = np.arange(2, len(genome), 3)
    flip = third[rng.random(third.shape[0]) < 0.2]
    mutated[flip] = (mutated[flip] + rng.integers(1, 4, flip.shape[0])) % 4

    plain = SketchParams(klist=(15,), sketchsize64=16, bbits=10,
                         codon_phased=False)
    phased = SketchParams(klist=(15,), sketchsize64=16, bbits=10,
                          codon_phased=True)

    up1, _ = sketch_codes(genome, plain)
    up2, _ = sketch_codes(mutated, plain)
    j_plain = _jaccard(up1[15], up2[15], 16, 10)

    uc1, _ = sketch_codes(genome, phased)
    uc2, _ = sketch_codes(mutated, phased)
    j_phased = _jaccard(uc1[15], uc2[15], 16, 10)

    # plain k=15 windows mostly hit a mutated third position; two of the
    # three phased seed classes sample only untouched positions, so the
    # union Jaccard sits near (2 + eps) / (3 + ~1.8) ~ 0.5
    assert j_plain < 0.3, j_plain
    assert j_phased > 0.4, j_phased
    assert j_phased > 2 * j_plain


def test_codon_phased_cli(population_dir, tmp_path):
    from poppunk_tpu.cli.main import main as poppunk_main
    import h5py
    import os

    d, rfile = population_dir
    out = str(tmp_path / "codondb")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", out,
                  "--min-k", "5", "--max-k", "9", "--k-step", "2",
                  "--sketch-size", "1024", "--codon-phased", "--no-plot"])
    with h5py.File(os.path.join(out, "codondb.h5")) as db:
        assert bool(db["sketches"].attrs["codon_phased"])
    assert os.path.isfile(os.path.join(out, "codondb.dists.npy"))
