"""Read (FASTQ) input path: gzip handling, k-mer count filtering, and the
reads-vs-assembly sketch agreement the filtering is meant to deliver."""

import gzip
import os

import numpy as np
import pytest

from poppunk_tpu.sketch.minhash import SketchParams, sketch_codes
from poppunk_tpu.sketch.reader import (filter_read_kmers,
                                       read_sequence_input)

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def write_fastq(path, reads, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@read{i}\n{r}\n+\n{'I' * len(r)}\n")


def simulate_reads(genome_codes, n_reads, read_len, rng, error_rate=0.0):
    reads = []
    L = genome_codes.shape[0]
    for _ in range(n_reads):
        start = rng.integers(0, L - read_len)
        r = genome_codes[start:start + read_len].copy()
        if error_rate:
            err = rng.random(read_len) < error_rate
            r[err] = (r[err] + rng.integers(1, 4, int(err.sum()))) % 4
        reads.append(_BASES[r].tobytes().decode())
    return reads


def test_fastq_parsing_and_gzip(tmp_path):
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 10_000).astype(np.uint8)
    reads = simulate_reads(genome, 50, 100, rng)
    fq = str(tmp_path / "r.fastq")
    fqgz = str(tmp_path / "r.fastq.gz")
    write_fastq(fq, reads)
    write_fastq(fqgz, reads, gz=True)
    codes1, len1, miss1, is_reads1 = read_sequence_input([fq])
    codes2, len2, miss2, is_reads2 = read_sequence_input([fqgz])
    assert is_reads1 and is_reads2
    assert len1 == len2 == 50 * 100
    assert np.array_equal(codes1, codes2)


def test_exact_filter_drops_singletons():
    h = np.array([1, 1, 2, 3, 3, 3], dtype=np.uint64)
    kept = filter_read_kmers(h, min_count=2, exact=True)
    assert sorted(set(kept.tolist())) == [1, 3]
    kept3 = filter_read_kmers(h, min_count=3, exact=True)
    assert sorted(set(kept3.tolist())) == [3]


def test_countmin_filter_approximates_exact():
    rng = np.random.default_rng(1)
    common = rng.integers(0, 2**63, 200, dtype=np.uint64)
    rare = rng.integers(0, 2**63, 5000, dtype=np.uint64)
    h = np.concatenate([np.repeat(common, 5), rare])
    rng.shuffle(h)
    kept = filter_read_kmers(h, min_count=3, exact=False)
    kept_set = set(kept.tolist())
    # all common k-mers survive; the vast majority of rare ones are dropped
    assert set(common.tolist()).issubset(kept_set)
    assert len(kept_set - set(common.tolist())) < 500


def test_reads_sketch_close_to_assembly(tmp_path):
    """Deep error-free reads of a genome must sketch (nearly) like the
    assembly once singleton noise k-mers are filtered."""
    from poppunk_tpu.ops.jaccard_np import (jaccard_from_matches,
                                            match_counts_np)

    rng = np.random.default_rng(2)
    genome = rng.integers(0, 4, 50_000).astype(np.uint8)
    reads_clean = simulate_reads(genome, 3000, 120, rng, error_rate=0.002)
    fq = str(tmp_path / "deep.fastq")
    write_fastq(fq, reads_clean)
    codes, length, missing, is_reads = read_sequence_input([fq])

    params = SketchParams(klist=(17,), sketchsize64=32, bbits=10,
                          min_count=3)
    asm_usigs, _ = sketch_codes(genome, params)
    read_usigs, _ = sketch_codes(codes, params, reads=True)

    m = match_counts_np(asm_usigs[17], read_usigs[17], 32, 10)
    j = jaccard_from_matches(m, 32, 10)
    assert j > 0.85, j
