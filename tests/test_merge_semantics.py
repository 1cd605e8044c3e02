"""End-to-end cluster-merge nomenclature: a query genome intermediate
between two strains must merge their clusters with an underscore-joined
name (printClusters semantics, reference network.py:1560-1610) and
--update-db must propagate the merged name."""

import csv
import os

import numpy as np
import pytest

from poppunk_tpu.cli.assign import main as assign_main
from poppunk_tpu.cli.main import main as poppunk_main

KARGS = ["--min-k", "13", "--max-k", "25", "--k-step", "4",
         "--sketch-size", "2048", "--no-plot"]


def read_clusters(csv_path):
    with open(csv_path) as f:
        return dict(list(csv.reader(f))[1:])


@pytest.fixture(scope="module")
def merge_setup(tmp_path_factory):
    """Two close strains + one distant, plus a hybrid query genome built
    from halves of strain0 and strain1 root genomes (within-strain
    distance to both)."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from synth_genomes import SyntheticPopulation, _BASES

    d = tmp_path_factory.mktemp("merge")
    pop = SyntheticPopulation(
        n_strains=3, genomes_per_strain=(4, 4, 4), genome_length=60_000,
        core_mutation_rate=0.006, between_divergence=0.02,
        accessory_pool=20, accessory_gene_len=1500, seed=99)
    rfile = pop.write_fastas(d)

    # hybrid: mosaic of strain0_iso0 and strain1_iso0 (alternating blocks)
    g0 = pop.genomes[pop.names.index("strain0_iso0")]
    g1 = pop.genomes[pop.names.index("strain1_iso0")]
    L = min(len(g0), len(g1))
    hybrid = g0[:L].copy()
    block = 2000
    for start in range(0, L, 2 * block):
        hybrid[start:start + block] = g1[start:start + block]
    path = os.path.join(str(d), "hybrid.fa")
    seq = _BASES[hybrid].tobytes().decode()
    with open(path, "w") as f:
        f.write(">hybrid\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")
    qfile = os.path.join(str(d), "hybrid_q.txt")
    with open(qfile, "w") as f:
        f.write(f"hybrid\t{path}\n")

    db = str(d / "db")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", db] + KARGS)
    poppunk_main(["--fit-model", "bgmm", "--ref-db", db, "--output", db,
                  "--K", "2", "--no-plot"])
    ref_clusters = read_clusters(os.path.join(db, "db_clusters.csv"))
    return d, db, qfile, ref_clusters


def test_merge_reported(merge_setup, tmp_path):
    d, db, qfile, ref_clusters = merge_setup
    c0 = ref_clusters["strain0_iso0"]
    c1 = ref_clusters["strain1_iso0"]
    assert c0 != c1

    out = str(tmp_path / "m")
    assign_main(["--db", db, "--query", qfile, "--output", out,
                 "--use-full-network"])
    got = read_clusters(os.path.join(out, "m_clusters.csv"))
    merged_name = got["hybrid"]
    assert set(merged_name.split("_")) == {c0, c1}, merged_name


def test_merge_survives_update(merge_setup, tmp_path):
    d, db, qfile, ref_clusters = merge_setup
    c0 = ref_clusters["strain0_iso0"]
    c1 = ref_clusters["strain1_iso0"]
    up = str(tmp_path / "up")
    assign_main(["--db", db, "--query", qfile, "--output", up,
                 "--update-db", "full", "--use-full-network"])
    got = read_clusters(os.path.join(up, "up_clusters.csv"))
    merged_name = got["hybrid"]
    assert set(merged_name.split("_")) == {c0, c1}
    # every old member of both strains now reports the merged name
    for name, cl in got.items():
        if name.startswith(("strain0", "strain1")) or name == "hybrid":
            assert cl == merged_name, (name, cl)
        elif name.startswith("strain2"):
            assert cl == ref_clusters["strain2_iso0"]
