"""Remaining flag combinations from the reference's run_test.py matrix:
auto-max-dists QC, single-query update-db with graph weights, and assign
QC pruning of outlier queries."""

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
def fitted(population, population_dir, tmp_path_factory):
    d, _ = population_dir
    refs = [n for n in population.names if not n.endswith("iso0")]
    queries = [n for n in population.names if n.endswith("iso0")]
    rfile = population.subset_rfile(d, refs, "fm_refs.txt")
    db = str(tmp_path_factory.mktemp("fm") / "db")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", db] + KARGS)
    poppunk_main(["--fit-model", "bgmm", "--ref-db", db, "--output", db,
                  "--K", "2", "--no-plot"])
    return db, refs, queries


def test_qc_auto_max_dists(fitted, tmp_path):
    db, refs, queries = fitted
    out = str(tmp_path / "autoqc")
    poppunk_main(["--qc-db", "--ref-db", db, "--output", out,
                  "--auto-max-dists", "both"])
    # the synthetic population has no outliers; everything passes
    assert os.path.isfile(os.path.join(out, "autoqc.dists.pkl")) or \
        not os.path.isfile(os.path.join(out, "autoqc_qcreport.txt"))


def test_single_query_update_graph_weights(fitted, population,
                                           population_dir, tmp_path):
    db, refs, queries = fitted
    d, _ = population_dir
    one = population.subset_rfile(d, [queries[0]], "fm_one.txt")
    up = str(tmp_path / "one_up")
    assign_main(["--db", db, "--query", one, "--output", up,
                 "--update-db", "full", "--graph-weights"])
    from poppunk_tpu.network.graph import load_network_file
    from poppunk_tpu.utils import read_pickle

    G = load_network_file(os.path.join(up, "one_up_graph.graph.npz"))
    assert G.weights is not None
    combined = read_pickle(os.path.join(up, "one_up.dists"),
                           distances=False)[0]
    assert queries[0] in combined


def test_assign_qc_prunes_outlier(fitted, population, population_dir,
                                  tmp_path):
    db, refs, queries = fitted
    d, _ = population_dir
    qfile = population.subset_rfile(
        d, [q for q in queries if not q.startswith("strain3")],
        "fm_queries.txt")
    out = str(tmp_path / "pruned")
    # absurd length range: every query fails sketch QC -> exit
    with pytest.raises(SystemExit):
        assign_main(["--db", db, "--query", qfile, "--output", out,
                     "--run-qc", "--length-range", "1", "2"])
    report = os.path.join(out, "pruned_qcreport.txt")
    assert os.path.isfile(report)

    # tight core cutoff: strain-different pairs trip QC but same-strain
    # queries survive
    out2 = str(tmp_path / "ok")
    assign_main(["--db", db, "--query", qfile, "--output", out2,
                 "--run-qc", "--max-pi-dist", "0.5", "--max-a-dist", "0.9",
                 "--max-zero-dist", "1"])
    got = read_clusters(os.path.join(out2, "ok_clusters.csv"))
    assert len(got) == 3
