"""Assigning with a refined model, including the core-only / accessory-only
boundary variants (fit_type core_refined/accessory_refined,
reference assign.py:444-2nd loop)."""

import csv
import os

import pytest

from poppunk_tpu.cli.assign import main as assign_main
from poppunk_tpu.cli.main import main as poppunk_main

KARGS = ["--min-k", "13", "--max-k", "25", "--k-step", "4",
         "--sketch-size", "2048", "--no-plot"]


def read_clusters(csv_path):
    with open(csv_path) as f:
        return dict(list(csv.reader(f))[1:])


@pytest.fixture(scope="module")
def refine_db(population, population_dir, tmp_path_factory):
    d, _ = population_dir
    refs = [n for n in population.names if not n.endswith("iso0")]
    queries = [n for n in population.names if n.endswith("iso0")]
    rfile = population.subset_rfile(d, refs, "ref_refine.txt")
    qfile = population.subset_rfile(d, queries, "q_refine.txt")
    db = str(tmp_path_factory.mktemp("refdb") / "db")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", db] + KARGS)
    poppunk_main(["--fit-model", "bgmm", "--ref-db", db, "--output", db,
                  "--K", "2", "--no-plot"])
    poppunk_main(["--fit-model", "refine", "--ref-db", db, "--output", db,
                  "--model-dir", db, "--indiv-refine", "both", "--no-plot"])
    return db, qfile, refs, queries


def test_assign_with_refine_model(refine_db, tmp_path):
    db, qfile, refs, queries = refine_db
    out = str(tmp_path / "rq")
    assign_main(["--db", db, "--query", qfile, "--output", out])
    got = read_clusters(os.path.join(out, "rq_clusters.csv"))
    assert set(got) == set(queries)
    ref_clusters = read_clusters(os.path.join(db, "db_clusters.csv"))
    old_ids = set(ref_clusters.values())
    for q in queries:
        # a query may join one of its own strain's clusters, merge several
        # of them, or fall outside the (tight) refined boundary entirely
        # and get a new id — but must NEVER take another strain's cluster
        same = {ref_clusters[r] for r in refs
                if r.split("_iso")[0] == q.split("_iso")[0]}
        other = old_ids - same
        got_parts = set(got[q].split("_"))
        assert not (got_parts & other), (q, got[q], same, other)


def test_assign_core_accessory_variants(refine_db, tmp_path):
    db, qfile, refs, queries = refine_db
    out = str(tmp_path / "rca")
    assign_main(["--db", db, "--query", qfile, "--output", out,
                 "--core", "--accessory"])
    # three cluster files: default + per-boundary variants
    assert os.path.isfile(os.path.join(out, "rca_clusters.csv"))
    assert os.path.isfile(os.path.join(out, "rca_core_refined_clusters.csv"))
    assert os.path.isfile(
        os.path.join(out, "rca_accessory_refined_clusters.csv"))
    core_got = read_clusters(
        os.path.join(out, "rca_core_refined_clusters.csv"))
    assert set(core_got) == set(queries)
