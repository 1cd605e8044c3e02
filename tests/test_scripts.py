"""Tests for the helper scripts (reference scripts/ equivalents)."""

import os

import numpy as np
import pytest

from poppunk_tpu.cli.main import main as poppunk_main

KARGS = ["--min-k", "13", "--max-k", "25", "--k-step", "4",
         "--sketch-size", "2048", "--no-plot"]


@pytest.fixture(scope="module")
def fitted_db(population_dir, tmp_path_factory):
    d, rfile = population_dir
    db = str(tmp_path_factory.mktemp("scripts") / "db")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", db] + KARGS)
    poppunk_main(["--fit-model", "bgmm", "--ref-db", db, "--output", db,
                  "--K", "2", "--no-plot"])
    return db


def test_rand_index(fitted_db, tmp_path):
    from poppunk_tpu.scripts.rand_index import main as rand_main

    csv1 = os.path.join(fitted_db, "db_clusters.csv")
    out = str(tmp_path / "rand.tsv")
    rand_main(["--input", f"{csv1},{csv1}", "--adjusted", "--output", out])
    lines = open(out).read().splitlines()
    fields = lines[1].split("\t")
    assert float(fields[3]) == 1.0 and float(fields[4]) == 1.0


def test_silhouette(fitted_db):
    from poppunk_tpu.scripts.silhouette import main as sil_main

    score = sil_main(["--distances", os.path.join(fitted_db, "db.dists"),
                      "--cluster-csv",
                      os.path.join(fitted_db, "db_clusters.csv")])
    assert score > 0.5  # strains are well separated


def test_extract_components(fitted_db, tmp_path):
    from poppunk_tpu.scripts.extract_components import main as ec_main

    out = str(tmp_path / "comp")
    ec_main(["--graph", os.path.join(fitted_db, "db_graph.graph.npz"),
             "--output", out])
    comps = [f for f in os.listdir(tmp_path)
             if f.startswith("comp.component_")]
    assert len(comps) == 4


def test_extract_distances(fitted_db, tmp_path):
    from poppunk_tpu.scripts.extract_distances import main as ed_main

    out = str(tmp_path / "dists.tsv")
    ed_main(["--distances", os.path.join(fitted_db, "db.dists"),
             "--output", out])
    lines = open(out).read().splitlines()
    assert lines[0] == "Query\tSubject\tCore\tAccessory"
    assert len(lines) == 1 + 15 * 14 // 2


def test_add_weights(fitted_db, tmp_path, monkeypatch):
    from poppunk_tpu.network.graph import load_network_file
    from poppunk_tpu.scripts.add_weights import main as aw_main

    out = str(tmp_path / "weighted")
    aw_main([os.path.join(fitted_db, "db_graph.graph.npz"),
             os.path.join(fitted_db, "db.dists"), out])
    G = load_network_file(os.path.join(out, "weighted_graph.graph.npz"))
    assert G.weights is not None and (G.weights > 0).all()


def test_distribute_fit(fitted_db, tmp_path, monkeypatch):
    from poppunk_tpu.scripts.distribute_fit import main as df_main

    monkeypatch.chdir(tmp_path)
    df_main(["--dbdir", fitted_db, "--fitdir", fitted_db,
             "--outpref", "bundle", "--no-compress"])
    full = os.listdir("bundle_full")
    assert "bundle_full.h5" in full
    assert "bundle_full_fit.npz" in full
    refs = os.listdir("bundle_refs")
    assert "bundle_refs.h5" in refs


def test_batch_mst(population, population_dir, tmp_path, monkeypatch):
    """Batched lineage build + sparse MST driver
    (scripts/poppunk_batch_mst.py flow)."""
    from poppunk_tpu.scripts.batch_mst import main as batch_main

    d, rfile = population_dir
    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "bmst")
    batch_main(["--r-files", rfile, "--n-batches", "2", "--output", out,
                "--rank", "3", "--sketch-size", "2048", "--min-k", "13",
                "--max-k", "25", "--k-step", "4", "--no-plot"])
    assert os.path.isfile(out + "/bmst_MST.nwk")
    nwk = open(out + "/bmst_MST.nwk").read()
    for name in population.names:
        assert name in nwk, name


def test_iterate(population_dir, tmp_path):
    from poppunk_tpu.scripts.iterate import main as it_main

    d, rfile = population_dir
    db = str(tmp_path / "multi")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", db] + KARGS)
    poppunk_main(["--fit-model", "bgmm", "--ref-db", db, "--output", db,
                  "--K", "2", "--no-plot"])
    poppunk_main(["--fit-model", "refine", "--ref-db", db, "--output", db,
                  "--multi-boundary", "4", "--no-plot"])
    boundary_files = [f for f in os.listdir(db)
                      if "_boundary" in f and f.endswith("_clusters.csv")]
    assert boundary_files, "multi-boundary output missing"
    it_main(["--db", db, "--cutoff", "0.5"])
    assert os.path.isfile(os.path.join(db, "multi_iterate.tree.nwk"))
    assert os.path.isfile(os.path.join(db, "multi_iterate.clusters.csv"))
    assert os.path.isfile(os.path.join(db, "multi_iterate.cutoff_clusters.csv"))


def test_easy_run(population_dir, tmp_path):
    """create-db -> dbscan -> refine convenience driver
    (scripts/poppunk_easy_run.py)."""
    import os

    from poppunk_tpu.scripts.easy_run import main as easy_main

    d, rfile = population_dir
    out = str(tmp_path / "easy")
    easy_main(["--r-files", rfile, "--output", out,
               "--analysis-args",
               "--min-k 13 --max-k 21 --k-step 4 --sketch-size 1024 "
               "--no-plot --K 2"])
    base = os.path.join(out, "easy")
    assert os.path.isfile(base + "_fit.npz")
    assert os.path.isfile(base + "_clusters.csv")
