"""Tests for the auxiliary CLIs: visualise, mst, info, references,
mandrake — counterpart of the visualise/MST/references/mandrake blocks of
the reference's test/run_test.py."""

import csv
import os

import pytest

from poppunk_tpu.cli.main import main as poppunk_main

KARGS = ["--min-k", "13", "--max-k", "25", "--k-step", "4",
         "--sketch-size", "2048", "--no-plot"]


@pytest.fixture(scope="module")
def fitted_db(population_dir, tmp_path_factory):
    d, rfile = population_dir
    db = str(tmp_path_factory.mktemp("tools") / "db")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", db] + KARGS)
    poppunk_main(["--fit-model", "bgmm", "--ref-db", db, "--output", db,
                  "--K", "2", "--no-plot"])
    return db


@pytest.fixture(scope="module")
def lineage_db(population_dir, tmp_path_factory):
    d, rfile = population_dir
    db = str(tmp_path_factory.mktemp("lin") / "db")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", db] + KARGS)
    poppunk_main(["--fit-model", "lineage", "--ranks", "1,2",
                  "--ref-db", db, "--output", db, "--no-plot"])
    return db


class TestVisualise:
    def test_microreact(self, fitted_db, tmp_path):
        from poppunk_tpu.cli.visualise import main as vis_main

        out = str(tmp_path / "viz")
        vis_main(["--ref-db", fitted_db, "--output", out, "--microreact",
                  "--tree", "both", "--maxIter", "10000"])
        base = os.path.join(out, "viz")
        assert os.path.isfile(base + "_microreact_clusters.csv")
        assert os.path.isfile(base + "_core_NJ.nwk")
        assert os.path.isfile(base + "_MST.nwk")
        assert os.path.isfile(base + ".microreact")
        # newick trees must contain every sample
        nwk = open(base + "_core_NJ.nwk").read()
        rows = list(csv.DictReader(open(base + "_microreact_clusters.csv")))
        for row in rows:
            assert row["id"].split("_iso")[0] in nwk

    def test_phandango_grapetree(self, fitted_db, tmp_path):
        from poppunk_tpu.cli.visualise import main as vis_main

        out = str(tmp_path / "pg")
        vis_main(["--ref-db", fitted_db, "--output", out, "--phandango",
                  "--grapetree", "--tree", "nj"])
        base = os.path.join(out, "pg")
        assert os.path.isfile(base + "_phandango_clusters.csv")
        assert os.path.isfile(base + "_grapetree_clusters.csv")
        assert os.path.isfile(base + "_core_NJ.tree")

    def test_cytoscape_with_network(self, fitted_db, tmp_path):
        from poppunk_tpu.cli.visualise import main as vis_main

        network = os.path.join(fitted_db, "db_graph.graph.npz")
        out = str(tmp_path / "cyto")
        vis_main(["--ref-db", fitted_db, "--output", out, "--cytoscape",
                  "--network-file", network])
        base = os.path.join(out, "cyto")
        assert os.path.isfile(base + "_cytoscape.graphml")
        assert os.path.isfile(base + "_cytoscape.csv")

    def test_include_files_subset(self, fitted_db, population, tmp_path):
        from poppunk_tpu.cli.visualise import main as vis_main

        subset = [n for n in population.names
                  if n.startswith(("strain0", "strain1"))]
        subset_file = str(tmp_path / "subset.txt")
        with open(subset_file, "w") as f:
            f.write("\n".join(subset) + "\n")
        out = str(tmp_path / "sub")
        vis_main(["--ref-db", fitted_db, "--output", out, "--microreact",
                  "--tree", "nj", "--include-files", subset_file,
                  "--maxIter", "10000"])
        rows = list(csv.DictReader(
            open(os.path.join(out, "sub_microreact_clusters.csv"))))
        assert sorted(r["id"] for r in rows) == sorted(subset)


class TestVisualiseWithQueries:
    def test_query_db_join(self, population, population_dir, fitted_db,
                           tmp_path):
        from poppunk_tpu.cli.assign import main as assign_main
        from poppunk_tpu.cli.visualise import main as vis_main

        d, _ = population_dir
        # use two of the fitted samples as "queries" under new names by
        # re-sketching their files with a _q suffix
        queries = [n for n in population.names if n.endswith("iso2")][:2]
        qfile = os.path.join(str(d), "viz_queries.txt")
        with open(qfile, "w") as f:
            for n in queries:
                f.write(f"{n}_q\t{os.path.join(str(d), n + '.fa')}\n")
        q_out = str(tmp_path / "qdb")
        assign_main(["--db", fitted_db, "--query", qfile,
                     "--output", q_out])
        out = str(tmp_path / "qviz")
        vis_main(["--ref-db", fitted_db, "--query-db", q_out,
                  "--output", out, "--microreact", "--tree", "nj",
                  "--maxIter", "10000", "--recalculate-distances"])
        rows = list(csv.DictReader(
            open(os.path.join(out, "qviz_microreact_clusters.csv"))))
        ids = {r["id"] for r in rows}
        assert {f"{n}_q" for n in queries}.issubset(ids)
        assert len(ids) == 15 + 2


class TestMST:
    def test_sparse_mst(self, lineage_db, tmp_path):
        from poppunk_tpu.cli.mst import main as mst_main

        out = str(tmp_path / "mst")
        mst_main(["--rank-fit", os.path.join(lineage_db, "db_rank_2_fit.npz"),
                  "--distance-pkl", os.path.join(lineage_db, "db.dists.pkl"),
                  "--previous-clustering",
                  os.path.join(lineage_db, "db_lineages.csv"),
                  "--output", out])
        base = os.path.join(out, "mst")
        assert os.path.isfile(base + "_MST.graphml")
        assert os.path.isfile(base + "_MST.nwk")


class TestInfo:
    def test_info(self, fitted_db, capsys):
        from poppunk_tpu.cli.info import main as info_main

        info_main(["--db", fitted_db])
        out = capsys.readouterr().out
        assert "Number of samples:\t\t15" in out
        assert "Sketch size:\t\t\t2048" in out
        assert "K-mer sizes:\t\t\t13,17,21,25" in out
        # per-sample lines
        assert "strain0_iso0" in out

    def test_info_simple(self, fitted_db, capsys):
        from poppunk_tpu.cli.info import main as info_main

        info_main(["--db", fitted_db, "--simple"])
        out = capsys.readouterr().out
        assert "strain0_iso0" not in out


class TestReferences:
    def test_reference_pick(self, fitted_db, tmp_path):
        from poppunk_tpu.cli.references import main as refs_main

        out = str(tmp_path / "refs")
        refs_main(["--network", os.path.join(fitted_db, "db_graph.graph.npz"),
                   "--distances", os.path.join(fitted_db, "db.dists"),
                   "--ref-db", fitted_db, "--output", out])
        base = os.path.join(out, "refs")
        assert os.path.isfile(base + ".refs")
        assert os.path.isfile(base + ".refs.dists.pkl")
        assert os.path.isfile(base + ".refs.h5")
        refs = open(base + ".refs").read().split()
        # one or more references per strain, fewer than all samples
        assert {r.split("_iso")[0] for r in refs} == \
            {f"strain{i}" for i in range(4)}
        assert len(refs) < 15


class TestLineages:
    def test_create_and_query(self, population, population_dir, tmp_path,
                              monkeypatch):
        from poppunk_tpu.cli.lineages import main as lineages_main

        d, _ = population_dir
        refs = [n for n in population.names if not n.endswith("iso1")]
        queries = [n for n in population.names if n.endswith("iso1")]
        rfile = population.subset_rfile(d, refs, "lin_refs.txt")
        qfile = population.subset_rfile(d, queries, "lin_queries.txt")

        db = str(tmp_path / "straindb")
        poppunk_main(["--create-db", "--r-files", rfile, "--output", db]
                     + KARGS)
        poppunk_main(["--fit-model", "bgmm", "--ref-db", db, "--output", db,
                      "--K", "2", "--no-plot"])

        # strain lineage DBs are created relative to the cwd
        monkeypatch.chdir(tmp_path)
        scheme = str(tmp_path / "scheme.pkl")
        out_prefix = str(tmp_path / "lineage_create")
        lineages_main(["--create-db", db, "--db-scheme", scheme,
                       "--output", out_prefix, "--ranks", "1,2",
                       "--min-count", "2", "--overwrite"])
        assert os.path.isfile(scheme)
        assert os.path.isfile(out_prefix + ".csv")
        with open(out_prefix + ".csv") as f:
            header = f.readline().strip().split(",")
        assert header[:2] == ["id", "Cluster"]

        q_out = str(tmp_path / "lineage_query")
        lineages_main(["--query-db", qfile, "--db-scheme", scheme,
                       "--output", q_out])
        assert os.path.isfile(q_out + ".csv")
        rows = [line.strip().split(",") for line in open(q_out + ".csv")][1:]
        assigned = {r[0]: r[1] for r in rows}
        assert set(assigned) == set(queries)


class TestMandrake:
    def test_embedding_dot(self, fitted_db, tmp_path):
        from poppunk_tpu.cli.mandrake import main as mandrake_main

        out = str(tmp_path / "emb")
        mandrake_main(["--distances", os.path.join(fitted_db, "db.dists"),
                       "--output", out, "--perplexity", "5",
                       "--knn", "5", "--iter", "10000"])
        dots = [f for f in os.listdir(out) if f.endswith("_mandrake.dot")]
        assert len(dots) == 1
        text = open(os.path.join(out, dots[0])).read()
        assert text.startswith("graph G {")
