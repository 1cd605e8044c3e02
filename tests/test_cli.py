"""End-to-end CLI tests — the counterpart of the reference's
test/run_test.py integration matrix, with cluster-correctness assertions
(the reference only checks exit codes)."""

import csv
import os

import numpy as np
import pytest

from poppunk_tpu.cli.main import main as poppunk_main

KARGS = ["--min-k", "13", "--max-k", "25", "--k-step", "4",
         "--sketch-size", "2048", "--no-plot"]


def read_clusters(csv_path):
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["Taxon", "Cluster"]
    return {name: cl for name, cl in rows[1:]}


def strains_by_cluster(clustering):
    out = {}
    for name, cl in clustering.items():
        out.setdefault(cl, set()).add(name.split("_iso")[0])
    return out


@pytest.fixture(scope="module")
def db(population, population_dir, tmp_path_factory):
    """A built sketch database + distances for the synthetic population."""
    d, rfile = population_dir
    out = str(tmp_path_factory.mktemp("cli") / "db")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", out] + KARGS)
    return out


class TestCreateDB:
    def test_artefacts(self, db):
        base = os.path.join(db, os.path.basename(db))
        assert os.path.isfile(base + ".h5")
        assert os.path.isfile(base + ".dists.pkl")
        assert os.path.isfile(base + ".dists.npy")

    def test_distance_structure(self, db, population):
        from poppunk_tpu.utils import read_pickle

        base = os.path.join(db, os.path.basename(db))
        rlist, qlist, self_mode, X = read_pickle(base + ".dists")
        n = len(population.names)
        assert self_mode and rlist == qlist
        assert X.shape == (n * (n - 1) // 2, 2)
        # within-strain core distances must be smaller than between-strain
        from poppunk_tpu.pairs import all_pairs

        i, j = all_pairs(n)
        same = np.array([
            population.strain_of[rlist[a]] == population.strain_of[rlist[b]]
            for a, b in zip(i, j)
        ])
        assert X[same, 0].max() < X[~same, 0].min()


class TestFitModels:
    def _check_perfect_clusters(self, clustering, population):
        by_cluster = strains_by_cluster(clustering)
        assert len(by_cluster) == 4
        for members in by_cluster.values():
            assert len(members) == 1

    def test_bgmm(self, db, population, tmp_path):
        out = str(tmp_path / "bgmm")
        poppunk_main(["--fit-model", "bgmm", "--ref-db", db, "--output", out,
                      "--K", "2", "--no-plot"])
        clustering = read_clusters(
            os.path.join(out, "bgmm_clusters.csv"))
        self._check_perfect_clusters(clustering, population)
        base = os.path.join(out, "bgmm")
        assert os.path.isfile(base + "_fit.pkl")
        assert os.path.isfile(base + "_fit.npz")
        assert os.path.isfile(base + "_graph.graph.npz")
        assert os.path.isfile(base + ".refs")
        # refs cover every cluster
        refs = open(base + ".refs").read().split()
        assert {r.split("_iso")[0] for r in refs} == \
            {f"strain{s}" for s in range(4)}

    def test_dbscan(self, db, population, tmp_path):
        out = str(tmp_path / "dbscan")
        poppunk_main(["--fit-model", "dbscan", "--ref-db", db,
                      "--output", out, "--no-plot"])
        clustering = read_clusters(os.path.join(out, "dbscan_clusters.csv"))
        self._check_perfect_clusters(clustering, population)

    def test_dbscan_for_refine_then_refine(self, db, population, tmp_path):
        """--for-refine skips assignment/network (reference
        __main__.py:630-632); the fit is then usable as a refine start."""
        out = str(tmp_path / "dbscan_fr")
        poppunk_main(["--fit-model", "dbscan", "--ref-db", db,
                      "--output", out, "--for-refine", "--no-plot"])
        assert not os.path.isfile(os.path.join(out, "dbscan_fr_clusters.csv"))
        assert os.path.isfile(os.path.join(out, "dbscan_fr_fit.npz"))
        rf = str(tmp_path / "rf_from_dbscan")
        poppunk_main(["--fit-model", "refine", "--ref-db", db,
                      "--output", rf, "--model-dir", out, "--no-plot"])
        clustering = read_clusters(
            os.path.join(rf, "rf_from_dbscan_clusters.csv"))
        self._check_strain_pure(clustering, population)

    def _check_strain_pure(self, clustering, population, max_clusters=10):
        """Refine may legitimately choose a tighter boundary than the strain
        split on synthetic data (higher transitivity for sub-cliques); the
        invariant is that no cluster may MIX strains."""
        by_cluster = strains_by_cluster(clustering)
        assert 4 <= len(by_cluster) <= max_clusters
        for members in by_cluster.values():
            assert len(members) == 1

    def test_refine(self, db, population, tmp_path):
        bgmm_out = str(tmp_path / "bgmm_for_refine")
        poppunk_main(["--fit-model", "bgmm", "--ref-db", db,
                      "--output", bgmm_out, "--K", "2", "--no-plot"])
        out = str(tmp_path / "refine")
        poppunk_main(["--fit-model", "refine", "--ref-db", db,
                      "--output", out, "--model-dir", bgmm_out, "--no-plot"])
        clustering = read_clusters(os.path.join(out, "refine_clusters.csv"))
        self._check_strain_pure(clustering, population)

    def test_refine_indiv_and_unconstrained(self, db, population, tmp_path):
        bgmm_out = str(tmp_path / "bgmm_s")
        poppunk_main(["--fit-model", "bgmm", "--ref-db", db,
                      "--output", bgmm_out, "--K", "2", "--no-plot"])
        out = str(tmp_path / "refine_iu")
        poppunk_main(["--fit-model", "refine", "--ref-db", db,
                      "--output", out, "--model-dir", bgmm_out,
                      "--indiv-refine", "both", "--no-plot"])
        for suffix in ("", "_core", "_accessory"):
            clustering = read_clusters(
                os.path.join(out, f"refine_iu{suffix}_clusters.csv"))
            self._check_strain_pure(clustering, population)
        out2 = str(tmp_path / "refine_u")
        poppunk_main(["--fit-model", "refine", "--ref-db", db,
                      "--output", out2, "--model-dir", bgmm_out,
                      "--unconstrained", "--pos-shift", "0.05", "--no-plot"])
        clustering = read_clusters(
            os.path.join(out2, "refine_u_clusters.csv"))
        self._check_strain_pure(clustering, population)

    def test_refine_variants(self, db, population, tmp_path):
        """Manual start file, betweenness score indices, --summary-sample,
        --no-local (the reference's refine matrix, run_test.py:43-52)."""
        bgmm_out = str(tmp_path / "bgmm_v")
        poppunk_main(["--fit-model", "bgmm", "--ref-db", db,
                      "--output", bgmm_out, "--K", "2", "--no-plot"])
        manual = str(tmp_path / "manual.txt")
        with open(manual, "w") as f:
            f.write("start 0.05,0.05\nend 0.6,0.6\nscaled True\n")
        for name, extra in [
            ("manual", ["--manual-start", manual]),
            ("score1", ["--score-idx", "1"]),
            ("score2", ["--score-idx", "2", "--betweenness-sample", "10"]),
            ("summary", ["--summary-sample", "12", "--no-local"]),
        ]:
            out = str(tmp_path / f"rv_{name}")
            poppunk_main(["--fit-model", "refine", "--ref-db", db,
                          "--output", out, "--model-dir", bgmm_out,
                          "--no-plot"] + extra)
            clustering = read_clusters(
                os.path.join(out, f"rv_{name}_clusters.csv"))
            self._check_strain_pure(clustering, population, max_clusters=12)

    def test_threshold(self, db, population, tmp_path):
        out = str(tmp_path / "thresh")
        poppunk_main(["--fit-model", "threshold", "--threshold", "0.02",
                      "--ref-db", db, "--output", out, "--no-plot"])
        clustering = read_clusters(os.path.join(out, "thresh_clusters.csv"))
        self._check_perfect_clusters(clustering, population)

    def test_lineage(self, db, population, tmp_path):
        out = str(tmp_path / "lineage")
        poppunk_main(["--fit-model", "lineage", "--ranks", "1,2",
                      "--ref-db", db, "--output", out, "--no-plot"])
        base = os.path.join(out, "lineage")
        assert os.path.isfile(base + "_sparse_dists.npz")
        assert os.path.isfile(base + "_rank_1_fit.npz")
        assert os.path.isfile(base + "_rank_2_fit.npz")
        assert os.path.isfile(base + "_lineages.csv")
        with open(base + "_lineages.csv") as f:
            header = f.readline().strip().split(",")
        assert header == ["id", "Rank_1", "Rank_2", "overall"]

    def test_use_model(self, db, population, tmp_path):
        fit_out = str(tmp_path / "first_fit")
        poppunk_main(["--fit-model", "bgmm", "--ref-db", db,
                      "--output", fit_out, "--K", "2", "--no-plot"])
        out = str(tmp_path / "reused")
        poppunk_main(["--use-model", "--ref-db", db, "--output", out,
                      "--model-dir", fit_out, "--no-plot"])
        c1 = read_clusters(os.path.join(fit_out, "first_fit_clusters.csv"))
        c2 = read_clusters(os.path.join(out, "reused_clusters.csv"))
        # same partition (names may renumber but here sizes are distinct)
        p1 = strains_by_cluster(c1)
        p2 = strains_by_cluster(c2)
        assert sorted(map(sorted, p1.values())) == \
            sorted(map(sorted, p2.values()))


class TestPlots:
    def test_create_db_and_fit_plots(self, population_dir, tmp_path):
        d, rfile = population_dir
        out = str(tmp_path / "plotdb")
        poppunk_main(["--create-db", "--r-files", rfile, "--output", out,
                      "--min-k", "13", "--max-k", "21", "--k-step", "4",
                      "--sketch-size", "1024", "--plot-fit", "1"])
        base = os.path.join(out, "plotdb")
        for suffix in ("_distanceDistribution.png", "_genome_lengths.png",
                       "_ambiguous_base_counts.png", "_fit_example_1.pdf"):
            assert os.path.isfile(base + suffix), suffix
        poppunk_main(["--fit-model", "bgmm", "--ref-db", out,
                      "--output", out, "--K", "2"])
        assert os.path.isfile(base + "_DPGMM_fit.png")
        assert os.path.isfile(base + "_DPGMM_fit_contours.pdf")

    def test_model_plots(self, db, tmp_path):
        d1 = str(tmp_path / "dbp")
        poppunk_main(["--fit-model", "dbscan", "--ref-db", db,
                      "--output", d1])
        assert os.path.isfile(os.path.join(d1, "dbp_dbscan.png"))
        d2 = str(tmp_path / "rfp")
        poppunk_main(["--fit-model", "refine", "--ref-db", db,
                      "--output", d2, "--model-dir", d1])
        assert os.path.isfile(os.path.join(d2, "rfp_refined_fit.png"))
        d3 = str(tmp_path / "linp")
        poppunk_main(["--fit-model", "lineage", "--ranks", "1,2",
                      "--ref-db", db, "--output", d3])
        hist = [f for f in os.listdir(d3) if "histogram" in f
                or "rank" in f and f.endswith(".png")]
        assert hist, os.listdir(d3)


class TestQCDB:
    def test_qc_passes_all(self, db, tmp_path, capsys):
        out = str(tmp_path / "qced")
        poppunk_main(["--qc-db", "--ref-db", db, "--output", out])
        # all synthetic genomes pass the default thresholds: dists copied
        assert os.path.isfile(os.path.join(out, "qced.dists.pkl"))

    def test_qc_retain_failures(self, db, population, tmp_path):
        out = str(tmp_path / "qcretain")
        poppunk_main(["--qc-db", "--ref-db", db, "--output", out,
                      "--length-range", "1", "2", "--retain-failures"])
        failed_h5 = os.path.join(out, "failed.qcretain.h5")
        assert os.path.isfile(failed_h5)
        from poppunk_tpu.io.hdf5db import get_seqs_in_db

        # nobody passes the absurd length range; the retained-failures DB
        # keeps every failing sketch
        assert sorted(get_seqs_in_db(failed_h5)) == sorted(population.names)

    def test_graph_weights_stored(self, db, tmp_path):
        out = str(tmp_path / "weighted")
        poppunk_main(["--fit-model", "bgmm", "--ref-db", db,
                      "--output", out, "--K", "2", "--no-plot",
                      "--graph-weights"])
        from poppunk_tpu.network.graph import load_network_file

        G = load_network_file(os.path.join(out, "weighted_graph.graph.npz"))
        assert G.weights is not None
        assert (G.weights >= 0).all() and G.n_edges > 0

    def test_qc_length_filter(self, db, population, tmp_path):
        out = str(tmp_path / "qcfail")
        poppunk_main(["--qc-db", "--ref-db", db, "--output", out,
                      "--length-range", "1", "2"])
        report = os.path.join(out, "qcfail_qcreport.txt")
        assert os.path.isfile(report)
        failed = [line.split("\t")[0] for line in open(report)]
        assert len(failed) == len(population.names)


def test_external_clustering(population, population_dir, tmp_path):
    """--external-clustering relates strain components to external labels
    (reference run_test.py:91)."""
    import pandas as pd

    d, rfile = population_dir
    ext_csv = str(tmp_path / "external.csv")
    with open(ext_csv, "w") as f:
        f.write("sample,SeroGroup\n")
        for name in population.names:
            f.write(f"{name},SG{population.strain_of[name]}\n")
    db = str(tmp_path / "extdb")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", db] + KARGS)
    poppunk_main(["--fit-model", "bgmm", "--ref-db", db, "--output", db,
                  "--K", "2", "--no-plot",
                  "--external-clustering", ext_csv])
    out_csv = os.path.join(db, "extdb_external_clusters.csv")
    assert os.path.isfile(out_csv)
    df = pd.read_csv(out_csv)
    assert set(df.columns) == {"sample", "SeroGroup"}
    for _, row in df.iterrows():
        assert row["SeroGroup"] == f"SG{population.strain_of[row['sample']]}"


def test_citation(capsys):
    with pytest.raises(SystemExit):
        poppunk_main(["--citation", "--fit-model", "bgmm"])
    out = capsys.readouterr().out
    assert "PopPUNK" in out and "Methods" in out


class TestGpuFlagCompat:
    def test_gpu_flags_accepted_and_ignored(self, population_dir, tmp_path,
                                            capsys):
        """The reference's GPU-offload flags parse as no-ops so existing
        PopPUNK scripts run unchanged (compute is always on device here)."""
        import sys

        from poppunk_tpu.cli.main import main as poppunk_main

        d, rfile = population_dir
        db = str(tmp_path / "gdb")
        poppunk_main(["--create-db", "--r-files", rfile, "--output", db,
                      "--min-k", "13", "--max-k", "21", "--k-step", "4",
                      "--sketch-size", "1024", "--no-plot",
                      "--gpu-sketch", "--gpu-dist", "--gpu-graph",
                      "--deviceid", "1"])
        err = capsys.readouterr().err
        assert "accepted for compatibility" in err
        import os

        assert os.path.isfile(os.path.join(db, "gdb.dists.npy"))

    def test_all_clis_parse_gpu_flags(self):
        """Every entry point accepts its reference GPU flag set."""
        import pytest

        from poppunk_tpu.cli import (assign, info, lineages, main, mandrake,
                                     mst, references, visualise)

        cases = [
            (main.get_options, ["--create-db", "--r-files", "x",
                                "--output", "y", "--gpu-model"]),
            (assign.get_options, ["--db", "x", "--query", "q",
                                  "--output", "y", "--gpu-dist"]),
            (visualise.get_options, ["--ref-db", "x", "--output", "y",
                                     "--microreact", "--gpu-graph",
                                     "--core-only", "--read-distances"]),
            (mst.get_options, ["--distance-pkl", "x", "--rank-fit", "r",
                               "--output", "y", "--gpu-graph"]),
            (mandrake.get_options, ["--distances", "x", "--output", "y",
                                    "--use-gpu", "--device-id", "0"]),
            (lineages.get_options, ["--create-db", "rfile.txt",
                                    "--db-scheme", "s", "--output", "y",
                                    "--gpu-sketch"]),
            (info.get_options, ["--db", "x", "--use-gpu"]),
            (references.get_options, ["--network", "n", "--distances", "d",
                                      "--output", "y", "--use-gpu"]),
        ]
        for get_options, argv in cases:
            try:
                get_options(argv)
            except SystemExit as e:  # argparse exits on unknown flags
                pytest.fail(f"{get_options.__module__} rejected {argv}: {e}")
