"""poppunk_tpu_scale — streaming-tier fit of a real sketch database.

The CLI twin of tests/test_scale.py's pipeline tests: artefact
conventions, cluster correctness vs the planted strains, and
loadability of the refine model it writes.
"""

import csv
import os

import numpy as np
import pytest

from poppunk_tpu.cli.main import main as poppunk_main
from poppunk_tpu.cli.scale import main as scale_main

KARGS = ["--min-k", "13", "--max-k", "25", "--k-step", "4",
         "--sketch-size", "2048", "--no-plot"]


def read_clusters(csv_path):
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["Taxon", "Cluster"]
    return {name: cl for name, cl in rows[1:]}


@pytest.fixture(scope="module")
def db(population_dir, tmp_path_factory):
    d, rfile = population_dir
    out = str(tmp_path_factory.mktemp("scale_cli") / "db")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", out]
                 + KARGS)
    return out


@pytest.fixture(scope="module")
def fitted(db, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale_cli") / "scalefit")
    scale_main(["--ref-db", db, "--output", out, "--no-plot",
                "--write-lineages", "--ranks", "1,2", "--seed", "42"])
    return out


class TestScaleCLI:
    def test_artefacts(self, fitted):
        base = os.path.join(fitted, os.path.basename(fitted))
        for ext in ("_fit.pkl", "_fit.npz", "_clusters.csv",
                    "_unword_clusters.csv", ".dists.pkl", "_lineages.csv",
                    ".h5"):
            assert os.path.isfile(base + ext), ext
        assert os.path.isfile(base + "_graph.graph.npz")
        # deliberately no condensed matrix on disk
        assert not os.path.isfile(base + ".dists.npy")

    def test_clusters_strain_pure(self, fitted, population):
        # refine may legitimately choose a tighter boundary than the
        # strain split on synthetic data (tests/test_cli.py's refine
        # invariant); no cluster may MIX strains
        base = os.path.join(fitted, os.path.basename(fitted))
        clustering = read_clusters(base + "_clusters.csv")
        by_cluster = {}
        for name, cl in clustering.items():
            by_cluster.setdefault(cl, set()).add(population.strain_of[name])
        assert 4 <= len(by_cluster) <= 10
        assert all(len(s) == 1 for s in by_cluster.values())

    def test_lineage_model_matches_from_scratch(self, fitted, db,
                                                tmp_path):
        """The LineageFit written from the fused kNN equals a
        from-scratch fit on the condensed matrix."""
        import scipy.sparse

        from poppunk_tpu.models.lineage import LineageFit
        from poppunk_tpu.utils import read_pickle

        db_base = os.path.join(db, os.path.basename(db))
        rlist, _, _, X = read_pickle(db_base + ".dists")
        n = len(rlist)
        ref = LineageFit(str(tmp_path / "scratch"), [1, 2], n - 1,
                         False, False, 1e-10, dist_col=0)
        ref.fit(X)

        lin_base = os.path.join(
            fitted + "_lineages",
            os.path.basename(fitted) + "_lineages")
        assert os.path.isfile(lin_base + "_fit.pkl")
        nn = scipy.sparse.load_npz(lin_base + "_sparse_dists.npz").tocoo()
        ref_nn = ref.nn_dists.tocoo()

        def key(m):
            order = np.lexsort((m.col, m.row))
            return m.row[order], m.col[order], m.data[order]

        ri, rj, rd = key(ref_nn)
        si, sj, sd = key(nn)
        assert np.array_equal(ri, si) and np.array_equal(rj, sj)
        np.testing.assert_allclose(sd, rd, rtol=1e-5, atol=1e-7)
        for rank in (1, 2):
            got = scipy.sparse.load_npz(
                lin_base + f"_rank_{rank}_fit.npz").tocoo()
            want = ref.lower_rank_dists[rank].tocoo()
            gi, gj, gd = key(got)
            wi, wj, wd = key(want)
            assert np.array_equal(gi, wi) and np.array_equal(gj, wj)
            np.testing.assert_allclose(gd, wd, rtol=1e-5, atol=1e-7)

    def test_rank1_lineages_refine_strains(self, fitted, population):
        base = os.path.join(fitted, os.path.basename(fitted))
        with open(base + "_lineages.csv") as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["id", "Rank_1", "Rank_2", "overall"]
        assert len(rows) - 1 == len(population.names)
        # rank-1 lineages are sub-clusters of strains: no lineage spans
        # two strains in this well-separated population
        by_lineage = {}
        for name, r1, _, _ in rows[1:]:
            by_lineage.setdefault(r1, set()).add(population.strain_of[name])
        assert all(len(s) == 1 for s in by_lineage.values())

    def test_model_round_trips_through_loader(self, fitted, db):
        from poppunk_tpu.models import load_cluster_fit
        from poppunk_tpu.utils import read_pickle

        base = os.path.join(fitted, os.path.basename(fitted))
        model = load_cluster_fit(base + "_fit.pkl", base + "_fit.npz")
        assert model.type == "refine"
        assert model.fitted and not model.indiv_fitted

        # boundary assignments of the true condensed matrix reproduce the
        # CLI's network: the model must classify exactly the written edges
        db_base = os.path.join(db, os.path.basename(db))
        rlist, _, _, X = read_pickle(db_base + ".dists")
        y = model.assign(X)
        from poppunk_tpu.network.graph import load_network_file
        from poppunk_tpu.pairs import all_pairs

        G = load_network_file(base + "_graph.graph.npz")
        i, j = all_pairs(len(rlist))
        within = set(map(tuple, np.stack([i, j], axis=1)[y == -1]))
        stored = set(map(tuple, np.sort(G.edges, axis=1)))
        assert within == stored

    def test_assign_drops_in(self, population, population_dir,
                             tmp_path_factory):
        """A scale-fitted database is a drop-in reference for
        poppunk_tpu_assign: held-out queries join their strain's
        cluster with no .dists.npy on disk."""
        from poppunk_tpu.cli.assign import main as assign_main

        d, _ = population_dir
        refs = [n for n in population.names if not n.endswith("iso0")]
        queries = [n for n in population.names if n not in refs]
        rfile = population.subset_rfile(d, refs, "scale_refs.txt")
        qfile = population.subset_rfile(d, queries, "scale_queries.txt")
        root = tmp_path_factory.mktemp("scale_assign")
        db = str(root / "db")
        poppunk_main(["--create-db", "--r-files", rfile, "--output", db]
                     + KARGS)
        fit = str(root / "fit")
        scale_main(["--ref-db", db, "--output", fit, "--no-plot"])
        out = str(root / "assigned")
        assign_main(["--db", fit, "--query", qfile, "--output", out])

        ref_clusters = read_clusters(
            os.path.join(fit, "fit_clusters.csv"))
        got = read_clusters(os.path.join(out, "assigned_clusters.csv"))
        assert set(queries) <= set(got)
        for q in queries:
            strain = population.strain_of[q]
            others = {ref_clusters[r] for r in refs
                      if population.strain_of[r] != strain}
            # on 11 genomes refine picks a tight boundary: a query may
            # rejoin its strain's (possibly merged, "a_b") clusters or
            # found a novel cluster — but may NEVER join another strain
            assert not set(got[q].split("_")) & others

    def test_indiv_refine(self, db, population, tmp_path):
        out = str(tmp_path / "indiv")
        scale_main(["--ref-db", db, "--output", out, "--no-plot",
                    "--indiv-refine", "both"])
        base = os.path.join(out, "indiv")
        fit = np.load(base + "_fit.npz")
        assert bool(fit["indiv_fitted"])
        cb, ab = fit["core_acc_intercepts"]
        assert cb > 0 and ab > 0
        for suffix in ("", "_core", "_accessory"):
            assert os.path.isfile(base + suffix + "_graph.graph.npz")
            clustering = read_clusters(base + suffix + "_clusters.csv")
            by_cluster = {}
            for name, cl in clustering.items():
                by_cluster.setdefault(cl, set()).add(
                    population.strain_of[name])
            assert all(len(s) == 1 for s in by_cluster.values()), suffix

    def test_unconstrained(self, db, population, tmp_path):
        out = str(tmp_path / "uncon")
        scale_main(["--ref-db", db, "--output", out, "--no-plot",
                    "--unconstrained", "--pos-shift", "0.05"])
        base = os.path.join(out, "uncon")
        fit = np.load(base + "_fit.npz")
        x, y = fit["intercept"]
        assert x > 0 and y > 0
        clustering = read_clusters(base + "_clusters.csv")
        by_cluster = {}
        for name, cl in clustering.items():
            by_cluster.setdefault(cl, set()).add(
                population.strain_of[name])
        assert all(len(s) == 1 for s in by_cluster.values())

    def test_dbscan_start_matches_host_path(self, db, population,
                                            tmp_path):
        """--fit-model dbscan: the streaming tier's DBSCAN-initialised
        refine equals the host two-step (poppunk --fit-model dbscan,
        then --fit-model refine --model-dir) — reference semantics where
        dbscan is the standard refine initialiser
        (PopPUNK/__main__.py:502-633; its fit subsamples to <=100k pairs
        at any N, dbscan.py:54-60)."""
        out = str(tmp_path / "sdb")
        scale_main(["--ref-db", db, "--output", out, "--no-plot",
                    "--fit-model", "dbscan"])
        base = os.path.join(out, "sdb")
        fit = np.load(base + "_fit.npz")

        host_db = str(tmp_path / "hostdb")
        poppunk_main(["--fit-model", "dbscan", "--ref-db", db,
                      "--output", host_db, "--no-plot"])
        host_rf = str(tmp_path / "hostrf")
        poppunk_main(["--fit-model", "refine", "--ref-db", db,
                      "--output", host_rf, "--model-dir", host_db,
                      "--no-plot"])
        host_fit = np.load(os.path.join(host_rf, "hostrf_fit.npz"))

        # the dbscan START is pinned exactly (same scale, and the host
        # dbscan _fit.npz means match what the streaming tier derives —
        # verified via the saved dbscan model); the refined boundary
        # itself is a bounded scalar minimum of a piecewise-constant
        # score, so host/device agree to within one global grid step,
        # not bit-exactly
        np.testing.assert_allclose(fit["scale"], host_fit["scale"],
                                   rtol=1e-6)
        db_fit = np.load(os.path.join(host_db, "hostdb_fit.npz"))
        mean0 = db_fit["means"][int(db_fit["within"])]
        mean1 = db_fit["means"][int(db_fit["between"])]
        grid_step = float(np.hypot(*(mean1 - mean0))) / 39
        assert np.all(np.abs(fit["intercept"] - host_fit["intercept"])
                      < grid_step)
        got = read_clusters(base + "_clusters.csv")
        want = read_clusters(os.path.join(host_rf,
                                          "hostrf_clusters.csv"))
        # identical partitions (labels may renumber)
        by_got, by_want = {}, {}
        for name in got:
            by_got.setdefault(got[name], set()).add(name)
            by_want.setdefault(want[name], set()).add(name)
        assert (sorted(map(sorted, by_got.values()))
                == sorted(map(sorted, by_want.values())))

    def test_multi_boundary(self, db, population, tmp_path):
        import glob

        out = str(tmp_path / "multi")
        scale_main(["--ref-db", db, "--output", out, "--no-plot",
                    "--multi-boundary", "4"])
        files = sorted(glob.glob(os.path.join(
            out, "multi_boundary*_clusters.csv")))
        assert files  # at least one interpolated boundary is non-trivial
        for f in files:
            clustering = read_clusters(f)
            assert len(clustering) == len(population.names)
            # tighter-than-optimal boundaries only SPLIT strains
            by_cluster = {}
            for name, cl in clustering.items():
                by_cluster.setdefault(cl, set()).add(
                    population.strain_of[name])
            assert all(len(s) == 1 for s in by_cluster.values()), f

    def test_run_qc_matches_host_and_excludes_outlier(
            self, population, population_dir, tmp_path_factory):
        """--run-qc: streaming distance QC fails the same samples as the
        host qc_dist_mat on the materialised matrix, and the fit
        proceeds on the survivors."""
        from poppunk_tpu.qc import qc_dist_mat
        from poppunk_tpu.utils import read_pickle

        d, rfile = population_dir
        root = tmp_path_factory.mktemp("scale_qc")
        # a junk genome: random sequence, no strain relationship
        rng = np.random.default_rng(99)
        junk = root / "junkbug.fa"
        seq = "".join(rng.choice(list("ACGT"), size=80_000))
        junk.write_text(">junkbug\n" + "\n".join(
            seq[i:i + 70] for i in range(0, len(seq), 70)) + "\n")
        rfile2 = root / "with_junk.txt"
        rfile2.write_text(open(rfile).read()
                          + f"junkbug\t{junk}\n")
        db = str(root / "db")
        poppunk_main(["--create-db", "--r-files", str(rfile2),
                      "--output", db] + KARGS)

        # defaults loosened: in this tiny synthetic population the
        # reference's default cutoffs legitimately fail most samples
        # (identical-accessory zero pairs, between-strain accessory >
        # 0.5) on the host path too; these values isolate the junk
        # genome (real acc max ~0.72, junk acc ~1.0)
        out = str(root / "qcfit")
        scale_main(["--ref-db", db, "--output", out, "--no-plot",
                    "--run-qc", "--max-zero-dist", "1",
                    "--max-pi-dist", "0.2", "--max-a-dist", "0.85"])

        # host oracle on the materialised matrix (no sketch failures
        # expected: lengths/base content are uniform here)
        from poppunk_tpu.qc import DEFAULT_QC

        db_base = os.path.join(db, os.path.basename(db))
        rlist, _, _, X = read_pickle(db_base + ".dists")
        qc_dict = dict(DEFAULT_QC)
        qc_dict.update(prop_zero=1, max_pi_dist=0.2, max_a_dist=0.85)
        _, fail_host = qc_dist_mat(X, rlist, rlist, db, qc_dict)

        report = os.path.join(out, "qcfit_qcreport.txt")
        assert os.path.isfile(report)
        failed = {line.split("\t")[0] for line in open(report)}
        assert "junkbug" in failed
        assert failed == set(fail_host)

        clustering = read_clusters(
            os.path.join(out, "qcfit_clusters.csv"))
        assert "junkbug" not in clustering
        assert set(clustering) == set(population.names) - failed

    def test_mst_from_scale_lineage_fit(self, fitted, tmp_path):
        """The rank fit written by --write-lineages drives
        poppunk_tpu_mst (another downstream drop-in)."""
        from poppunk_tpu.cli.mst import main as mst_main

        lin_base = os.path.join(
            fitted + "_lineages",
            os.path.basename(fitted) + "_lineages")
        base = os.path.join(fitted, os.path.basename(fitted))
        out = str(tmp_path / "mst")
        mst_main(["--rank-fit", lin_base + "_rank_2_fit.npz",
                  "--distance-pkl", base + ".dists.pkl",
                  "--previous-clustering", base + "_lineages.csv",
                  "--output", out, "--no-plot"])
        assert os.path.isfile(os.path.join(out, "mst_MST.graphml"))

    def test_use_model_reproduces_fit(self, fitted, db, tmp_path):
        """--use-model with the fitted boundary on the same database
        reproduces the fit run's clusters exactly."""
        out = str(tmp_path / "reuse")
        scale_main(["--ref-db", db, "--output", out, "--use-model",
                    "--model-dir", fitted, "--no-plot"])
        base = os.path.join(out, "reuse")
        want = read_clusters(os.path.join(
            fitted, os.path.basename(fitted) + "_clusters.csv"))
        got = read_clusters(base + "_clusters.csv")
        assert got == want
        # the model artefact is re-saved under the new output
        fit = np.load(base + "_fit.npz")
        src = np.load(os.path.join(
            fitted, os.path.basename(fitted) + "_fit.npz"))
        np.testing.assert_array_equal(fit["intercept"], src["intercept"])

    def test_use_model_threshold(self, db, tmp_path):
        """A threshold model (slope 0) streams through --use-model too."""
        thr = str(tmp_path / "thr")
        poppunk_main(["--fit-model", "threshold", "--threshold", "0.02",
                      "--ref-db", db, "--output", thr, "--no-plot"])
        out = str(tmp_path / "thr_reuse")
        scale_main(["--ref-db", db, "--output", out, "--use-model",
                    "--model-dir", thr, "--no-plot"])
        want = read_clusters(os.path.join(thr, "thr_clusters.csv"))
        got = read_clusters(os.path.join(out, "thr_reuse_clusters.csv"))
        assert got == want

    @pytest.mark.parametrize("mode", ["full", "fast"])
    def test_extract_references(self, db, mode, tmp_path):
        out = str(tmp_path / f"refs_{mode}")
        scale_main(["--ref-db", db, "--output", out, "--no-plot",
                    "--extract-references", "--refs-mode", mode])
        base = os.path.join(out, f"refs_{mode}")
        assert os.path.isfile(base + ".refs")
        refs = {line.strip() for line in open(base + ".refs")}
        clustering = read_clusters(base + "_clusters.csv")
        # every cluster keeps at least one reference
        by_cluster = {}
        for name, cl in clustering.items():
            by_cluster.setdefault(cl, set()).add(name)
        for members in by_cluster.values():
            assert members & refs

    def test_mandrake_embedding(self, db, population, tmp_path):
        out = str(tmp_path / "emb")
        scale_main(["--ref-db", db, "--output", out, "--no-plot",
                    "--mandrake", "--perplexity", "5",
                    "--mandrake-iter", "20000"])
        dot = os.path.join(
            out, "emb_perplexity5.0_accessory_mandrake.dot")
        assert os.path.isfile(dot)
        content = open(dot).read()
        for name in population.names:
            assert f'"{name}"' in content

    def test_dists_pkl_names_sorted(self, fitted, population):
        from poppunk_tpu.utils import read_pickle

        base = os.path.join(fitted, os.path.basename(fitted))
        rlist, qlist, self_mode, X = read_pickle(base + ".dists",
                                                 distances=False)
        assert self_mode and rlist == qlist == sorted(population.names)
        assert X is None

    def test_bootstrap_cli_equals_standard(self, db, tmp_path,
                                           monkeypatch):
        """--single-device routes through the two-round bootstrap
        (deferred pass 1 with the refine band fill fused); clusters must
        equal the POPPUNK_TPU_BOOTSTRAP=0 run exactly."""
        outs = {}
        for mode in ("0", "1"):
            monkeypatch.setenv("POPPUNK_TPU_BOOTSTRAP", mode)
            out = str(tmp_path / f"boot{mode}")
            scale_main(["--ref-db", db, "--output", out, "--no-plot",
                        "--single-device", "--seed", "42"])
            base = os.path.join(out, os.path.basename(out))
            outs[mode] = read_clusters(base + "_clusters.csv")
        assert outs["0"] == outs["1"]
