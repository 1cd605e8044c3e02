"""Query-assignment tests — counterpart of the reference's assign coverage
in test/run_test.py (batch / stable / serial / update-db) plus the
update-equivalence invariant of test/test-update.py."""

import csv
import os

import numpy as np
import pytest
import scipy.sparse

from poppunk_tpu.cli.assign import main as assign_main
from poppunk_tpu.cli.main import main as poppunk_main

KARGS = ["--min-k", "13", "--max-k", "25", "--k-step", "4",
         "--sketch-size", "2048", "--no-plot"]


def read_clusters(csv_path):
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    return {name: cl for name, cl in rows[1:]}


@pytest.fixture(scope="module")
def split_population(population, population_dir, tmp_path_factory):
    """DB fitted on strains 0-2 (minus the iso0 hold-outs); queries are the
    hold-outs plus all of strain3 (a novel strain)."""
    d, _ = population_dir
    refs = [n for n in population.names
            if not n.startswith("strain3") and not n.endswith("iso0")]
    queries = [n for n in population.names if n not in refs]
    rfile = population.subset_rfile(d, refs, "refs_subset.txt")
    qfile = population.subset_rfile(d, queries, "queries_subset.txt")
    db = str(tmp_path_factory.mktemp("assign") / "db")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", db] + KARGS)
    poppunk_main(["--fit-model", "bgmm", "--ref-db", db, "--output", db,
                  "--K", "2", "--no-plot"])
    ref_clusters = read_clusters(os.path.join(db, "db_clusters.csv"))
    return db, rfile, qfile, refs, queries, ref_clusters


class TestBatchAssign:
    def test_known_and_novel(self, split_population, population, tmp_path):
        db, rfile, qfile, refs, queries, ref_clusters = split_population
        out = str(tmp_path / "batch")
        assign_main(["--db", db, "--query", qfile, "--output", out])
        got = read_clusters(os.path.join(out, "batch_clusters.csv"))
        # held-out queries keep their strain's existing cluster name
        for q in queries:
            if not q.startswith("strain3"):
                mate = next(r for r in refs
                            if r.split("_iso")[0] == q.split("_iso")[0])
                assert got[q] == ref_clusters[mate], q
        # the novel strain forms ONE new cluster with a new id
        novel_ids = {got[q] for q in queries if q.startswith("strain3")}
        assert len(novel_ids) == 1
        assert novel_ids.pop() not in set(ref_clusters.values())

    def test_dists_written(self, split_population, tmp_path):
        db, rfile, qfile, refs, queries, _ = split_population
        out = str(tmp_path / "dists")
        assign_main(["--db", db, "--query", qfile, "--output", out])
        from poppunk_tpu.utils import read_pickle

        rlist, qlist, self_mode, X = read_pickle(
            os.path.join(out, "dists.dists"))
        assert not self_mode
        assert sorted(qlist) == sorted(queries)
        # refs subset was used (clique-pruned)
        assert set(rlist).issubset(set(refs))
        assert X.shape == (len(qlist) * len(rlist), 2)


class TestStableSerial:
    def test_stable(self, split_population, tmp_path):
        db, rfile, qfile, refs, queries, ref_clusters = split_population
        out = str(tmp_path / "stable")
        assign_main(["--db", db, "--query", qfile, "--output", out,
                     "--stable", "core"])
        got = read_clusters(os.path.join(out, "stable_clusters.csv"))
        for q in queries:
            if q.startswith("strain3"):
                assert got[q] == "NA"
            else:
                mate = next(r for r in refs
                            if r.split("_iso")[0] == q.split("_iso")[0])
                assert got[q] == ref_clusters[mate]

    def test_stable_external_clustering(self, split_population, population,
                                        tmp_path):
        """--stable + --external-clustering writes the external mapping
        (the reference runs printExternalClusters for stable AND serial
        modes, assign.py:731-733)."""
        db, rfile, qfile, refs, queries, ref_clusters = split_population
        ext_csv = str(tmp_path / "external.csv")
        with open(ext_csv, "w") as f:
            f.write("sample,SeroGroup\n")
            for name in refs:
                f.write(f"{name},SG{population.strain_of[name]}\n")
        out = str(tmp_path / "stable_ext")
        assign_main(["--db", db, "--query", qfile, "--output", out,
                     "--stable", "core", "--external-clustering", ext_csv])
        assert os.path.isfile(
            os.path.join(out, "stable_ext_external_clusters.csv"))

    def test_serial(self, split_population, tmp_path):
        db, rfile, qfile, refs, queries, ref_clusters = split_population
        out = str(tmp_path / "serial")
        assign_main(["--db", db, "--query", qfile, "--output", out,
                     "--serial"])
        got = read_clusters(os.path.join(out, "serial_clusters.csv"))
        for q in queries:
            if q.startswith("strain3"):
                assert got[q] == "novel"
            else:
                mate = next(r for r in refs
                            if r.split("_iso")[0] == q.split("_iso")[0])
                assert got[q] == ref_clusters[mate]


class TestMaxMergeQC:
    def test_pruned_query_excluded_everywhere(self, split_population,
                                              tmp_path, monkeypatch):
        """A query failing assignment QC (--max-merge) must vanish from
        EVERY output: clusters CSV, the persisted distances and the
        partial query graph (the pruned name list must propagate out of
        the network-assignment scope, reference assign.py:625-628)."""
        import poppunk_tpu.assign as am

        db, rfile, qfile, refs, queries, ref_clusters = split_population
        victim = queries[0]

        def fake_qc(r_list, q_list, assignments, max_clusters,
                    cluster_file):
            passing = [q for q in q_list if q != victim]
            return passing, {victim: ["Failed graph QC (too many links)"]}

        monkeypatch.setattr(am, "qc_query_assignments", fake_qc)
        out = str(tmp_path / "mm")
        assign_main(["--db", db, "--query", qfile, "--output", out,
                     "--run-qc", "--max-pi-dist", "1", "--max-a-dist", "1",
                     "--max-zero-dist", "1", "--max-merge", "2",
                     "--save-partial-query-graph"])

        got = read_clusters(os.path.join(out, "mm_clusters.csv"))
        assert victim not in got
        assert set(queries) - {victim} <= set(got)

        from poppunk_tpu.utils import read_pickle

        rlist, qlist, self_mode, X = read_pickle(
            os.path.join(out, "mm.dists"))
        assert victim not in qlist
        assert X.shape[0] == len(rlist) * len(qlist)

        subset = open(os.path.join(out, "mm_query.subset")).read().split()
        assert victim not in subset
        assert set(subset) <= set(rlist) | set(qlist)


class TestNameClash:
    def test_clash_without_flag_exits(self, split_population, population,
                                      population_dir, tmp_path):
        db, rfile, qfile, refs, queries, _ = split_population
        d, _ = population_dir
        clash = population.subset_rfile(d, [refs[0]], "clash.txt")
        out = str(tmp_path / "clash")
        with pytest.raises(SystemExit):
            assign_main(["--db", db, "--query", clash, "--output", out])

    def test_clash_renamed_with_write_references(self, split_population,
                                                 population, population_dir,
                                                 tmp_path):
        db, rfile, qfile, refs, queries, ref_clusters = split_population
        d, _ = population_dir
        clash = population.subset_rfile(d, [refs[0]], "clash2.txt")
        out = str(tmp_path / "clash_wr")
        assign_main(["--db", db, "--query", clash, "--output", out,
                     "--write-references"])
        got = read_clusters(os.path.join(out, "clash_wr_clusters.csv"))
        renamed = refs[0] + "_query"
        assert renamed in got
        # an exact copy of a reference genome lands in its own cluster
        assert got[renamed] == ref_clusters[refs[0]]


class TestUpdateDB:
    def test_full_update_then_assign(self, split_population, population,
                                     population_dir, tmp_path):
        db, rfile, qfile, refs, queries, ref_clusters = split_population
        d, _ = population_dir
        # split queries into two batches
        q1 = [q for q in queries if q.endswith("iso0")
              and not q.startswith("strain3")]
        q2 = [q for q in queries if q not in q1]
        q1_file = population.subset_rfile(d, q1, "upd_q1.txt")
        q2_file = population.subset_rfile(d, q2, "upd_q2.txt")

        up1 = str(tmp_path / "up1")
        assign_main(["--db", db, "--query", q1_file, "--output", up1,
                     "--update-db", "full"])
        # updated DB artefacts exist
        assert os.path.isfile(os.path.join(up1, "up1.h5"))
        assert os.path.isfile(os.path.join(up1, "up1.dists.pkl"))
        assert os.path.isfile(os.path.join(up1, "up1_graph.graph.npz"))
        assert os.path.isfile(os.path.join(up1, "up1.refs"))
        from poppunk_tpu.utils import read_pickle

        combined, _, self_mode, _ = read_pickle(
            os.path.join(up1, "up1.dists"), distances=False)
        assert self_mode and set(q1).issubset(combined)

        # chain: assign the second batch against the updated DB
        up2 = str(tmp_path / "up2")
        assign_main(["--db", up1, "--query", q2_file, "--output", up2,
                     "--update-db", "full"])
        got = read_clusters(os.path.join(up2, "up2_clusters.csv"))
        by_strain = {}
        for name, cl in got.items():
            by_strain.setdefault(name.split("_iso")[0], set()).add(cl)
        # each strain maps to exactly one cluster id across the chain
        for strain, ids in by_strain.items():
            assert len(ids) == 1, (strain, ids)
        assert len(set(v.pop() for v in by_strain.values())) == 4


class TestFastUpdate:
    def test_fast_update(self, split_population, population, population_dir,
                         tmp_path):
        db, rfile, qfile, refs, queries, ref_clusters = split_population
        up = str(tmp_path / "fast")
        assign_main(["--db", db, "--query", qfile, "--output", up,
                     "--update-db", "fast"])
        # fast mode still produces a usable updated database
        assert os.path.isfile(os.path.join(up, "fast.h5"))
        assert os.path.isfile(os.path.join(up, "fast.refs"))
        fast_refs = open(os.path.join(up, "fast.refs")).read().split()
        combined = set(refs) | set(queries)
        assert set(fast_refs).issubset(combined)
        # each strain (incl. the novel one) keeps at least one reference
        strains = {r.split("_iso")[0] for r in fast_refs}
        assert "strain3" in strains
        # the updated DB can answer another assignment (fresh name)
        d, _ = population_dir
        one = os.path.join(str(d), "fast_extra.txt")
        with open(one, "w") as f:
            f.write(f"fresh_q\t{os.path.join(str(d), queries[0] + '.fa')}\n")
        out2 = str(tmp_path / "fq")
        assign_main(["--db", up, "--query", one, "--output", out2])
        got = read_clusters(os.path.join(out2, "fq_clusters.csv"))
        assert "fresh_q" in got


class TestLineageUpdateEquivalence:
    """The core invariant of test/test-update.py: building with
    --update-db must match building from scratch (R^2 > 0.99 on
    pair-matched rank-1 sparse distances)."""

    def _matched_r2(self, mat1, names1, mat2, names2):
        d1 = {}
        c1 = mat1.tocoo()
        for i, j, v in zip(c1.row, c1.col, c1.data):
            d1[(names1[i], names1[j])] = v
        xs, ys = [], []
        c2 = mat2.tocoo()
        for i, j, v in zip(c2.row, c2.col, c2.data):
            key = (names2[i], names2[j])
            if key in d1:
                xs.append(d1[key])
                ys.append(v)
        assert len(xs) > 0
        xs, ys = np.asarray(xs), np.asarray(ys)
        if np.allclose(xs, ys):
            return 1.0
        ss_res = ((ys - xs) ** 2).sum()
        ss_tot = ((ys - ys.mean()) ** 2).sum()
        return 1 - ss_res / ss_tot if ss_tot > 0 else 1.0

    def test_update_equals_scratch(self, population, population_dir,
                                   tmp_path):
        d, rfile_all = population_dir
        batch1 = [n for n in population.names if not n.endswith("iso3")
                  and not n.endswith("iso4")]
        batch2 = [n for n in population.names if n not in batch1]
        b1 = population.subset_rfile(d, batch1, "lin_b1.txt")
        b2 = population.subset_rfile(d, batch2, "lin_b2.txt")

        # scratch: full fit on everything
        full_db = str(tmp_path / "full")
        poppunk_main(["--create-db", "--r-files", rfile_all,
                      "--output", full_db] + KARGS)
        poppunk_main(["--fit-model", "lineage", "--ranks", "1,2",
                      "--ref-db", full_db, "--output", full_db, "--no-plot"])

        # incremental: batch1 fit, then update with batch2
        db1 = str(tmp_path / "b1")
        poppunk_main(["--create-db", "--r-files", b1, "--output", db1]
                     + KARGS)
        poppunk_main(["--fit-model", "lineage", "--ranks", "1,2",
                      "--ref-db", db1, "--output", db1, "--no-plot"])
        up = str(tmp_path / "up")
        assign_main(["--db", db1, "--query", b2, "--output", up,
                     "--update-db", "full"])

        from poppunk_tpu.utils import read_pickle

        full_names = read_pickle(os.path.join(full_db, "full.dists"),
                                 distances=False)[0]
        up_names = read_pickle(os.path.join(up, "up.dists"),
                               distances=False)[0]
        assert sorted(full_names) == sorted(up_names)

        m_full = scipy.sparse.load_npz(
            os.path.join(full_db, "full_rank_1_fit.npz"))
        m_up = scipy.sparse.load_npz(os.path.join(up, "up_rank_1_fit.npz"))
        r2 = self._matched_r2(m_full, full_names, m_up, up_names)
        assert r2 > 0.99, r2


class TestWarmup:
    def test_warmup_compiles_and_exits(self, population_dir, tmp_path,
                                       capsys):
        """--warmup pre-compiles one serving program per batch bucket and
        exits without touching outputs."""
        import pytest as _pytest

        from poppunk_tpu.cli.assign import main as assign_main
        from poppunk_tpu.cli.main import main as poppunk_main

        d, rfile = population_dir
        db = str(tmp_path / "wdb")
        poppunk_main(["--create-db", "--r-files", rfile, "--output", db,
                      "--min-k", "13", "--max-k", "21", "--k-step", "4",
                      "--sketch-size", "1024", "--no-plot"])
        poppunk_main(["--fit-model", "bgmm", "--ref-db", db, "--output", db,
                      "--K", "2", "--no-plot"])
        with _pytest.raises(SystemExit) as e:
            assign_main(["--db", db, "--warmup", "--output",
                         str(tmp_path / "unused")])
        assert e.value.code == 0
        err = capsys.readouterr().err
        assert "Warmed 10 serving programs" in err
        import os

        assert not os.path.exists(str(tmp_path / "unused"))
