"""Resident serving session (poppunk_tpu.serve.AssignSession): results
must equal the CLI --stable route exactly, references stay device-resident
between requests, and the fused 1-NN post matches a host oracle."""

import csv
import os

import numpy as np
import pytest

from poppunk_tpu.cli.assign import main as assign_main
from poppunk_tpu.cli.main import main as poppunk_main

KARGS = ["--min-k", "13", "--max-k", "25", "--k-step", "4",
         "--sketch-size", "2048", "--no-plot"]


@pytest.fixture(scope="module")
def refine_db(population_dir, tmp_path_factory):
    d, rfile = population_dir
    db = str(tmp_path_factory.mktemp("servedb") / "db")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", db] + KARGS)
    poppunk_main(["--fit-model", "bgmm", "--ref-db", db, "--output", db,
                  "--K", "2", "--no-plot"])
    poppunk_main(["--fit-model", "refine", "--ref-db", db, "--output", db,
                  "--no-plot"])
    return db


def _query_rfile(population, population_dir, tmp_path, n=4):
    d, _ = population_dir
    names = [x for x in population.names if x.endswith("iso1")][:n]
    qfile = population.subset_rfile(d, names, "serve_q.txt")
    # rename to avoid reference clashes
    out = str(tmp_path / "serve_q_renamed.txt")
    with open(qfile) as f, open(out, "w") as g:
        for line in f:
            name, path = line.rstrip("\n").split("\t")
            g.write(f"{name}_sq\t{path}\n")
    return out


@pytest.mark.parametrize("stable", ["core", "accessory"])
def test_session_matches_cli_stable(population, population_dir, refine_db,
                                    tmp_path, stable):
    from poppunk_tpu.serve import AssignSession

    qfile = _query_rfile(population, population_dir, tmp_path)
    out = str(tmp_path / f"cli_{stable}")
    assign_main(["--db", refine_db, "--query", qfile, "--output", out,
                 "--stable", stable])
    cli = {r["Taxon"]: r["Cluster"] for r in csv.DictReader(
        open(os.path.join(out, os.path.basename(out) + "_clusters.csv")))}

    session = AssignSession(refine_db, stable=stable)
    got = session.assign_files(qfile)
    assert got == cli
    # second request on the same session (resident refs) agrees too
    assert session.assign_files(qfile) == cli


def test_session_warmup_and_reuse(refine_db):
    from poppunk_tpu.serve import AssignSession

    session = AssignSession(refine_db)
    assert session.warmup() == 10  # buckets 1..512


def test_stable_post_oracle(refine_db, population, population_dir,
                            tmp_path):
    """The fused (nn, within) output equals a host recomputation from the
    full distance matrix."""
    from poppunk_tpu.io.hdf5db import read_sketches
    from poppunk_tpu.ops.distances import query_db
    from poppunk_tpu.serve import AssignSession

    qfile = _query_rfile(population, population_dir, tmp_path, n=3)
    session = AssignSession(refine_db, stable="core")

    from poppunk_tpu.io.hdf5db import _sketch_one
    from poppunk_tpu.sketch.minhash import SketchParams
    from poppunk_tpu.utils import read_rfile

    names, seqs = read_rfile(qfile)
    params = SketchParams(klist=session.kmers,
                          sketchsize64=session.ss64, bbits=session.bbits)
    q_sketches = [_sketch_one((n, f, params)) for n, f in zip(names, seqs)]

    r_sketches = read_sketches(session.ref_db, session.r_names)
    qr = query_db(r_sketches, q_sketches, list(session.kmers))
    n_ref = len(session.r_names)
    rect = qr[:, 0].reshape(len(q_sketches), n_ref)
    nn = rect.argmin(axis=1)
    sign = np.asarray(session.model.assign(qr))
    want = {}
    for qi, sk in enumerate(q_sketches):
        within = sign[qi * n_ref + nn[qi]] == -1
        want[sk.name] = (session.ref_clustering[session.r_names[nn[qi]]]
                         if within else "NA")
    assert session.assign_sketches(q_sketches) == want


def test_session_bgmm_matches_cli_stable(population, population_dir,
                                         tmp_path):
    """BGMM sessions agree with the CLI --stable route too."""
    from poppunk_tpu.serve import AssignSession

    d, rfile = population_dir
    db = str(tmp_path / "bgdb")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", db] + KARGS)
    poppunk_main(["--fit-model", "bgmm", "--ref-db", db, "--output", db,
                  "--K", "2", "--no-plot"])
    qfile = _query_rfile(population, population_dir, tmp_path)
    out = str(tmp_path / "bg_cli")
    assign_main(["--db", db, "--query", qfile, "--output", out,
                 "--stable", "core"])
    cli = {r["Taxon"]: r["Cluster"] for r in csv.DictReader(
        open(os.path.join(out, "bg_cli_clusters.csv")))}
    session = AssignSession(db, stable="core")
    assert session.assign_files(qfile) == cli


def test_session_dbscan_matches_cli_stable(population, population_dir,
                                           tmp_path):
    """DBSCAN sessions (grid-quantised approximate_predict on device)
    agree with the CLI two-pass --stable route."""
    from poppunk_tpu.serve import AssignSession

    d, rfile = population_dir
    db = str(tmp_path / "dbdb")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", db] + KARGS)
    poppunk_main(["--fit-model", "dbscan", "--ref-db", db, "--output", db,
                  "--no-plot"])
    qfile = _query_rfile(population, population_dir, tmp_path)
    out = str(tmp_path / "db_cli")
    assign_main(["--db", db, "--query", qfile, "--output", out,
                 "--stable", "core"])
    cli = {r["Taxon"]: r["Cluster"] for r in csv.DictReader(
        open(os.path.join(out, "db_cli_clusters.csv")))}
    session = AssignSession(db, stable="core")
    assert session.assign_files(qfile) == cli


def test_dbscan_grid_matches_exact_predict():
    """The quantised decision grid reproduces the exact host
    approximate_predict away from decision boundaries."""
    from poppunk_tpu.models.dbscan import DBSCANFit

    rng = np.random.default_rng(5)
    within = rng.normal([0.02, 0.05], 0.005, size=(300, 2))
    between = rng.normal([0.15, 0.3], 0.01, size=(400, 2))
    X = np.abs(np.vstack([within, between]))
    model = DBSCANFit("/tmp/unused_prefix", assign_points=False)
    model.fit(X, max_num_clusters=4, min_cluster_prop=0.01)
    grid, x0, dx, y0, dy = model.decision_grid(resolution=512)

    pts = np.abs(rng.normal([0.02, 0.05], 0.004, size=(200, 2)))
    exact = model.assign(pts, progress=False)
    Xs = pts / model.scale
    ix = np.clip(((Xs[:, 0] - x0) / dx).astype(int), 0, 511)
    iy = np.clip(((Xs[:, 1] - y0) / dy).astype(int), 0, 511)
    quant = grid[ix, iy]
    # identical for all but boundary-grazing points
    assert (quant == exact).mean() > 0.97


def test_geometry_mismatch_rejected(refine_db):
    """Same-Wp geometry mismatches (e.g. ss64 32 vs 64 pad to the same
    lane tile) pass every shape check and would return confidently wrong
    clusters — the session must reject them up-front."""
    from poppunk_tpu.serve import AssignSession
    from poppunk_tpu.sketch.minhash import Sketch

    session = AssignSession(refine_db)
    ss = session.ss64 // 2  # any value != the db's geometry
    wrong = Sketch(name="q0", usigs={k: np.zeros(ss * session.bbits,
                                                 np.uint64)
                                     for k in session.kmers},
                   sketchsize64=ss, bbits=session.bbits,
                   length=2_000_000, missing_bases=0,
                   base_freq=(0.25, 0.25, 0.25, 0.25))
    with pytest.raises(ValueError, match="geometry"):
        session.assign_sketches([wrong])


def test_assign_files_accepts_parallel_lists(population, population_dir,
                                             refine_db, tmp_path):
    from poppunk_tpu.serve import AssignSession

    qfile = _query_rfile(population, population_dir, tmp_path)
    names, files = [], []
    with open(qfile) as f:
        for line in f:
            n, p = line.split()
            names.append(n)
            files.append(p)
    session = AssignSession(refine_db)
    via_rfile = session.assign_files(qfile)
    via_lists = session.assign_files((names, files))
    assert via_lists == via_rfile
    with pytest.raises(TypeError, match="rfile path"):
        session.assign_files(["a.fa", "b.fa"])


def test_assign_files_threaded_pool(refine_db, tmp_path):
    """threads>1 routes sketching through a spawn pool with
    native_threads=1 jobs (the 4-tuple _sketch_one form)."""
    from synth_genomes import SyntheticPopulation

    from poppunk_tpu.serve import AssignSession

    pop = SyntheticPopulation(n_strains=2, genomes_per_strain=(2, 2),
                              genome_length=20_000, seed=31)
    qdir = tmp_path / "q"
    qdir.mkdir()
    qfile = pop.write_fastas(str(qdir))
    session = AssignSession(refine_db)
    serial = session.assign_files(qfile, threads=1)
    pooled = session.assign_files(qfile, threads=2)
    assert pooled == serial
