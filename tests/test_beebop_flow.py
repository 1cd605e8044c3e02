"""The BeeBOP/web-service flow (reference test/run_test.py:139-143):
assign with --save-partial-query-graph, then visualise only the affected
components via --use-partial-query-graph."""

import csv
import os

import pytest

from poppunk_tpu.cli.assign import main as assign_main
from poppunk_tpu.cli.main import main as poppunk_main
from poppunk_tpu.cli.visualise import main as vis_main

KARGS = ["--min-k", "13", "--max-k", "25", "--k-step", "4",
         "--sketch-size", "2048", "--no-plot"]


def test_partial_query_graph_flow(population, population_dir, tmp_path):
    d, _ = population_dir
    refs = [n for n in population.names if not n.endswith("iso0")]
    queries = [n for n in population.names
               if n.endswith("iso0") and n.startswith("strain0")]
    rfile = population.subset_rfile(d, refs, "beebop_refs.txt")
    qfile = population.subset_rfile(d, queries, "beebop_q.txt")

    db = str(tmp_path / "db")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", db] + KARGS)
    poppunk_main(["--fit-model", "bgmm", "--ref-db", db, "--output", db,
                  "--K", "2", "--no-plot"])

    out = str(tmp_path / "bq")
    assign_main(["--db", db, "--query", qfile, "--output", out,
                 "--save-partial-query-graph"])
    subset_file = os.path.join(out, "bq_query.subset")
    graph_file = os.path.join(out, "bq_graph.graph.npz")
    assert os.path.isfile(subset_file)
    assert os.path.isfile(graph_file)
    subset = open(subset_file).read().split()
    # only strain0's component members + the query
    assert all(s.startswith("strain0") for s in subset)
    assert "strain0_iso0" in subset

    viz = str(tmp_path / "viz")
    vis_main(["--ref-db", db, "--query-db", out, "--output", viz,
              "--cytoscape", "--network-file", graph_file,
              "--use-partial-query-graph", subset_file])
    csv_file = os.path.join(viz, "viz_cytoscape.csv")
    assert os.path.isfile(csv_file)
    rows = list(csv.DictReader(open(csv_file)))
    ids = {r["id"] for r in rows}
    assert set(subset) == ids


def test_extend_query_graph_flow(population, population_dir, tmp_path):
    """--extend-query-graph grows the partial-graph subset to every
    isolate sharing a cluster with it (reference visualise.py:444-464)."""
    d, _ = population_dir
    refs = [n for n in population.names if not n.endswith("iso0")]
    queries = [n for n in population.names
               if n.endswith("iso0") and n.startswith("strain1")]
    rfile = population.subset_rfile(d, refs, "ext_refs.txt")
    qfile = population.subset_rfile(d, queries, "ext_q.txt")

    db = str(tmp_path / "db")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", db] + KARGS)
    poppunk_main(["--fit-model", "bgmm", "--ref-db", db, "--output", db,
                  "--K", "2", "--no-plot"])

    out = str(tmp_path / "eq")
    assign_main(["--db", db, "--query", qfile, "--output", out,
                 "--save-partial-query-graph"])
    subset_file = os.path.join(out, "eq_query.subset")
    graph_file = os.path.join(out, "eq_graph.graph.npz")

    viz = str(tmp_path / "viz_ext")
    vis_main(["--ref-db", db, "--query-db", out, "--output", viz,
              "--microreact", "--tree", "none",
              "--use-partial-query-graph", subset_file,
              "--extend-query-graph"])
    csv_file = os.path.join(viz, "viz_ext_microreact_clusters.csv")
    assert os.path.isfile(csv_file)
    rows = list(csv.DictReader(open(csv_file)))
    ids = {r["id"] for r in rows}
    # extension pulls in ALL strain1 members of the query's cluster, not
    # just the component listed in the subset file
    strain1_refs = {n for n in population.names
                    if n.startswith("strain1") and not n.endswith("iso0")}
    assert strain1_refs <= ids
    assert "strain1_iso0" in ids
