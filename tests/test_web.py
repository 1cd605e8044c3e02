"""Web glue tests: JSON sketch <-> HDF5 roundtrip (the canonical sketch
schema fixture, reference test/json_sketch.txt path), graphml subgraph
JSON, and cluster prevalence summaries."""

import json
import os

import numpy as np

from poppunk_tpu.web import (graphml_to_json, sketch_to_hdf5,
                             sketch_to_json, summarise_clusters)


def test_sketch_json_hdf5_roundtrip(tmp_path):
    from poppunk_tpu.sketch.minhash import SketchParams, sketch_sequence
    from poppunk_tpu.io.hdf5db import read_sketches
    from poppunk_tpu.ops.distances import query_db

    rng = np.random.default_rng(5)
    params = SketchParams(klist=(15, 19), sketchsize64=8, bbits=8)
    sketches = [
        sketch_sequence(f"s{i}", rng.integers(0, 4, 30000).astype(np.uint8),
                        params)
        for i in range(3)
    ]
    # serialise to the canonical JSON, rebuild a DB from it
    doc = {sk.name: json.dumps(sketch_to_json(sk)) for sk in sketches}
    out = str(tmp_path / "webdb")
    q_names = sketch_to_hdf5(doc, out)
    assert sorted(q_names) == ["s0", "s1", "s2"]

    rebuilt = read_sketches(out, q_names)
    for orig, new in zip(sorted(sketches, key=lambda s: s.name), rebuilt):
        assert orig.length == new.length
        for k in orig.usigs:
            assert np.array_equal(orig.usigs[k], new.usigs[k])

    # distances from the rebuilt DB equal distances from the originals
    want = query_db(sketches, None, [15, 19], self_mode=True,
                    use_pallas=False)
    got = query_db(rebuilt, None, [15, 19], self_mode=True,
                   use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_graphml_to_json(tmp_path):
    from poppunk_tpu.network.graph import Graph, save_network

    G = Graph(6, [(0, 1), (1, 2), (3, 4), (4, 5), (3, 5)])
    labels = [f"iso{i}" for i in range(6)]
    out = str(tmp_path / "net")
    save_network(G, prefix=out, suffix="_cytoscape", use_graphml=True,
                 vertex_labels=labels)
    doc = graphml_to_json(out)
    # the component of the LAST vertex: {3,4,5}
    node_labels = {n["data"]["label"] for n in doc["elements"]["nodes"]}
    assert node_labels == {"iso3", "iso4", "iso5"}
    assert len(doc["elements"]["edges"]) == 3


def test_summarise_clusters(tmp_path):
    out = str(tmp_path / "sum")
    os.makedirs(out)
    with open(os.path.join(out, "sum_clusters.csv"), "w") as f:
        f.write("Taxon,Cluster\n")
        for i in range(6):
            f.write(f"r{i},1\n")
        f.write("r6,2\nr7,2\nq0,1\n")
    (q_names, q_clusters, q_prev, clusters, prevalences, aliases,
     include) = summarise_clusters(out, "sp", str(tmp_path), ["q0"])
    assert q_names == ["q0"] and q_clusters == [1]
    assert q_prev[0] > 70  # 7/9 samples
    assert os.path.isfile(os.path.join(out, "include1.txt"))
    assert "q0" in open(os.path.join(out, "include1.txt")).read().split()


def test_api_posts_legacy_microreact(tmp_path, monkeypatch):
    """web.api posts the reference tree + clusters with the query's
    cluster highlighted (reference web.py:103-122), returning the
    project URL from the response."""
    from poppunk_tpu import web

    db = tmp_path / "wdb"
    db.mkdir()
    (db / "wdb_microreact_clusters.csv").write_text(
        "id,Cluster_Cluster__autocolour\na,1\nb,2\nc,1\n")
    (db / "wdb.nwk").write_text("(a:1,(b:1,c:1):1);")

    posted = {}

    class FakeResponse:
        text = '{"url": "https://microreact.org/project/xyz"}'

    def fake_post(url, data=None):
        posted["url"] = url
        posted["data"] = data
        return FakeResponse()

    import requests

    monkeypatch.setattr(requests, "post", fake_post)
    url = web.api("1", str(db))
    assert url == "https://microreact.org/project/xyz"
    assert posted["data"]["tree"].startswith("(a:1")
    # query cluster 1 rows highlighted red, others blue
    assert "red" in posted["data"]["data"]
    assert "blue" in posted["data"]["data"]


def test_api_main_flow(population, population_dir, tmp_path):
    """poppunk_tpu_api end-to-end: build + fit a reference db, export one
    held-out genome's sketch as canonical JSON, assign it through
    web.main, and check the JSON response names the right cluster."""
    from poppunk_tpu.cli.main import main as poppunk_main
    from poppunk_tpu.io.hdf5db import read_sketches
    from poppunk_tpu.web import main as api_main

    d, _ = population_dir
    refs = [n for n in population.names if not n.endswith("iso0")]
    queries = [n for n in population.names
               if n.endswith("iso0") and n.startswith("strain0")]
    rfile = population.subset_rfile(d, refs, "api_refs.txt")
    qfile = population.subset_rfile(d, queries, "api_q.txt")

    kargs = ["--min-k", "13", "--max-k", "25", "--k-step", "4",
             "--sketch-size", "2048", "--no-plot"]
    db = str(tmp_path / "apidb")
    poppunk_main(["--create-db", "--r-files", rfile, "--output", db] + kargs)
    poppunk_main(["--fit-model", "bgmm", "--ref-db", db, "--output", db,
                  "--K", "2", "--no-plot"])

    # sketch the query separately, then export it as canonical JSON —
    # the shape a web front end would POST
    qdb = str(tmp_path / "apiq")
    poppunk_main(["--create-db", "--r-files", qfile, "--output", qdb] + kargs)
    (sk,) = read_sketches(qdb, queries)
    sketch_path = str(tmp_path / (queries[0] + ".json"))
    with open(sketch_path, "w") as f:
        json.dump(sketch_to_json(sk), f)

    out = str(tmp_path / "apiout")
    response = api_main(["--sketch", sketch_path, "--ref-db", db,
                         "--output", out])
    assert response["queries"][0]["name"] == queries[0]
    # the query inherits the ref db's nomenclature: its cluster id must be
    # the one holding the other strain0 isolates in the reference CSV
    import csv as _csv
    with open(os.path.join(db, os.path.basename(db) + "_clusters.csv")) as f:
        rows = {r["Taxon"]: r["Cluster"] for r in _csv.DictReader(f)}
    strain0_clusters = {rows[n] for n in rows if n.startswith("strain0")}
    assert strain0_clusters, "no strain0 isolates in the ref clustering"
    assert response["queries"][0]["cluster"] in strain0_clusters
    assert response["clusters"], "prevalence table empty"
