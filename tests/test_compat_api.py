"""Reference API-surface parity: file reader, compat wrappers, CLI, clustering."""

from __future__ import annotations

import numpy as np
import pytest

from hoshizora_spark import Graph, clustering, edges_from_pairs, read_edge_list
from hoshizora_spark import compat
from hoshizora_spark.cli import main as cli_main
from tests import oracle
from tests.fixtures import ALL_FIXTURES

G4 = ALL_FIXTURES["g4_two_triangles_bridge"]


@pytest.fixture()
def edge_file(tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text("# comment line\n" + "\n".join(f"{s} {d}" for s, d in G4) + "\n")
    return str(p)


def test_read_edge_list(spark, edge_file):
    got = sorted((r["src"], r["dst"]) for r in read_edge_list(spark, edge_file).collect())
    assert got == sorted(G4)


def test_clustering_two_triangles_golden(spark):
    # hand-computed from the kernel semantics (clustering_louvain.h:26-75):
    # the bridge edge (2,3) has lower modularity gain than intra-triangle
    # edges, so each triangle collapses to one cluster.
    g = Graph.from_edges(edges_from_pairs(spark, G4))
    res = clustering(g)
    rows = {r["vid"]: r["cluster"] for r in res.assign.collect()}
    assert [rows[i] for i in range(6)] == [0, 0, 0, 1, 1, 1]
    assert res.num_clusters == 2
    # dense packing: ids are exactly 0..k-1
    assert sorted({r["cluster"] for r in res.assign.collect()}) == [0, 1]


def test_clustering_deep_coarsen_stops(spark):
    g = Graph.from_edges(edges_from_pairs(spark, G4))
    res = clustering(g, num_clusters_hint=1)
    rows = {r["vid"]: r["cluster"] for r in res.assign.collect()}
    # negative-gain bridge: coarsening cannot merge the two triangles
    assert [rows[i] for i in range(6)] == [0, 0, 0, 1, 1, 1]


def test_compat_pagerank_matches_reference_format(spark, edge_file):
    out = compat.pagerank(edge_file, num_iters=50, spark=spark)
    assert len(out) == 6
    want = oracle.pagerank_fixed_iters(G4, 50)
    got = np.array([float(x) for x in out])
    assert np.allclose(got, want, atol=1e-6)
    assert all("." in x and len(x.split(".")[1]) == 6 for x in out)  # %.6f strings


def test_compat_clustering(spark, edge_file):
    assert compat.clustering(edge_file, spark=spark) == [0, 0, 0, 1, 1, 1]


def test_cli_pagerank(spark, edge_file, capsys):
    rc = cli_main(["pagerank", edge_file, "10"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().split("\n")
    assert len(lines) == 6
    want = oracle.pagerank_fixed_iters(G4, 10)
    assert np.allclose([float(x) for x in lines], want, atol=1e-6)


def test_cli_usage_error():
    assert cli_main([]) == 2
    assert cli_main(["nope"]) == 2
