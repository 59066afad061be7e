"""Brandes betweenness: exact oracle replay, sampled replay, known values."""

from __future__ import annotations

import numpy as np
import pytest

from hoshizora_spark import Graph, betweenness_centrality, edges_from_pairs
from tests import oracle
from tests.fixtures import ALL_FIXTURES


def _scores(res, num_vertices):
    rows = {r["vid"]: r["betweenness"] for r in res.centrality.collect()}
    assert len(rows) == num_vertices
    return np.array([rows[v] for v in range(num_vertices)])


@pytest.mark.parametrize("name", sorted(ALL_FIXTURES))
def test_betweenness_exact_matches_brandes(spark, name):
    edges = ALL_FIXTURES[name]
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    res = betweenness_centrality(g)
    assert res.converged
    got = _scores(res, g.num_vertices)
    want = oracle.brandes_betweenness(edges, num_vertices=g.num_vertices)
    np.testing.assert_allclose(got, want, atol=1e-9), name


def test_betweenness_path_graph_known_values(spark):
    # P4: inner vertices broker 2 unordered pairs each (NetworkX
    # betweenness_centrality(normalized=False) convention)
    g = Graph.from_edges(edges_from_pairs(spark, [(0, 1), (1, 2), (2, 3)]))
    got = _scores(betweenness_centrality(g), 4)
    np.testing.assert_allclose(got, [0.0, 2.0, 2.0, 0.0], atol=1e-12)


def test_betweenness_star_center(spark):
    g = Graph.from_edges(edges_from_pairs(spark, [(0, i) for i in range(1, 5)]))
    got = _scores(betweenness_centrality(g), 5)
    np.testing.assert_allclose(got, [6.0, 0, 0, 0, 0], atol=1e-12)


def test_betweenness_directed(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    got = _scores(betweenness_centrality(g, directed=True), g.num_vertices)
    want = oracle.brandes_betweenness(edges, directed=True)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_betweenness_sampled_replay(spark):
    rng = np.random.default_rng(17)
    V = 40
    edges = [(int(rng.integers(V)), int(rng.integers(V))) for _ in range(3 * V)]
    g = Graph.from_edges(edges_from_pairs(spark, edges), num_vertices=V)
    for seed, mod in ((0, 2), (4, 3)):
        res = betweenness_centrality(g, sample_mod=mod, seed=seed)
        got = _scores(res, V)
        want = oracle.brandes_betweenness(
            edges, sample_mod=mod, seed=seed, num_vertices=V
        )
        assert res.num_sources > 0
        np.testing.assert_allclose(got, want, atol=1e-9), (seed, mod)


def test_betweenness_guards(spark):
    g = Graph.from_edges(edges_from_pairs(spark, [(0, 1)]))
    with pytest.raises(ValueError, match="seed"):
        betweenness_centrality(g, seed=10_001)
    with pytest.raises(ValueError, match="sample_mod"):
        betweenness_centrality(g, sample_mod=0)
