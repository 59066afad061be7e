"""Densest subgraph peeling: replay oracle + approximation sanity."""

from __future__ import annotations

import numpy as np
import pytest

from hoshizora_spark import Graph, densest_subgraph, edges_from_pairs
from tests import oracle
from tests.fixtures import ALL_FIXTURES


def _result(res):
    rows = res.vertices.collect()
    S = {r["vid"] for r in rows}
    dens = {r["density"] for r in rows}
    assert len(dens) <= 1
    return S, (dens.pop() if dens else res.density)


@pytest.mark.parametrize("name", sorted(ALL_FIXTURES))
def test_densest_matches_replay(spark, name):
    edges = ALL_FIXTURES[name]
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    res = densest_subgraph(g)
    assert res.converged
    got_S, got_rho = _result(res)
    want_rho, want_round, want_S = oracle.densest_subgraph_peel(
        edges, num_vertices=g.num_vertices
    )
    assert got_S == want_S, name
    assert res.best_round == want_round
    np.testing.assert_allclose(got_rho, want_rho)


def test_densest_finds_planted_clique(spark):
    # K6 planted in a long path: the clique (density 2.5) must win
    clique = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    path = [(i, i + 1) for i in range(6, 30)]
    g = Graph.from_edges(edges_from_pairs(spark, clique + path + [(5, 6)]))
    res = densest_subgraph(g, eps=0.1)
    S, rho = _result(res)
    assert set(range(6)) <= S
    assert rho >= 2.5 / (2 * 1.1)  # approximation guarantee vs K6 itself


def test_densest_edgeless(spark):
    g = Graph.from_edges(edges_from_pairs(spark, [(0, 0), (3, 3)]))
    res = densest_subgraph(g)
    S, rho = _result(res)
    assert S == set(range(4)) and rho == 0.0


def test_densest_eps_guard(spark):
    g = Graph.from_edges(edges_from_pairs(spark, [(0, 1)]))
    with pytest.raises(ValueError, match="eps"):
        densest_subgraph(g, eps=-0.1)
