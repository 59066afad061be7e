"""k-truss h-index fixpoint vs the exact peeling oracle."""

from __future__ import annotations

import numpy as np
import pytest

from hoshizora_spark import Graph, edges_from_pairs, k_truss
from tests import oracle
from tests.fixtures import ALL_FIXTURES


def _truss(g):
    res = k_truss(g)
    assert res.converged
    return {(r["a"], r["b"]): r["trussness"] for r in res.trussness.collect()}


@pytest.mark.parametrize("name", sorted(ALL_FIXTURES))
def test_truss_matches_peeling_fixtures(spark, name):
    edges = ALL_FIXTURES[name]
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    assert _truss(g) == oracle.k_truss(edges), name


def test_truss_k4_plus_tail(spark):
    """K4 (trussness 4 everywhere) with a pendant edge (trussness 2) and
    one extra triangle hanging off a K4 vertex (trussness 3)."""
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),  # K4
             (3, 4),                                          # pendant
             (0, 5), (1, 5)]                                  # extra triangle
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    got = _truss(g)
    want = oracle.k_truss(edges)
    assert got == want
    assert got[(3, 4)] == 2
    assert got[(0, 5)] == got[(1, 5)] == 3
    assert got[(2, 3)] == 4


def test_truss_random_graphs(spark):
    rng = np.random.default_rng(23)
    for trial in range(3):
        V = 40
        E = int(4 * V)
        edges = [(int(rng.integers(V)), int(rng.integers(V))) for _ in range(E)]
        g = Graph.from_edges(edges_from_pairs(spark, edges), num_vertices=V)
        assert _truss(g) == oracle.k_truss(edges), trial
