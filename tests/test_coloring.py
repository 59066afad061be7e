"""Greedy coloring: replay oracle, properness, compactness invariants."""

from __future__ import annotations

import numpy as np
import pytest

from hoshizora_spark import Graph, edges_from_pairs, greedy_coloring
from tests import oracle
from tests.fixtures import ALL_FIXTURES


def _colors(res, num_vertices):
    rows = {r["vid"]: r["color"] for r in res.colors.collect()}
    assert len(rows) == num_vertices
    return np.array([rows[v] for v in range(num_vertices)])


def _assert_proper_and_compact(edges, got):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    for a, b in und:
        assert got[a] != got[b], (a, b)
    # greedy mex never skips a color: 0..max all used, and every vertex's
    # color is within its degree+1 bound
    assert got.min() == 0
    assert set(range(got.max() + 1)) <= set(got.tolist())
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for v in range(len(got)):
        assert got[v] <= deg.get(v, 0), v


@pytest.mark.parametrize("name", sorted(ALL_FIXTURES))
def test_coloring_matches_replay(spark, name):
    edges = ALL_FIXTURES[name]
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    res = greedy_coloring(g, seed=5)
    assert res.converged
    got = _colors(res, g.num_vertices)
    want = oracle.greedy_coloring(edges, 5, g.num_vertices)
    assert (got == want).all(), name
    _assert_proper_and_compact(edges, got)


def test_coloring_random_graphs_multiple_seeds(spark):
    rng = np.random.default_rng(23)
    V = 50
    edges = [(int(rng.integers(V)), int(rng.integers(V))) for _ in range(3 * V)]
    g = Graph.from_edges(edges_from_pairs(spark, edges), num_vertices=V)
    for seed in (0, 9):
        got = _colors(greedy_coloring(g, seed=seed), V)
        want = oracle.greedy_coloring(edges, seed, V)
        assert (got == want).all(), seed
        _assert_proper_and_compact(edges, got)


def test_coloring_bipartite_star_two_colors(spark):
    g = Graph.from_edges(edges_from_pairs(spark, [(0, i) for i in range(1, 8)]))
    got = _colors(greedy_coloring(g, seed=1), 8)
    assert got.max() <= 1  # star is bipartite; greedy mex needs only 2


def test_coloring_seed_bound(spark):
    g = Graph.from_edges(edges_from_pairs(spark, [(0, 1)]))
    with pytest.raises(ValueError, match="seed"):
        greedy_coloring(g, seed=10_001)


@pytest.mark.parametrize("name", sorted(ALL_FIXTURES))
def test_coloring_degree_order_matches_replay(spark, name):
    edges = ALL_FIXTURES[name]
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    res = greedy_coloring(g, seed=5, degree_order=True)
    assert res.converged
    got = _colors(res, g.num_vertices)
    want = oracle.greedy_coloring_degree(edges, 5, g.num_vertices)
    assert (got == want).all(), name
    _assert_proper_and_compact(edges, got)


def test_coloring_degree_order_hub_first(spark):
    # star: the hub has max degree, wins round 0, leaves all color in
    # round 1 -> exactly 2 rounds regardless of seed
    g = Graph.from_edges(edges_from_pairs(spark, [(0, i) for i in range(1, 9)]))
    for seed in (0, 7):
        res = greedy_coloring(g, seed=seed, degree_order=True)
        assert res.rounds == 2
        got = _colors(res, 9)
        assert got[0] == 0 and (got[1:] == 1).all()
