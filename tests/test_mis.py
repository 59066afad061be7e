"""Luby maximal independent set: replay oracle + structural invariants."""

from __future__ import annotations

import numpy as np
import pytest

from hoshizora_spark import Graph, edges_from_pairs, maximal_independent_set
from tests import oracle
from tests.fixtures import ALL_FIXTURES


def _members(res, num_vertices):
    rows = {r["vid"]: r["in_mis"] for r in res.members.collect()}
    assert len(rows) == num_vertices
    return np.array([rows[v] for v in range(num_vertices)])


def _assert_mis_invariants(edges, got):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    # independence: no edge inside the set
    for a, b in und:
        assert not (got[a] == 1 and got[b] == 1), (a, b)
    # maximality: every excluded vertex has a member neighbor
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v in range(len(got)):
        if got[v] == 0:
            assert any(got[u] == 1 for u in adj.get(v, ())), v


@pytest.mark.parametrize("name", sorted(ALL_FIXTURES))
def test_mis_matches_replay_and_invariants(spark, name):
    edges = ALL_FIXTURES[name]
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    res = maximal_independent_set(g, seed=5)
    assert res.converged
    got = _members(res, g.num_vertices)
    want = oracle.luby_mis(edges, 5, g.num_vertices)
    assert (got == want).all(), name
    _assert_mis_invariants(edges, got)


def test_mis_random_graphs_multiple_seeds(spark):
    rng = np.random.default_rng(31)
    for trial in range(2):
        V = 50
        edges = [
            (int(rng.integers(V)), int(rng.integers(V))) for _ in range(3 * V)
        ]
        g = Graph.from_edges(edges_from_pairs(spark, edges), num_vertices=V)
        for seed in (0, 9):
            res = maximal_independent_set(g, seed=seed)
            got = _members(res, V)
            want = oracle.luby_mis(edges, seed, V)
            assert (got == want).all(), (trial, seed)
            _assert_mis_invariants(edges, got)


def test_mis_isolated_vertices_always_in(spark):
    # g5 has isolated vertex 3 (V=6): it must be in every MIS
    g = Graph.from_edges(edges_from_pairs(spark, ALL_FIXTURES["g5_multi_dup_isolated"]))
    for seed in (0, 1, 2):
        got = _members(maximal_independent_set(g, seed=seed), g.num_vertices)
        assert got[3] == 1, seed


def test_mis_seed_bound(spark):
    g = Graph.from_edges(edges_from_pairs(spark, [(0, 1)]))
    with pytest.raises(ValueError, match="seed"):
        maximal_independent_set(g, seed=10_001)
