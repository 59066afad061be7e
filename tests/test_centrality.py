"""Harmonic centrality: exact vs BFS-derived oracle; HyperBall accuracy."""

from __future__ import annotations

import numpy as np
import pytest

from hoshizora_spark import (
    Graph,
    edges_from_pairs,
    harmonic_centrality,
    harmonic_centrality_hll,
)
from tests import oracle
from tests.fixtures import ALL_FIXTURES


def _exact_harmonic(edges, num_vertices, directed):
    """H(v) = sum over sources u != v of 1/d(u -> v)."""
    h = np.zeros(num_vertices)
    for s in range(num_vertices):
        d = oracle.bfs_distances(edges, [s], directed=directed, num_vertices=num_vertices)
        for t in range(num_vertices):
            if t != s and d[t] > 0:
                h[t] += 1.0 / d[t]
    return h


@pytest.mark.parametrize("name", ["g1_chain", "g3_star", "g4_two_triangles_bridge",
                                  "g5_multi_dup_isolated", "g6_powerlaw"])
@pytest.mark.parametrize("directed", [True, False])
def test_harmonic_matches_bfs(spark, name, directed):
    edges = ALL_FIXTURES[name]
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    res = harmonic_centrality(g, directed=directed)
    assert res.converged
    rows = {r["vid"]: r["centrality"] for r in res.centrality.collect()}
    want = _exact_harmonic(edges, g.num_vertices, directed)
    got = np.array([rows[v] for v in range(g.num_vertices)])
    assert np.allclose(got, want, atol=1e-12), f"{name} directed={directed}"


def test_harmonic_cap_guard(spark):
    from hoshizora_spark.algorithms import centrality as cmod

    g = Graph.from_edges(
        edges_from_pairs(spark, [(0, 1)]), num_vertices=cmod.MAX_EXACT_VERTICES + 1
    )
    with pytest.raises(ValueError, match="harmonic_centrality_hll"):
        harmonic_centrality(g)


def test_harmonic_hll_rank_quality(spark):
    """HyperBall at m=256 on the 200-vertex power-law graph: estimates
    within 20% per vertex-average, and the top-10 ranking overlaps the
    exact top-10 strongly (the use case is ranking, not point values)."""
    edges = ALL_FIXTURES["g6_powerlaw"]
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    want = _exact_harmonic(edges, g.num_vertices, directed=False)
    res = harmonic_centrality_hll(g, m=256, directed=False)
    assert res.converged
    rows = {r["vid"]: r["centrality"] for r in res.centrality.collect()}
    got = np.array([rows[v] for v in range(g.num_vertices)])
    # aggregate accuracy: mean relative error over non-isolated vertices
    nz = want > 0
    rel = np.abs(got[nz] - want[nz]) / want[nz]
    assert rel.mean() < 0.2, rel.mean()
    top_exact = set(np.argsort(-want)[:10])
    top_hll = set(np.argsort(-got)[:10])
    assert len(top_exact & top_hll) >= 6, (top_exact, top_hll)
    # determinism
    res2 = harmonic_centrality_hll(g, m=256, directed=False)
    rows2 = {r["vid"]: r["centrality"] for r in res2.centrality.collect()}
    assert rows == rows2


def test_harmonic_hll_m_guard(spark):
    g = Graph.from_edges(edges_from_pairs(spark, [(0, 1)]))
    with pytest.raises(ValueError, match="power of two"):
        harmonic_centrality_hll(g, m=100)


def test_degree_assortativity_golden(spark):
    """Star graph: every edge pairs the hub (deg n) with a leaf (deg 1) ->
    r = -1 exactly. Chain of 5: known value vs a numpy Pearson oracle."""
    from hoshizora_spark import degree_assortativity

    g = Graph.from_edges(edges_from_pairs(spark, ALL_FIXTURES["g3_star"]))
    row = degree_assortativity(g).first()
    assert row["assortativity"] == -1.0

    edges = ALL_FIXTURES["g6_powerlaw"]
    g2 = Graph.from_edges(edges_from_pairs(spark, edges))
    row2 = degree_assortativity(g2).first()
    und = oracle._undirected_simple(edges)
    deg = np.zeros(g2.num_vertices, dtype=np.int64)
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    dx = np.array([deg[a] for a, b in und] + [deg[b] for a, b in und], dtype=np.float64)
    dy = np.array([deg[b] for a, b in und] + [deg[a] for a, b in und], dtype=np.float64)
    want = np.corrcoef(dx, dy)[0, 1]
    assert row2["n_stubs"] == 2 * len(und)
    assert abs(row2["assortativity"] - want) < 1e-6


def test_degree_assortativity_null_on_regular(spark):
    """K3 is 2-regular: zero degree variance -> NULL, not a div-by-zero."""
    from hoshizora_spark import degree_assortativity

    g = Graph.from_edges(edges_from_pairs(spark, [(0, 1), (1, 2), (0, 2)]))
    row = degree_assortativity(g).first()
    assert row["n_stubs"] == 6 and row["assortativity"] is None


def _hits_numpy(edges, num_vertices, iters):
    """Sequential L1-normalized half-steps; mirrors hits() exactly."""
    a = np.ones(num_vertices)
    h = np.ones(num_vertices)
    for _ in range(iters):
        ar = np.zeros(num_vertices)
        for s, t in edges:
            ar[t] += h[s]
        a = ar / ar.sum() if ar.sum() > 0 else np.zeros(num_vertices)
        hr = np.zeros(num_vertices)
        for s, t in edges:
            hr[s] += a[t]
        h = hr / hr.sum() if hr.sum() > 0 else np.zeros(num_vertices)
    return a, h


@pytest.mark.parametrize("name", ["g1_chain", "g3_star", "g6_powerlaw"])
def test_hits_fixed_iters_matches_numpy(spark, name):
    from hoshizora_spark import hits

    edges = ALL_FIXTURES[name]
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    res = hits(g, max_iters=12, tol=None)
    assert res.iterations == 12
    want_a, want_h = _hits_numpy(edges, g.num_vertices, 12)
    rows = {r["vid"]: r for r in res.scores.collect()}
    assert len(rows) == g.num_vertices
    for v in range(g.num_vertices):
        assert abs(rows[v]["authority"] - want_a[v]) < 1e-9, (name, v)
        assert abs(rows[v]["hub"] - want_h[v]) < 1e-9, (name, v)


def test_hits_tol_converges(spark):
    from hoshizora_spark import hits

    g = Graph.from_edges(edges_from_pairs(spark, ALL_FIXTURES["g6_powerlaw"]))
    res = hits(g, max_iters=200, tol=1e-10)
    assert res.converged and res.iterations < 200
    # stationary point: one more sequential round moves nothing
    want_a, want_h = _hits_numpy(
        ALL_FIXTURES["g6_powerlaw"], g.num_vertices, res.iterations + 20
    )
    rows = {r["vid"]: r for r in res.scores.collect()}
    for v in range(g.num_vertices):
        assert abs(rows[v]["authority"] - want_a[v]) < 1e-7
        assert abs(rows[v]["hub"] - want_h[v]) < 1e-7


def test_hits_edgeless_graph_zero(spark):
    from hoshizora_spark import hits

    g = Graph.from_edges(edges_from_pairs(spark, [(0, 1)]).filter("src > 99"),
                         num_vertices=3)
    res = hits(g, max_iters=3, tol=None)
    rows = {r["vid"]: r for r in res.scores.collect()}
    assert len(rows) == 3
    assert all(rows[v]["authority"] == 0.0 and rows[v]["hub"] == 0.0 for v in rows)
