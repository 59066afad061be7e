"""Per-edge BSP state (the reference's gather ``prev_val`` hook, kernel.h:17-18)
expressed as E-row loop state — fixed-point and trajectory checks."""

from __future__ import annotations

import numpy as np
import pytest

from hoshizora_spark import Graph, edges_from_pairs, pagerank, smoothed_pagerank
from tests import oracle
from tests.fixtures import ALL_FIXTURES

FIXTURES = ["g1_chain", "g3_star", "g5_multi_dup_isolated"]


def _graph(spark, name: str) -> Graph:
    return Graph.from_edges(edges_from_pairs(spark, ALL_FIXTURES[name]))


def _rank_vec(res, n: int) -> np.ndarray:
    rows = {r["vid"]: r["rank"] for r in res.ranks.collect()}
    return np.array([rows[i] for i in range(n)])


@pytest.mark.parametrize("name", FIXTURES)
def test_smoothed_pagerank_fixed_point_is_pagerank(spark, name):
    """beta damps the trajectory but never moves the answer: at message
    stationarity m* = r(m*)·w, so r(m*) is the plain PageRank fixed point."""
    g = _graph(spark, name)
    res = smoothed_pagerank(g, beta=0.5, tol=1e-9, max_iters=600)
    assert res.converged
    got = _rank_vec(res, g.num_vertices)
    want = oracle.pagerank(ALL_FIXTURES[name], tol=1e-9)
    assert np.allclose(got, want, atol=1e-6), f"{name}: max err {np.abs(got - want).max()}"


def test_beta_one_reduces_to_reference_recurrence(spark):
    """With beta=1 the smoothing term vanishes and k edge-state supersteps
    reproduce the plain recurrence exactly (k+1 rank iterations: m_0 already
    encodes r_0=1, and the final rank read applies one more fold)."""
    name = "g3_star"
    g = _graph(spark, name)
    k = 7
    res = smoothed_pagerank(g, beta=1.0, tol=None, max_iters=k)
    got = _rank_vec(res, g.num_vertices)
    want = _rank_vec(pagerank(g, tol=None, max_iters=k + 1), g.num_vertices)
    assert np.allclose(got, want, atol=1e-12), f"max err {np.abs(got - want).max()}"


def test_prev_value_is_actually_read(spark):
    """One superstep at beta=0.5 must blend the previous edge value with the
    fresh contribution — distinguishable from both beta=1 (no memory) and
    zero supersteps (all memory)."""
    g = _graph(spark, "g1_chain")
    one = smoothed_pagerank(g, beta=0.5, tol=None, max_iters=1)
    msgs = {(r["src"], r["dst"]): r["m"] for r in one.messages.collect()}
    # chain 0->1->2: w = 1.0 on each edge; m_0 = 1.0; r_1(0) = 0.15/3,
    # r_1(1) = 0.85·1 + 0.15/3 — so m_1(0,1) = 0.5·1 + 0.5·r_1(0)·1
    n = g.num_vertices
    r1_0 = 0.15 / n
    r1_1 = 0.85 * 1.0 + 0.15 / n
    assert msgs[(0, 1)] == pytest.approx(0.5 * 1.0 + 0.5 * r1_0, abs=1e-15)
    assert msgs[(1, 2)] == pytest.approx(0.5 * 1.0 + 0.5 * r1_1, abs=1e-15)


def test_bad_beta_rejected(spark):
    g = _graph(spark, "g1_chain")
    with pytest.raises(ValueError):
        smoothed_pagerank(g, beta=0.0)
    with pytest.raises(ValueError):
        smoothed_pagerank(g, beta=1.5)
