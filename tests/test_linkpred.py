"""Link prediction (common / Jaccard / Adamic–Adar) vs a dict oracle."""

from __future__ import annotations

import numpy as np
import pytest

from hoshizora_spark import Graph, edges_from_pairs, link_prediction
from tests import oracle
from tests.fixtures import ALL_FIXTURES


def _collect(df):
    return {
        (r["u"], r["v"]): (r["common"], r["jaccard"], r["adamic_adar"])
        for r in df.collect()
    }


@pytest.mark.parametrize("name", ["g1_chain", "g3_star", "g4_two_triangles_bridge",
                                  "g6_powerlaw", "g7_bipartite"])
def test_linkpred_matches_oracle(spark, name):
    edges = ALL_FIXTURES[name]
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    got = _collect(link_prediction(g, round_dp=None))
    want = oracle.link_prediction(edges)
    assert set(got) == set(want), name
    for k in want:
        assert got[k][0] == want[k][0], (name, k)
        assert np.isclose(got[k][1], want[k][1], atol=1e-12), (name, k)
        assert np.isclose(got[k][2], want[k][2], atol=1e-12), (name, k)


def test_linkpred_star_semantics(spark):
    """Star: every leaf pair shares exactly the hub; hub degree 5 —
    jaccard 1/1 = ... leaves have degree 1, so J = 1/(1+1-1) = 1."""
    g = Graph.from_edges(edges_from_pairs(spark, ALL_FIXTURES["g3_star"]))
    got = _collect(link_prediction(g, round_dp=None))
    assert set(got) == {(u, v) for u in range(1, 6) for v in range(u + 1, 6)}
    for c, j, a in got.values():
        assert c == 1 and j == 1.0
        assert np.isclose(a, 1.0 / np.log(5.0))


def test_linkpred_hub_cap_and_existing(spark):
    edges = ALL_FIXTURES["g4_two_triangles_bridge"]
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    # hub cap drops high-degree wedge centers
    capped = _collect(link_prediction(g, max_hub_degree=2, round_dp=None))
    want = oracle.link_prediction(edges, max_hub_degree=2)
    assert set(capped) == set(want)
    # include_existing scores adjacent pairs too
    full = _collect(link_prediction(g, include_existing=True, round_dp=None))
    want_full = oracle.link_prediction(edges, include_existing=True)
    assert set(full) == set(want_full)
    for k in want_full:
        assert full[k][0] == want_full[k][0]


def test_linkpred_min_common(spark):
    edges = ALL_FIXTURES["g6_powerlaw"]
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    got = _collect(link_prediction(g, min_common=3, round_dp=None))
    want = oracle.link_prediction(edges, min_common=3)
    assert set(got) == set(want)
    assert all(c >= 3 for c, _, _ in got.values())
