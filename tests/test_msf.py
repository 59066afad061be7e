"""Borůvka MSF vs Kruskal oracle: unique forest under (w, a, b) order."""

from __future__ import annotations

import numpy as np
import pytest

from hoshizora_spark import Graph, edges_from_pairs, minimum_spanning_forest
from tests import oracle
from tests.fixtures import ALL_FIXTURES


def _forest(res):
    return {(r["a"], r["b"], r["w"]) for r in res.edges.collect()}


@pytest.mark.parametrize("name", sorted(ALL_FIXTURES))
def test_msf_unit_weights_matches_kruskal(spark, name):
    edges = ALL_FIXTURES[name]
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    res = minimum_spanning_forest(g)
    assert res.converged
    assert _forest(res) == oracle.kruskal_msf(edges, num_vertices=g.num_vertices)


def test_msf_weighted_random_graphs(spark):
    rng = np.random.default_rng(41)
    for trial in range(2):
        V = 40
        pairs = {
            (min(a, b), max(a, b))
            for a, b in (
                (int(rng.integers(V)), int(rng.integers(V))) for _ in range(4 * V)
            )
            if a != b
        }
        weights = {p: float(rng.integers(1, 50)) for p in pairs}  # many ties
        rows = [(a, b, weights[(a, b)]) for a, b in pairs]
        df = spark.createDataFrame(rows, "src long, dst long, w double")
        g = Graph.from_edges(df, num_vertices=V, extra_cols=("w",))
        res = minimum_spanning_forest(g, weight_col="w")
        got = _forest(res)
        want = oracle.kruskal_msf(list(pairs), weights, num_vertices=V)
        assert got == want, trial
        # forest size = V - #components; components partition matches CC
        cc = oracle.connected_components(list(pairs), num_vertices=V)
        assert len(got) == V - len(set(cc.tolist()))
        comp = {r["vid"]: r["comp"] for r in res.components.collect()}
        by_label: dict[int, set[int]] = {}
        for v, c in comp.items():
            by_label.setdefault(c, set()).add(v)
        cc_groups = {}
        for v in range(V):
            cc_groups.setdefault(int(cc[v]), set()).add(v)
        assert set(map(frozenset, by_label.values())) == set(
            map(frozenset, cc_groups.values())
        )


def test_msf_total_weight_path_vs_heavy_chord(spark):
    # triangle with one heavy edge: forest keeps the two light edges
    df = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 10.0)], "src long, dst long, w double"
    )
    g = Graph.from_edges(df, extra_cols=("w",))
    got = _forest(minimum_spanning_forest(g, weight_col="w"))
    assert got == {(0, 1, 1.0), (1, 2, 2.0)}


def test_msf_empty_graph(spark):
    df = spark.createDataFrame([(0, 0, 1.0)], "src long, dst long, w double")
    g = Graph.from_edges(df, extra_cols=("w",))
    res = minimum_spanning_forest(g, weight_col="w")
    assert res.converged and res.edges.count() == 0
