"""Deterministic random-walk corpus vs a Python replay oracle."""

from __future__ import annotations

import pytest

from hoshizora_spark import Graph, edges_from_pairs, random_walks, walks_as_sentences
from tests import oracle
from tests.fixtures import ALL_FIXTURES


def _corpus(res):
    return {(r["walk_id"], r["step"], r["vid"]) for r in res.corpus.collect()}


@pytest.mark.parametrize("name", ["g1_chain", "g2_cycle", "g4_two_triangles_bridge",
                                  "g5_multi_dup_isolated", "g6_powerlaw"])
def test_walks_match_replay_oracle(spark, name):
    edges = ALL_FIXTURES[name]
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    res = random_walks(g, walk_length=6, walks_per_vertex=2, seed=3)
    got = _corpus(res)
    want = oracle.random_walks(edges, 6, 2, 3, g.num_vertices)
    assert got == want, name


def test_walks_deterministic_and_seed_sensitive(spark):
    edges = ALL_FIXTURES["g6_powerlaw"]
    g = Graph.from_edges(edges_from_pairs(spark, edges))
    a = _corpus(random_walks(g, walk_length=5, walks_per_vertex=1, seed=1))
    b = _corpus(random_walks(g, walk_length=5, walks_per_vertex=1, seed=1))
    c = _corpus(random_walks(g, walk_length=5, walks_per_vertex=1, seed=2))
    assert a == b
    assert a != c  # different seed, different corpus


def test_walks_dead_end_terminates(spark):
    # 0 -> 1 -> 2 (dead end): every walk from 0 has exactly 3 rows
    g = Graph.from_edges(edges_from_pairs(spark, [(0, 1), (1, 2)]))
    res = random_walks(g, walk_length=10, walks_per_vertex=1, seed=0)
    rows = sorted(_corpus(res))
    by_wid = {}
    for wid, step, vid in rows:
        by_wid.setdefault(wid, []).append((step, vid))
    assert by_wid[0] == [(0, 0), (1, 1), (2, 2)]
    assert by_wid[1] == [(0, 1), (1, 2)]
    assert by_wid[2] == [(0, 2)]


def test_walks_multi_edge_weighting(spark):
    """g5 has (0,1) twice: both idx 0 and 1 map to dst 1 — the walk from
    0 always moves to 1 regardless of the pick (frequency-proportional)."""
    g = Graph.from_edges(edges_from_pairs(spark, ALL_FIXTURES["g5_multi_dup_isolated"]))
    for seed in (0, 1, 2):
        res = random_walks(g, walk_length=1, walks_per_vertex=1, seed=seed)
        step1 = {r["vid"] for r in res.corpus.filter("step = 1 AND walk_id = 0").collect()}
        assert step1 == {1}, seed


def test_walks_sentences_rollup(spark):
    g = Graph.from_edges(edges_from_pairs(spark, [(0, 1), (1, 2)]))
    res = random_walks(g, walk_length=10, walks_per_vertex=1, seed=0)
    sent = {r["walk_id"]: r["path"] for r in walks_as_sentences(res).collect()}
    assert sent == {0: [0, 1, 2], 1: [1, 2], 2: [2]}


def test_walks_bounds(spark):
    g = Graph.from_edges(edges_from_pairs(spark, [(0, 1)]))
    with pytest.raises(ValueError, match="seed"):
        random_walks(g, seed=10_001)
    with pytest.raises(ValueError, match="walk_length"):
        random_walks(g, walk_length=0)
