"""Skew salting: correctness of the salted-join regime on hub graphs."""

from __future__ import annotations

import numpy as np

from hoshizora_spark import Graph, edges_from_pairs, pagerank
from hoshizora_spark.runtime.skew import hot_keys, salted_join_edges_state, salted_sum
from tests import oracle


def _hub_graph(n_spokes: int = 100) -> list[tuple[int, int]]:
    """Vertex 0 is a hub with out-edges to every spoke and back-edges."""
    edges = []
    for i in range(1, n_spokes + 1):
        edges.append((0, i))
        if i % 3 == 0:
            edges.append((i, 0))
    return edges


def test_hot_keys_detects_hub(spark):
    edges = edges_from_pairs(spark, _hub_graph())
    hot = hot_keys(edges, "src", min_count=50)
    assert [r["src"] for r in hot.collect()] == [0]


def test_pagerank_salted_matches_oracle(spark):
    pairs = _hub_graph()
    g = Graph.from_edges(edges_from_pairs(spark, pairs))
    # force the shuffle regime (broadcast off) + salting of the hub
    res = pagerank(
        g, tol=1e-9, max_iters=300, broadcast_vertices=0, salt_hot_degree=10, num_salts=4
    )
    rows = {r["vid"]: r["rank"] for r in res.ranks.collect()}
    got = np.array([rows[i] for i in range(g.num_vertices)])
    want = oracle.pagerank(pairs, tol=1e-9)
    assert np.allclose(got, want, atol=1e-6)


def test_salted_join_covers_cold_and_hot(spark):
    pairs = _hub_graph(20)
    edges = edges_from_pairs(spark, pairs)
    state = (
        edges.selectExpr("src").union(edges.selectExpr("dst as src")).distinct()
    ).selectExpr("src", "cast(src as double) as rank")
    hot = hot_keys(edges, "src", min_count=5)
    joined = salted_join_edges_state(edges, state, "src", hot, num_salts=3)
    # every edge row survives exactly once with its state value attached
    assert joined.count() == len(pairs)
    assert joined.filter("rank != cast(src as double)").count() == 0


def test_salted_sum_equals_plain_sum(spark):
    pairs = _hub_graph(50)
    edges = edges_from_pairs(spark, pairs)
    from pyspark.sql import functions as F

    plain = {r["dst"]: r["s"] for r in edges.groupBy("dst").agg(
        F.count("*").cast("double").alias("s")
    ).collect()}
    salted = {r["dst"]: r["s"] for r in salted_sum(
        edges, "dst", F.lit(1.0), "s", num_salts=4
    ).collect()}
    assert plain == salted
