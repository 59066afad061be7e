"""Weighted-edge PageRank: rank flow proportional to edge weight."""

from __future__ import annotations

import numpy as np

from hoshizora_spark import Graph, pagerank
from pyspark.sql import functions as F


def _oracle_weighted(edges_w, V, tol=1e-9, iters=5000):
    tot = np.zeros(V)
    for s, d, w in edges_w:
        tot[s] += w
    rank = np.ones(V)
    base = 0.15 / V
    for _ in range(iters):
        acc = np.zeros(V)
        for s, d, w in edges_w:
            acc[d] += rank[s] * w / tot[s]
        new = 0.85 * acc + base
        if np.max(np.abs(new - rank)) <= tol:
            rank = new
            break
        rank = new
    return rank


def test_weighted_pagerank_matches_oracle(spark):
    edges_w = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0), (3, 0, 5.0)]
    df = spark.createDataFrame(edges_w, schema="src long, dst long, wgt double")
    g = Graph.from_edges(df, extra_cols=("wgt",))
    res = pagerank(g, tol=1e-9, max_iters=500, weight_col="wgt")
    rows = {r["vid"]: r["rank"] for r in res.ranks.collect()}
    got = np.array([rows[i] for i in range(4)])
    want = _oracle_weighted(edges_w, 4)
    assert np.allclose(got, want, atol=1e-6)


def test_weighted_pagerank_csr_matches_df(spark):
    """Weighted CSR fast path ≡ weighted DataFrame path (reference e_props,
    core/graph.h:74 — weights now live on the CSR blocks, not DF-only)."""
    from hoshizora_spark import pagerank_csr

    edges_w = [
        (0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0), (3, 0, 5.0),
        (3, 1, 0.5), (1, 2, 1.5),  # multi-edge: shares must sum per (src,dst)
    ]
    df = spark.createDataFrame(edges_w, schema="src long, dst long, wgt double")
    g = Graph.from_edges(df, extra_cols=("wgt",))
    a = pagerank(g, tol=1e-10, max_iters=500, weight_col="wgt")
    b = pagerank_csr(g, tol=1e-10, max_iters=500, weight_col="wgt")
    ra = {r["vid"]: r["rank"] for r in a.ranks.collect()}
    rb = {r["vid"]: r["rank"] for r in b.ranks.collect()}
    assert set(ra) == set(rb)
    assert all(abs(ra[k] - rb[k]) < 1e-9 for k in ra)
    want = _oracle_weighted(edges_w, 4)
    got = np.array([rb[i] for i in range(4)])
    assert np.allclose(got, want, atol=1e-6)


def test_uniform_weights_equal_unweighted(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
    plain = spark.createDataFrame(pairs, schema="src long, dst long")
    weighted = plain.withColumn("wgt", F.lit(7.5))
    a = pagerank(Graph.from_edges(plain), tol=1e-10, max_iters=500)
    b = pagerank(
        Graph.from_edges(weighted, extra_cols=("wgt",)),
        tol=1e-10, max_iters=500, weight_col="wgt",
    )
    ra = {r["vid"]: r["rank"] for r in a.ranks.collect()}
    rb = {r["vid"]: r["rank"] for r in b.ranks.collect()}
    assert all(abs(ra[k] - rb[k]) < 1e-9 for k in ra)
