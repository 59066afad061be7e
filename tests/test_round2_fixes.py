"""Regression tests for the round-2 advisor findings (ADVICE.md r01).

* word_ngrams on docs shorter than n tokens (was: descending F.sequence →
  F.slice ANSI crash aborting the whole job)
* read_edge_list / stream parse on malformed tokens (was: ANSI cast abort)
* personalized_pagerank seed validation (was: silent rank bias)
* salted_sum salt spread with a 1-partition upstream (was: salt space
  collapsed to spark_partition_id % k)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hoshizora_spark import Graph, edges_from_pairs, personalized_pagerank, text
from hoshizora_spark.io import read_edge_list
from hoshizora_spark.runtime.skew import SALT_COL


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_word_ngrams_short_docs_yield_no_grams(spark):
    docs = _docs(
        spark,
        [(1, "only two"), (2, "one"), (3, ""), (4, "a full three gram doc here")],
    )
    got = {(r["doc_id"], r["gram"]) for r in text.word_ngrams(docs, n=3).collect()}
    assert all(d == 4 for d, _ in got)
    assert ("a full three" in {g for _, g in got})
    assert len(got) == 4  # 6 tokens -> 4 trigrams


def test_jaccard_pairs_survive_short_docs(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta eta"),
            (3, "x"),  # < n tokens: must not crash the join
            (4, "y z"),
        ],
    )
    pairs = text.jaccard_pairs(docs, n=3, threshold=0.5).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {(1, 2)}


def test_minhash_pipeline_survives_short_docs(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta eta"),
            (3, "too short"),
        ],
    )
    res = text.minhash_near_dups(docs, threshold=0.5).collect()
    assert {(r["a"], r["b"]) for r in res} == {(1, 2)}


def test_read_edge_list_drops_malformed_tokens(spark, tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text("0 1\n# comment\n1 2\nbogus line\n2 notanint\n3 4\n")
    got = sorted(
        (r["src"], r["dst"]) for r in read_edge_list(spark, str(p)).collect()
    )
    assert got == [(0, 1), (1, 2), (3, 4)]


def test_personalized_pagerank_rejects_out_of_domain_seeds(spark):
    g = Graph.from_edges(edges_from_pairs(spark, [(0, 1), (1, 2), (2, 0)]))
    with pytest.raises(ValueError, match="outside vertex domain"):
        personalized_pagerank(g, sources=[1, 99])


def test_salted_sum_spreads_on_single_partition_upstream(spark):
    from hoshizora_spark.runtime.skew import salted_sum

    # one hot key, identical payloads, forced into ONE upstream partition:
    # the old partition-id salt would collapse to a single salt value
    df = spark.createDataFrame(
        [(7, 1.0)] * 400, schema="k long, v double"
    ).coalesce(1)
    out = salted_sum(df, "k", F.col("v"), "s", num_salts=8).collect()
    assert out == [(7, 400.0)] or (out[0]["k"] == 7 and out[0]["s"] == 400.0)
    # inspect stage-1 spread directly
    salted = df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(F.col("v"), F.monotonically_increasing_id()), F.lit(8)),
    )
    n_salts = salted.select(SALT_COL).distinct().count()
    assert n_salts >= 4  # uniform-ish over 8 salts, never 1


# ---- from_adjacency (reference core/graph.h:551-622 parity) ----


def test_from_adjacency_mirrors_reference_builder(spark):
    """Fixture mirrors the reference semantics: V = list length (isolated
    trailing vertex counts), duplicate neighbors kept on the out side,
    deduped on the gather side, round-trips through to_adjacency."""
    adj = spark.createDataFrame(
        [(0, [1, 2, 1]), (1, [2]), (2, []), (3, [0])],
        schema="vid long, neighbors array<long>",
    )
    g = Graph.from_adjacency(adj)
    assert g.num_vertices == 4
    edges = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    assert edges == [(0, 1), (0, 1), (0, 2), (1, 2), (3, 0)]  # dup kept

    g_in = Graph.from_adjacency(adj, dedup=True)
    edges_in = sorted((r["src"], r["dst"]) for r in g_in.edges.collect())
    assert edges_in == [(0, 1), (0, 2), (1, 2), (3, 0)]  # std::set view
    # in-degrees of the gather-side view: vertex 1 sees src 0 once
    indeg = {r["dst"]: r["in_deg"] for r in g_in.in_degrees.collect()}
    assert indeg[1] == 1

    back = {r["vid"]: r["neighbors"] for r in g.to_adjacency().collect()}
    assert back == {0: [1, 1, 2], 1: [2], 2: [], 3: [0]}


def test_from_adjacency_pagerank_equals_from_edges(spark):
    """The two builders must define the same graph for the algorithms."""
    from hoshizora_spark import pagerank

    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0)]
    g_e = Graph.from_edges(edges_from_pairs(spark, pairs))
    adj_rows = [(v, sorted(d for s, d in pairs if s == v)) for v in range(4)]
    g_a = Graph.from_adjacency(
        spark.createDataFrame(adj_rows, schema="vid long, neighbors array<long>")
    )
    r_e = {r["vid"]: r["rank"] for r in pagerank(g_e, tol=1e-9).ranks.collect()}
    r_a = {r["vid"]: r["rank"] for r in pagerank(g_a, tol=1e-9).ranks.collect()}
    assert all(abs(r_e[v] - r_a[v]) < 1e-12 for v in range(4))
