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
