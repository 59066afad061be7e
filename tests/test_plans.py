"""Physical-plan audits (SURVEY.md §7.3 #4): the plans we ship are the
plans we designed.

* no ``BatchEvalPython`` (row-at-a-time Python) anywhere — Python enters
  only through Arrow (``FlatMapGroupsInPandas`` on the CSR path)
* the small rank/label side broadcasts in the small-V regime
* parquet scans carry pushed filters / pruned schemas
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hoshizora_spark import Graph, edges_from_pairs
from hoshizora_spark.algorithms.pagerank import _weighted_edges
from hoshizora_spark.graph.core import maybe_broadcast
from tests.fixtures import ALL_FIXTURES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _graph(spark):
    return Graph.from_edges(edges_from_pairs(spark, ALL_FIXTURES["g6_powerlaw"]))


def test_no_row_python_in_message_plan(spark):
    g = _graph(spark)
    ew = _weighted_edges(g)
    ranks = g.vertices().withColumn("rank", F.lit(1.0))
    msgs = (
        ew.join(maybe_broadcast(ranks.selectExpr("vid as src", "rank"), g.num_vertices, 10**6), "src")
        .groupBy("dst")
        .agg(F.sum(F.col("rank") * F.col("w")).alias("acc"))
    )
    plan = _plan(msgs)
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_gas_plan_uses_arrow_not_row_python(spark):
    from hoshizora_spark.algorithms.pagerank import PageRankKernel
    from hoshizora_spark.graph.csr import build_csr_blocks
    from hoshizora_spark.runtime.gas import gas_messages, init_state

    g = _graph(spark)
    csr = build_csr_blocks(g, num_blocks=2)
    kernel = PageRankKernel(g.num_vertices)
    msgs = gas_messages(csr, init_state(spark, csr, kernel), kernel)
    plan = _plan(msgs)
    assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" in plan  # Arrow-batched, the only Python entry


def test_parquet_scan_prunes_and_pushes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.filter(F.col("doc_id") < 100).select("doc_id", "lang")
    plan = _plan(q)
    assert "PushedFilters: [" in plan and "LessThan(doc_id,100)" in plan
    # column pruning: text (the wide column) must not be read
    assert "ReadSchema" in plan and "text" not in plan.split("ReadSchema")[1][:200]


def test_triangle_plan_no_cartesian(spark):
    from hoshizora_spark.algorithms.triangles import triangle_triples

    g = _graph(spark)
    plan = _plan(triangle_triples(g))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_cosine_topk_has_no_global_window(spark, sf_dir):
    """The full scored relation must never funnel through a single-task
    Window (VERDICT r01 weak #1): top-k is a per-partition partial +
    bounded merge, so the plan contains no Window operator at all."""
    from hoshizora_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.limit(2).selectExpr("vec_id as query_id", "embedding")
    plan = _plan(similarity.cosine_topk(emb, q, k=3))
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_keyed_gas_plan_uses_arrow_not_row_python(spark):
    from hoshizora_spark.algorithms.labelprop import LabelPropKernel
    from hoshizora_spark.graph.core import Graph as G, symmetrize
    from hoshizora_spark.graph.csr import build_csr_blocks
    from hoshizora_spark.runtime.gas import gas_keyed_counts, init_state

    g = _graph(spark)
    sym_g = G(edges=symmetrize(g.edges), num_vertices=g.num_vertices)
    csr = build_csr_blocks(sym_g, num_blocks=2)
    kernel = LabelPropKernel()
    freq = gas_keyed_counts(csr, init_state(spark, csr, kernel), kernel)
    plan = _plan(freq)
    assert "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" in plan  # Arrow-batched keyed fold


def test_cosine_topk_partial_is_map_side_bounded(spark, sf_dir):
    """The per-partition top-k partial runs inside the map task (Arrow
    MapInPandas), so the exchange carries ≤ k rows per (query, partition)
    — a collect_list partial would ship every scored row (ADVICE r2)."""
    from hoshizora_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.limit(2).selectExpr("vec_id as query_id", "embedding")
    plan = _plan(similarity.cosine_topk(emb, q, k=3))
    assert "MapInPandas" in plan
    assert "Window" not in plan


def test_cosine_near_dup_lsh_no_crossjoin(spark, sf_dir):
    from hoshizora_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(similarity.cosine_near_dup_lsh(emb, threshold=0.5))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_assignment_plan_independent_of_centroid_count(spark, sf_dir):
    """The IVF cell assignment must NOT embed k·d centroid literals in the
    plan (the r2 scale-killer): plan size stays flat as n_centroids grows
    because centroids travel as a broadcast numpy matrix."""
    from hoshizora_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a4, _ = similarity.ivf_index(emb, n_centroids=4, iters=1)
    a16, _ = similarity.ivf_index(emb, n_centroids=16, iters=1)
    p4, p16 = _plan(a4), _plan(a16)
    assert "MapInPandas" in p16
    # literal-embedding plans grow ~4× here; broadcast plans stay put
    assert len(p16) < 1.2 * len(p4)
