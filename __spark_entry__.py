"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: PageRank over the supplier co-occurrence graph
at sf0.001, top-10 most-central suppliers.

``queries()`` / ``oracle_sql()`` — one entry per SQL-checkable operator from
SURVEY.md §2 (edge extraction, degrees, dense-ID compaction, triangles, CC),
plus rows-only entries for the iterative algorithms DuckDB can't express.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _edges_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier co-occurrence: suppliers sharing an order (canonical src<dst)."""
    li = _lineitem(spark, sf_dir).select("l_orderkey", "l_suppkey")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst"))
        .distinct()
    )


def _graph_cooccur(spark: SparkSession, sf_dir: str):
    from hoshizora_spark import Graph

    return Graph.from_edges(_edges_cooccur(spark, sf_dir))


# ---------------------------------------------------------------- entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top-10 suppliers by PageRank centrality (sf0.001)."""
    from hoshizora_spark import pagerank, top_k

    g = _graph_cooccur(spark, "/root/testdata/sf0.001")
    res = pagerank(g, tol=1e-6, max_iters=200)
    return top_k(res.ranks, 10).select("vid", F.round("rank", 9).alias("rank"))


# ---------------------------------------------------------------- queries


def q_edge_extract_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _lineitem(spark, sf_dir)
    return li.select(
        F.col("l_partkey").alias("src"), (F.col("l_suppkey") + 1000000).alias("dst")
    ).distinct()


def q_edge_extract_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _edges_cooccur(spark, sf_dir)


def q_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hoshizora_spark import symmetrize

    edges = _edges_cooccur(spark, sf_dir)
    sym = symmetrize(edges)
    deg = sym.groupBy(F.col("src").alias("vid")).agg(F.count(F.lit(1)).alias("degree"))
    return deg.orderBy(F.col("degree").desc(), F.col("vid").asc()).limit(20)


def q_dense_id_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-level check of dense-ID assignment: V distinct keys -> ids 0..V-1."""
    from hoshizora_spark.graph.ids import assign_dense_ids

    edges = _edges_cooccur(spark, sf_dir)
    verts = edges.select(F.col("src").alias("key")).union(
        edges.select(F.col("dst").alias("key"))
    )
    ids = assign_dense_ids(verts, ["key"], id_col="vid")
    return ids.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.min("vid").alias("min_vid"),
        F.max("vid").alias("max_vid"),
        F.count_distinct("vid").alias("n_distinct_vids"),
    )


def q_triangle_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hoshizora_spark import Graph, triangle_total

    g = Graph.from_edges(_edges_cooccur(spark, sf_dir))
    n = triangle_total(g)
    return spark.createDataFrame([(n,)], schema="triangles long")


def q_triangle_total_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite graph must have zero triangles — structural invariant."""
    from hoshizora_spark import Graph, triangle_total

    g = Graph.from_edges(q_edge_extract_bipartite(spark, sf_dir))
    n = triangle_total(g)
    return spark.createDataFrame([(n,)], schema="triangles long")


def q_connected_components_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hoshizora_spark import Graph, connected_components

    edges = _edges_cooccur(spark, sf_dir).filter((F.col("src") < 200) & (F.col("dst") < 200))
    g = Graph.from_edges(edges)
    present = (
        edges.select(F.col("src").alias("vid"))
        .union(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    res = connected_components(g)
    return res.labels.join(present, "vid").select("vid", "label")


def q_pagerank_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank — not SQL-expressible; driver rows-only check."""
    from hoshizora_spark import pagerank, top_k

    g = _graph_cooccur(spark, sf_dir)
    res = pagerank(g, tol=1e-6, max_iters=200)
    return top_k(res.ranks, 10).select("vid", F.round("rank", 9).alias("rank"))


def q_label_propagation_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sync LPA — iterative, rows-only check (pytest covers exactness)."""
    from hoshizora_spark import Graph, label_propagation

    edges = _edges_cooccur(spark, sf_dir).filter((F.col("src") < 200) & (F.col("dst") < 200))
    g = Graph.from_edges(edges)
    res = label_propagation(g, max_rounds=10)
    present = (
        edges.select(F.col("src").alias("vid"))
        .union(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    return res.labels.join(present, "vid").select("vid", "label")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "edge_extract_bipartite": q_edge_extract_bipartite,
        "edge_extract_cooccur": q_edge_extract_cooccur,
        "degree_topk": q_degree_topk,
        "dense_id_compaction": q_dense_id_compaction,
        "triangle_total": q_triangle_total,
        "triangle_total_bipartite": q_triangle_total_bipartite,
        "connected_components_small": q_connected_components_small,
        "pagerank_top10": q_pagerank_top10,
        "label_propagation_small": q_label_propagation_small,
    }


# ---------------------------------------------------------------- oracles


_COOCCUR_SQL = """
    SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
"""


def oracle_sql() -> dict[str, str]:
    return {
        "edge_extract_bipartite": """
            SELECT DISTINCT l_partkey AS src, l_suppkey + 1000000 AS dst
            FROM lineitem
        """,
        "edge_extract_cooccur": _COOCCUR_SQL,
        "degree_topk": f"""
            WITH e AS ({_COOCCUR_SQL}),
            sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e)
            SELECT src AS vid, count(*) AS degree
            FROM sym GROUP BY src
            ORDER BY degree DESC, vid ASC LIMIT 20
        """,
        "dense_id_compaction": f"""
            WITH e AS ({_COOCCUR_SQL}),
            v AS (SELECT DISTINCT k FROM (SELECT src AS k FROM e UNION ALL SELECT dst FROM e))
            SELECT count(*) AS n_vertices,
                   CAST(0 AS BIGINT) AS min_vid,
                   count(*) - 1 AS max_vid,
                   count(*) AS n_distinct_vids
            FROM v
        """,
        "triangle_total": f"""
            WITH e AS ({_COOCCUR_SQL})
            SELECT count(*) AS triangles
            FROM e e1 JOIN e e2 ON e1.dst = e2.src
                      JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
        """,
        "triangle_total_bipartite": """
            WITH e AS (
              SELECT DISTINCT least(l_partkey, l_suppkey + 1000000) AS src,
                              greatest(l_partkey, l_suppkey + 1000000) AS dst
              FROM lineitem
            )
            SELECT count(*) AS triangles
            FROM e e1 JOIN e e2 ON e1.dst = e2.src
                      JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
        """,
        "connected_components_small": f"""
            WITH RECURSIVE
            e AS (SELECT src, dst FROM ({_COOCCUR_SQL}) WHERE src < 200 AND dst < 200),
            und AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
            verts AS (SELECT DISTINCT a AS v FROM und),
            walk(v, r) AS (
                SELECT v, v FROM verts
                UNION
                SELECT und.b, walk.r FROM walk JOIN und ON walk.v = und.a
            )
            SELECT v AS vid, min(r) AS label FROM walk GROUP BY v
        """,
    }
