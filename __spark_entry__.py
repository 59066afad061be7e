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


def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Teleport-set PageRank from the 3 lowest supplier ids (rows-only:
    iterative; pytest gates exactness vs the numpy oracle)."""
    from hoshizora_spark import personalized_pagerank, top_k

    g = _graph_cooccur(spark, sf_dir)
    res = personalized_pagerank(g, sources=[1, 2, 3], tol=1e-6, max_iters=200)
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


# ------------------------------------------------- text / similarity ops


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents + deterministic exact copies (doc_id<3 → +2000000) and
    near-copies (doc_id<5 → +1000000, ' extra token tail' appended) so the
    dedup operators have positives to find. Same construction in SQL."""
    d = _docs(spark, sf_dir)
    exact = d.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    near = d.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" extra token tail")).alias("text"),
        "lang", "source", "n_chars",
    )
    return d.unionByName(exact).unionByName(near)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hoshizora_spark import text

    return text.exact_dedup(_docs_aug(spark, sf_dir))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hoshizora_spark import text

    return text.token_counts(_docs(spark, sf_dir))


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hoshizora_spark import text

    return text.quality_scores(_docs(spark, sf_dir))


def q_lang_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hoshizora_spark import text

    return text.lang_scores(_docs(spark, sf_dir))


def q_jaccard_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hoshizora_spark import text

    return text.jaccard_pairs(_docs_aug(spark, sf_dir), threshold=0.5)


def q_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup (rows-only: xxhash64 not portable to DuckDB;
    pytest checks candidate recall vs the exact-Jaccard op)."""
    from hoshizora_spark import text

    return text.minhash_near_dups(_docs_aug(spark, sf_dir), threshold=0.5)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (rows-only; determinism + Hamming tested in pytest)."""
    from hoshizora_spark import text

    return text.simhash64(_docs(spark, sf_dir))


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hoshizora_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.cosine_topk(emb, queries_df, k=5)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN (rows-only; recall vs exact checked in pytest)."""
    from hoshizora_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ann_lsh_topk(emb, queries_df, k=5, num_planes=16, bands=8)


def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """log2-bucket in-degree histogram — feeds the skew/salting decision."""
    from hoshizora_spark.graph.build import degree_stats

    return degree_stats(_edges_cooccur(spark, sf_dir))


def q_kcore_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coreness per vertex (rows-only: iterative peeling; pytest gates
    exactness vs the numpy oracle)."""
    from hoshizora_spark import Graph
    from hoshizora_spark.algorithms.kcore import k_core

    edges = _edges_cooccur(spark, sf_dir).filter(
        (F.col("src") < 200) & (F.col("dst") < 200)
    )
    g = Graph.from_edges(edges)
    present = (
        edges.select(F.col("src").alias("vid"))
        .union(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )
    return k_core(g).coreness.join(present, "vid").select("vid", "coreness")


def q_clustering_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Louvain-style clustering with coarsening (rows-only: iterative)."""
    from hoshizora_spark import Graph, clustering

    edges = _edges_cooccur(spark, sf_dir).filter(
        (F.col("src") < 200) & (F.col("dst") < 200)
    )
    g = Graph.from_edges(edges)
    return clustering(g, num_clusters_hint=10).assign


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "dedup_exact": q_dedup_exact,
        "token_counts": q_token_counts,
        "quality_scores": q_quality_scores,
        "lang_scores": q_lang_scores,
        "jaccard_near_dup": q_jaccard_near_dup,
        "minhash_near_dup": q_minhash_near_dup,
        "simhash": q_simhash,
        "cosine_topk": q_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "degree_histogram": q_degree_histogram,
        "kcore_small": q_kcore_small,
        "clustering_modularity": q_clustering_modularity,
        "edge_extract_bipartite": q_edge_extract_bipartite,
        "edge_extract_cooccur": q_edge_extract_cooccur,
        "degree_topk": q_degree_topk,
        "dense_id_compaction": q_dense_id_compaction,
        "triangle_total": q_triangle_total,
        "triangle_total_bipartite": q_triangle_total_bipartite,
        "connected_components_small": q_connected_components_small,
        "pagerank_top10": q_pagerank_top10,
        "personalized_pagerank_top10": q_personalized_pagerank,
        "label_propagation_small": q_label_propagation_small,
    }


# ---------------------------------------------------------------- oracles


_COOCCUR_SQL = """
    SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
"""


_AUG_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 2000000, text FROM documents WHERE doc_id < 3
    UNION ALL
    SELECT doc_id + 1000000, text || ' extra token tail' FROM documents WHERE doc_id < 5
"""

_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_STOPLIST = "('the','a','of','and','to','in','is','on','for','with')"


def _lang_score_sql(markers: list[str]) -> str:
    terms = [
        f"CAST((length(low) - length(replace(low, '{w}', ''))) / {len(w)} AS BIGINT)"
        for w in markers
    ]
    return " + ".join(terms)


def oracle_sql() -> dict[str, str]:
    from hoshizora_spark.text import LANG_MARKERS

    langs = list(LANG_MARKERS)
    score_cols = ",\n".join(
        f"        {_lang_score_sql(ws)} AS {lang}_score" for lang, ws in LANG_MARKERS.items()
    )
    pred_cases = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"{lang}_score >= {l}_score" for l in langs[i + 1:])
        pred_cases.append(f"WHEN {conds} THEN '{lang}'")
    pred_sql = "CASE " + " ".join(pred_cases) + f" ELSE '{langs[-1]}' END"

    return {
        "dedup_exact": f"""
            WITH aug AS ({_AUG_SQL})
            SELECT sha256({_NORM}) AS content_hash,
                   min(doc_id) AS keep_id,
                   count(*) - 1 AS n_dups
            FROM aug GROUP BY 1
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_measured
            FROM documents
        """,
        "quality_scores": f"""
            WITH s AS (
              SELECT doc_id, text,
                     string_split_regex({_NORM}, ' ') AS toks,
                     length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS punct
              FROM documents
            )
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   round(punct * 1.0 / greatest(length(text), 1), 6) AS punct_ratio,
                   round(len(list_filter(toks, w -> w IN {_STOPLIST})) * 1.0
                         / greatest(len(toks), 1), 6) AS stopword_ratio,
                   round(least(len(toks) / 100.0, 1.0)
                         * (1.0 - punct * 1.0 / greatest(length(text), 1))
                         * (0.5 + len(list_filter(toks, w -> w IN {_STOPLIST})) * 1.0
                                / greatest(len(toks), 1)), 6) AS quality
            FROM s
        """,
        "lang_scores": f"""
            WITH low AS (SELECT doc_id, lower(text) AS low FROM documents),
            s AS (
              SELECT doc_id,
{score_cols}
              FROM low
            )
            SELECT *, {pred_sql} AS pred_lang FROM s
        """,
        "jaccard_near_dup": f"""
            WITH aug AS ({_AUG_SQL}),
            norm AS (SELECT doc_id, string_split_regex({_NORM}, ' ') AS t FROM aug),
            grams AS (
              SELECT DISTINCT doc_id,
                     t[CAST(i AS INT)] || ' ' || t[CAST(i + 1 AS INT)] || ' '
                       || t[CAST(i + 2 AS INT)] AS gram
              FROM norm, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
              WHERE len(t) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY 1),
            inter AS (
              SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS i
              FROM grams ga JOIN grams gb
                ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
              GROUP BY 1, 2
            )
            SELECT a, b,
                   round(i * 1.0 / (sa.n_grams + sb.n_grams - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE i * 1.0 / (sa.n_grams + sb.n_grams - i) >= 0.5
        """,
        "degree_histogram": f"""
            WITH e AS ({_COOCCUR_SQL}),
            indeg AS (SELECT dst, count(*) AS in_deg FROM e GROUP BY dst)
            SELECT CAST(floor(log2(in_deg)) AS BIGINT) AS bucket,
                   count(*) AS n_vertices,
                   max(in_deg) AS max_in_deg
            FROM indeg GROUP BY 1 ORDER BY bucket
        """,
        "cosine_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 3
            ),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])), 6) AS cos
              FROM q, embeddings e
              WHERE e.vec_id != q.query_id
            ),
            r AS (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, vec_id ASC
              ) AS rn
              FROM scored
            )
            SELECT query_id, vec_id, cos FROM r WHERE rn <= 5
        """,
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
