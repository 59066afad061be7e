"""Benchmark harness (driver contract).

Runs the headline graph workloads at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "edges_per_sec_per_superstep", "value": N, "unit": "edges/sec",
     "queries": {"q1": sec, ...}, "sf": ...}

The metric follows BASELINE.json: edges-processed/sec per superstep for
PageRank (damping 0.85) run to max|Δrank| ≤ 1e-6 convergence.  Per-query
wall seconds cover the full pipeline (graph build + algorithm + collect).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from hoshizora_spark import (  # noqa: E402
    Graph,
    connected_components,
    label_propagation,
    pagerank,
    top_k,
    triangle_total,
)
from hoshizora_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def part_cooccur_edges(spark, sf_dir: str):
    """Parts co-purchased within an order (canonical src<dst, distinct)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )


def main() -> None:
    spark = get_spark(app_name="hoshizora_bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    queries: dict[str, float] = {}
    extras: dict[str, object] = {}

    # Shared graph build (timed as its own query).
    t0 = time.perf_counter()
    edges = part_cooccur_edges(spark, SF_DIR)
    edges = edges.repartition(CPUS, "src").persist()
    num_edges = edges.count()
    g = Graph.from_edges(edges)
    queries["q0_graph_build"] = round(time.perf_counter() - t0, 3)
    extras["num_edges"] = num_edges
    extras["num_vertices"] = g.num_vertices

    # q1: PageRank to 1e-6 (the headline metric), pure-DataFrame path.
    t0 = time.perf_counter()
    res = pagerank(g, tol=1e-6, max_iters=300)
    _ = res.ranks.count()
    q1 = time.perf_counter() - t0
    queries["q1_pagerank_df"] = round(q1, 3)
    extras["pagerank_iters"] = res.iterations
    extras["pagerank_converged"] = res.converged
    eps_df = res.edges_processed_per_iter * res.iterations / q1

    # q1c: PageRank to 1e-6, CSR-block path (if available).
    eps_csr = 0.0
    try:
        from hoshizora_spark.algorithms.pagerank import pagerank_csr
        from hoshizora_spark.graph.csr import build_csr_blocks

        t0 = time.perf_counter()
        blocks = build_csr_blocks(g)  # auto-sized (see graph/csr.py)
        resc = pagerank_csr(g, blocks, tol=1e-6, max_iters=300)
        _ = resc.ranks.count()
        q1c = time.perf_counter() - t0
        queries["q1c_pagerank_csr"] = round(q1c, 3)
        extras["pagerank_csr_iters"] = resc.iterations
        eps_csr = resc.edges_processed_per_iter * resc.iterations / q1c
    except ImportError:
        pass

    # q2: connected components (exact min-label).
    t0 = time.perf_counter()
    cc = connected_components(g, max_rounds=50)
    _ = cc.labels.count()
    queries["q2_connected_components"] = round(time.perf_counter() - t0, 3)
    extras["cc_rounds"] = cc.rounds

    # q3: label propagation, 10 synchronous rounds.
    t0 = time.perf_counter()
    lp = label_propagation(g, max_rounds=10)
    _ = lp.labels.count()
    queries["q3_label_propagation"] = round(time.perf_counter() - t0, 3)

    # q4: triangle counting (degree-ordered joins).
    t0 = time.perf_counter()
    ntri = triangle_total(g)
    queries["q4_triangles"] = round(time.perf_counter() - t0, 3)
    extras["triangles"] = ntri

    # q5: corpus -> dependency graph -> top-10 PageRank (the V0 pipeline).
    t0 = time.perf_counter()
    from hoshizora_spark.corpus import synthesize_corpus
    from hoshizora_spark.graph.build import build_graph_from_corpus

    corpus = synthesize_corpus(spark, num_repos=100, files_per_repo=200, seed=42)
    bundle = build_graph_from_corpus(corpus)
    pr5 = pagerank(bundle.graph, tol=1e-6, max_iters=120)
    _ = top_k(pr5.ranks, 10).collect()
    queries["q5_corpus_pipeline"] = round(time.perf_counter() - t0, 3)
    extras["corpus_edges"] = bundle.num_edges

    # q6: k-core coreness via the h-index iteration (at-scale round structure).
    t0 = time.perf_counter()
    from hoshizora_spark import k_core_hindex

    kc = k_core_hindex(g)
    _ = kc.coreness.count()
    queries["q6_kcore_hindex"] = round(time.perf_counter() - t0, 3)
    extras["kcore_max"] = kc.max_core
    extras["kcore_rounds"] = kc.rounds

    # q7: corpus hygiene + multimodal: exact dedup + MinHash near-dup over
    # the documents table, byte-exact media dedup + Arrow decode over the
    # synthesized media corpus.
    t0 = time.perf_counter()
    from hoshizora_spark import multimodal, text

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _ = text.exact_dedup(docs).count()
    extras["minhash_pairs"] = text.minhash_near_dups(docs, threshold=0.5).count()
    media = multimodal.synthesize_media(docs.select("doc_id", "text"))
    _ = multimodal.media_exact_dedup(media).count()
    _ = multimodal.decode_media_meta(media).count()
    queries["q7_dedup_media"] = round(time.perf_counter() - t0, 3)

    edges.unpersist()
    value = max(eps_df, eps_csr)
    extras["edges_per_sec_df"] = round(eps_df)
    if eps_csr:
        extras["edges_per_sec_csr"] = round(eps_csr)
    print(
        json.dumps(
            {
                "metric": "pagerank_edges_per_sec_per_superstep",
                "value": round(value),
                "unit": "edges/sec",
                "queries": queries,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                **{"extras": extras},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
