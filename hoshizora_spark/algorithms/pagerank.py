"""PageRank with the reference's exact semantics, Spark-first.

Semantics replicated from /root/reference/src/hoshizora/app/pagerank.h:9-51
(see SURVEY.md §2.4):

  * init rank = 1.0 per vertex (pagerank.h:17-20 — NOT 1/N)
  * message per out-edge = rank(src) / out_degree(src) (pagerank.h:22-24);
    multi-edges each carry a message (from_edge_list keeps duplicates,
    core/graph.h:457-479)
  * new rank = 0.85 * Σ in-messages + 0.15 / N (pagerank.h:38-41);
    zero-in-degree vertices get exactly 0.15/N (zero = 0.0, pagerank.h:31)
  * NO dangling-vertex mass redistribution — mass leaks at sinks
  * isolated ids in the dense domain exist and converge to 0.15/N

The reference runs a fixed ``num_iters`` (default 50, pybind.cpp:14); the
target rule adds convergence ``max|Δrank| ≤ tol``. Both are supported.

Physical plan per superstep (one shuffle round + one scalar action):

  ranks ⋈ ew on src  →  partial hash agg on dst (map-side combine)  →
  final agg  →  left join back onto the persistent vertex frame  →
  localCheckpoint/parquet checkpoint (cuts lineage)  →  max|Δ| action.

Multi-edges are pre-aggregated into a per-(src,dst) multiplicity at build
time, so the per-superstep join touches each distinct edge once — the same
work-saving the reference gets from its static CSR layout.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hoshizora_spark.graph.core import Graph
from hoshizora_spark.runtime.checkpoint import CheckpointManager

DAMPING = 0.85
JUMP = 0.15


@dataclass
class PageRankResult:
    ranks: DataFrame  # (vid: long, rank: double)
    iterations: int
    converged: bool
    deltas: list[float] = field(default_factory=list)
    edges_processed_per_iter: int = 0
    wall_ms_per_iter: list[float] = field(default_factory=list)


def _weighted_edges(graph: Graph) -> DataFrame:
    """(src, dst, w) with w = multiplicity/out_degree — one row per distinct edge."""
    mult = graph.edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("mult"))
    deg = graph.out_degrees  # counts multi-edges, matching CSR degree
    return mult.join(deg, "src").select(
        "src", "dst", (F.col("mult") / F.col("out_deg")).alias("w")
    )


def pagerank(
    graph: Graph,
    tol: float | None = 1e-6,
    max_iters: int = 200,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> PageRankResult:
    spark = graph.spark
    V = graph.num_vertices
    if V == 0:
        return PageRankResult(ranks=graph.vertices().withColumn("rank", F.lit(0.0)),
                              iterations=0, converged=True)
    base = JUMP / V

    ew = _weighted_edges(graph)
    num_msg_edges = ew.count()  # distinct (src,dst) pairs carried per superstep
    # Persist the static side once; every superstep reuses it. On a cluster this
    # is the analogue of the reference's one-time CSR build (core/graph.h:439-547).
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ew = ew.repartition(n_part, "src").persist()

    start_iter = 0
    if resume and checkpoint is not None and checkpoint.latest_iter() is not None:
        start_iter = checkpoint.latest_iter() + 1
        ranks = checkpoint.load_state(spark, start_iter - 1).select(
            "vid", F.col("new_rank").alias("rank")
        )
    else:
        ranks = graph.vertices().withColumn("rank", F.lit(1.0))
        ranks = ranks.localCheckpoint(eager=True)

    deltas: list[float] = []
    walls: list[float] = []
    converged = False
    it = start_iter
    for it in range(start_iter, max_iters):
        t0 = time.perf_counter()
        msgs = (
            ew.join(ranks.select(F.col("vid").alias("src"), "rank"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("acc"))
        )
        nxt = (
            ranks.join(msgs, ranks.vid == msgs.dst, "left")
            .select(
                "vid",
                (F.lit(DAMPING) * F.coalesce(F.col("acc"), F.lit(0.0)) + F.lit(base)).alias(
                    "new_rank"
                ),
                F.col("rank").alias("old_rank"),
            )
        )
        if checkpoint is not None and (it % checkpoint_every == 0 or it == max_iters - 1):
            nxt = checkpoint.save_state(it, nxt)
        else:
            nxt = nxt.localCheckpoint(eager=True)
        delta = nxt.agg(F.max(F.abs(F.col("new_rank") - F.col("old_rank")))).first()[0]
        delta = float(delta) if delta is not None else 0.0
        wall_ms = (time.perf_counter() - t0) * 1000.0
        deltas.append(delta)
        walls.append(wall_ms)
        if checkpoint is not None:
            checkpoint.append_metrics(spark, it, num_msg_edges, wall_ms, delta, None)
        ranks = nxt.select("vid", F.col("new_rank").alias("rank"))
        if tol is not None and delta <= tol:
            converged = True
            it += 1
            break
    else:
        it = max_iters
    ew.unpersist()
    return PageRankResult(
        ranks=ranks,
        iterations=it - start_iter,
        converged=converged,
        deltas=deltas,
        edges_processed_per_iter=num_msg_edges,
        wall_ms_per_iter=walls,
    )


def top_k(ranks: DataFrame, k: int = 10) -> DataFrame:
    """Top-k vertices by rank, deterministic order (rank desc, vid asc).

    orderBy+limit compiles to TakeOrderedAndProject — a per-partition heap
    followed by a driver merge, no shuffle-everything-to-one-partition
    (which a global Window would do).
    """
    return ranks.orderBy(F.col("rank").desc(), F.col("vid").asc()).limit(k)
