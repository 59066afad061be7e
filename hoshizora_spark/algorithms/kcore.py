"""k-core decomposition (coreness per vertex) by batch peeling.

Beyond the reference's two apps but squarely in its domain (link-graph
structure mining; e.g. "dependency backbone" extraction). Semantics over
the undirected simple graph: coreness(v) = largest k such that v belongs
to a subgraph where every vertex has degree ≥ k.

Batch peeling, exact and deterministic:

    k = 0; alive = all vertices
    repeat:
        peel = alive vertices with alive-degree < k+1... actually:
        while some alive vertex has degree < k: remove ALL of them at
        once (their coreness is their current k-1 bucket) — batch
        cascades within the same k; when stable, k += 1.

Each peel round is one degree aggregation + one anti-join — no per-vertex
Python. Rounds = O(max_coreness + cascade depth); each is a bounded
shuffle over the shrinking alive-edge set, which we re-checkpoint so plan
depth stays O(1) (same discipline as the BSP loops).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hoshizora_spark.graph.core import Graph, sized_partitions, symmetrize


@dataclass
class KCoreResult:
    coreness: DataFrame  # (vid: long, coreness: long) over the full domain
    max_core: int
    rounds: int


def k_core(graph: Graph, max_rounds: int = 10_000) -> KCoreResult:
    spark = graph.spark
    sym = symmetrize(graph.edges)  # simple undirected: dedup + no loops
    n_part = sized_partitions(spark, sym.count())
    edges = sym.repartition(n_part, "src").localCheckpoint(eager=True)

    # isolated / not-yet-peeled vertices end with coreness 0 by default
    result = graph.vertices().select("vid", F.lit(0).cast("long").alias("coreness"))
    result = result.localCheckpoint(eager=True)

    k = 1
    rounds = 0
    while rounds < max_rounds:
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        alive = deg.count()
        if alive == 0:
            break
        peel = deg.filter(F.col("deg") < k).select("src")
        n_peel = peel.count()
        rounds += 1
        if n_peel == 0:
            # everyone alive has degree >= k: they are at least k-core
            upd = deg.select("src", F.lit(k).cast("long").alias("c"))
            result = (
                result.join(upd, result.vid == upd.src, "left")
                .select("vid", F.coalesce("c", "coreness").alias("coreness"))
                .localCheckpoint(eager=True)
            )
            k += 1
            continue
        # remove peeled vertices and their edges; cascade stays at this k
        peel_b = F.broadcast(peel) if n_peel <= 5_000_000 else peel
        edges = (
            edges.join(peel_b.withColumnRenamed("src", "p"), edges.src == F.col("p"), "left_anti")
        )
        peel_dst = peel.withColumnRenamed("src", "p")
        peel_dst_b = F.broadcast(peel_dst) if n_peel <= 5_000_000 else peel_dst
        edges = edges.join(peel_dst_b, edges.dst == F.col("p"), "left_anti")
        edges = edges.localCheckpoint(eager=True)
    return KCoreResult(coreness=result, max_core=k - 1, rounds=rounds)
