"""Connected components via min-label propagation + pointer jumping.

The two ingredients exist in the reference: min-id label selection
(/root/reference/src/hoshizora/app/clustering_louvain.h:70) and
pointer-jumping label smoothing ``label[i] = label[label[i]]``
(/root/reference/src/hoshizora/app/apps.h:100-110). Output contract:
component label = min vertex id in the component (exact match).

Per round (SURVEY.md §2.3 A2):
  1. propagate: label'[v] = min(label[v], min over undirected neighbors' labels)
     — one shuffle (groupBy(dst).min) over the symmetrized edge set
  2. pointer-jump: label''[v] = label'[label'[v]] — one self-join;
     halves the remaining path length, so rounds ≈ O(log diameter)
  3. converge when no label changed (scalar action)
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hoshizora_spark.graph.core import Graph, symmetrize
from hoshizora_spark.runtime.checkpoint import CheckpointManager


@dataclass
class ComponentsResult:
    labels: DataFrame  # (vid: long, label: long)
    rounds: int
    converged: bool
    changed_per_round: list[int] = field(default_factory=list)
    wall_ms_per_round: list[float] = field(default_factory=list)


def connected_components(
    graph: Graph,
    max_rounds: int = 50,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
) -> ComponentsResult:
    spark = graph.spark
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sym = symmetrize(graph.edges).repartition(n_part, "dst").persist()

    start = 0
    if resume and checkpoint is not None and checkpoint.latest_iter() is not None:
        start = checkpoint.latest_iter() + 1
        labels = checkpoint.load_state(spark, start - 1).select("vid", "label")
    else:
        labels = graph.vertices().withColumn("label", F.col("vid"))
        labels = labels.localCheckpoint(eager=True)

    changed_hist: list[int] = []
    walls: list[float] = []
    converged = False
    rounds = 0
    for it in range(start, max_rounds):
        t0 = time.perf_counter()
        # 1. min neighbor label flowing along every (undirected) edge into dst
        nbr_min = (
            sym.join(labels.select(F.col("vid").alias("src"), "label"), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        prop = (
            labels.join(nbr_min, labels.vid == nbr_min.dst, "left")
            .select(
                "vid",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                    "plabel"
                ),
                F.col("label").alias("old_label"),
            )
        )
        # 2. pointer jumping: label[v] <- label[label[v]]  (apps.h:100-110)
        hop = prop.select(F.col("vid").alias("jvid"), F.col("plabel").alias("jlabel"))
        nxt = (
            prop.join(hop, prop.plabel == hop.jvid, "left")
            .select(
                "vid",
                F.coalesce(F.col("jlabel"), F.col("plabel")).alias("label"),
                "old_label",
            )
        )
        if checkpoint is not None:
            nxt = checkpoint.save_state(it, nxt)
        else:
            nxt = nxt.localCheckpoint(eager=True)
        changed = nxt.filter(F.col("label") != F.col("old_label")).count()
        wall_ms = (time.perf_counter() - t0) * 1000.0
        changed_hist.append(changed)
        walls.append(wall_ms)
        if checkpoint is not None:
            checkpoint.append_metrics(spark, it, -1, wall_ms, None, changed)
        labels = nxt.select("vid", "label")
        rounds = it - start + 1
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    return ComponentsResult(
        labels=labels,
        rounds=rounds,
        converged=converged,
        changed_per_round=changed_hist,
        wall_ms_per_round=walls,
    )
