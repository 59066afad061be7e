"""Synchronous label propagation clustering with deterministic tiebreaks.

Generalizes the reference's clustering kernel: per-vertex adopt the
best-scoring neighbor label with a min-id tiebreak
(/root/reference/src/hoshizora/app/clustering_louvain.h:62-75). Here the
score is neighbor-label frequency (classic LPA); ties broken by MIN label,
rounds are synchronous, and a fixed round cap keeps 2-cycles deterministic —
all so output is exactly reproducible across parallelism levels (north_rule
exact-match requirement).

Plan per round: one shuffle (groupBy(dst, label).count) + one partial
ordering agg (max_by via struct max) + a left join. All Catalyst-native.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hoshizora_spark.graph.core import Graph, symmetrize
from hoshizora_spark.runtime.checkpoint import CheckpointManager


@dataclass
class LabelPropResult:
    labels: DataFrame  # (vid: long, label: long)
    rounds: int
    converged: bool
    changed_per_round: list[int] = field(default_factory=list)
    wall_ms_per_round: list[float] = field(default_factory=list)


def label_propagation(
    graph: Graph,
    max_rounds: int = 20,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
) -> LabelPropResult:
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
        # count neighbor labels arriving at each dst
        freq = (
            sym.join(labels.select(F.col("vid").alias("src"), "label"), "src")
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # most frequent label, ties -> min label: max over (cnt, -label)
        best = (
            freq.groupBy("dst")
            .agg(
                F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg_label"))).alias("top")
            )
            .select("dst", (-F.col("top.neg_label")).alias("best_label"))
        )
        nxt = (
            labels.join(best, labels.vid == best.dst, "left")
            .select(
                "vid",
                F.coalesce(F.col("best_label"), F.col("label")).alias("label"),
                F.col("label").alias("old_label"),
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
    return LabelPropResult(
        labels=labels,
        rounds=rounds,
        converged=converged,
        changed_per_round=changed_hist,
        wall_ms_per_round=walls,
    )
