"""Generic BSP superstep loop: the Spark analogue of the reference executor.

``BulkSyncGASExecutor::run`` (/root/reference/src/hoshizora/core/
bulksync_gas_executor.h:110-241) drives iterations of barrier-synchronized
phases over double-buffered vertex state. Here one superstep is one
DataFrame job (the stage boundary IS the barrier), the "double buffer" is
the immutable next-state DataFrame, and lineage is cut every iteration by
either ``localCheckpoint`` or a durable ``CheckpointManager`` write that
also records per-partition lineage + metrics and enables resume
(north_star requirement — the reference has no persistence at all).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from hoshizora_spark.runtime.checkpoint import CheckpointManager


@dataclass
class LoopResult:
    state: DataFrame
    iterations: int
    converged: bool
    stats: list[float] = field(default_factory=list)
    wall_ms: list[float] = field(default_factory=list)


def bsp_loop(
    spark: SparkSession,
    *,
    init: Callable[[], DataFrame],
    step: Callable[[DataFrame, int], DataFrame],
    stat: Callable[[DataFrame], float],
    done: Callable[[float], bool],
    restore: Callable[[DataFrame], DataFrame],
    max_iters: int,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    edges_per_iter: int = -1,
    metric_kind: str = "delta",  # 'delta' -> max_abs_delta slot, 'changed' -> changed slot
) -> LoopResult:
    """Run supersteps until ``done(stat(next))`` or ``max_iters``.

    * ``init()`` builds iteration-0 state (ignored on resume).
    * ``step(state, it)`` emits the next-state DataFrame; it may carry extra
      columns (e.g. ``old_rank``) that ``stat`` needs — ``restore`` projects
      those away to produce the persistent state for the next round.
    * ``stat`` runs AFTER the checkpoint/localCheckpoint cut, so the scalar
      action re-reads materialized data instead of recomputing the step.
    """
    start = 0
    if resume and checkpoint is not None and checkpoint.latest_iter() is not None:
        start = checkpoint.latest_iter() + 1
        state = restore(checkpoint.load_state(spark, start - 1))
    else:
        state = init().localCheckpoint(eager=True)

    stats: list[float] = []
    walls: list[float] = []
    converged = False
    rounds = 0
    for it in range(start, max_iters):
        t0 = time.perf_counter()
        nxt = step(state, it)
        if checkpoint is not None and (it % checkpoint_every == 0 or it == max_iters - 1):
            nxt = checkpoint.save_state(it, nxt)
        else:
            nxt = nxt.localCheckpoint(eager=True)
        s = stat(nxt)
        wall = (time.perf_counter() - t0) * 1000.0
        stats.append(s)
        walls.append(wall)
        if checkpoint is not None:
            checkpoint.append_metrics(
                spark,
                it,
                edges_per_iter,
                wall,
                s if metric_kind == "delta" else None,
                int(s) if metric_kind == "changed" else None,
            )
        state = restore(nxt)
        rounds = it - start + 1
        if done(s):
            converged = True
            break
    return LoopResult(
        state=state, iterations=rounds, converged=converged, stats=stats, wall_ms=walls
    )
