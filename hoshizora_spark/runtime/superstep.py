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

from pyspark.sql import Column, DataFrame, Observation, SparkSession

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
    stat: Callable[[DataFrame], float] | None = None,
    stat_expr: Column | None = None,
    done: Callable[[float], bool],
    restore: Callable[[DataFrame], DataFrame],
    max_iters: int,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    edges_per_iter: int = -1,
    metric_kind: str = "delta",  # 'delta' -> max_abs_delta slot, 'changed' -> changed slot
    fuse: int = 1,
    loop_conf: dict[str, str] | None = None,
) -> LoopResult:
    """Run supersteps until ``done(stat)`` or ``max_iters``.

    * ``init()`` builds iteration-0 state (ignored on resume).
    * ``step(state, it)`` emits the next-state DataFrame; it may carry extra
      columns (e.g. ``old_rank``) that the statistic needs — ``restore``
      projects those away to produce the persistent state for the next round.
    * ``stat_expr`` (preferred): an aggregate Column (e.g.
      ``max(abs(new - old))``) piggybacked on the checkpoint job via
      ``DataFrame.observe`` — the convergence scalar costs ZERO extra Spark
      jobs per superstep (the CollectMetrics node rides the materialization
      the checkpoint already runs). NULL metric (empty frame) reads as 0.0.
    * ``stat`` (fallback): a callable issuing its own action AFTER the
      lineage cut — one extra job per superstep; kept for statistics not
      expressible as a single aggregate.
    * ``loop_conf``: session SQL confs pinned for the duration of the loop
      and restored after (even on error). This is a CLUSTER-SPECIFIC
      pinning hook (e.g. a deployment that wants a fixed shuffle
      parallelism inside the loop) — it is NOT an AQE-off recommendation.
      The "disable AQE inside loops" hypothesis was tested and REFUTED
      (BENCH.md round 4): AQE-on won all 8 paired comparisons at
      V=200k/E=128M by 1.1-3.6×, because AQE's right-sizing of the
      partial-fold exchange saves more task-launch cost than its
      per-stage replan jobs add (the W≈0 probe in scripts/f_probe.py
      itemizes the trade). Leave loops on the session's AQE setting
      unless a measurement on YOUR cluster says otherwise.
    * ``fuse`` (EXPERIMENTAL): supersteps per lineage cut / convergence
      check. Same expressions and fold shapes as ``fuse=1``; results agree
      to float-summation reordering (~1e-12 relative — Spark does not pin
      the merge order of a double sum across plan shapes, so bit-equality
      is NOT guaranteed; tests assert tight allclose). What changes is
      scheduling: one checkpoint job + one Observation sync per ``fuse``
      supersteps instead of per superstep, attacking the measured
      ~1.3-2 s/superstep fixed driver cost (BENCH.md round-3 f+W/cores
      fit). Intermediate sub-step states are ``persist()``-ed so each is
      computed exactly once (a step references its input ≥2×; without the
      cache a fused chain would re-execute geometrically). Convergence is
      only observed per chunk, so a tol run may execute up to ``fuse-1``
      supersteps past the crossing (harmless for contracting iterations).
      Durable checkpoints stay on their ``checkpoint_every`` grid — chunks
      never fuse across a save boundary, so resume granularity is
      unchanged. ``stats`` gets one entry per chunk (the observed final
      delta); ``wall_ms`` stays per superstep (chunk wall / sub-steps).
      Status: correct on all fixtures, but on a 128M-edge input the fused
      chunk planned/executed pathologically slowly (suspected AQE ×
      nested-broadcast × InMemoryRelation interaction) — profile before
      enabling on large inputs; the default stays 1 everywhere.
    """
    if stat_expr is None and stat is None:
        raise ValueError("bsp_loop needs stat_expr or stat")
    if fuse < 1:
        raise ValueError("bsp_loop: fuse must be >= 1")
    if fuse > 1 and checkpoint is not None and checkpoint_every <= 1:
        # chunks never cross a durable-save boundary, so checkpoint_every=1
        # pins every chunk to a single superstep — fuse silently no-ops.
        import warnings

        warnings.warn(
            "bsp_loop: fuse>1 with checkpoint_every<=1 disables fusion entirely"
            " (every superstep is a save boundary); set checkpoint_every > fuse"
            " for fusion to engage",
            stacklevel=2,
        )
    saved_conf: dict[str, str | None] = {}
    for k, v in (loop_conf or {}).items():
        try:
            saved_conf[k] = spark.conf.get(k)
        except Exception:  # unset key
            saved_conf[k] = None
        spark.conf.set(k, v)
    try:
        return _run_loop(
            spark,
            init=init,
            step=step,
            stat=stat,
            stat_expr=stat_expr,
            done=done,
            restore=restore,
            max_iters=max_iters,
            checkpoint=checkpoint,
            checkpoint_every=checkpoint_every,
            resume=resume,
            edges_per_iter=edges_per_iter,
            metric_kind=metric_kind,
            fuse=fuse,
        )
    finally:
        for k, v in saved_conf.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _run_loop(
    spark: SparkSession,
    *,
    init,
    step,
    stat,
    stat_expr,
    done,
    restore,
    max_iters: int,
    checkpoint: CheckpointManager | None,
    checkpoint_every: int,
    resume: bool,
    edges_per_iter: int,
    metric_kind: str,
    fuse: int,
) -> LoopResult:
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
    it = start
    while it < max_iters:
        # chunk of n_sub supersteps: bounded by fuse, max_iters, and the
        # durable-save grid (a chunk ends ON a boundary, never crosses one)
        n_sub = 1
        while (
            n_sub < fuse
            and it + n_sub < max_iters
            and not (checkpoint is not None and (it + n_sub - 1) % checkpoint_every == 0)
        ):
            n_sub += 1
        last_it = it + n_sub - 1
        t0 = time.perf_counter()
        nxt = step(state, it)
        mids: list[DataFrame] = []
        for j in range(1, n_sub):
            mid = restore(nxt).persist()
            mids.append(mid)
            nxt = step(mid, it + j)
        obs = None
        if stat_expr is not None:
            obs = Observation(f"hz_stat_{last_it}")
            nxt = nxt.observe(obs, stat_expr.alias("stat"))
        if checkpoint is not None and (
            last_it % checkpoint_every == 0 or last_it == max_iters - 1
        ):
            nxt = checkpoint.save_state(last_it, nxt)
        else:
            nxt = nxt.localCheckpoint(eager=True)
        if obs is not None:
            v = obs.get.get("stat")
            s = float(v) if v is not None else 0.0
        else:
            s = stat(nxt)
        wall = (time.perf_counter() - t0) * 1000.0
        for mid in mids:  # chunk is materialized; intermediates are dead
            mid.unpersist()
        stats.append(s)
        walls.extend([wall / n_sub] * n_sub)
        if checkpoint is not None:
            # one metrics row per chunk: edges scale with n_sub so
            # throughput derived from (edges_processed / wall_ms) stays
            # exact under fusion (wall covers the whole chunk)
            checkpoint.append_metrics(
                spark,
                last_it,
                edges_per_iter * n_sub if edges_per_iter > 0 else edges_per_iter,
                wall,
                s if metric_kind == "delta" else None,
                int(s) if metric_kind == "changed" else None,
            )
        state = restore(nxt)
        rounds = last_it - start + 1
        it += n_sub
        if done(s):
            converged = True
            break
    return LoopResult(
        state=state, iterations=rounds, converged=converged, stats=stats, wall_ms=walls
    )
