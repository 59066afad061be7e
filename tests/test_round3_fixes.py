"""Regression tests for round-3 verdict/advice findings (VERDICT.md r03).

* cache hygiene: triangle_triples and ivf_index must leave no
  CacheManager entry behind (a DataFrame.persist without unpersist pins
  the plan for the whole session — the ContextCleaner never reclaims it)
* bsp_loop fuse>1 + checkpoint_every=1 warns that fusion is suppressed
* fused metrics rows carry chunk-scaled edges so throughput derived from
  the metrics table is exact
"""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from hoshizora_spark import Graph, edges_from_pairs
from hoshizora_spark.runtime.checkpoint import CheckpointManager
from hoshizora_spark.runtime.superstep import bsp_loop


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_triangles_leave_no_cached_frames(spark):
    from hoshizora_spark.algorithms.triangles import triangle_counts, triangle_total

    spark.catalog.clearCache()
    g = Graph.from_edges(
        edges_from_pairs(spark, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (1, 3)])
    )
    assert triangle_total(g) == 4
    _ = triangle_counts(g).collect()
    assert _cache_manager_empty(spark)


def test_ivf_index_leaves_no_cached_frames_and_assignments_survive(spark):
    from hoshizora_spark.similarity import ivf_index

    spark.catalog.clearCache()
    emb = spark.createDataFrame(
        [(i, [float(i % 4), float((i * 7) % 5), 1.0]) for i in range(40)],
        schema="vec_id long, embedding array<float>",
    )
    assign, cents = ivf_index(emb, n_centroids=4, iters=2)
    # consumed AFTER ivf_index returned (the unit-vector cache is gone by
    # now) — the materialized assignment frame must still produce rows
    assert assign.count() == 40
    assert len(cents) == 4
    assert _cache_manager_empty(spark)


def _loop(spark, checkpoint, fuse, max_iters=3, checkpoint_every=1):
    return bsp_loop(
        spark,
        init=lambda: spark.range(4).select(
            F.col("id").alias("vid"), F.lit(0.0).alias("val")
        ),
        step=lambda st, it: st.select(
            "vid", (F.col("val") + 1.0).alias("new_val"), F.col("val").alias("old_val")
        ),
        stat_expr=F.max(F.abs(F.col("new_val") - F.col("old_val"))),
        done=lambda d: False,
        restore=lambda df: df.select("vid", F.col("new_val").alias("val")),
        max_iters=max_iters,
        checkpoint=checkpoint,
        checkpoint_every=checkpoint_every,
        edges_per_iter=10,
        fuse=fuse,
    )


def test_fuse_suppressed_by_checkpoint_grid_warns(spark, tmp_path):
    cp = CheckpointManager(str(tmp_path), "warncheck")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        res = _loop(spark, cp, fuse=4, max_iters=2, checkpoint_every=1)
    assert res.iterations == 2
    assert any("disables fusion" in str(w.message) for w in caught)


def test_fused_metrics_rows_scale_edges_with_chunk(spark, tmp_path):
    cp = CheckpointManager(str(tmp_path), "fusemetrics")
    res = _loop(spark, cp, fuse=2, max_iters=4, checkpoint_every=4)
    assert res.iterations == 4
    rows = {r["iter"]: r["edges_processed"] for r in cp.metrics(spark).collect()}
    # chunk grid: iter 0 is a save boundary (0 % 4 == 0) -> chunk [0];
    # then [1,2] fused (edges 2x); then [3] capped by max_iters.
    assert rows == {0: 10, 2: 20, 3: 10}
    # invariant the ADVICE asked for: summed edges over metrics rows equals
    # edges_per_iter x supersteps, so table-derived throughput is exact
    assert sum(rows.values()) == 4 * 10
