"""Working instance of the documented edge-state BSP pattern.

``VectorKernel`` deliberately allocates no per-edge buffer (runtime/gas.py
parity note): a kernel that needs the reference's ``prev_val``
(kernel.h:17-18 — gather reads the edge's previous-superstep EData from a
persistent E-sized array, bulksync_gas_executor.h) expresses the edge
buffer AS BSP STATE — the loop state frame carries E edge rows
(src, dst, prev_msg) alongside the V vertex rows, and each superstep joins
them. This test is that pattern end-to-end: a message-smoothed PageRank
variant where the per-edge message is the average of the freshly scattered
value and the edge's previous message,

    msg_t(e)   = (rank_{t}(src)·w(e) + msg_{t-1}(e)) / 2
    rank_{t+1} = 0.85 · Σ_in msg_t + 0.15/N

— exactly a ``gather(prev_val, curr_val)`` kernel in the reference's
vocabulary. Checked against a dense numpy simulation of the same
recurrence (retry-safe: all state rides the checkpointed frame, nothing
lives in worker memory).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hoshizora_spark import Graph, edges_from_pairs
from hoshizora_spark.algorithms.pagerank import DAMPING, JUMP, _weighted_edges
from hoshizora_spark.runtime.superstep import bsp_loop
from tests.fixtures import ALL_FIXTURES

ROUNDS = 6


def _spark_edge_state_pagerank(spark, pairs):
    g = Graph.from_edges(edges_from_pairs(spark, pairs))
    V = g.num_vertices
    base = JUMP / V
    ew = _weighted_edges(g).persist()
    ew.count()

    # BSP state = vertex rows (kind=0: vid, val=rank) ∪ edge rows
    # (kind=1: src, dst, val=prev_msg). One frame, one checkpoint.
    def init():
        verts = g.vertices().select(
            F.lit(0).alias("kind"),
            F.col("vid").alias("src"),
            F.lit(-1).cast("long").alias("dst"),
            F.lit(1.0).alias("val"),
        )
        edges0 = ew.select(
            F.lit(1).alias("kind"), "src", "dst", F.lit(0.0).alias("val")
        )
        return verts.unionByName(edges0)

    def step(state, it):
        ranks = state.filter(F.col("kind") == 0).select(
            F.col("src").alias("rvid"), F.col("val").alias("rank")
        )
        prev = state.filter(F.col("kind") == 1).select("src", "dst", F.col("val").alias("pm"))
        # gather(prev_val, curr_val): smooth the fresh scatter with the
        # edge's previous message — needs BOTH the joined rank and pm
        msgs = (
            ew.join(prev, ["src", "dst"])
            .join(F.broadcast(ranks), F.col("src") == F.col("rvid"))
            .select(
                "src",
                "dst",
                ((F.col("rank") * F.col("w") + F.col("pm")) / 2.0).alias("msg"),
            )
        )
        new_edges = msgs.select(
            F.lit(1).alias("kind"), "src", "dst", F.col("msg").alias("new_val"),
            F.lit(0.0).alias("old_val"),
        )
        acc = msgs.groupBy("dst").agg(F.sum("msg").alias("acc"))
        new_verts = (
            ranks.join(acc, ranks.rvid == acc.dst, "left")
            .select(
                F.lit(0).alias("kind"),
                F.col("rvid").alias("src"),
                F.lit(-1).cast("long").alias("dst"),
                (F.lit(DAMPING) * F.coalesce("acc", F.lit(0.0)) + F.lit(base)).alias(
                    "new_val"
                ),
                F.col("rank").alias("old_val"),
            )
        )
        return new_verts.unionByName(new_edges)

    res = bsp_loop(
        spark,
        init=init,
        step=step,
        stat_expr=F.max(F.when(F.col("kind") == 0, F.abs(F.col("new_val") - F.col("old_val")))),
        done=lambda d: False,
        restore=lambda df: df.select("kind", "src", "dst", F.col("new_val").alias("val")),
        max_iters=ROUNDS,
    )
    ew.unpersist()
    out = res.state.filter(F.col("kind") == 0).select(
        F.col("src").alias("vid"), F.col("val").alias("rank")
    )
    return {r["vid"]: r["rank"] for r in out.collect()}, V


def _numpy_reference(pairs, V):
    W = np.zeros((V, V))  # W[dst, src] = edge weight (mult / out_deg)
    from collections import Counter

    cnt = Counter(pairs)
    outdeg = Counter(s for s, _ in pairs)
    for (s, d), m in cnt.items():
        W[d, s] += m / outdeg[s]
    rank = np.ones(V)
    msg = np.zeros((V, V))  # msg[dst, src]; only edge slots ever non-zero
    mask = W != 0
    for _ in range(ROUNDS):
        fresh = W * rank[None, :]
        msg = np.where(mask, (fresh + msg) / 2.0, 0.0)
        rank = DAMPING * msg.sum(axis=1) + JUMP / V
    return rank


def test_edge_state_bsp_matches_dense_simulation(spark):
    pairs = ALL_FIXTURES["g6_powerlaw"]
    got, V = _spark_edge_state_pagerank(spark, pairs)
    want = _numpy_reference(pairs, V)
    assert set(got) == set(range(V))
    for v in range(V):
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
