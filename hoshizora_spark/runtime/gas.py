"""Vectorized Gather-Apply-Scatter over CSR blocks (the Kernel extension point).

The reference's only user extension surface is the ``Kernel`` virtual class
(/root/reference/src/hoshizora/core/kernel.h:7-29): per-vertex ``init``,
per-out-edge ``scatter``, per-in-edge ``gather``, per-dst monoid
``zero``+``sum``, per-vertex ``apply`` — executed scalar, one virtual call
per element (bulksync_gas_executor.h:179-235). Here the same protocol is
**vectorized**: each hook takes/returns numpy arrays over one CSR block's
Arrow batch, so Python runs a handful of numpy kernels per block per
superstep instead of per-element calls — the SIMD execution the reference
aspired to (core/colle.h:17 "TODO: SIMD-aware").

Execution of one superstep (2 exchanges total, vs the reference's 5
barriers — scatter/gather fuse into one numpy pass, sum is split into an
in-block partial fold + a final shuffle agg):

  1. route state rows to their owning block (``block_id_of``)
  2. groupBy(block_id) → ``applyInPandas`` (CSR arrays come from the
     worker-cached sidecar, graph/csr.py — only state rows cross Arrow):
       gather src values per edge (np.repeat over CSR offsets),
       msgs = kernel.scatter_gather(src_vals, weights),
       per-block partial fold by dst (np.bincount / ufunc.at)
       → (dst, acc) rows, ≤ distinct-dst-per-block of them
  3. final fold + apply, fused: the block partials union a NULL-acc
     carrier row per vertex (old state + block ownership riding along),
     one groupBy(dst).agg(sum|min|max, max(old), max(bid)) folds across
     blocks AND replaces the old broadcast apply join — the whole
     superstep is ONE Spark job. [the only big shuffle; partial folding
     bounds any hot vertex's fan-in at num_blocks rows — built-in skew
     mitigation, no salting needed on this path]
  4. apply: a Column expression over (old_val, acc) on the agg output

The per-block partial fold is the distributed replacement for the
reference's ``forward_indices`` static permutation (graph.h:354-388): the
exchange delivers messages pre-grouped by dst, Spark's shuffle plays the
role of the permutation.
"""

from __future__ import annotations

from typing import Protocol

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hoshizora_spark.graph.csr import CsrBlocks

_COMBINES = {"sum": F.sum, "min": F.min, "max": F.max}


class VectorKernel(Protocol):
    """Vectorized GAS kernel (numpy in, numpy out). Mirrors core/kernel.h.

    Parity note — ``gather``'s ``prev_val`` (kernel.h:17-18): the reference
    hands gather the edge's *previous-superstep* EData from a persistent
    per-edge buffer (bulksync_gas_executor.h keeps E-sized arrays across
    supersteps). Neither reference app reads it (pagerank.h / apps.h both
    return a function of ``curr_val`` only), so this protocol does not
    allocate per-edge state. A kernel that genuinely needs it expresses the
    edge buffer as BSP state — carry (edge_id, eval) rows in the loop state
    frame (E rows instead of V) and join them into the superstep — which is
    the only retry-safe distributed form: worker-resident edge buffers
    would silently reset whenever Spark recomputes a task.
    """

    combine: str  # 'sum' | 'min' | 'max' — the zero+sum monoid
    state_type: str  # Spark type of the vertex state column, e.g. 'double'

    def init_expr(self, vid: Column) -> Column:
        """Iteration-0 state (kernel.h:12 ``init``)."""
        ...

    def scatter_gather(self, src_vals: np.ndarray, weights: np.ndarray) -> np.ndarray:
        """Per-edge message from gathered src state (kernel.h:14-18
        ``scatter``+``gather`` fused — both are per-edge maps)."""
        ...

    def apply_expr(self, vid: Column, prev: Column, acc: Column) -> Column:
        """New state from (prev, folded acc); acc is NULL when no message
        arrived (kernel.h:20-26 ``zero``/``apply``)."""
        ...


def _partial_fold(combine: str, msgs_sorted: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Linear per-dst fold over dst-sorted messages (np.*.reduceat).

    The sort happened ONCE at block-build time (the forward permutation,
    reference graph.h:354-388); per superstep this is a single O(E) pass.
    """
    if len(msgs_sorted) == 0:
        return msgs_sorted
    if combine == "sum":
        return np.add.reduceat(msgs_sorted, starts)
    if combine == "min":
        return np.minimum.reduceat(msgs_sorted, starts)
    if combine == "max":
        return np.maximum.reduceat(msgs_sorted, starts)
    raise ValueError(f"unknown combine {combine!r}")


def gas_partial_messages(
    csr: CsrBlocks, state: DataFrame, kernel: VectorKernel
) -> DataFrame:
    """(dst, acc) per block — steps 1-2 above, BEFORE the final cross-block
    fold (≤ num_blocks rows per distinct dst).

    ``state`` must be (vid: long, val: state_type, block_id: int) covering
    every vertex — ``block_id`` is assigned once by ``init_state`` and
    carried through every superstep (vertex→block ownership is static, so
    re-deriving it per superstep would be O(V·num_blocks) wasted work).
    Only state rows travel through the exchange; the CSR arrays are loaded
    from the sidecar store and cached inside each reused Python worker
    (graph/csr.py load_block) — the static-adjacency property of the
    reference's execution model.
    """
    path = csr.path
    combine = kernel.combine
    scatter_gather = kernel.scatter_gather

    def run_block(key, state_pdf: pd.DataFrame) -> pd.DataFrame:
        from hoshizora_spark.graph.csr import load_block

        lo, hi, _off, _idx, _w, src_sorted, w_sorted, uniq_dst, starts = load_block(
            path, int(key[0])
        )
        vals = np.zeros(hi - lo, dtype=np.float64)
        vids = state_pdf["vid"].to_numpy(np.int64)
        vals[vids - lo] = state_pdf["val"].to_numpy(np.float64)
        # gather per edge in dst-sorted order: one cache-friendly fancy
        # index into the block-local state slice (the scatter+forward-
        # permutation of the reference, fused)
        msgs = scatter_gather(vals[src_sorted], w_sorted)
        acc = _partial_fold(combine, msgs, starts)
        return pd.DataFrame({"dst": uniq_dst, "acc": acc})

    return state.groupby("block_id").applyInPandas(
        run_block, schema="dst long, acc double"
    )


def gas_messages(csr: CsrBlocks, state: DataFrame, kernel: VectorKernel) -> DataFrame:
    """(dst, acc) after the full fold — steps 1-3 above."""
    partial = gas_partial_messages(csr, state, kernel)
    agg = _COMBINES[kernel.combine]
    return partial.groupBy("dst").agg(agg("acc").alias("acc"))


class KeyedVectorKernel(Protocol):
    """GAS kernel whose per-dst accumulator is a (key → count) map — the
    struct-valued fold the scalar sum/min/max monoid can't express.

    This is the CSR-path generalization the reference reaches with
    pair-typed state + a side-band ``changed`` flag in its kernel ``sum``
    (clustering_louvain.h:62-75); label propagation's per-(dst, label)
    counting is the canonical instance. ``scatter_key`` maps gathered src
    states to a per-edge integer key; the fold counts occurrences per
    (dst, key); the argmax/tiebreak over the map happens algorithm-side on
    the (dst, key, cnt) frame.
    """

    state_type: str  # Spark type of the vertex state column, e.g. 'long'

    def init_expr(self, vid: Column) -> Column:
        ...

    def scatter_key(self, src_vals: np.ndarray) -> np.ndarray:
        """Per-edge key from gathered src state (identity for LPA)."""
        ...


def gas_keyed_counts(csr: CsrBlocks, state: DataFrame, kernel: KeyedVectorKernel) -> DataFrame:
    """(dst, key, cnt) after the full fold — the keyed analogue of
    ``gas_messages``. Per block: gather src states in dst-sorted order,
    map to keys, run-length-encode consecutive (dst, key) runs after an
    in-block lexsort — O(E log E) numpy per block, emitting at most
    distinct-(dst, key)-per-block rows into the exchange. A hot vertex's
    fan-in is bounded at num_blocks × distinct keys, the same built-in
    skew bound as the scalar path."""
    path = csr.path
    scatter_key = kernel.scatter_key

    def run_block(key, state_pdf: pd.DataFrame) -> pd.DataFrame:
        from hoshizora_spark.graph.csr import load_block

        lo, hi, _off, _idx, _w, src_sorted, _w_sorted, uniq_dst, starts = load_block(
            path, int(key[0])
        )
        n_edges = len(src_sorted)
        if n_edges == 0:
            return pd.DataFrame({"dst": [], "key": [], "cnt": []}).astype(
                {"dst": np.int64, "key": np.int64, "cnt": np.int64}
            )
        vals = np.zeros(hi - lo, dtype=np.int64)
        vids = state_pdf["vid"].to_numpy(np.int64)
        vals[vids - lo] = state_pdf["val"].to_numpy(np.int64)
        keys = scatter_key(vals[src_sorted])
        seg_lens = np.diff(np.r_[starts, n_edges])
        dst_idx = np.repeat(np.arange(len(uniq_dst), dtype=np.int64), seg_lens)
        order = np.lexsort((keys, dst_idx))
        kd, kl = dst_idx[order], keys[order]
        head = np.r_[True, (kd[1:] != kd[:-1]) | (kl[1:] != kl[:-1])]
        idx = np.flatnonzero(head)
        cnt = np.diff(np.r_[idx, n_edges])
        return pd.DataFrame(
            {"dst": uniq_dst[kd[idx]], "key": kl[idx], "cnt": cnt.astype(np.int64)}
        )

    partial = state.groupby("block_id").applyInPandas(
        run_block, schema="dst long, key long, cnt long"
    )
    return partial.groupBy("dst", "key").agg(F.sum("cnt").alias("cnt"))


def dst_route_table(csr: CsrBlocks, edges: DataFrame) -> DataFrame:
    """(block_id, vid) — the blocks in which each vertex appears as a dst.

    The GraphX-style vertex routing table: CSR blocks partition by *src*
    range, so a fold whose per-edge term reads dst-side state (the
    clustering gain's ``q_dst``, clustering_louvain.h:44-60) must replicate
    that state into every block holding an in-edge of the vertex. Built
    once per block build (one distinct over E rows); per-superstep cost is
    then one join of the V-row state against this ≤min(E, V·B)-row table —
    the distributed stand-in for the reference's shared-memory read of
    ``v_data[dst]`` in ``gather``.
    """
    return (
        edges.select(
            csr.block_id_of(F.col("src")).alias("block_id"),
            F.col("dst").alias("vid"),
        )
        .distinct()
    )


def gas_gain_argmax(
    csr: CsrBlocks,
    q: DataFrame,
    dst_route: DataFrame,
    c2m: float,
    threshold: float,
) -> DataFrame:
    """(dst, gain, src) — per-dst argmax over in-edges of the modularity
    gain ``2·(w/c2m − q_src·q_dst)``, keeping only gains strictly above
    ``threshold``; ties broken toward the smallest src. This is the
    reference clustering kernel's gather+sum on the CSR fast path
    (clustering_louvain.h:44-75: gather computes the gain, sum is a strict
    ``>`` fold in CSC src-ascending order ⇒ max gain, ties → smallest src).

    ``q``: (vid, q) for every vertex. Blocks must be built with raw
    weights (``normalize_weights=False``). Arithmetic matches the
    DataFrame path bit-for-bit: same driver-computed ``c2m`` literal, same
    IEEE double ops, and the final cross-block merge is the identical
    ``max(struct(gain, -src))`` aggregate. Per-block partials bound a hot
    vertex's fan-in at num_blocks rows, like every other CSR fold here.
    """
    path = csr.path
    src_side = q.select(
        "vid",
        F.col("q").alias("val"),
        csr.block_id_of(F.col("vid")).alias("block_id"),
        F.lit(0).alias("role"),
    )
    dst_side = q.join(dst_route, "vid").select(
        "vid", F.col("q").alias("val"), "block_id", F.lit(1).alias("role")
    )
    both = src_side.unionByName(dst_side)

    def run_block(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from hoshizora_spark.graph.csr import load_block

        lo, hi, _off, _idx, _w, src_sorted, w_sorted, uniq_dst, starts = load_block(
            path, int(key[0])
        )
        empty = pd.DataFrame(
            {
                "dst": np.zeros(0, np.int64),
                "gain": np.zeros(0, np.float64),
                "src": np.zeros(0, np.int64),
            }
        )
        n_edges = len(src_sorted)
        if n_edges == 0:
            return empty
        role = pdf["role"].to_numpy(np.int32)
        vids = pdf["vid"].to_numpy(np.int64)
        qv = pdf["val"].to_numpy(np.float64)
        is_src = role == 0
        vals = np.zeros(hi - lo, dtype=np.float64)
        vals[vids[is_src] - lo] = qv[is_src]
        dvid, dq = vids[~is_src], qv[~is_src]
        o = np.argsort(dvid)  # dst_route rows are distinct per block
        q_dst_u = dq[o][np.searchsorted(dvid[o], uniq_dst)]
        seg_lens = np.diff(np.r_[starts, n_edges])
        # same expression shape as the DF path: 2.0*(w/c2m - q_s*q_d)
        g = 2.0 * (w_sorted / c2m - vals[src_sorted] * np.repeat(q_dst_u, seg_lens))
        keep = g > threshold
        if not keep.any():
            return empty
        didx = np.repeat(np.arange(len(uniq_dst), dtype=np.int64), seg_lens)[keep]
        gk = g[keep]
        sk = src_sorted[keep].astype(np.int64) + lo
        # per-dst head after (dst, gain desc, src asc) ordering == the
        # reference's strict-'>' fold in src-ascending CSC order
        order = np.lexsort((sk, -gk, didx))
        dd, gg, ss = didx[order], gk[order], sk[order]
        head = np.r_[True, dd[1:] != dd[:-1]]
        return pd.DataFrame(
            {"dst": uniq_dst[dd[head]], "gain": gg[head], "src": ss[head]}
        )

    partial = both.groupby("block_id").applyInPandas(
        run_block, schema="dst long, gain double, src long"
    )
    top = partial.groupBy("dst").agg(
        F.max(F.struct(F.col("gain"), (-F.col("src")).alias("neg_src"))).alias("top")
    )
    return top.select(
        "dst",
        F.col("top.gain").alias("gain"),
        (-F.col("top.neg_src")).alias("src"),
    )


def gas_step(
    csr: CsrBlocks,
    state: DataFrame,
    kernel: VectorKernel,
    broadcast_vertices: int = 200_000,  # kept for API compat; no longer used
) -> DataFrame:
    """One full superstep: returns (vid, block_id, new_val, old_val).

    The apply join is folded INTO the final cross-block fold: block
    partials union a NULL-acc carrier row per vertex (carrying old state +
    block ownership), and one groupBy(dst) computes the monoid fold
    (min/max/sum all skip NULLs — acc stays NULL when no message arrived,
    the old left-join-miss case) plus ``max(old)``/``max(bid)`` (exactly
    one non-null per vid). A superstep is then ONE Spark job: state
    exchange → per-block numpy fold → final agg → checkpoint — no
    broadcast-collect job, no apply join (the BENCH.md ``f + W/cores``
    fixed-cost attack; the old shape paid an extra driver job per
    superstep to broadcast the folded acc back into the join).
    """
    partial = gas_partial_messages(csr, state, kernel).select(
        "dst",
        "acc",
        F.lit(None).cast(kernel.state_type).alias("old"),
        F.lit(None).cast("int").alias("bid"),
    )
    carrier = state.select(
        F.col("vid").alias("dst"),
        F.lit(None).cast("double").alias("acc"),
        F.col("val").alias("old"),
        F.col("block_id").alias("bid"),
    )
    agg = _COMBINES[kernel.combine]
    folded = partial.unionByName(carrier).groupBy("dst").agg(
        agg("acc").alias("acc"),
        F.max("old").alias("old_val"),
        F.max("bid").alias("block_id"),
    )
    return folded.select(
        F.col("dst").alias("vid"),
        "block_id",
        kernel.apply_expr(F.col("dst"), F.col("old_val"), F.col("acc")).alias("new_val"),
        F.col("old_val"),
    )


def init_state(spark, csr: CsrBlocks, kernel: VectorKernel) -> DataFrame:
    """(vid, val, block_id) — block ownership computed once, here only."""
    return spark.range(csr.num_vertices).select(
        F.col("id").alias("vid"),
        kernel.init_expr(F.col("id")).cast(kernel.state_type).alias("val"),
        csr.block_id_of(F.col("id")).alias("block_id"),
    )
