"""Louvain-style modularity clustering with graph coarsening (reference app #2).

Replicates the structure of the reference's ``clustering`` driver
(/root/reference/src/hoshizora/app/apps.h:42-175) and its one-superstep
best-gain kernel (/root/reference/src/hoshizora/app/clustering_louvain.h:11-86):

  per level, on the coarse weighted graph (M = ORIGINAL edge count, fixed):
    q(v)        = (e_ii(v) + Σ_out w + Σ_in w) / (2M)          (scatter, l.28-42)
    gain(s,d)   = 2·(w(s,d)/(2M) − q(s)·q(d))                  (gather, l.44-60)
    best(d)     = argmax over in-edges by gain, gain > threshold,
                  ties → smallest src (CSC fold order with strict '>', l.62-75)
    label(d)    = min(best_src, d), else d                     (sum, l.70)
  then (driver, apps.h:80-167):
    pointer-jump labels to fixpoint                            (l.100-110)
    pack surviving labels dense, in ascending label order      (l.113-123)
    coarsen: intra-cluster weight → e_ii, inter → summed edge weight
    repeat while num_clusters > num_clusters_hint and anything moved

Two deliberate divergences from reference *implementation* (not output
contract — the reference ships no tests or goldens, README.md:66):
  * apps.h:125-162 re-counts every coarse edge as weight 1 on deeper
    levels, discarding accumulated weights (and resets e_ii); we sum true
    weights — standard Louvain coarsening.
  * the reference puns packed/original id spaces in its relabel loop
    (apps.h:81-98); we keep an explicit (orig_vid → coarse_id) assignment.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hoshizora_spark.graph.core import Graph, maybe_broadcast
from hoshizora_spark.graph.ids import assign_dense_ids


@dataclass
class ClusteringResult:
    assign: DataFrame  # (vid: long, cluster: long) — dense 0..k-1
    num_clusters: int
    levels: int
    clusters_per_level: list[int] = field(default_factory=list)


def _best_moves(
    edges_w: DataFrame, vprops: DataFrame, m_all: int, threshold: float, num_coarse: int
) -> DataFrame:
    """(cid, new_label, moved) per coarse vertex — the one-superstep GAS pass."""
    # strength: e_ii + out weights + in weights  (clustering_louvain.h:28-42)
    outw = edges_w.groupBy("src").agg(F.sum("w").alias("ow"))
    inw = edges_w.groupBy("dst").agg(F.sum("w").alias("iw"))
    q = (
        vprops.join(outw, vprops.cid == outw.src, "left")
        .join(inw, vprops.cid == inw.dst, "left")
        .select(
            "cid",
            (
                (F.col("e_ii") + F.coalesce("ow", F.lit(0.0)) + F.coalesce("iw", F.lit(0.0)))
                / F.lit(2.0 * m_all)
            ).alias("q"),
        )
    )
    q = maybe_broadcast(q, num_coarse, 200_000)
    qs = q.select(F.col("cid").alias("src"), F.col("q").alias("q_src"))
    qd = q.select(F.col("cid").alias("dst"), F.col("q").alias("q_dst"))
    gains = (
        edges_w.join(qs, "src")
        .join(qd, "dst")
        .select(
            "src",
            "dst",
            (
                F.lit(2.0)
                * (F.col("w") / F.lit(2.0 * m_all) - F.col("q_src") * F.col("q_dst"))
            ).alias("gain"),
        )
    )
    # fold over in-edges: strict '>' with CSC (src-ascending) order means
    # max gain wins, equal gains keep the smallest src (kernel sum, l.62-75)
    best = (
        gains.filter(F.col("gain") > F.lit(threshold))
        .groupBy("dst")
        .agg(F.max(F.struct(F.col("gain"), (-F.col("src")).alias("neg_src"))).alias("top"))
        .select(
            F.col("dst").alias("cid"),
            F.least(-F.col("top.neg_src"), F.col("dst")).alias("adopt"),
        )
    )
    best = maybe_broadcast(best, num_coarse, 200_000)
    return vprops.select("cid").join(best, "cid", "left").select(
        "cid",
        F.coalesce(F.col("adopt"), F.col("cid")).alias("new_label"),
        F.col("adopt").isNotNull().alias("moved"),
    )


def _pointer_jump(labels: DataFrame, num_coarse: int, max_hops: int = 64) -> DataFrame:
    """label[v] <- label[label[v]] to fixpoint (apps.h:100-110).

    The changed-count rides the localCheckpoint job as an observed metric —
    one Spark job per hop, not two.
    """
    from pyspark.sql import Observation

    cur = labels.localCheckpoint(eager=True)
    for hop_i in range(max_hops):
        hop = maybe_broadcast(
            cur.select(F.col("cid").alias("jcid"), F.col("new_label").alias("jlabel")),
            num_coarse,
            200_000,
        )
        obs = Observation(f"hz_jump_{hop_i}")
        nxt = (
            cur.join(hop, cur.new_label == hop.jcid, "left")
            .select(
                "cid",
                F.coalesce("jlabel", "new_label").alias("new_label"),
                (F.coalesce("jlabel", "new_label") != F.col("new_label")).alias("ch"),
            )
            .observe(obs, F.sum(F.col("ch").cast("long")).alias("changed"))
        ).localCheckpoint(eager=True)
        changed = int(obs.get.get("changed") or 0)
        cur = nxt.select("cid", "new_label")
        if changed == 0:
            break
    return cur


def clustering(
    graph: Graph,
    num_clusters_hint: int = 100,
    threshold: float = 3e-5,
    max_levels: int = 20,
) -> ClusteringResult:
    """Defaults mirror pybind (/root/reference/src/hoshizora/pybind.cpp:15-21)."""
    spark = graph.spark
    V = graph.num_vertices
    m_all = graph.edges.count()  # graph.num_all_edges = num_edges (apps.h:71)
    if V == 0 or m_all == 0:
        return ClusteringResult(
            assign=graph.vertices().withColumn("cluster", F.col("vid")),
            num_clusters=V,
            levels=0,
        )

    # level-0 coarse graph: weight 1 per distinct out-edge (apps.h:58-66 uses
    # an unordered_map per src, so multi-edges collapse to weight 1), e_ii=0
    assign = graph.vertices().select(F.col("vid"), F.col("vid").alias("coarse"))
    assign = assign.localCheckpoint(eager=True)
    edges_w = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .distinct()
        .select("src", "dst", F.lit(1.0).alias("w"))
    )
    vprops = graph.vertices().select(
        F.col("vid").alias("cid"), F.lit(0.0).alias("e_ii")
    )
    num_coarse = V
    edges_w = edges_w.localCheckpoint(eager=True)
    vprops = vprops.localCheckpoint(eager=True)

    levels = 0
    sizes: list[int] = []
    while True:
        moves = _best_moves(edges_w, vprops, m_all, threshold, num_coarse)
        moves = moves.localCheckpoint(eager=True)
        any_moved = moves.filter(F.col("moved")).count() > 0
        labels = _pointer_jump(moves.select("cid", "new_label"), num_coarse)

        # dense pack in ascending label order (apps.h:113-123 std::map scan);
        # assign_dense_ids is the scalable range-partitioned pack, not a
        # single-partition global window
        packed = assign_dense_ids(
            labels.select(F.col("new_label").alias("lbl")), ["lbl"], id_col="packed"
        )
        new_k = packed.count()
        packed = maybe_broadcast(packed, new_k, 200_000)
        cmap = labels.join(packed, labels.new_label == packed.lbl).select(
            F.col("cid"), F.col("packed")
        )
        cmap = maybe_broadcast(cmap, num_coarse, 200_000)
        assign = (
            assign.join(cmap, assign.coarse == cmap.cid)
            .select("vid", F.col("packed").alias("coarse"))
            .localCheckpoint(eager=True)
        )
        levels += 1
        sizes.append(new_k)

        if not (new_k > num_clusters_hint and any_moved) or levels >= max_levels:
            num_coarse = new_k
            break

        # coarsen (true-weight variant; see module docstring)
        cs = cmap.select(F.col("cid").alias("src"), F.col("packed").alias("c_src"))
        cd = cmap.select(F.col("cid").alias("dst"), F.col("packed").alias("c_dst"))
        rolled = (
            edges_w.join(cs, "src")
            .join(cd, "dst")
            .groupBy("c_src", "c_dst")
            .agg(F.sum("w").alias("w"))
        )
        intra = rolled.filter(F.col("c_src") == F.col("c_dst")).select(
            F.col("c_src").alias("cid"), F.col("w").alias("intra_w")
        )
        carried = (
            vprops.join(cmap, "cid")
            .groupBy("packed")
            .agg(F.sum("e_ii").alias("old_eii"))
            .select(F.col("packed").alias("cid"), "old_eii")
        )
        new_vprops = (
            carried.join(intra, "cid", "left")
            .select(
                "cid",
                (F.coalesce("intra_w", F.lit(0.0)) + F.col("old_eii")).alias("e_ii"),
            )
        )
        edges_w = (
            rolled.filter(F.col("c_src") != F.col("c_dst"))
            .select(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"), "w")
            .localCheckpoint(eager=True)
        )
        vprops = new_vprops.localCheckpoint(eager=True)
        num_coarse = new_k

    return ClusteringResult(
        assign=assign.select("vid", F.col("coarse").alias("cluster")),
        num_clusters=num_coarse,
        levels=levels,
        clusters_per_level=sizes,
    )
