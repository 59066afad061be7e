"""Neighborhood-overlap link prediction: common neighbors, Jaccard,
Adamic–Adar.

Not shipped by the reference (README.md:67, applications WIP); the
standard candidate-scoring pass of entity-resolution / link-prediction
pipelines over the same undirected simple graph the triangle counter
uses. One wedge join, one aggregation:

  1. canonicalize: undirected, dedup, drop self-loops; degree table
  2. wedges through each shared neighbor w: sym(w,u) ⋈ sym(w,v), u < v
  3. groupBy (u, v): common = count(w), adamic_adar = Σ 1/ln(deg(w))
  4. join degrees: jaccard = common / (deg(u) + deg(v) − common)
  5. drop pairs already adjacent (candidates = non-edges), unless
     ``include_existing``

Scale shape: the wedge join costs Σ_w deg(w)² — on a power-law graph the
hubs dominate, so ``max_hub_degree`` drops wedge CENTERS above the cap
(the standard recall-for-work trade, same contract as the LSH bucket
caps in text.py). The group key is the (u, v) pair — ~deg² keys, each
tiny, so the aggregation itself cannot skew. No windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hoshizora_spark.graph.core import Graph


def link_prediction(
    graph: Graph,
    min_common: int = 1,
    max_hub_degree: int | None = None,
    include_existing: bool = False,
    round_dp: int | None = 6,
) -> DataFrame:
    """(u, v, common, jaccard, adamic_adar) for unordered pairs u < v
    sharing ≥ ``min_common`` neighbors in the undirected simple graph.

    ``max_hub_degree``: drop shared-neighbor centers with degree above
    the cap before the wedge join (bounds work on power-law hubs; scores
    for pairs only connected through dropped hubs are lost — documented
    recall trade). ``round_dp`` rounds the two double scores for
    bit-portable comparison (None = raw doubles).
    """
    und = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    sym = und.select(F.col("a").alias("w"), F.col("b").alias("n")).union(
        und.select(F.col("b").alias("w"), F.col("a").alias("n"))
    )
    deg = sym.groupBy("w").agg(F.count(F.lit(1)).alias("deg"))
    centers = sym.join(deg, "w")
    if max_hub_degree is not None:
        centers = centers.filter(F.col("deg") <= max_hub_degree)
    left = centers.select("w", F.col("n").alias("u"), F.col("deg").alias("deg_w"))
    right = centers.select("w", F.col("n").alias("v"))
    pairs = (
        left.join(right, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(F.lit(1.0) / F.log(F.col("deg_w").cast("double"))).alias("aa"),
        )
        .filter(F.col("common") >= min_common)
    )
    if not include_existing:
        pairs = pairs.join(
            und.select(F.col("a").alias("u"), F.col("b").alias("v")),
            ["u", "v"],
            "left_anti",
        )
    du = deg.select(F.col("w").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("w").alias("v"), F.col("deg").alias("deg_v"))
    scored = pairs.join(du, "u").join(dv, "v")
    jacc = F.col("common").cast("double") / (
        F.col("deg_u") + F.col("deg_v") - F.col("common")
    ).cast("double")
    aa = F.col("aa")
    if round_dp is not None:
        jacc = F.round(jacc, round_dp)
        aa = F.round(aa, round_dp)
    return scored.select(
        "u",
        "v",
        "common",
        jacc.alias("jaccard"),
        aa.alias("adamic_adar"),
    )
