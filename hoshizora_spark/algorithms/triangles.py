"""Triangle counting via degree-ordered edge joins.

Absent from the reference (README.md:67 lists applications as WIP); mandated
by BASELINE.json north_rule. Standard degree-ordering construction:

  1. canonicalize: undirected, dedup, drop self-loops
  2. orient each edge u→v iff (deg(u), u) < (deg(v), v)
     — every vertex's oriented out-degree is O(sqrt(E)), so the wedge join
     below is O(E^1.5) work and hub vertices cannot blow up a single key
     (the skew mitigation for power-law graphs)
  3. wedges: o1(u,v) ⋈ o2(v,w) on v → (u, v, w)
  4. close: wedge ⋈ oriented on (u,w) → triangle (u < v < w in order)
  5. per-vertex counts: explode {u,v,w} → groupBy(vid).count
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hoshizora_spark.graph.core import Graph, symmetrize


def _oriented(graph: Graph) -> DataFrame:
    """(u, v) with (deg,id)-order u < v over the undirected simple graph."""
    und = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).withColumnRenamed("src", "v")
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    withdeg = und.join(da, "a").join(db, "b")
    return withdeg.select(
        F.when(
            (F.col("deg_a") < F.col("deg_b"))
            | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
            F.col("a"),
        )
        .otherwise(F.col("b"))
        .alias("u"),
        F.when(
            (F.col("deg_a") < F.col("deg_b"))
            | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
            F.col("b"),
        )
        .otherwise(F.col("a"))
        .alias("v"),
    )


def triangle_triples(graph: Graph) -> DataFrame:
    """One row per triangle: (x, y, z) the oriented corners (each exactly once).

    ``oriented`` is referenced 3× in one plan, so it is persisted for the
    build — but only for the build: the triple frame is materialized here
    (eager localCheckpoint — an RDD the ContextCleaner reclaims once the
    caller drops it, unlike a CacheManager entry) and the cache released
    before returning, so no session-lifetime cached frame survives the call.
    """
    oriented = _oriented(graph).persist()
    wedges = oriented.alias("e1").join(
        oriented.select(F.col("u").alias("v"), F.col("v").alias("w")).alias("e2"), "v"
    )
    closing = oriented.select(F.col("u"), F.col("v").alias("w"))
    tri = (
        wedges.join(closing, ["u", "w"], "inner")
        .select(F.col("u").alias("x"), F.col("v").alias("y"), F.col("w").alias("z"))
        .localCheckpoint(eager=True)
    )
    oriented.unpersist()
    return tri


def triangle_counts(graph: Graph) -> DataFrame:
    """(vid: long, triangles: long) over the full dense domain (zeros included)."""
    tri = triangle_triples(graph)
    corners = (
        tri.select(F.col("x").alias("vid"))
        .union(tri.select(F.col("y").alias("vid")))
        .union(tri.select(F.col("z").alias("vid")))
    )
    per_vertex = corners.groupBy("vid").agg(F.count(F.lit(1)).alias("triangles"))
    return (
        graph.vertices()
        .join(per_vertex, "vid", "left")
        .select("vid", F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"))
    )


def triangle_total(graph: Graph) -> int:
    return triangle_triples(graph).count()


def clustering_coefficients(graph: Graph) -> DataFrame:
    """(vid, triangles, degree, lcc) — local clustering coefficient over
    the undirected simple graph: lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1)),
    0.0 where deg < 2. Full dense domain (isolated vertices included).

    Pure composition: per-vertex triangle counts (degree-ordered joins
    above, O(E^1.5) with the sqrt(E) out-degree bound) + one degree agg —
    all Catalyst, no Python. deg·(deg−1) stays exact in float64 up to
    deg ≈ 9.4e7, far past any real vertex degree."""
    und = symmetrize(graph.edges)
    deg = (
        und.groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
        .withColumnRenamed("src", "vid")
    )
    d = F.coalesce(F.col("degree"), F.lit(0))
    return (
        triangle_counts(graph)
        .join(deg, "vid", "left")
        .select(
            "vid",
            "triangles",
            d.alias("degree"),
            F.when(
                d >= 2,
                F.lit(2.0) * F.col("triangles") / (d * (d - F.lit(1.0))),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )
