"""Drop-in API surface matching the reference's Python module.

The reference exposes exactly two functions via pybind11
(/root/reference/src/hoshizora/pybind.cpp:6-22):

    hoshizora.pagerank(file_name, num_iters=50)      -> list[str]
    hoshizora.clustering(file_name, num_clusters_hint=100,
                         threshold=0.00003)          -> list[int]

These wrappers reproduce that surface (same defaults, same return shapes —
pagerank stringifies ranks exactly like app/pagerank.h:43-50 ``to_string``)
on top of the Spark engine, so a reference user can switch imports and run.

WARNING — small-graph-only surface: the reference API's return type forces
``collect()`` of one Python object per vertex onto the driver. At 10^6+
vertices that is gigabytes of driver heap and minutes of serialization; at
link-graph scale (10^9+) it will OOM the driver outright. This module
exists for drop-in parity on reference-sized inputs (≈5M edges, io.h:43).
Anything larger must use the native API (``hoshizora_spark.pagerank`` /
``clustering``), which returns DataFrames and writes results distributed.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hoshizora_spark.algorithms.clustering import clustering as _clustering
from hoshizora_spark.algorithms.pagerank import pagerank as _pagerank
from hoshizora_spark.graph.core import Graph
from hoshizora_spark.io import read_edge_list
from hoshizora_spark.session import get_spark


def _graph_from_file(spark: SparkSession | None, file_name: str) -> Graph:
    spark = spark or get_spark()
    return Graph.from_edges(read_edge_list(spark, file_name))


def pagerank(file_name: str, num_iters: int = 50, spark: SparkSession | None = None) -> list[str]:
    """Fixed-iteration PageRank, stringified per vertex (pybind.cpp:10-14)."""
    g = _graph_from_file(spark, file_name)
    res = _pagerank(g, tol=None, max_iters=num_iters)
    rows = res.ranks.orderBy("vid").select(F.col("rank").cast("float")).collect()
    # f32 cast + C++ std::to_string fixed 6-decimal format (pagerank.h:47)
    return [f"{r['rank']:.6f}" for r in rows]


def clustering(
    file_name: str,
    num_clusters_hint: int = 100,
    threshold: float = 0.00003,
    spark: SparkSession | None = None,
) -> list[int]:
    """Cluster id per vertex, dense-packed (pybind.cpp:15-21)."""
    g = _graph_from_file(spark, file_name)
    res = _clustering(g, num_clusters_hint=num_clusters_hint, threshold=threshold)
    rows = res.assign.orderBy("vid").select("cluster").collect()
    return [int(r["cluster"]) for r in rows]
