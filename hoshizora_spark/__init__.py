"""hoshizora_spark — a PySpark-native link-graph analytics engine.

A from-scratch reimagining of hoshizora (single-node C++ GAS engine,
/root/reference) on Apache Spark: PageRank, connected components, label
propagation, and triangle counting over edge tables derived from a
source-code corpus, expressed as DataFrame joins/aggregations plus
vectorized Arrow UDFs, with per-superstep checkpointing and skew-aware
partitioning.
"""

from hoshizora_spark.graph.core import Graph, edges_from_pairs, symmetrize
from hoshizora_spark.graph.csr import CsrBlocks, build_csr_blocks
from hoshizora_spark.algorithms.pagerank import (
    pagerank,
    pagerank_csr,
    personalized_pagerank,
    personalized_pagerank_csr,
    top_k,
)
from hoshizora_spark.algorithms.bfs import bfs_distances, bfs_distances_csr
from hoshizora_spark.algorithms.anf import (
    neighborhood_function,
    neighborhood_function_hll,
)
from hoshizora_spark.algorithms.centrality import (
    degree_assortativity,
    harmonic_centrality,
    harmonic_centrality_hll,
    hits,
)
from hoshizora_spark.algorithms.betweenness import betweenness_centrality
from hoshizora_spark.algorithms.linkpred import link_prediction
from hoshizora_spark.algorithms.coloring import greedy_coloring
from hoshizora_spark.algorithms.densest import densest_subgraph
from hoshizora_spark.algorithms.mis import maximal_independent_set
from hoshizora_spark.algorithms.msf import minimum_spanning_forest
from hoshizora_spark.algorithms.scc import strongly_connected_components
from hoshizora_spark.algorithms.walks import random_walks, walks_as_sentences
from hoshizora_spark.algorithms.sssp import sssp_distances, sssp_distances_csr
from hoshizora_spark.algorithms.edge_state import smoothed_pagerank
from hoshizora_spark.algorithms.clustering import clustering
from hoshizora_spark.algorithms.components import (
    connected_components,
    connected_components_csr,
)
from hoshizora_spark.algorithms.kcore import k_core, k_core_hindex, k_core_hindex_csr
from hoshizora_spark.algorithms.truss import k_truss
from hoshizora_spark.algorithms.labelprop import label_propagation, label_propagation_csr
from hoshizora_spark.algorithms.triangles import (
    clustering_coefficients,
    triangle_counts,
    triangle_total,
)
from hoshizora_spark import multimodal, similarity, text
from hoshizora_spark.io import read_edge_list, read_edges_parquet
from hoshizora_spark.runtime.checkpoint import CheckpointManager
from hoshizora_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "Graph",
    "CsrBlocks",
    "build_csr_blocks",
    "edges_from_pairs",
    "symmetrize",
    "bfs_distances",
    "bfs_distances_csr",
    "betweenness_centrality",
    "link_prediction",
    "k_truss",
    "densest_subgraph",
    "greedy_coloring",
    "maximal_independent_set",
    "minimum_spanning_forest",
    "strongly_connected_components",
    "random_walks",
    "walks_as_sentences",
    "sssp_distances",
    "sssp_distances_csr",
    "neighborhood_function",
    "neighborhood_function_hll",
    "harmonic_centrality",
    "harmonic_centrality_hll",
    "degree_assortativity",
    "hits",
    "pagerank",
    "pagerank_csr",
    "personalized_pagerank",
    "personalized_pagerank_csr",
    "smoothed_pagerank",
    "top_k",
    "clustering",
    "k_core",
    "k_core_hindex",
    "k_core_hindex_csr",
    "multimodal",
    "connected_components",
    "connected_components_csr",
    "read_edge_list",
    "read_edges_parquet",
    "similarity",
    "text",
    "label_propagation",
    "label_propagation_csr",
    "clustering_coefficients",
    "triangle_counts",
    "triangle_total",
    "CheckpointManager",
    "get_spark",
]
