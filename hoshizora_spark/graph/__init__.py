from hoshizora_spark.graph.core import Graph, edges_from_pairs, symmetrize

__all__ = ["Graph", "edges_from_pairs", "symmetrize"]
