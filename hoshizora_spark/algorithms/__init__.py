from hoshizora_spark.algorithms.pagerank import pagerank
from hoshizora_spark.algorithms.components import connected_components
from hoshizora_spark.algorithms.labelprop import label_propagation
from hoshizora_spark.algorithms.triangles import triangle_counts, triangle_total

__all__ = [
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_counts",
    "triangle_total",
]
