from linkgraph.operators.centrality import (
    betweenness_centrality,
    closeness_centrality,
    multi_source_bfs,
)
from linkgraph.operators.components import strongly_connected_components, weakly_connected_components
from linkgraph.operators.kcore import core_numbers, k_core
from linkgraph.operators.lpa import label_propagation
from linkgraph.operators.pagerank import pagerank
from linkgraph.operators.traversal import bfs_levels, reachable_from, shortest_paths
from linkgraph.operators.triangles import clustering_coefficients, triangle_counts

__all__ = [
    "pagerank",
    "weakly_connected_components",
    "strongly_connected_components",
    "label_propagation",
    "triangle_counts",
    "clustering_coefficients",
    "bfs_levels",
    "reachable_from",
    "shortest_paths",
    "k_core",
    "core_numbers",
    "multi_source_bfs",
    "closeness_centrality",
    "betweenness_centrality",
]
