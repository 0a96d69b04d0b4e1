"""linkgraph — a PySpark-native link-graph analytics engine.

A brand-new, idiomatic-Spark re-expression of the capabilities of
``d4rkart/networkx-rust`` (reference snapshot at ``/root/reference``):
the graph model becomes a pair of DataFrames (vertices, edges), every
"loop over neighbors" becomes a join or aggregation over the edge
table, and the flagship iterative algorithms (PageRank, connected
components, label propagation, triangle counting) are partition-
parallel DataFrame computations driven by a checkpointing iteration
loop.

Nothing here is a port: the reference is an in-memory adjacency-map
library (see SURVEY.md); this package is tables + Catalyst from the
ground up.
"""

from linkgraph.graph import LinkGraph, quotient_graph
from linkgraph.session import get_spark

__all__ = ["LinkGraph", "quotient_graph", "get_spark"]
__version__ = "0.1.0"
