from linkgraph.sources.edges import build_edges, tpch_edges
from linkgraph.sources.pages import generate_pages_local, pages_dataframe

__all__ = ["build_edges", "tpch_edges", "generate_pages_local", "pages_dataframe"]
