from linkgraph.streaming.ingest import incremental_edge_ingest

__all__ = ["incremental_edge_ingest"]
