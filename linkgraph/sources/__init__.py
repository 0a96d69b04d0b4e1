from linkgraph.sources.edges import anchor_text_stats, build_edges, build_host_edges, tpch_edges
from linkgraph.sources.io import load_graph, save_graph
from linkgraph.sources.pages import generate_pages_local, pages_dataframe
from linkgraph.sources.snapshots import SnapshotError, SnapshotTable
from linkgraph.sources.warc import (
    encode_warc,
    iter_warc_records,
    synth_warc_segments,
    warc_corpus_stats,
    warc_pages,
)

__all__ = [
    "anchor_text_stats",
    "build_edges",
    "build_host_edges",
    "tpch_edges",
    "generate_pages_local",
    "pages_dataframe",
    "save_graph",
    "load_graph",
    "SnapshotError",
    "SnapshotTable",
    "encode_warc",
    "iter_warc_records",
    "synth_warc_segments",
    "warc_corpus_stats",
    "warc_pages",
]
