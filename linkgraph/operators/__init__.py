from linkgraph.operators.centrality import (
    betweenness_centrality,
    closeness_centrality,
    distance_summary,
    eccentricity,
    harmonic_centrality,
    multi_source_bfs,
    multi_source_shortest_paths,
)
from linkgraph.operators.dag import dag_longest_path, topological_generations
from linkgraph.operators.linkpred import (
    attribute_assortativity,
    average_neighbor_degree,
    cocitation_counts,
    degree_connectivity,
    graph_summary,
    link_prediction_scores,
    powerlaw_alpha,
    reciprocity,
    rich_club_coefficients,
)
from linkgraph.operators.bowtie import bowtie_decomposition, reachable_set
from linkgraph.operators.spectral import (
    eigenvector_centrality,
    hits,
    katz_centrality,
    salsa,
)
from linkgraph.operators.truss import k_truss, truss_numbers
from linkgraph.operators.components import (
    connected_components_alternating,
    strongly_connected_components,
    weakly_connected_components,
)
from linkgraph.operators.kcore import core_numbers, k_core
from linkgraph.operators.layout import (
    circular_layout,
    kamada_kawai_layout,
    random_layout,
    rescale_layout,
    shell_layout,
    spiral_layout,
    spring_layout_sampled,
)
from linkgraph.operators.lpa import community_stats, label_propagation, modularity
from linkgraph.operators.mst import minimum_spanning_forest
from linkgraph.operators.pagerank import (
    blockrank,
    pagerank,
    personalized_pagerank_batch,
    trustrank,
)
from linkgraph.operators.traversal import (
    bfs_levels,
    dfs_preorder,
    dijkstra_exact,
    reachable_from,
    reconstruct_path,
    shortest_paths,
)
from linkgraph.operators.features import (
    aggregate_neighbor_embeddings,
    aggregate_neighbor_features,
)
from linkgraph.operators.events import funnel, retention_cohorts
from linkgraph.operators.similarity import (
    ann_cosine_topk,
    cosine_topk,
    embedding_near_duplicates,
    ivf_cosine_topk,
    topk_recall,
)
from linkgraph.operators.simrank import simrank_scores
from linkgraph.operators.terms import (
    build_inverted_index,
    entropy_signals,
    group_percentiles,
    lm_perplexity,
    tfidf_top_terms,
)
from linkgraph.operators.crawl import (
    edge_delta,
    opic,
    politeness_schedule,
    resolve_aliases,
)
from linkgraph.operators.sampling import (
    hash_split,
    negative_edges,
    stratified_sample,
    weighted_sample,
)
from linkgraph.operators.packing import (
    chunk_documents,
    mixture_weights,
    pack_sequences,
)
from linkgraph.operators.cliques import (
    four_clique_counts,
    four_clique_list,
    total_four_cliques,
)
from linkgraph.operators.mirrors import mirror_pairs, outlink_minhash, outlink_sets
from linkgraph.operators.triangles import clustering_coefficients, triangle_counts
from linkgraph.operators.walks import node2vec_walks, random_walks
from linkgraph.operators.embeddings import (
    deepwalk_embeddings,
    edge_skipgram_pairs,
    skipgram_examples,
    skipgram_train,
    vocab_index,
    walk_skipgram_pairs,
)
from linkgraph.operators.partition import balanced_partition, edge_locality
from linkgraph.operators.metrics import average_precision, confusion_metrics, ranking_auc
from linkgraph.operators.patterns import PatternError, find_motifs
from linkgraph.operators.messages import aggregate_messages, pregel, triplets
from linkgraph.operators.greedy import (
    greedy_coloring,
    maximal_independent_set,
    maximal_matching,
)
from linkgraph.operators.densest import densest_subgraph
from linkgraph.operators.wl import wl_graph_fingerprint, wl_signatures
from linkgraph.operators.anf import (
    effective_diameter,
    hyperball_centralities,
    neighborhood_function,
)
from linkgraph.operators.motifs import butterfly_count, dyad_census, triad_motifs
from linkgraph.operators.temporal import earliest_arrival
from linkgraph.operators.localcluster import local_community
from linkgraph.operators.louvain import louvain, louvain_local_moves
from linkgraph.operators.landmarks import (
    estimate_distances,
    landmark_index,
    select_landmarks,
)
from linkgraph.operators.leiden import leiden, refine_connected
from linkgraph.operators.robots import parse_robots, robots_allowed
from linkgraph.operators.tokenizer import (
    bpe_encode,
    bpe_merges,
    pair_stats,
    word_counts,
)
from linkgraph.operators.multimodal import (
    audio_decode_stats,
    decode_audio_real,
    decode_bmp,
    decode_image_real,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    extract_features,
    frame_sample_plan,
    image_decode_stats,
    resize_images,
)

__all__ = [
    "estimate_distances",
    "landmark_index",
    "select_landmarks",
    "leiden",
    "refine_connected",
    "parse_robots",
    "robots_allowed",
    "bpe_encode",
    "bpe_merges",
    "audio_decode_stats",
    "decode_audio_real",
    "decode_bmp",
    "decode_image_real",
    "decode_ppm",
    "decode_wav",
    "encode_bmp",
    "encode_ppm",
    "encode_wav",
    "extract_features",
    "frame_sample_plan",
    "image_decode_stats",
    "resize_images",
    "pair_stats",
    "word_counts",
    "blockrank",
    "pagerank",
    "weakly_connected_components",
    "strongly_connected_components",
    "connected_components_alternating",
    "label_propagation",
    "triangle_counts",
    "clustering_coefficients",
    "four_clique_counts",
    "four_clique_list",
    "total_four_cliques",
    "mirror_pairs",
    "outlink_minhash",
    "outlink_sets",
    "bfs_levels",
    "reachable_from",
    "shortest_paths",
    "k_core",
    "core_numbers",
    "multi_source_bfs",
    "minimum_spanning_forest",
    "dfs_preorder",
    "dijkstra_exact",
    "reconstruct_path",
    "circular_layout",
    "shell_layout",
    "spiral_layout",
    "random_layout",
    "rescale_layout",
    "spring_layout_sampled",
    "kamada_kawai_layout",
    "closeness_centrality",
    "betweenness_centrality",
    "eccentricity",
    "distance_summary",
    "modularity",
    "random_walks",
    "node2vec_walks",
    "harmonic_centrality",
    "multi_source_shortest_paths",
    "hits",
    "eigenvector_centrality",
    "link_prediction_scores",
    "graph_summary",
    "k_truss",
    "truss_numbers",
    "reciprocity",
    "trustrank",
    "bowtie_decomposition",
    "reachable_set",
    "katz_centrality",
    "average_neighbor_degree",
    "chunk_documents",
    "pack_sequences",
    "mixture_weights",
    "topological_generations",
    "cocitation_counts",
    "salsa",
    "negative_edges",
    "stratified_sample",
    "hash_split",
    "aggregate_neighbor_features",
    "aggregate_neighbor_embeddings",
    "lm_perplexity",
    "simrank_scores",
    "tfidf_top_terms",
    "group_percentiles",
    "entropy_signals",
    "funnel",
    "retention_cohorts",
    "attribute_assortativity",
    "powerlaw_alpha",
    "dag_longest_path",
    "cosine_topk",
    "ann_cosine_topk",
    "ivf_cosine_topk",
    "embedding_near_duplicates",
    "topk_recall",
    "rich_club_coefficients",
    "degree_connectivity",
    "personalized_pagerank_batch",
    "community_stats",
    "maximal_independent_set",
    "greedy_coloring",
    "maximal_matching",
    "densest_subgraph",
    "wl_signatures",
    "wl_graph_fingerprint",
    "hyperball_centralities",
    "neighborhood_function",
    "effective_diameter",
    "butterfly_count",
    "dyad_census",
    "triad_motifs",
    "earliest_arrival",
    "local_community",
    "louvain",
    "louvain_local_moves",
    "weighted_sample",
    "opic",
    "edge_delta",
    "resolve_aliases",
    "politeness_schedule",
    "build_inverted_index",
    "skipgram_train",
    "skipgram_examples",
    "walk_skipgram_pairs",
    "edge_skipgram_pairs",
    "deepwalk_embeddings",
    "vocab_index",
    "balanced_partition",
    "edge_locality",
    "ranking_auc",
    "confusion_metrics",
    "average_precision",
    "find_motifs",
    "PatternError",
    "aggregate_messages",
    "triplets",
    "pregel",
]
