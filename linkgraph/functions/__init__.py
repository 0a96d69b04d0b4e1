from linkgraph.functions.extract import (
    extract_links_udf,
    extract_text_udf,
    normalize_url_col,
    pinned_extract_links,
    pinned_extract_text,
    url_id_col,
)
from linkgraph.functions.url import (
    canonical_host_col,
    canonicalize_url_col,
    path_depth_col,
    registrable_domain_col,
)

__all__ = [
    "extract_links_udf",
    "extract_text_udf",
    "normalize_url_col",
    "pinned_extract_links",
    "pinned_extract_text",
    "url_id_col",
    "canonicalize_url_col",
    "canonical_host_col",
    "registrable_domain_col",
    "path_depth_col",
]
