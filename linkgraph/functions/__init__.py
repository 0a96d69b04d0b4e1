from linkgraph.functions.extract import (
    extract_links_udf,
    extract_text_udf,
    normalize_url_col,
    pinned_extract_links,
    pinned_extract_text,
    url_id_col,
)

__all__ = [
    "extract_links_udf",
    "extract_text_udf",
    "normalize_url_col",
    "pinned_extract_links",
    "pinned_extract_text",
    "url_id_col",
]
