"""Pure Column expression library (SURVEY.md §2.8) — no UDFs anywhere."""

from .normalize import fn_normalize_edge_label, fn_normalize_edge_source
from .uri import (
    fn_doc_collection_name,
    fn_doc_key,
    fn_make_edge_key,
    fn_make_vertex_id,
    fn_pred_last_path,
    fn_predicate_label,
    fn_term_split,
    fn_uri_basename,
    fn_uri_fragment,
    fn_uri_path,
    fn_uri_rewrite_special,
    fn_uri_strip_fragment,
    fn_vtuple,
    vtuple_columns,
)
from .version import (
    DATE_PATTERN,
    fn_extract_version_date,
    fn_version_from_info_or_iri,
    fn_version_newer,
)

__all__ = [
    "DATE_PATTERN",
    "fn_doc_collection_name",
    "fn_doc_key",
    "fn_extract_version_date",
    "fn_make_edge_key",
    "fn_make_vertex_id",
    "fn_normalize_edge_label",
    "fn_normalize_edge_source",
    "fn_pred_last_path",
    "fn_predicate_label",
    "fn_term_split",
    "fn_uri_basename",
    "fn_uri_fragment",
    "fn_uri_path",
    "fn_uri_rewrite_special",
    "fn_uri_strip_fragment",
    "fn_version_from_info_or_iri",
    "fn_version_newer",
    "fn_vtuple",
    "vtuple_columns",
]
