from .graph_build import (
    GraphBuildResult,
    build_edges,
    build_graph,
    build_vertices,
    clean_triples,
    label_predicates,
    parse_uri_dim,
)
