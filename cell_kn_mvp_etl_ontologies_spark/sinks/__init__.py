from .graph import read_graph_vertices, upsert_parquet, write_graph
from .jsonl import export_jsonl
from .side_outputs import write_deprecated_terms, write_edge_labels
