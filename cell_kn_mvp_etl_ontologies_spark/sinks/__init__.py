from .graph import read_graph_vertices, upsert_parquet, write_graph
from .jsonl import export_jsonl
from .sharded import verify_range_sharded, write_range_sharded
from .side_outputs import write_deprecated_terms, write_edge_labels
from .zorder import write_zorder_clustered, z_value, z_value_sql, zorder_cell_stats
