from .file_stream import (
    read_documents_stream,
    read_embeddings_stream,
    read_events_stream,
    read_lineitem_stream,
    read_orders_stream,
    read_part_stream,
    run_stream_apply_changes,
    run_stream_to_table,
    run_stream_to_table_with_metrics,
    run_stream_upsert,
)
