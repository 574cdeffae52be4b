"""DataFrame -> DataFrame relational operators (SURVEY.md §2.2-2.7, §2.12)."""

from .aggregates import (
    TRIPLE_KEY,
    agg_collect_edge_labels,
    agg_count_metrics,
    agg_dedup_edges,
    agg_distinct_triples,
    agg_distinct_vertices,
    agg_first_fallback_rootns,
    agg_pivot_vertex_attrs,
    agg_pivot_wide,
)
from .filters import (
    deprecated_obsolete_predicate,
    filter_deprecated_obsolete,
    filter_isin_valid_vertices,
    filter_object_is_literal,
    filter_predicate_ns_whitelist,
    filter_root_ns_class,
    filter_skip_file,
    filter_valid_triple,
    project_triple_nodes,
    valid_triple_predicate,
    with_vtuple,
)
from .joins import (
    join_anti_new_only,
    join_flatten_restriction,
    join_ro_label_lookup,
    join_semi_edge_endpoints,
    join_upsert,
    join_upsert_scd2,
)
from .setops import setop_except, setop_intersect, setop_union_files, setop_union_label_sets
from .training import (
    assign_shards,
    contamination_ngrams,
    hash_bucket,
    hash_fraction,
    interleave_weighted,
    pack_sequences,
    pack_sequences_greedy,
    quantize_embeddings_int8,
    sample_stratified,
    split_train_val_test,
)
from .windows import (
    sort_by_key,
    window_last_wins,
    window_rank_topk,
    window_running_sum,
    window_sessionize,
)
