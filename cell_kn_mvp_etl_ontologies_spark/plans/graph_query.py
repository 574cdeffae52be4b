"""Graph reachability queries over the property-graph store.

The reference serves these from ArangoDB after loading (AQL traversals are
downstream of this repo's scope); the engine answers bounded reachability
directly on the edges DataFrame with iterative distributed self-joins —
appropriate for ontology DAGs whose depth (subclass chains, partonomy) is
tens, not thousands.

Scale notes: each hop is ONE shuffle join keyed on the frontier's endpoint;
the union of per-hop frontiers is min-folded at the end in a single
aggregation.  For depths beyond ~10, checkpoint the frontier every few hops
(lineage/plan depth grows linearly) or switch to doubling (path-join-path,
O(log d) iterations at higher per-step cost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame, max_hops: int, src: str = "a", dst: str = "b"
) -> DataFrame:
    """All (src, dst, hops) pairs reachable in <= max_hops edges, with the
    minimal hop count.  ``edges`` needs columns (src, dst)."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    base = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"), F.lit(1).alias("hops"))
    step = edges.select(F.col(src).alias("b"), F.col(dst).alias("c"))
    frontier = base
    all_paths = base
    for _ in range(max_hops - 1):
        frontier = frontier.join(step, on="b").select(
            "a", F.col("c").alias("b"), (F.col("hops") + 1).alias("hops")
        )
        all_paths = all_paths.unionByName(frontier)
    return all_paths.groupBy("a", "b").agg(F.min("hops").alias("hops"))
