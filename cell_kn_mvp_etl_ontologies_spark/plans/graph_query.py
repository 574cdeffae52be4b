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


def connected_components(
    pairs: DataFrame, a: str = "a", b: str = "b", max_iter: int = 25
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = minimum
    node id reachable through the pair graph (deterministic canonical label).

    The duplicate-clustering finisher: exact/MinHash/SimHash dedup emit
    PAIRS, but keep-one-per-group needs the transitive closure of those
    pairs (A~B, B~C ⇒ {A,B,C} one cluster, keep min).

    Min-label propagation: each round, every node takes the min of its own
    and its neighbors' labels — one join + one min-aggregate per round, both
    keyed shuffles on uniformly distributed ids.  Rounds needed = component
    diameter; duplicate clusters from LSH band pairs are near-cliques
    (diameter ≤ 2-3), so this converges in a handful of rounds — the
    convergence check (labels unchanged) is a count aggregate, no collect.
    ``localCheckpoint`` truncates the growing lineage each round (swap for
    reliable ``checkpoint()`` on a cluster).  For adversarial long-chain
    graphs switch to alternating large-star/small-star (O(log d) rounds).
    """
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    edges = pairs.select(F.col(a).alias("x"), F.col(b).alias("y"))
    sym = edges.unionByName(edges.select(F.col("y").alias("x"), F.col("x").alias("y")))
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("x").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    for _ in range(max_iter):
        nbr = sym.join(
            labels.withColumnRenamed("node", "y"), on="y"
        ).select(F.col("x").alias("node"), "label")
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, on="node")
            .filter(F.col("new_label") != F.col("label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Partially-propagated labels would silently split one true component
        # into several — downstream keep-one-per-cluster dedup would then keep
        # extra copies.  Fail loudly instead of returning wrong clusters.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); component diameter exceeds "
            f"max_iter — raise max_iter or switch to large-star/small-star."
        )
    return labels.select("node", F.col("label").alias("component"))
