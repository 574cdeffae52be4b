"""Skew mitigation (SURVEY.md §2.12 / 100 TB posture).

AQE's skew-join splitting handles oversized *join* partitions at runtime, but
two hot-key shapes still need explicit structure at scale:

1. **Skewed set aggregation** — collect_set/collect_list partial states for a
   hot key all merge on ONE reducer regardless of partial aggregation.
   ``salted_collect_set`` splits the key across ``n_salts`` reducers and
   merges the per-salt sets with array expressions (flatten + dedup + sort),
   which is associative and order-insensitive, so the result is identical to
   the unsalted aggregate.

2. **Skewed join against a broadcast-too-large dim** — when runtime stats
   are missing or AQE's per-partition threshold misses (one key >> all
   others), ``salted_join`` replicates the small side ``n_salts``× and
   spreads the big side's hot key uniformly.

Salt values never reach the output; they only shape the exchange, so any
salt assignment yields the same result and determinism of the salt itself is
not required for correctness (rand-based salting is still avoided — the salt
derives from xxhash64 of the row — so retried tasks repartition identically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, n_salts: int, cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic salt in [0, n_salts) from xxhash64 of ``cols``
    (default: all columns).  Identical rows get identical salts — for exact
    duplicates at extreme multiplicity, pass a high-cardinality column subset
    or pre-dedup."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(*basis), F.lit(n_salts)))


def salted_collect_set(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 32,
    out_col: str = "values",
) -> DataFrame:
    """Two-phase distinct-set aggregation: groupBy(keys + salt) builds
    bounded per-salt sets in parallel, groupBy(keys) merges them JVM-side.
    Output equals sort_array(collect_set(value_col)) per keys."""
    salted = with_salt(df, n_salts, [value_col])
    phase1 = salted.groupBy(*keys, SALT_COL).agg(
        F.collect_set(value_col).alias("_partial")
    )
    merged = F.array_sort(F.array_distinct(F.flatten(F.collect_list("_partial"))))
    return phase1.groupBy(*keys).agg(merged.alias(out_col))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small side
    once per salt, join on (keys + salt).  The hot key's rows land on
    ``n_salts`` reducers instead of one.  Replication cost is
    |small| × n_salts — use only when the small side is near but over the
    broadcast threshold and a key histogram is skewed.

    Only big-side-preserving join types are allowed: with the small side
    replicated, right/full-outer would surface each unmatched small row
    n_salts times."""
    allowed = {"inner", "cross", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated small "
            "side would duplicate its unmatched rows"
        )
    big_s = with_salt(big, n_salts)
    small_r = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return big_s.join(small_r, on=[*on, SALT_COL], how=how).drop(SALT_COL)
