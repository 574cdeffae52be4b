"""Incremental-pipeline operators: snapshot differencing (CDC extraction).

The reference rebuilds its graph from scratch every run (drop + recreate at
``OntologyGraphBuilder.java:511-517``) and upserts per document.  At 100 TB
the viable pattern is incremental: diff today's snapshot against yesterday's
and feed ONLY the changed rows downstream.  ``snapshot_diff`` is that
primitive — the batch analog of a CDC feed, and the natural producer for the
``join_upsert`` / ``join_upsert_scd2`` consumers already in this engine.

Scale design: both snapshots are first projected down to (keys, fingerprint)
where the fingerprint is ``xxhash64(to_json(struct(compare_cols)))`` — the
full-outer join then shuffles keys + 8 bytes per row instead of the whole row
width.  ``to_json`` keeps NULLs positional: Spark's multi-arg hash functions
skip NULL inputs, so ``('a', NULL)`` and ``(NULL, 'a')`` would collide and a
real change could classify as ``unchanged``; the JSON encoding makes every
field explicit.  Classification by fingerprint equality is exact up to
xxhash64 collision (~2^-64 per changed row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CHANGE_COL = "change_type"


def _fingerprint(df: DataFrame, keys: list[str], compare_cols: list[str]) -> DataFrame:
    fp = F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in compare_cols])))
    return df.select(*keys, fp.alias("_fp"))


def snapshot_diff(
    current: DataFrame,
    previous: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify rows between two snapshots of the same keyed table.

    Output: (keys..., change_type) with change_type in
    {'insert', 'update', 'delete'} (plus 'unchanged' when requested):

    - ``insert``: key present only in ``current``
    - ``delete``: key present only in ``previous``
    - ``update``: key in both, ``compare_cols`` fingerprints differ
    - ``unchanged``: key in both, fingerprints equal

    ``compare_cols`` defaults to every non-key column present in BOTH
    frames.  One full-outer sort-merge/hash join on ``keys`` — a single
    keyed shuffle of (keys, 8-byte fingerprint) per side regardless of row
    width; AQE handles key skew.  Consumers that need the changed payloads
    join this frame (semi-join on keys per change_type) back to the
    snapshots, keeping the wide-row scan out of the diff itself.
    """
    if not keys:
        raise ValueError("snapshot_diff requires at least one key column")
    if compare_cols is None:
        compare_cols = [
            c for c in current.columns if c not in keys and c in set(previous.columns)
        ]
    if not compare_cols:
        raise ValueError("no compare columns: snapshots share only key columns")

    cur = _fingerprint(current, keys, compare_cols)
    prev = _fingerprint(previous, keys, compare_cols)
    joined = cur.alias("c").join(prev.alias("p"), on=keys, how="full_outer")

    change = (
        F.when(F.col("p._fp").isNull(), F.lit("insert"))
        .when(F.col("c._fp").isNull(), F.lit("delete"))
        .when(F.col("c._fp") != F.col("p._fp"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*keys, change.alias(CHANGE_COL))
    if not include_unchanged:
        out = out.filter(F.col(CHANGE_COL) != "unchanged")
    return out


def apply_changes(
    state: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply a CDC changelog batch to keyed state, out-of-order tolerant.

    Both frames share one schema: (keys..., payload..., op, seq) with op in
    {'I','U','D'} and seq a monotonically increasing change sequence.  The
    new state keeps, per key, the row with the HIGHEST seq across old state
    and incoming changes — so batches may arrive in any order, re-bundled
    into any micro-batch partitioning, and the fixed point is identical.
    Deletes are retained as tombstones (op='D' rows): dropping them instead
    would let a late lower-seq update resurrect a deleted key.  Compact
    tombstones out periodically once upstream guarantees no older changes
    remain in flight.  Ties (same key, same seq — e.g. one upstream commit
    emitting U and D for a key) resolve op-ascending, so 'D' wins: the
    conservative choice for dedup-style consumers.

    One keyed shuffle (window over keys); state never joins wide."""
    allrows = state.unionByName(changes)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc(), F.col(op_col).asc())
    return (
        allrows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def live_view(state: DataFrame, op_col: str = "op", seq_col: str = "seq") -> DataFrame:
    """The queryable face of CDC state: tombstones filtered, bookkeeping
    columns dropped."""
    return state.filter(F.col(op_col) != "D").drop(op_col, seq_col)


def cdc_delta_rows(
    changes: DataFrame,
    cols: list[str],
    op_col: str = "op",
    before_prefix: str = "before_",
    after_prefix: str = "after_",
) -> DataFrame:
    """Signed delta rows from a before/after-image changelog (Debezium
    shape): deletes contribute their before-image with sign -1, inserts
    their after-image with sign +1, updates both.  Because each image keeps
    its OWN column values, an update that moves a row between groups
    retracts from the old group and adds to the new one with no special
    casing.  Output: (cols..., sign INT)."""
    ops = F.col(op_col)
    minus = changes.filter(ops.isin("U", "D")).select(
        *[F.col(before_prefix + c).alias(c) for c in cols], F.lit(-1).alias("sign")
    )
    plus = changes.filter(ops.isin("I", "U")).select(
        *[F.col(after_prefix + c).alias(c) for c in cols], F.lit(1).alias("sign")
    )
    return minus.unionByName(plus)


def maintain_group_agg(
    agg_state: DataFrame,
    deltas: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_col: str = "n",
    total_col: str = "total",
) -> DataFrame:
    """Incremental maintenance of a grouped (count, sum) aggregate — the
    materialized-view-maintenance core: merge CHANGE-scale deltas into the
    existing aggregate instead of rescanning the fact table.

    ``agg_state`` holds (group_cols..., n, total); ``deltas`` comes from
    ``cdc_delta_rows``.  Deltas aggregate at group cardinality (one small
    shuffle over the changes only), then one outer join folds them in;
    groups whose count reaches zero disappear, new groups appear.  Sums
    must be DECIMAL (exact, associative, commutative — retraction needs
    x + d - d == x, which floats do not guarantee).  count/sum/avg
    maintain this way; min/max do not retract (a deleted extremum forces a
    per-group rescan) — keep them out of incrementally-maintained views or
    pair them with a monotonic merge strategy."""
    d = (
        deltas.groupBy(*group_cols)
        .agg(
            F.sum("sign").alias("_dn"),
            F.sum(F.col(value_col) * F.col("sign")).alias("_dt"),
        )
    )
    merged = agg_state.join(d, on=group_cols, how="full_outer")
    zero = F.lit(0).cast(agg_state.schema[total_col].dataType)
    return (
        merged.select(
            *group_cols,
            (F.coalesce(F.col(n_col), F.lit(0)) + F.coalesce(F.col("_dn"), F.lit(0))).alias(n_col),
            (F.coalesce(F.col(total_col), zero) + F.coalesce(F.col("_dt"), zero)).alias(total_col),
        )
        .filter(F.col(n_col) > 0)
    )
