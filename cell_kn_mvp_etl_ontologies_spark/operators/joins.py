"""Join operators (SURVEY.md §2.3).

Design notes for scale:
  - ``join_ro_label_lookup`` broadcasts the term dictionary (a few thousand
    rows even for the full RO) — no shuffle on the fact side.
  - ``join_flatten_restriction`` is the one genuinely intricate operator: a
    self-join keyed on (src_file, bnode_id).  Bnode labels are file-local, so
    src_file MUST be part of the key (SURVEY.md §4 custom-work item 2).  The
    bnode side is pre-aggregated (one row per bnode) before the join, which
    both shrinks the build side and makes the join 1:1; AQE picks broadcast
    vs sort-merge from runtime stats.
  - semi/anti/upsert joins are expressed with Spark's dedicated join types so
    Catalyst can plan them (BHJ/SMJ + AQE skew handling) instead of hand-rolled
    key-set lookups as in the reference.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..constants import KIND_BNODE, OWL_ON_PROPERTY, OWL_SOME_VALUES_FROM, RDFS_SUBCLASS_OF


def join_flatten_restriction(triples: DataFrame) -> DataFrame:
    """Flatten ``owl:Restriction`` bnodes into named triples.

    For statements ``(:C rdfs:subClassOf _:b)``: look up the statements about
    ``_:b``; the object of its ``owl:onProperty`` statement becomes the
    predicate and of its ``owl:someValuesFrom`` statement the object, emitting
    ``(:C, prop, filler)``.  Bnodes missing either half are dropped.
    Ref: OntologyTripleParser.java:90-115.

    Returns rows in the triples schema with object_kind='iri'.
    """
    # ONE scan, ONE shuffle, NO self-join: both legs of the old formulation
    # (parent statements pointing AT a bnode, statements ABOUT a bnode) key on
    # the same (src_file, bnode_id), so a single filtered pass can route each
    # row to its role and a single groupBy assembles the restriction — the
    # parents as a collected list (one output row per parent statement, like
    # the old 1:N join), onProperty/someValuesFrom as conditional max()
    # (safe: owl:Restriction carries at most one of each — and max makes
    # duplicates deterministic).  The old shape scanned the triple stream
    # twice more and shuffled both sides of a join; at fact scale those are
    # two full extra passes over unpersisted input.
    is_parent = (F.col("predicate") == RDFS_SUBCLASS_OF) & (F.col("object_kind") == KIND_BNODE)
    legs = triples.filter(
        is_parent | F.col("predicate").isin(OWL_ON_PROPERTY, OWL_SOME_VALUES_FROM)
    )
    keyed = legs.select(
        "src_file",
        F.when(is_parent, F.col("object_iri")).otherwise(F.col("subject")).alias("bnode_id"),
        F.when(is_parent, F.col("subject")).alias("parent"),
        F.when(F.col("predicate") == OWL_ON_PROPERTY, F.col("object_iri")).alias("onp"),
        F.when(F.col("predicate") == OWL_SOME_VALUES_FROM, F.col("object_iri")).alias("svf"),
    )
    assembled = (
        keyed.groupBy("src_file", "bnode_id")
        .agg(
            F.collect_list("parent").alias("parents"),  # collect_list skips nulls
            F.max("onp").alias("on_property"),
            F.max("svf").alias("some_values_from"),
        )
        .filter(F.col("on_property").isNotNull() & F.col("some_values_from").isNotNull())
    )
    return assembled.select(
        "src_file",
        F.explode("parents").alias("subject"),  # no parents -> bnode dropped, like the inner join
        F.col("on_property").alias("predicate"),
        F.lit("iri").alias("object_kind"),
        F.col("some_values_from").alias("object_iri"),
        F.lit(None).cast("string").alias("object_lexical"),
        F.lit(None).cast("string").alias("object_lang"),
        F.lit(None).cast("string").alias("object_datatype"),
    )


def join_ro_label_lookup(
    df: DataFrame, ro_terms: DataFrame, token_col: str = "pred_token", out_col: str = "label"
) -> DataFrame:
    """Map a predicate's trailing path token through the ro.owl dictionary to
    its human label (``RO_0002202`` -> ``develops from``), keeping the token
    when no entry exists.  Broadcast left join — the dictionary is small.
    Ref: OntologyGraphBuilder.java:117-123.
    """
    dim = F.broadcast(ro_terms.select(F.col("term"), F.col("label").alias("_ro_label")).dropDuplicates(["term"]))
    joined = df.join(dim, on=df[token_col] == dim["term"], how="left")
    return joined.withColumn(out_col, F.coalesce(F.col("_ro_label"), F.col(token_col))).drop("term", "_ro_label")


def join_semi_edge_endpoints(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Keep edges whose BOTH endpoints exist in the vertex set (referential
    integrity) — two left-semi joins.  Ref: OntologyGraphBuilder.java:463-466."""
    v = vertices.select(F.col("collection"), F.col("key"))
    from_ok = edges.join(
        v,
        (edges["from_collection"] == v["collection"]) & (edges["from_key"] == v["key"]),
        "left_semi",
    )
    return from_ok.join(
        v,
        (from_ok["to_collection"] == v["collection"]) & (from_ok["to_key"] == v["key"]),
        "left_semi",
    )


def join_anti_new_only(incoming: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """Documents whose key does not yet exist in the sink (the insert path of
    the reference's per-document exists check).  Ref: OntologyGraphBuilder.java:254,463."""
    return incoming.join(existing.select(*keys), on=keys, how="left_anti")


def join_upsert(incoming: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE semantics: incoming wins per key, existing rows without a match
    are kept — full-outer join + per-column coalesce.  Replaces the reference's
    one-HTTP-round-trip-per-document upsert (OntologyGraphBuilder.java:254-273,
    463-479) with a single distributed join.
    """
    cols = [c for c in incoming.columns if c not in keys]
    assert set(incoming.columns) == set(existing.columns), "upsert requires identical schemas"
    inc = reduce(lambda d, c: d.withColumnRenamed(c, "_inc_" + c), cols, incoming)
    inc = inc.withColumn("_inc_present", F.lit(True))
    joined = inc.join(existing, on=keys, how="full_outer")
    picked = [
        F.when(F.col("_inc_present").isNotNull(), F.col("_inc_" + c)).otherwise(F.col(c)).alias(c)
        for c in cols
    ]
    return joined.select(*keys, *picked)


def join_upsert_scd2(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    eff_col: str,
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge: instead of overwriting
    (``join_upsert``'s MERGE), every version is kept with a validity
    interval.  ``base`` and ``updates`` are full row snapshots sharing a
    schema that includes ``eff_col`` (the version's effective-from marker,
    any totally ordered type); the output closes each version with
    ``end_col`` = the key's next effective-from (NULL for the open/current
    version) and flags ``current_col``.

    Union + one lead() window — a single shuffle on the dimension keys, no
    join at all, so it scales with the dimension regardless of how many
    update batches are unioned in.  History tables built this way join back
    to facts with the §2.12 bucketized range join (fact ts between
    valid_from and valid_to).
    """
    assert set(base.columns) == set(updates.columns), "scd2 requires identical schemas"
    versions = base.unionByName(updates)
    w = Window.partitionBy(*keys).orderBy(eff_col)
    nxt = F.lead(F.col(eff_col)).over(w)
    return versions.withColumn(end_col, nxt).withColumn(current_col, F.col(end_col).isNull())


def join_interval_overlap(
    left: DataFrame,
    right: DataFrame,
    bucket_size: int,
    l_id: str = "l_id",
    l_start: str = "l_start",
    l_end: str = "l_end",
    r_id: str = "r_id",
    r_start: str = "r_start",
    r_end: str = "r_end",
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair whose closed
    intervals [start, end] intersect — the interval analogue of the
    bucketized point-in-range ``join_range_bucketed`` and the shape behind
    genomic overlap joins and maintenance-window / outage attribution.

    Scale shape: each interval explodes into the fixed-width time chunks
    it touches (``sequence`` over floor(start/B)..floor(end/B) — a codegen
    map, no shuffle), the join is a plain equi-join on the chunk id, and
    the overlap predicate refines inside the join.  The classic duplicate
    problem (a pair sharing many chunks matches in each) is solved WITHOUT
    a distinct shuffle: a pair is emitted only in the chunk containing the
    overlap's START (floor(max(l_start, r_start)/B)), which both sides by
    construction cover — one emission per pair, zero post-join dedup.
    Cost is O(span/B) replicas per interval: pick B near the median span
    so replication stays O(1); whale intervals (span >> B) should be
    clamped or handled via a small broadcast side-table upstream.

    Inputs carry (id, start, end) as integer seconds/units; output is one
    row per overlapping pair with the exact overlap length
    ``overlap = min(ends) - max(starts)`` (>= 0; touching endpoints count,
    half-open semantics = filter overlap > 0 downstream).
    """
    B = int(bucket_size)
    ls, le = F.col(l_start).cast("long"), F.col(l_end).cast("long")
    rs, re_ = F.col(r_start).cast("long"), F.col(r_end).cast("long")
    lx = left.select(
        F.col(l_id).alias("_lid"), ls.alias("_ls"), le.alias("_le"),
        F.explode(F.sequence(F.floor(ls / B), F.floor(le / B))).alias("_chunk"),
    )
    rx = right.select(
        F.col(r_id).alias("_rid"), rs.alias("_rs"), re_.alias("_re"),
        F.explode(F.sequence(F.floor(rs / B), F.floor(re_ / B))).alias("_chunk"),
    )
    j = lx.join(rx, "_chunk")
    ov_start = F.greatest(F.col("_ls"), F.col("_rs"))
    ov_end = F.least(F.col("_le"), F.col("_re"))
    return (
        j.filter(
            (ov_end >= ov_start) & (F.col("_chunk") == F.floor(ov_start / B))
        )
        .select(
            F.col("_lid").alias(l_id),
            F.col("_rid").alias(r_id),
            F.col("_ls").alias(l_start),
            F.col("_le").alias(l_end),
            F.col("_rs").alias(r_start),
            F.col("_re").alias(r_end),
            (ov_end - ov_start).cast("long").alias("overlap"),
        )
    )
