"""Round-12 extension batch (catalog/frontier9.py): property pins beyond
the DuckDB hash gate — the semantic claims each docstring makes."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
    _WEIGHTED_DF_CAP,
    dedup_minhash_weighted_capped_q,
    similarity_range_search_routed_q,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_weighted_capped_keeps_planted_dups_and_audits(spark):
    """The df-capped weighted refine still recovers every planted
    full-prefix duplicate at jw = 1e6 (distinctive shingles survive any
    cap ≥ their df), the audit row reports a non-degenerate cap (some
    hot shingles dropped, not all), and every pair row's jw stays in
    (300000, 1e6]."""
    rows = dedup_minhash_weighted_capped_q(spark, SF01).collect()
    audit = [r for r in rows if r.a == -1 and r.b == -1]
    pairs = [r for r in rows if r.a >= 0]
    assert len(audit) == 1
    n_hot, hot_ppm = audit[0].min_sum, audit[0].jw_ppm
    assert 0 < n_hot, "cap must drop SOMETHING at gate scale or it's vacuous"
    assert 0 < hot_ppm < 500_000, "cap must not drop most of the census"
    planted = {(r.a, r.a + 10000) for r in pairs if r.b == r.a + 10000}
    assert planted == {(i, i + 10000) for i in range(10)}
    for r in pairs:
        if r.b == r.a + 10000 and r.a < 10:
            assert r.jw_ppm == 1_000_000
        assert 300_000 <= r.jw_ppm <= 1_000_000


def test_weighted_cap_reduces_candidates(spark):
    """The df cap measurably shrinks the shared-shingle join's candidate
    volume on the gate corpus (the quadratic guard is live, not
    decorative): count pairs sharing >= 1 shingle with and without the
    cap."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier8 import weighted_corpus

    corpus = weighted_corpus(spark, SF01)
    sh = corpus.select(
        F.col("doc_id").alias("id"),
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 4, 0)),"
                " i -> substring(text, i, 5))"
            )
        ).alias("sh"),
    ).distinct()
    dfc = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))

    def n_pairs(census):
        x = census.select(F.col("id").alias("a"), "sh")
        y = census.select(F.col("id").alias("b"), "sh")
        return (
            x.join(y, on="sh")
            .filter(F.col("b") > F.col("a"))
            .select("a", "b")
            .distinct()
            .count()
        )

    uncapped = n_pairs(sh)
    capped = n_pairs(
        sh.join(dfc.filter(F.col("df") <= _WEIGHTED_DF_CAP).select("sh"), on="sh")
    )
    assert capped < uncapped, (capped, uncapped)


def test_range_routed_identity_at_full_probe(spark):
    """At nprobe = n_cells the routed radius search is bit-identical to
    the brute gate tier — the routed-identity proof backing the shared
    oracle constant."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier8 import (
        similarity_range_search_q,
    )

    brute = {tuple(r) for r in similarity_range_search_q(spark, SF).collect()}
    routed = {tuple(r) for r in similarity_range_search_routed_q(spark, SF).collect()}
    assert routed == brute and len(brute) > 0


def test_range_routed_pruned_is_subset_with_structural_recall(spark):
    """At nprobe = 1 the routed output is a SUBSET of brute (routing can
    only prune, never invent) and every planted exact copy is still
    recovered: an identical vector quantizes identically, hence assigns
    to its source's cell."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier8 import (
        range_search_em,
        similarity_range_search_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
        range_search_routed,
    )

    em = range_search_em(spark, SF)
    q = em.filter(F.col("vec_id") < 8)
    pruned = {
        (r.q_id, r.t_id)
        for r in range_search_routed(em, q, n_cells=4, nprobe=1).collect()
    }
    brute = {
        (r.q_id, r.t_id) for r in similarity_range_search_q(spark, SF).collect()
    }
    assert pruned <= brute
    # planted copies: vec_id < 5 duplicated at vec_id + 10000, cos = 1
    for i in range(5):
        assert (i, i + 10000) in pruned, i
