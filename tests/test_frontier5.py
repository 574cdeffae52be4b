"""Tests for catalog/frontier5.py — the round-8 rank-correlation /
paired-detector / uplift evaluation batch."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark import catalog

catalog.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_spearman_matches_scipy_free_reference(spark):
    """ρ from the catalog query must equal the formula computed directly
    from collected ranks (tie-broken identically), and sit in [−1e6, 1e6]."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    [r] = QUERIES["eval_spearman_rank"](spark, SF_DIR).collect()
    assert r.n >= 3
    # recompute driver-side from the same per-customer metrics
    per = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.count(F.lit(1)).alias("no"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("ce"),
        )
        .collect()
    )
    by_orders = sorted(per, key=lambda x: (x.no, x.cust))
    by_cents = sorted(per, key=lambda x: (x.ce, x.cust))
    r1 = {x.cust: i + 1 for i, x in enumerate(by_orders)}
    r2 = {x.cust: i + 1 for i, x in enumerate(by_cents)}
    sum_d2 = sum((r1[c] - r2[c]) ** 2 for c in r1)
    n = len(per)
    assert (r.n, r.sum_d2) == (n, sum_d2)
    assert r.rho_ppm == 1_000_000 - 6_000_000 * sum_d2 // (n * (n * n - 1))
    assert -1_000_000 <= r.rho_ppm <= 1_000_000


def test_spearman_plan_has_no_single_partition_sort(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    plan = (
        QUERIES["eval_spearman_rank"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The point of with_global_rank: the rank passes never funnel the
    # customer frame through one partition.  The only SinglePartition
    # exchange allowed in this plan is the final 1-row rho aggregate —
    # so assert no SinglePartition exchange FEEDS a Window (ADVICE r8:
    # the previous form of this test was tautological).
    for i, line in enumerate(plan.splitlines()):
        if "Window [row_number()" in line or "Window [rank(" in line:
            upstream = "\n".join(plan.splitlines()[i : i + 8])
            assert "Exchange SinglePartition" not in upstream, plan
    # and the rank shuffles ARE the value-derived bucket exchanges
    assert "hashpartitioning(__gr_bkt" in plan, plan


def test_kendall_census_identities(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    [r] = QUERIES["eval_kendall_tau"](spark, SF_DIR).collect()
    assert r.n_pairs == r.n_conc + r.n_disc + r.n_tied
    assert -1_000_000 <= r.tau_a_ppm <= 1_000_000
    # frequency and spend are strongly positively associated in TPC-H-ish
    # data (more orders -> more total spend): concordant must dominate
    assert r.n_conc > r.n_disc


def test_kendall_sign_decomposition_negative_branch(spark):
    """A hand-built anti-correlated slice must produce a NEGATIVE tau via
    the same sign-decomposed expression both engines evaluate."""
    import duckdb

    from cell_kn_mvp_etl_ontologies_spark.catalog import ORACLES

    con = duckdb.connect()
    # cust k places k orders whose TOTAL spend strictly decreases with k:
    # x strictly increasing, y strictly decreasing -> every pair
    # discordant -> tau_a = -1e6 exactly (the negative branch of the
    # sign-decomposed CASE)
    rows = []
    totals = {1: 100.0, 2: 10.0, 3: 5.0, 4: 1.0}
    for cust, price in totals.items():
        for j in range(cust):
            rows.append(f"({cust}, {cust * 10 + j}, {price})")
    con.execute(
        "CREATE TABLE orders AS SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") t(o_custkey, k, o_totalprice)"
    )
    [row] = con.sql(ORACLES["eval_kendall_tau"]).fetchall()
    n_pairs, n_conc, n_disc, n_tied, tau = row
    assert n_pairs == 6 and n_disc == 6 and n_conc == 0
    assert tau == -1_000_000


def test_mcnemar_cells_sum_and_chi2(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    [r] = QUERIES["eval_mcnemar"](spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert r.n00 + r.n01 + r.n10 + r.n11 == n_docs
    if r.n01 + r.n10 > 0:
        assert r.chi2_milli == 1000 * (r.n10 - r.n01) ** 2 // (r.n01 + r.n10)
        assert r.chi2_cc_milli <= r.chi2_milli  # correction never increases


def test_gains_deciles_monotone_and_bounded(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = sorted(
        QUERIES["eval_gains_deciles"](spark, SF_DIR).collect(),
        key=lambda x: x.decile,
    )
    assert [x.decile for x in rows] == list(range(1, 11))
    # cumulative columns strictly monotone in n, non-decreasing in pos
    for a, b in zip(rows, rows[1:]):
        assert b.cum_n > a.cum_n and b.cum_pos >= a.cum_pos
    last = rows[-1]
    assert last.gains_ppm == 1_000_000  # all positives captured by decile 10
    assert last.lift_ppm == 1_000_000  # final lift is exactly 1e6 by identity
    # every row satisfies the exact integer identities
    for x in rows:
        assert x.gains_ppm == 1_000_000 * x.cum_pos // last.cum_pos
        assert x.lift_ppm == 1_000_000 * x.cum_pos * last.cum_n // (
            x.cum_n * last.cum_pos
        )


def test_uplift_qini_identities_and_aa_null(spark):
    """The md5-coin treatment is independent of the outcome, so the table
    is an A/A experiment: exact identities must hold and the final-decile
    uplift must be near zero (|uplift| < 10% absolute at test SF)."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = sorted(
        QUERIES["eval_uplift_qini"](spark, SF_DIR).collect(), key=lambda x: x.decile
    )
    assert [x.decile for x in rows] == list(range(1, 11))
    cum_t = cum_c = pos_t = pos_c = 0
    for x in rows:
        cum_t += x.n_t
        cum_c += x.n_c
        pos_t += x.pos_t
        pos_c += x.pos_c
        assert (x.cum_n_t, x.cum_n_c, x.cum_pos_t, x.cum_pos_c) == (
            cum_t, cum_c, pos_t, pos_c,
        )
        # sign-decomposed integer identities, recomputed in python
        num = x.cum_pos_t * x.cum_n_c - x.cum_pos_c * x.cum_n_t
        if x.cum_n_c == 0:
            assert x.qini_milli == 0
        elif num >= 0:
            assert x.qini_milli == 1000 * num // x.cum_n_c
        else:
            assert x.qini_milli == -(1000 * (-num) // x.cum_n_c)
        if x.cum_n_c and x.cum_n_t:
            den = x.cum_n_t * x.cum_n_c
            expect = 1000000 * num // den if num >= 0 else -(1000000 * (-num) // den)
            assert x.uplift_ppm == expect
    last = rows[-1]
    assert last.cum_n_t + last.cum_n_c == sum(x.n_t + x.n_c for x in rows)
    # A/A null: full-population uplift within 10% absolute
    assert abs(last.uplift_ppm) < 100_000, last.uplift_ppm


def test_uplift_qini_treatment_is_pure_hash(spark):
    """Treatment must be the sample_split_hash md5 contract — recompute a
    few coins driver-side and confirm both arms are populated."""
    import hashlib

    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["eval_uplift_qini"](spark, SF_DIR).collect()
    assert sum(x.n_t for x in rows) > 0 and sum(x.n_c for x in rows) > 0
    # spot-check the coin definition used by the oracle
    for doc_id in (0, 1, 2):
        h = int(hashlib.md5(f"uplift{doc_id}".encode()).hexdigest()[:8], 16)
        assert h % 2 in (0, 1)
