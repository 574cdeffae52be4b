"""Reusable exact-integer evaluation/allocation statistics.

Factored from the round-9 catalog queries so the logic is a library
surface, not query-inline code: each function is a pure
``DataFrame -> DataFrame`` operator over caller-supplied columns, and the
catalog queries (`eval_wilcoxon_signed_rank`,
`sample_allocation_largest_remainder`, `eval_rank_biased_overlap`) are
thin bindings of these onto the gate tables — the DuckDB differential
gate therefore gates THESE implementations.

Shared doctrines (see catalog/frontier4.py): integer/rational identities
only, doubled ranks so midranks stay integral, truncating divisions with
non-negative operands (or sign-decomposed), fully keyed total orders so
results are retry/partition-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (1-p)·p^(d-1) in ppm for p = 0.9, d = 1..10 — hardcoded so neither
# engine evaluates a float pow (the eval_ranking_ndcg discount-table
# doctrine).  Σ = 651,320 ppm = 1 - 0.9^10 (the truncated-RBO cap).
RBO_WEIGHTS_PPM = [
    (1, 100000),
    (2, 90000),
    (3, 81000),
    (4, 72900),
    (5, 65610),
    (6, 59049),
    (7, 53144),
    (8, 47829),
    (9, 43046),
    (10, 38742),
]


def largest_remainder_allocation(
    df: DataFrame, key: str, weight: str, budget: int
) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of ``budget`` integer
    units across the rows of ``df`` proportionally to ``weight``:
    floor quotas ⌊K·w/W⌋, then the K − Σfloor leftover units go to the
    largest remainders (ties broken by ``key`` — fully deterministic).

    Guarantees: Σalloc = budget EXACTLY and |alloc − K·w/W| < 1 per row
    (pro-rata-then-round schemes can miss the total by |rows|).

    Scale contract: ``df`` is a STRATA dim frame (one row per stratum —
    aggregate the corpus first); the rank and Σfloor windows run on that
    bounded frame, the sanctioned bounded-dim single-partition pattern.

    Precondition (ADVICE r9): the weight column must be non-empty with a
    strictly positive total — apportioning a budget over zero total
    weight is undefined.  Enforced loudly: Σweight ≤ 0 raises at
    execution time in BOTH engines (Spark via assert_true here; DuckDB's
    division by zero errors on its own) instead of Spark silently
    emitting NULL quotas.
    """
    tot = df.agg(
        F.coalesce(F.sum(weight).cast("long"), F.lit(0)).alias("__t")
    ).select(
        # assert_true returns NULL when the predicate holds, so the
        # coalesce(+0) keeps __t unchanged on the happy path and the
        # whole expression raises when Σweight ≤ 0.
        (
            F.col("__t")
            + F.coalesce(
                F.assert_true(
                    F.col("__t") > 0,
                    F.lit(
                        "largest_remainder_allocation: weight total must be"
                        " > 0 (empty input or all-zero weight column)"
                    ),
                ).cast("long"),
                F.lit(0),
            )
        ).alias("__t")
    )
    quota = df.crossJoin(F.broadcast(tot)).select(
        "*",
        F.expr(f"CAST({budget} * {weight} DIV __t AS BIGINT)").alias(
            "base_alloc"
        ),
        F.expr(f"CAST({budget} * {weight} % __t AS BIGINT)").alias("rem_num"),
    )
    w_rank = Window.orderBy(F.desc("rem_num"), F.asc(key))
    w_all = Window.partitionBy()
    return (
        quota.select(
            "*",
            F.row_number().over(w_rank).cast("long").alias("__rank"),
            (F.lit(budget) - F.sum("base_alloc").over(w_all))
            .cast("long")
            .alias("__extra"),
        )
        .select(
            *[c for c in df.columns],
            "base_alloc",
            "rem_num",
            (F.col("__rank") <= F.col("__extra")).cast("long").alias("extra"),
            (
                F.col("base_alloc")
                + (F.col("__rank") <= F.col("__extra")).cast("long")
            )
            .cast("long")
            .alias("alloc"),
        )
    )


def wilcoxon_signed_rank(df: DataFrame, diff: str) -> DataFrame:
    """Wilcoxon signed-rank statistics over a paired-difference column:
    zeros dropped (the standard convention), |d| midranks computed
    exactly in integers by DOUBLING (2·avg-rank = 2·cum_before + c + 1
    is always integral — the eval_auc_rank trick), W⁺ as the doubled
    rank-sum of positive diffs.

    Returns ONE row: n_eff, n_pos, w_plus2, w_minus2 (the exact
    complement n(n+1) − W⁺₂), and shift_num4 = 2·W⁺₂ − n(n+1) =
    4·(W⁺ − E[W⁺]) — sign says direction; the variance ratio is float
    post-processing outside this contract.

    Scale contract: one hash agg to |d|-value granularity (map-side
    combinable), one window cumsum over DISTINCT |d| values, 1-row
    reduce — never a row-granular sort.
    """
    nz = df.filter(F.col(diff) != 0).select(
        F.col(diff).alias("__d"), F.abs(diff).alias("__ad")
    )
    per_ad = nz.groupBy("__ad").agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.sum((F.col("__d") > 0).cast("long")).cast("long").alias("__p"),
    )
    w = Window.orderBy("__ad")
    ranked = per_ad.withColumn(
        "__r2", 2 * (F.sum("__c").over(w) - F.col("__c")) + F.col("__c") + 1
    )
    agg = ranked.agg(
        F.sum("__c").cast("long").alias("n_eff"),
        F.sum("__p").cast("long").alias("n_pos"),
        F.sum(F.col("__p") * F.col("__r2")).cast("long").alias("w_plus2"),
    )
    return agg.select(
        "n_eff",
        "n_pos",
        "w_plus2",
        (F.col("n_eff") * (F.col("n_eff") + 1) - F.col("w_plus2"))
        .cast("long")
        .alias("w_minus2"),
        (2 * F.col("w_plus2") - F.col("n_eff") * (F.col("n_eff") + 1))
        .cast("long")
        .alias("shift_num4"),
    )


def rank_biased_overlap_topk(
    df: DataFrame,
    group: str,
    item: str,
    score_a: str,
    score_b: str,
) -> DataFrame:
    """Truncated RBO@10 (p = 0.9, no residual) between the rankings two
    score columns induce on the same items, per group.

    Rankings use ONE fully keyed total order each (score desc, item asc)
    so row_number is reproducible; per-depth overlap uses the max-rank
    census (an item in both top-10s contributes to every depth
    ≥ max(ra, rb) — one θ-join against the 10-row weight dim instead of
    10 set intersections); each term w_d·overlap_d DIV d is an integer,
    so the sum is order-independent.  Caps at Σw = 651,320 ppm.

    Returns (group, rbo_ppm_trunc, overlap_at_10).
    """
    w_a = Window.partitionBy(group).orderBy(F.desc(score_a), F.asc(item))
    w_b = Window.partitionBy(group).orderBy(F.desc(score_b), F.asc(item))
    ranked = df.select(
        group,
        F.row_number().over(w_a).cast("long").alias("__ra"),
        F.row_number().over(w_b).cast("long").alias("__rb"),
    )
    both_top = ranked.filter(
        (F.col("__ra") <= 10) & (F.col("__rb") <= 10)
    ).select(group, F.greatest("__ra", "__rb").alias("__m"))
    weights = df.sparkSession.createDataFrame(
        RBO_WEIGHTS_PPM, "d long, w_ppm long"
    )
    terms = (
        both_top.join(F.broadcast(weights), F.col("__m") <= F.col("d"))
        .groupBy(group, "d", "w_ppm")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap_d"))
    )
    return terms.groupBy(group).agg(
        F.sum(F.expr("w_ppm * overlap_d DIV d"))
        .cast("long")
        .alias("rbo_ppm_trunc"),
        F.max(F.when(F.col("d") == 10, F.col("overlap_d")))
        .cast("long")
        .alias("overlap_at_10"),
    )


def kendall_tau_census_bucketed(
    df: DataFrame, id_col: str, x: str, y: str, width: int
) -> DataFrame:
    """Exact Kendall pair census (n_pairs, n_conc, n_disc, n_tied,
    tau_a_ppm) for two near-continuous integer metrics with NO all-pairs
    join — the fallback `eval_kendall_tau_full`'s guard names, as a
    reusable operator.

    Decomposition (every pair counted exactly once):
      - x is cut into fixed-WIDTH value buckets (xb = x DIV width —
        value-derived, so xb_i < xb_j ⟹ x_i < x_j STRICTLY, and the
        bucketing is engine/partitioning-independent);
      - CROSS-BUCKET pairs via strict-CDF dominance counting on the
        (xb, y) grid with xb as the small axis (the Brandes-style per
        point j: D_j = #(xb < xb_j) − H(xb_j⁻, y_j), C_j = H − E);
      - SAME-BUCKET pairs via an all-pairs strip PARTITIONED BY BUCKET
        (O(Σ n_b²) = O(n²/B) total);
      - ties fall out by subtraction.

    ``id_col`` must be a STABLE unique row identity (a real key, never
    monotonically_increasing_id) — the strip's count-once order must be
    identical across the self-join's two legs even when one leg's tasks
    retry, or pairs double/zero-count (the chaos-probe doctrine).
    Requires x ≥ 0 (value bucketing by DIV; shift negative metrics
    first).

    Scale contract: two keyed aggs + a B-row broadcast dim × the y grid
    + two PARTITIONED window passes + per-bucket bounded strips; B and
    the strip occupancy are the tuning pair (B·strip ≈ n balances the
    sides) — callers should guard both (the catalog binding does).
    """
    per = df.select(
        F.col(id_col).alias("__rid"),
        F.col(x).cast("long").alias("__x"),
        F.col(y).cast("long").alias("__y"),
    ).withColumn("__xb", F.expr(f"CAST(__x DIV {width} AS BIGINT)"))
    buckets = per.select("__xb").distinct()
    ygrid = per.select("__y").distinct()
    t_cnt = per.groupBy("__xb", "__y").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    grid = (
        ygrid.crossJoin(F.broadcast(buckets))
        .join(t_cnt, ["__xb", "__y"], "left")
        .withColumn("__cnt", F.coalesce(F.col("__cnt"), F.lit(0)).cast("long"))
    )
    w_y = Window.partitionBy("__xb").orderBy("__y").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cy = grid.withColumn("__cy", F.sum("__cnt").over(w_y))
    w_x = Window.partitionBy("__y").orderBy("__xb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    h = (
        cy.withColumn(
            "__h", F.coalesce(F.sum("__cy").over(w_x), F.lit(0)).cast("long")
        )
        .withColumn(
            "__e", F.coalesce(F.sum("__cnt").over(w_x), F.lit(0)).cast("long")
        )
        .select("__xb", "__y", "__h", "__e")
    )
    xcensus = per.groupBy("__xb").agg(
        F.count(F.lit(1)).cast("long").alias("__m")
    )
    w_xc = Window.orderBy("__xb").rowsBetween(Window.unboundedPreceding, -1)
    nx_lt = xcensus.withColumn(
        "__nx_lt", F.coalesce(F.sum("__m").over(w_xc), F.lit(0)).cast("long")
    ).select("__xb", "__nx_lt")
    perj = per.join(h, ["__xb", "__y"]).join(F.broadcast(nx_lt), "__xb")
    cross = perj.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        # coalesce: SUM over an empty frame is NULL — the census columns
        # must be well-defined zeros on empty/1-row input (ADVICE r9)
        F.coalesce(F.sum(F.col("__nx_lt") - F.col("__h")), F.lit(0))
        .cast("long")
        .alias("disc_x"),
        F.coalesce(F.sum(F.col("__h") - F.col("__e")), F.lit(0))
        .cast("long")
        .alias("conc_x"),
    )
    a = per.select(
        "__xb",
        F.col("__rid").alias("__ra"),
        F.col("__x").alias("__xa"),
        F.col("__y").alias("__ya"),
    )
    bb = per.select(
        "__xb",
        F.col("__rid").alias("__rb"),
        F.col("__x").alias("__xx"),
        F.col("__y").alias("__yb"),
    )
    strip = (
        a.join(bb, on="__xb")
        .filter(F.col("__ra") < F.col("__rb"))
        .select(
            (
                (F.col("__xa") - F.col("__xx"))
                * (F.col("__ya") - F.col("__yb"))
            ).alias("__dxdy")
        )
        .agg(
            F.sum((F.col("__dxdy") > 0).cast("long"))
            .cast("long")
            .alias("conc_s"),
            F.sum((F.col("__dxdy") < 0).cast("long"))
            .cast("long")
            .alias("disc_s"),
        )
    )
    sums = cross.crossJoin(strip).select(
        "n",
        (F.col("conc_x") + F.coalesce(F.col("conc_s"), F.lit(0))).alias(
            "n_conc"
        ),
        (F.col("disc_x") + F.coalesce(F.col("disc_s"), F.lit(0))).alias(
            "n_disc"
        ),
    )
    return sums.select(
        F.expr("CAST(n * (n - 1) DIV 2 AS BIGINT)").alias("n_pairs"),
        F.col("n_conc").cast("long").alias("n_conc"),
        F.col("n_disc").cast("long").alias("n_disc"),
        F.expr("CAST(n * (n - 1) DIV 2 - n_conc - n_disc AS BIGINT)").alias(
            "n_tied"
        ),
        F.expr(
            # n < 2 guard (ADVICE r9): with no pairs the denominator is 0 —
            # Spark (non-ANSI) would silently return NULL while DuckDB
            # errors; make the undefined-τ case an EXPLICIT NULL in both
            # engines (the eval_cochran_q q_milli pattern).
            "CAST(CASE WHEN n < 2 THEN NULL"
            " WHEN n_conc >= n_disc"
            " THEN 1000000 * (n_conc - n_disc) DIV (n * (n - 1) DIV 2)"
            " ELSE -(1000000 * (n_disc - n_conc) DIV (n * (n - 1) DIV 2)) END"
            " AS BIGINT)"
        ).alias("tau_a_ppm"),
    )
