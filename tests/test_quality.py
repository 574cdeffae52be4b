"""Unit tests for the data-quality expectation gate (operators/quality.py)
with planted violations of every constraint kind."""

from __future__ import annotations

import pytest

from cell_kn_mvp_etl_ontologies_spark.operators.quality import (
    ForeignKey,
    InRange,
    MatchesRegex,
    NotNull,
    Unique,
    check_expectations,
)


def test_all_constraint_kinds_count_planted_violations(spark):
    child = spark.createDataFrame(
        [
            (1, 10, 5.0, "1-HIGH"),
            (1, 11, -2.0, "bad"),      # dup key, below range, regex miss
            (2, None, 50.0, "2-LOW"),  # null fk col
            (3, 99, 200.0, None),      # orphan fk (99 not in parent); null regex col ok
            (1, 10, None, "3-MEDIUM"), # dup key again; null range col ok
        ],
        "k long, fk long, v double, s string",
    )
    parent = spark.createDataFrame([(10,), (11,)], "pk long")
    out = {
        r["constraint"]: (r["violations"], r["passed"])
        for r in check_expectations(
            child,
            row_checks=[
                NotNull("fk"),
                InRange("v", 0.0, 100.0),
                MatchesRegex("s", r"^[0-9]-[A-Z]+$"),
            ],
            unique_checks=[Unique(("k",))],
            fk_checks=[(ForeignKey("fk", "parent"), parent, "pk")],
        ).collect()
    }
    assert out["not_null(fk)"] == (1, False)
    # -2.0 below range; 200.0 above; NULL v is not a range violation
    assert out["in_range(v,0.0,100.0)"] == (2, False)
    # 'bad' misses; NULL s is not a regex violation
    assert out["matches_regex(s)"] == (1, False)
    # key 1 appears 3 times -> all 3 rows count as violations
    assert out["unique(k)"] == (3, False)
    # fk=99 is absent from parent; NULL fk is not an fk violation
    assert out["fk(fk->parent)"] == (1, False)


def test_clean_data_passes_and_empty_constraints_raise(spark):
    df = spark.createDataFrame([(1, "1-A"), (2, "2-B")], "k long, s string")
    out = check_expectations(
        df,
        row_checks=[NotNull("k"), MatchesRegex("s", r"^[0-9]-[A-Z]$")],
        unique_checks=[Unique(("k",))],
    ).collect()
    assert all(r["passed"] and r["violations"] == 0 for r in out)
    with pytest.raises(ValueError):
        check_expectations(df, row_checks=[])


def test_row_checks_fold_into_single_aggregate(spark):
    df = spark.createDataFrame([(1, 2.0)], "a long, b double")
    plan = check_expectations(
        df, row_checks=[NotNull("a"), NotNull("b"), InRange("b", 0.0, 1.0)]
    )._jdf.queryExecution().optimizedPlan().toString()
    # one Aggregate over the scan — adding row checks must not add jobs
    assert plan.count("Aggregate") == 1


def test_profile_numeric_stats_and_single_pass(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators.quality import profile_numeric

    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (2.0, 30.0), (None, 40.0)],
        "a double, b double",
    )
    out = {r["column"]: r for r in profile_numeric(df, ["a", "b"]).collect()}
    a = out["a"]
    assert (a["n_rows"], a["n_null"], a["n_distinct"]) == (4, 1, 2)
    assert (a["min_v"], a["max_v"], a["sum_v"]) == (1.0, 2.0, 5.0)
    assert a["mean_v"] == 5.0 / 3
    b = out["b"]
    assert (b["n_null"], b["sum_v"], b["mean_v"]) == (1, 80.0, 80.0 / 3)
    with pytest.raises(ValueError):
        profile_numeric(df, [])
