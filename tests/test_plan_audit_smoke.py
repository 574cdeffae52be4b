"""Plan-audit smoke gate (VERDICT r10 #6): run tools/audit_plans.py's
detector over the round's 50-row driver prefix inside pytest, so a plan
regression introduced mid-round (an alias blowing a filter chain past
pushdown, a lost broadcast hint turning a keyed join into a
BroadcastNestedLoopJoin) surfaces in the suite instead of at the next
manual per-round audit.

Two layers:
- the detector itself must be RED on an injected BroadcastNestedLoopJoin
  (proves the gate can fail);
- the current driver prefix must be GREEN (waivers honored — the same
  WAIVERS table the manual audit uses, one source of truth).
"""

from __future__ import annotations

import argparse
import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def audit():
    return _load(os.path.join(REPO, "tools", "audit_plans.py"), "audit_plans")


@pytest.fixture(scope="module")
def audit_args():
    # the manual sweep's defaults (tools/audit_plans.py main())
    return argparse.Namespace(filter_chars=4000, regex_max=60, exchange_max=12)


def _flags_for(audit, audit_args, name, df):
    qe = df._jdf.queryExecution()
    return audit.iter_flags(
        name,
        qe.optimizedPlan().toString(),
        qe.executedPlan().toString(),
        audit_args,
    )


def test_detector_red_on_injected_nested_loop_join(spark, audit, audit_args):
    """An accidental cross product MUST flag — otherwise the green gate
    below proves nothing."""
    from pyspark.sql import functions as F

    a = spark.range(100).select(F.col("id").alias("x"))
    b = spark.range(100).select(F.col("id").alias("y"))
    # inequality join with no equi-key: Spark plans BroadcastNestedLoopJoin
    bad = a.join(b, a.x < b.y)
    flags = _flags_for(audit, audit_args, "__injected__", bad)
    assert any(f.startswith("CARTESIAN") for f in flags), flags


def test_driver_prefix_plans_clean(spark, audit, audit_args):
    """The round's 50-row driver prefix audits clean at sf0.001 (plan
    shapes are scale-free; sf0.001 keeps the eager IVM rows cheap)."""
    entry = _load(os.path.join(REPO, "__spark_entry__.py"), "entrymod")
    qs = entry.queries()
    prefix = list(qs)[:50]
    sf_dir = "/root/testdata/sf0.001"
    failures = {}
    for name in prefix:
        try:
            df = qs[name](spark, sf_dir)
            flags = _flags_for(audit, audit_args, name, df)
        except Exception as exc:  # noqa: BLE001 — collect, report all at once
            failures[name] = f"ERROR {type(exc).__name__}: {exc}"[:200]
            continue
        if flags:
            failures[name] = ", ".join(flags)
        spark.catalog.clearCache()
    assert not failures, f"plan audit flagged {len(failures)}: {failures}"
