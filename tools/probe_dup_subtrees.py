"""Catalog-wide duplicated-subtree census (round 14, guide §3.3).

For every `queries()` row, counts physical-plan Generate (explode) and Scan
nodes that appear more than once with identical normalized arguments —
the signature of a fan-out subtree recomputed per consumer (the BM25 tf
pattern fixed in OPTIMIZATION_r14 entry H).  Reporting only — the fix is
per-operator (materialize once) and must be A/B'd; this ranks candidates.

Usage: python tools/probe_dup_subtrees.py [--sf-dir DIR] [query ...]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

from pyspark.sql import SparkSession

from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF


def normalize(line: str) -> str:
    line = re.sub(r"#\d+[L]?", "#x", line)
    line = re.sub(r"plan_id=\d+", "plan_id=x", line)
    return line.strip()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs = m.queries()
    names = args.queries or list(qs)

    b = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", "12g")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    errors = 0
    for name in names:
        try:
            df = qs[name](spark, args.sf_dir)
            # simple mode: tree nodes carry inline arguments (formatted mode
            # puts them in detail sections, so tree lines never match)
            phys = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
        except Exception as exc:  # noqa: BLE001
            errors += 1
            print(f"ERR   {name}: {type(exc).__name__}: {str(exc)[:120]}")
            continue
        gens = Counter(
            normalize(l) for l in phys.splitlines() if "Generate explode" in l
        )
        dup_gen = sum(c - 1 for c in gens.values() if c > 1)
        pys = Counter(
            normalize(l)
            for l in phys.splitlines()
            if re.search(r"MapInPandas|ArrowEval|BatchEvalPython|FlatMapGroupsInPandas", l)
        )
        dup_py = sum(c - 1 for c in pys.values() if c > 1)
        if dup_gen or dup_py:
            results.append((dup_gen, dup_py, name))
        spark.catalog.clearCache()
    results.sort(reverse=True)
    print("\n== duplicated-subtree candidates (extra Generate copies, extra scans) ==")
    for dup_gen, dup_py, name in results:
        print(f"{name}: +{dup_gen} duplicate explode evals, +{dup_py} duplicate python-boundary nodes")
    print(f"\n{len(results)} candidates / {len(names)} rows ({errors} errors)")
    spark.stop()
    return 0


if __name__ == "__main__":
    main()
