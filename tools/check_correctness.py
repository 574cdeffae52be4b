"""Local mirror of the driver's t2 correctness gate.

For every query in __spark_entry__.py: run the Spark query and the DuckDB
oracle at the given SF, compare row count + (name-sorted) schema + an
order-insensitive value hash over stringified cells.  Usage:

    python tools/check_correctness.py [--sf-dir /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    try:
        if pd.isna(v):
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    return str(v)


def frame_hash(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = ["\x1f".join(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    h = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
    return len(df), cols, h


def spark_to_pandas(sdf) -> pd.DataFrame:
    pdf = sdf.toPandas()
    # normalize numpy/arrow scalars to plain python via astype(object) walk
    return pdf


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    ap.add_argument("--json-out", default=None, help="write per-query results (driver CORRECTNESS shape) to this path")
    ap.add_argument("--ansi", default=None, choices=["true", "false"],
                    help="force spark.sql.ansi.enabled (default: engine default) — the driver's session config is unknown, so the gate must pass under BOTH modes")
    ap.add_argument("--tz", default=None,
                    help="force spark.sql.session.timeZone (e.g. America/New_York) — the gate must be timezone-independent: all event-time math runs on TIMESTAMP_NTZ")
    ap.add_argument("--master", default=None,
                    help="override the Spark master, e.g. local-cluster[4,4,4096] to run the gate across REAL executor processes (separate heaps, wire serialization, executor-side Python workers) instead of local threads")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import importlib.util

    spec = importlib.util.spec_from_file_location("entrymod", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(args.master or f"local[{args.cpus}]")
        .appName("check-correctness")
        .config("spark.sql.shuffle.partitions", str(int(args.cpus) * 2))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    )
    if args.ansi is not None:
        builder = builder.config("spark.sql.ansi.enabled", args.ansi)
    if args.tz is not None:
        builder = builder.config("spark.sql.session.timeZone", args.tz)
    if args.master is not None:
        # Multi-process masters spawn executor-side Python workers that must
        # import this package — the local equivalent of shipping it with
        # --py-files / a cluster pip install on a real deployment.
        builder = builder.config("spark.executorEnv.PYTHONPATH", REPO)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    queries = mod.queries()
    oracles = mod.oracle_sql()
    names = args.queries or list(queries)
    n_pass = n_fail = n_rows_only = 0
    failures = []
    results: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            s_pd = spark_to_pandas(sdf)
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            results[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                             "spark_rows": None, "oracle_rows": None, "err": "spark error"}
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(s_pd)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            results[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                             "spark_rows": len(s_pd), "oracle_rows": None, "err": None,
                             "rows_only": True}
            continue
        try:
            d_pd = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            failures.append(name)
            results[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                             "spark_rows": len(s_pd), "oracle_rows": None, "err": "duckdb error"}
            continue
        sn, sc, sh = frame_hash(s_pd)
        dn, dc, dh = frame_hash(d_pd)
        ok = (sn, sc, sh) == (dn, dc, dh)
        results[name] = {"rows_match": sn == dn, "schema_match": sc == dc, "hash_match": sh == dh,
                         "spark_rows": sn, "oracle_rows": dn, "err": None}
        if ok:
            n_pass += 1
            print(f"PASS  {name}: {sn} rows [{time.time()-t0:.1f}s]")
        else:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark({sn} rows, {sc}, {sh[:10]}) vs duck({dn} rows, {dc}, {dh[:10]})")
            if sn and dn and sc == dc:
                s_rows = sorted("\x1f".join(norm_cell(v) for v in r) for r in s_pd[sorted(s_pd.columns)].itertuples(index=False, name=None))
                d_rows = sorted("\x1f".join(norm_cell(v) for v in r) for r in d_pd[sorted(d_pd.columns)].itertuples(index=False, name=None))
                s_only = [r for r in s_rows if r not in set(d_rows)][:3]
                d_only = [r for r in d_rows if r not in set(s_rows)][:3]
                for r in s_only:
                    print(f"      spark-only: {r!r}")
                for r in d_only:
                    print(f"      duck-only : {r!r}")
    print(f"\n{n_pass} pass / {n_fail} fail / {n_rows_only} rows-only of {len(names)}")
    if failures:
        print("failures:", " ".join(failures))
    if args.json_out:
        import json

        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.json_out}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
