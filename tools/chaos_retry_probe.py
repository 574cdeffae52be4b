"""Fault-tolerance probe: kill one executor JVM mid-query on a
local-cluster master and verify the recomputed result is bit-identical to
the quiet run.

This is the evidence behind the engine's determinism-under-retry claims
(md5-keyed sampling, integer-scaled iterative math, sorted-set dedup):
Spark recovers lost tasks and shuffle blocks via lineage, so a query is
only retry-safe if every operator is a pure function of its inputs —
nondeterministic sampling or float reduction order would make the re-run
diverge.  The probe runs a query once undisturbed, then again while a
`kill -9` lands on one CoarseGrainedExecutorBackend ~1 s into execution,
and compares order-insensitive value hashes.

Usage: python tools/chaos_retry_probe.py [query ...]
Defaults to a mix of shuffle-heavy, iterative, and sampling queries.
"""

from __future__ import annotations

import hashlib
import os
import signal
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "graph_build_vertices",   # pivot + dedup chain
    "graph_pagerank",         # iterative integer math + localCheckpoint
    "dedup_minhash_lsh",      # shingle/minhash shuffle
    "sample_split_hash",      # md5-keyed deterministic sampling
    "temporal_gap_fill",      # window fill
]


def frame_hash(df) -> tuple[int, str]:
    rows = sorted(
        "\x1f".join("<NULL>" if v is None else repr(v) for v in row)
        for row in df.collect()
    )
    return len(rows), hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def executor_pids() -> list[int]:
    out = subprocess.run(
        ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
        capture_output=True, text=True,
    ).stdout
    return [int(p) for p in out.split()]


def kill_one_executor_after(delay_s: float, done: threading.Event) -> None:
    time.sleep(delay_s)
    if done.is_set():
        return
    pids = executor_pids()
    if pids:
        os.kill(pids[0], signal.SIGKILL)
        print(f"  [chaos] killed executor pid {pids[0]}", flush=True)


def main() -> int:
    import importlib.util

    from pyspark.sql import SparkSession

    from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    builder = (
        SparkSession.builder.master("local-cluster[4,4,4096]")
        .appName("chaos-retry-probe")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        # lost-executor recovery knobs left at defaults: 4 task retries,
        # shuffle refetch + lineage recompute
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    queries = mod.queries()
    names = sys.argv[1:] or DEFAULT_QUERIES
    failures = []
    for name in names:
        fn = queries[name]
        quiet = frame_hash(fn(spark, sf_dir))
        done = threading.Event()
        killer = threading.Thread(target=kill_one_executor_after, args=(1.0, done))
        killer.start()
        try:
            chaos = frame_hash(fn(spark, sf_dir))
        finally:
            done.set()
            killer.join()
        ok = quiet == chaos
        print(f"{'PASS' if ok else 'FAIL'}  {name}: quiet={quiet} chaos={chaos}")
        if not ok:
            failures.append(name)
        # let the standalone worker respawn the executor before the next query
        deadline = time.time() + 60
        while len(executor_pids()) < 4 and time.time() < deadline:
            time.sleep(1)
    print(f"\n{len(names) - len(failures)} retry-identical / {len(failures)} divergent of {len(names)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
