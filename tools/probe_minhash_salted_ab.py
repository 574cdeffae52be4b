"""Interleaved A/B + identity for round-15 salted pair-generation in the
uncapped MinHash-LSH self-join (VERDICT r14 #4, guide §2.5 skew): the
sf0.1 corpus puts 736 of ~5.5k docs into ONE band bucket, so the
band_key-keyed self-join generates ~270k of its pairs in a single reducer
task (8→32-core scaling ratio 0.69 — serialization, not volume).

Salting splits that generation S ways WITHOUT changing the emitted pair
set: side A carries salt(a) = pmod(xxhash64(id), S); side B is replicated
to all S salts; the join key becomes (band_key, salt), so each (a, b,
band) match occurs exactly once (on a's salt) and the hot bucket's pair
generation spreads across S tasks.  distinct() downstream is unchanged.

Run:  SPARK_GRAFT_CPUS=32 python tools/probe_minhash_salted_ab.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.io import load_table, parallelize
from cell_kn_mvp_etl_ontologies_spark.operators.dedup import (
    minhash_band_keys,
    minhash_signatures,
    shingles,
)
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def corpus(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 100 < 5).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return parallelize(docs.unionByName(dups))


def band_frame(spark):
    sigs = minhash_signatures(
        shingles(corpus(spark), "text", "doc_id", 5, 200, distinct=False),
        8,
        portable=True,
    )
    return minhash_band_keys(sigs, 8, 4)


def pairs_plain(spark):
    bands = band_frame(spark)
    a = bands.select(F.col("id").alias("a"), "band_key")
    b = bands.select(F.col("id").alias("b"), "band_key")
    return (
        a.join(b, on="band_key")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def pairs_salted(spark, n_salts: int):
    bands = band_frame(spark)
    a = bands.select(
        F.col("id").alias("a"),
        "band_key",
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_salts)).cast("int").alias("salt"),
    )
    b = bands.select(F.col("id").alias("b"), "band_key").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return (
        a.join(b, on=["band_key", "salt"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def main() -> int:
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-minhash-salted-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, SF_DIR, "documents").count()  # warm scan path

    a = sorted(pairs_plain(spark).collect())
    for s in (8, CPUS):
        b = sorted(pairs_salted(spark, s).collect())
        print(f"identity S={s}: {a == b} ({len(a)} pairs)", flush=True)
        assert a == b

    variants = {
        "plain": lambda: pairs_plain(spark),
        "salted8": lambda: pairs_salted(spark, 8),
        f"salted{CPUS}": lambda: pairs_salted(spark, CPUS),
    }
    for fn in variants.values():  # warm
        fn().write.mode("overwrite").format("noop").save()
    readings: dict[str, list[float]] = {}
    order = list(variants)
    for rnd in range(5):
        for name in order if rnd % 2 == 0 else reversed(order):
            spark._jvm.System.gc()
            t0 = time.time()
            variants[name]().write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            readings.setdefault(name, []).append(dt)
            print(f"round {rnd} {name}: {dt:.3f}s", flush=True)
    print()
    for name, xs in readings.items():
        print(f"{name}: {['%.2f' % x for x in xs]} min {min(xs):.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
