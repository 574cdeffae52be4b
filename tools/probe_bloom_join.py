"""A/B probe: shuffle join with vs without the explicit Bloom prefilter.

Setup mirrors the 100 TB shape the operator exists for: a fact table joined
to a SELECTIVE dimension subset, with broadcast joins and Spark's own
runtime filters disabled so the baseline is an honest shuffle join (at real
scale the dimension side is over the broadcast threshold and AQE's runtime
bloom only fires in its heuristic window — the explicit operator is for
when you KNOW the reduction pays).

Usage: python tools/probe_bloom_join.py [sf_dir] — prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from cell_kn_mvp_etl_ontologies_spark.io import load_table  # noqa: E402
from cell_kn_mvp_etl_ontologies_spark.operators.sketches import (  # noqa: E402
    bloom_build,
    bloom_prefilter,
)
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    b = (
        SparkSession.builder.master("local[32]")
        .appName("bloom-join-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        # force the baseline to a genuine shuffle join
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # isolate the EXPLICIT bloom from Spark's adaptive runtime filter
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        .config("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # selective dimension subset: ~0.5% of parts
    part = load_table(spark, SF_DIR, "part").filter(F.col("p_partkey") % 191 == 0)
    dim = part.select("p_partkey", "p_brand")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity"
    )
    li.count()  # warm scan

    def timed(df):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            spark.sparkContext._jvm.System.gc()
        return round(best, 3)

    def agg(j):
        # DECIMAL sum: order-independent, so the plain/bloom equality check
        # below cannot trip on float reduction order
        return j.groupBy("p_brand").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev"),
        )

    plain = agg(li.join(dim, li["l_partkey"] == dim["p_partkey"]))
    t_plain = timed(plain)

    # bloom paths: the filter must NOT broadcast-join dim itself — the point
    # is the big side shrinks before ITS exchange; dim still shuffles
    from cell_kn_mvp_etl_ontologies_spark.operators.sketches import (
        bloom_prefilter_materialized,
    )

    M, K = 1 << 16, 4
    # production path: portable=False (xxhash64) — the md5 family exists for
    # cross-engine oracle gating, not for hot loops (see _km_hashes_fast)
    bloom = bloom_build(dim, "p_partkey", m_bits=M, k=K, portable=False)
    pre = bloom_prefilter(li, "l_partkey", bloom, m_bits=M, k=K, portable=False)
    bloomed = agg(pre.join(dim, F.col("l_partkey") == dim["p_partkey"]))
    t_bloom = timed(bloomed)

    pre_m = bloom_prefilter_materialized(
        li, "l_partkey", bloom, m_bits=M, k=K, portable=False
    )
    bloomed_m = agg(pre_m.join(dim, F.col("l_partkey") == dim["p_partkey"]))
    t_bloom_m = timed(bloomed_m)

    # the portable (md5) flavor, for the record of why it is gate-only
    bloom_p = bloom_build(dim, "p_partkey", m_bits=M, k=K)
    pre_p = bloom_prefilter(li, "l_partkey", bloom_p, m_bits=M, k=K)
    t_bloom_md5 = timed(agg(pre_p.join(dim, F.col("l_partkey") == dim["p_partkey"])))

    n_fact = li.count()
    n_kept = pre.count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, bloomed.collect()))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, bloomed_m.collect()))
    print(
        json.dumps(
            {
                "metric": "bloom_join_probe",
                "sf_dir": SF_DIR,
                "t_shuffle_join": t_plain,
                "t_bloom_prefilter_join": t_bloom,
                "t_bloom_materialized_join": t_bloom_m,
                "t_bloom_md5_join": t_bloom_md5,
                "fact_rows": n_fact,
                "rows_into_exchange": n_kept,
                "reduction": round(1 - n_kept / n_fact, 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
