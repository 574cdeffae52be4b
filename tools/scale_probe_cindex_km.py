"""10× scale probe for the round-10 survival pair (SCALE.md
§survival-at-10x): `eval_cindex_full`'s dominance-counting path and the
`temporal_kaplan_meier` fold, on synthetic orders with C customers × a
bounded tenure axis, scaled 1× → 10× on customers.

Exactness at 1× AND 10×: the probe re-derives the C-index census from the
quadratic all-pairs join IN-ENGINE (affordable because comparability
keys on the bounded t axis make the pair count ~C²/2 — at 10× that is
2·10⁹ logical pairs, so the quadratic check runs on a 10%-sampled
entity subset there, exact on the sample), and the KM curve is checked
against a python replay of the pinned integer recurrence.

Usage: python tools/scale_probe_cindex_km.py [mult ...]   # default 1 10
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BASE_CUST = 20_000


def synth_orders(spark, n_cust: int):
    """1-20 orders per customer (md5-derived tenure), ~45% of customers
    with a finalized order, spend cents md5-derived."""
    c = spark.range(n_cust).select(F.col("id").alias("cust"))
    h = F.conv(F.substring(F.md5(F.concat(F.lit("t|"), F.col("cust").cast("string"))), 1, 8), 16, 10).cast("long")
    per = c.select("cust", (h % 20 + 1).alias("n_orders"))
    o = per.select(
        "cust", F.explode(F.sequence(F.lit(1), F.col("n_orders"))).alias("j")
    )
    oh = F.conv(F.substring(F.md5(F.concat(F.col("cust").cast("string"), F.lit("#"), F.col("j").cast("string"))), 1, 8), 16, 10).cast("long")
    return o.select(
        (F.col("cust") * 100 + F.col("j")).alias("o_orderkey"),
        F.col("cust").alias("o_custkey"),
        ((oh % 100000).cast("double") / 100.0).alias("o_totalprice"),
        F.when(oh % 100 < 8, "F").otherwise("O").alias("o_orderstatus"),
    )


def main() -> None:
    mults = [int(x) for x in sys.argv[1:]] or [1, 10]
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("cindex-km-scale-probe")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()

    import tempfile

    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES, load_all

    load_all()

    for mult in mults:
        n_cust = BASE_CUST * mult
        d = tempfile.mkdtemp(prefix="surv_")
        synth_orders(spark, n_cust).write.mode("overwrite").parquet(
            d + "/orders.parquet"
        )

        # -- dominance-counting C-index ----------------------------------
        t0 = time.time()
        [full] = QUERIES["eval_cindex_full"](spark, d).collect()
        wall_ci = time.time() - t0
        # quadratic check on a deterministic entity sample (exact on it)
        frac = 100 if mult == 1 else 10  # keep the pair join ~4e8 at 10×
        o = spark.read.parquet(d + "/orders.parquet")
        sample = o.filter(F.col("o_custkey") % (100 // frac if frac < 100 else 1) == 0)
        per = sample.groupBy(F.col("o_custkey").alias("cust")).agg(
            F.count(F.lit(1)).cast("long").alias("t"),
            F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("e"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("s"),
        )
        a = per.select(F.col("cust").alias("ci"), F.col("t").alias("ti"),
                       F.col("e").alias("ei"), F.col("s").alias("si"))
        b = per.select(F.col("cust").alias("cj"), F.col("t").alias("tj"),
                       F.col("s").alias("sj"))
        quad = a.join(
            b, (F.col("ti") < F.col("tj")) & (F.col("ei") == 1) & (F.col("ci") != F.col("cj"))
        ).agg(
            F.count(F.lit(1)).alias("n_comparable"),
            F.sum(F.when(F.col("si") > F.col("sj"), 1).otherwise(0)).alias("n_conc"),
            F.sum(F.when(F.col("si") == F.col("sj"), 1).otherwise(0)).alias("n_tied"),
        ).first()
        # run the production path ON THE SAMPLE for the cross-check
        d2 = tempfile.mkdtemp(prefix="surv_s_")
        sample.write.mode("overwrite").parquet(d2 + "/orders.parquet")
        [full_s] = QUERIES["eval_cindex_full"](spark, d2).collect()
        ok = (
            full_s.n_comparable == quad.n_comparable
            and full_s.n_conc == quad.n_conc
            and full_s.n_tied == quad.n_tied
        )

        # -- KM fold ------------------------------------------------------
        t0 = time.time()
        km = QUERIES["temporal_kaplan_meier"](spark, d).collect()
        wall_km = time.time() - t0
        steps = sorted((r.t, r.n_risk, r.d, r.c, r.s_ppm) for r in km)
        s_ppm = 1_000_000
        km_ok = True
        for t, n_risk, dd, cc, got in steps:
            s_ppm = s_ppm * (n_risk - dd) // n_risk
            km_ok = km_ok and (got == s_ppm)

        print(
            json.dumps(
                {
                    "probe": "survival_pair",
                    "mult": mult,
                    "customers": n_cust,
                    "wall_cindex_full": round(wall_ci, 2),
                    "cindex_vs_quadratic_exact": bool(ok),
                    "quadratic_sample_pct": frac,
                    "wall_km": round(wall_km, 2),
                    "km_steps": len(steps),
                    "km_recurrence_exact": bool(km_ok),
                    "c_ppm": full.c_ppm,
                }
            ),
            flush=True,
        )
        import shutil

        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
