"""10×/100× state-grain probe for the four round-11 IVM maintainers
(VERDICT r11 #6), extending tools/scale_probe_ivm_state.py's method: drive
the REGISTERED catalog rows unmodified across three decades
(sf0.001 → sf0.01 → sf0.1) recording (input grain, result rows, wall),
and measure each maintainer's STATE CENSUS cardinality at each decade —
the claim under test is state = O(entities/grid), not O(rows):

- `stream_expectations_maintain`    state = 5 counters + orderkey census
- `stream_schema_drift_maintain`    state = (column, half, value) census
                                    (enum/band columns bounded; custkey
                                    grows with entities)
- `stream_weighted_median_maintain` state = (flag, quantity) census —
  the value GRID (≤ flag×50 rows at any scale); the open question is
  value-cardinality explosion, probed here by a price-cents variant
  (worst case: distinct values ≈ rows) vs the banded mitigation
- `stream_novelty_maintain`         state = (gram, first_doc) index +
  per-doc counters on the CONTRACT-BOUNDED 200-doc slice (flat by
  construction; production is vocabulary-sized)

Run:  python tools/scale_probe_ivm_state_r12.py
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from cell_kn_mvp_etl_ontologies_spark.io import load_table  # noqa: E402
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
TWINS = [
    "stream_expectations_maintain",
    "stream_schema_drift_maintain",
    "stream_weighted_median_maintain",
    "stream_novelty_maintain",
]


def state_census_counts(spark, sf) -> dict:
    """The state-census cardinality each maintainer would hold after
    consuming the full slice — computed from the batch data because the
    registered rows clean their scratch state (finish_and_clean)."""
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)

    out: dict = {}
    out["expectations_orderkey_census"] = orders.select("o_orderkey").distinct().count()
    # schema drift: same column set as the contract (status, priority,
    # custkey, price band) × half
    half = F.when(F.month("o_orderdate") <= 6, 1).otherwise(2)
    drift = 0
    for name, expr in [
        ("o_orderstatus", F.col("o_orderstatus")),
        ("o_orderpriority", F.col("o_orderpriority")),
        ("o_custkey", F.col("o_custkey").cast("string")),
        ("price_band", F.floor(F.col("o_totalprice") / 50000).cast("long").cast("string")),
    ]:
        drift += (
            orders.select(half.alias("half"), expr.alias("v"))
            .distinct()
            .count()
        )
    out["schema_drift_value_census"] = drift
    out["wmed_grid_census"] = (
        li.select("l_returnflag", F.col("l_quantity").cast("long")).distinct().count()
    )
    # value-cardinality explosion variant: census keyed on price CENTS
    # (worst case) vs the banded mitigation (cents DIV 10000)
    out["wmed_exploded_census"] = (
        li.select("l_returnflag", F.round(F.col("l_extendedprice") * 100).cast("long"))
        .distinct()
        .count()
    )
    out["wmed_banded_census"] = (
        li.select(
            "l_returnflag",
            (F.round(F.col("l_extendedprice") * 100).cast("long") / 10000)
            .cast("long"),
        )
        .distinct()
        .count()
    )
    out["novelty_gram_index"] = (
        docs.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(length(substring(text,1,100)) - 7, 0)),"
                    " i -> substring(substring(text,1,100), i, 8))"
                )
            ).alias("g")
        )
        .distinct()
        .count()
    )
    return out


def main() -> None:
    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    qs = entry.queries()

    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {}
    for sf in SFS:
        tag = sf.rsplit("sf", 1)[-1]
        out[f"rows_{tag}"] = {
            "orders": load_table(spark, sf, "orders").count(),
            "lineitem": load_table(spark, sf, "lineitem").count(),
        }
        out[f"state_census_{tag}"] = state_census_counts(spark, sf)
        for name in TWINS:
            t0 = time.time()
            n_rows = qs[name](spark, sf).count()
            out[f"{name}_{tag}"] = {
                "result_rows": n_rows,
                "sec": round(time.time() - t0, 2),
            }
            spark.catalog.clearCache()
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
