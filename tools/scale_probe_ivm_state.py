"""10× state-grain probe for the round-10 IVM twins (VERDICT r10 #7).

The multi-batch bundling-independence pins run at sf0.01; this probe runs
the four registered maintainers at 10× (and 100×) the event grain and
records (events consumed, result rows, wall sec) per scale.  The claim
under test: maintained state — and therefore the read-time face each
maintainer returns, which IS a face over its state — stays O(entities)
(users / vocabulary / hour grid / tenure grid), NOT O(events):

- `stream_velocity_maintain`   state = per-user census + per-user last
- `stream_kaplan_meier_maintain` state = per-tenure-grid counts
- `stream_seasonal_null_maintain` state = 24 hour-bucket counts
- `stream_hapax_maintain`      state = (lang, word) frequency census
                               (vocabulary — grows SUBLINEARLY in tokens)

The probe drives the REGISTERED catalog rows unmodified across
sf0.001 → sf0.01 → sf0.1 (events 4,116 → 41,499 → 414,588 — two decades),
so the evidence covers the exact gated code path, not a reimplementation.

Run:  python tools/scale_probe_ivm_state.py
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from cell_kn_mvp_etl_ontologies_spark.io import load_table  # noqa: E402
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
TWINS = [
    "stream_velocity_maintain",
    "stream_kaplan_meier_maintain",
    "stream_seasonal_null_maintain",
    "stream_hapax_maintain",
]


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
        # the maintainers consume the events/orders/documents slices their
        # contracts define; events count is the scale axis
        n_events = load_table(spark, sf, "events").count()
        out[f"events_{tag}"] = n_events
        for name in TWINS:
            t0 = time.time()
            n_rows = qs[name](spark, sf).count()
            out[f"{name}_{tag}"] = {
                "result_rows": n_rows,
                "sec": round(time.time() - t0, 2),
            }
            spark.catalog.clearCache()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
