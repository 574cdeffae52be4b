"""Event-time session-window state eviction audit (VERDICT r6 #8): the
planted four-batch scenario must (a) emit exactly what batch
window_sessionize computes over the ADMITTED events for sessions the final
watermark finalized, and (b) show bounded state in the state-store metrics
— rows evicted on finalization, the post-grace late event counted as
dropped, only the open session left resident."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.catalog.streaming import (
    SESSION_GAP,
    plant_session_eviction_scenario,
    session_eviction_stream,
)
from cell_kn_mvp_etl_ontologies_spark.streaming import run_stream_to_table_with_metrics


def _run(spark):
    root = plant_session_eviction_scenario(spark)
    agg = session_eviction_stream(spark, root + "/events")
    out, prog = run_stream_to_table_with_metrics(agg, output_mode="append")
    rows = sorted(
        (r.user_id, str(r.session_window.start), str(r.session_window.end), r.n)
        for r in out.collect()
    )
    return root, rows, prog


def test_session_eviction_matches_batch_sessionize(spark):
    """Rows-equal-to-batch: sessionize the admitted events (everything the
    stream did not drop) with the batch operator, finalize at the final
    watermark, and the streaming append output must match exactly."""
    from cell_kn_mvp_etl_ontologies_spark.operators.windows import window_sessionize

    root, got, prog = _run(spark)

    admitted = [
        ("A", "2024-03-01 10:00:00"), ("A", "2024-03-01 10:05:00"),
        ("B", "2024-03-01 10:02:00"), ("A", "2024-03-01 10:07:00"),
        ("C", "2024-03-01 12:00:00"), ("B", "2024-03-01 10:04:00"),
        ("C", "2024-03-01 12:05:00"), ("C", "2024-03-01 12:10:00"),
        # the batch-3 late B 10:06 is NOT here: the stream dropped it
    ]
    ev = spark.createDataFrame(admitted, "user_id string, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    gap_s = 600
    sess = window_sessionize(ev, ["user_id"], "ts", gap_s)
    batch = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("start"),
            (F.max("ts") + F.expr(f"INTERVAL {gap_s} SECONDS")).alias("end"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    # final watermark = max event time of the last batch (12:10) - 30 min
    final_wm = "2024-03-01 11:40:00"
    finalized = batch.filter(F.col("end") <= F.lit(final_wm).cast("timestamp"))
    want = sorted(
        (r.user_id, str(r.start), str(r.end), r.n) for r in finalized.collect()
    )
    assert got == want
    assert [r[0] for r in got] == ["A", "B"]
    assert got[0][3] == 3  # A: 3 events incl. the batch-1 merge
    assert got[1][3] == 2  # B: in-grace late 10:04 merged before finalization


def test_session_eviction_state_metrics_bounded(spark):
    """State-store metrics: sessions evict when they finalize (never grows
    past the 4 concurrent sessions the scenario creates), the post-grace
    late event is counted by numRowsDroppedByWatermark, and the final
    resident state is exactly the one still-open session."""
    root, got, prog = _run(spark)
    data_batches = [p for p in prog if p.get("stateOperators")]
    ops = [p["stateOperators"][0] for p in data_batches]

    assert max(o["numRowsTotal"] for o in ops) <= 4
    # finalization evicted A's and B's session rows
    assert sum(o["numRowsRemoved"] for o in ops) >= 2
    # the batch-3 post-grace B event was dropped by the watermark
    assert sum(o["numRowsDroppedByWatermark"] for o in ops) == 1
    # steady state after the flush: only C's open session remains
    assert ops[-1]["numRowsTotal"] == 1


def test_session_gap_constant_matches_batch_gap():
    # the two tests above hardcode 600 s; keep them honest against the
    # catalog constant
    assert SESSION_GAP == "10 minutes"
