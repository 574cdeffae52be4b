"""Streaming chaos composition (VERDICT r9 #8): one adversarial file that
drives EXISTING maintainers under the three stressors at once —
out-of-order delivery, commit-misaligned ``maxFilesPerTrigger`` batch
boundaries, and a mid-stream failure with checkpoint-restart redelivery —
to prove the boundary-stitch and idempotent-upsert contracts COMPOSE:

1. `markov_maintain_run` (the boundary-stitch maintainer): 5 planted
   time-slice files whose rows are SHUFFLED within each file (the window
   must resequence) with every user active in every slice, driven at
   ``maxFilesPerTrigger=2`` so trigger boundaries land mid-way between
   planted commits (5 files → 2+2+1 batches).  The stitched matrix must
   equal the batch lag() computation exactly.

2. `run_stream_apply_changes` (the idempotent CDC upsert): a 5-file
   changelog planted OUT OF SEQ ORDER (later seq in earlier files — the
   bundling-independence contract), ``maxFilesPerTrigger=2``, and a
   fault injected through the production ``chaos_after_batch`` seam at
   the worst possible point — AFTER the state write of batch 1, BEFORE
   the checkpoint offset commit (the at-least-once window).  The query
   dies, the restart REDELIVERS batch 1 against state that already
   contains it, and seq-resolution must converge: final state equals the
   quiet run bit-for-bit.

The executor-kill variant of the same claims runs out-of-process on a
local-cluster master (tools/chaos_retry_probe.py; SCALE.md §chaos) —
in-process local[4] has task maxFailures=1, so the in-test fault is
injected at the foreachBatch commit protocol instead, which is the layer
the streaming contracts actually promise."""

from __future__ import annotations

import datetime as dt
import hashlib
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.catalog import load_all

load_all()  # frontier modules register in dependency order


def _plant_event_slices(tmp_path, n_files=5, users=4, per_slice=6):
    """Time-slice files, every user active in every slice, rows md5-shuffled
    WITHIN each file; per-user event time still increases across files (the
    stitch maintainer's stated ordering contract)."""
    ev_dir = tmp_path / "events_chaos"
    ev_dir.mkdir()
    rows = []
    eid = 0
    for f in range(n_files):
        slice_rows = []
        for u in range(users):
            for j in range(per_slice):
                t = dt.datetime(2024, 1, 1, f, j * 7 + u)
                etype = "abc"[(u + f + j) % 3]
                slice_rows.append((eid, t, u, etype, 1.0))
                eid += 1
        # shuffle within the file: order by md5 of the event id
        slice_rows.sort(key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest())
        rows.extend(slice_rows)
        pd.DataFrame(
            {
                "event_id": [r[0] for r in slice_rows],
                "ts": pd.to_datetime([r[1] for r in slice_rows]).astype(
                    "datetime64[us]"  # NANOS parquet type is illegal to Spark
                ),
                "user_id": [r[2] for r in slice_rows],
                "event_type": [r[3] for r in slice_rows],
                "value": [r[4] for r in slice_rows],
            }
        ).to_parquet(ev_dir / f"part-{f}.parquet")
        t0 = 1_000_000_000 + f * 100
        os.utime(ev_dir / f"part-{f}.parquet", (t0, t0))
    return str(ev_dir), rows


def test_markov_stitch_survives_shuffled_files_and_misaligned_triggers(
    spark, tmp_path
):
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier3 import (
        markov_maintain_run,
    )

    ev_dir, rows = _plant_event_slices(tmp_path)
    schema = spark.read.parquet(ev_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)  # 5 files -> 2+2+1: misaligned
        .parquet(ev_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    got = {
        (r.from_type, r.to_type): (r.n, r.n_from, r.p_ppm)
        for r in markov_maintain_run(spark, stream).collect()
    }

    # batch expectation: python lag over the FULL per-user sequences
    from collections import defaultdict

    seqs = defaultdict(list)
    for eid, t, u, etype, _ in rows:
        seqs[u].append((t, eid, etype))
    counts: dict = defaultdict(int)
    for u, evs in seqs.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] += 1
    n_from = defaultdict(int)
    for (a, _), n in counts.items():
        n_from[a] += n
    want = {
        (a, b): (n, n_from[a], 1_000_000 * n // n_from[a])
        for (a, b), n in counts.items()
    }
    assert got == want and len(got) > 3


def _plant_changelog(tmp_path, n_files=5):
    """CDC changelog across 5 files with seq DELIBERATELY out of file
    order: file k carries the seq residue class (n_files-1-k), so the
    largest seqs for many keys arrive FIRST.  Every key is touched in
    several files; key % 7 == 0 ends deleted at its max seq."""
    cdc_dir = tmp_path / "cdc_chaos"
    cdc_dir.mkdir()
    all_rows = []
    for f in range(n_files):
        rows = []
        for key in range(40):
            seq = (n_files - 1 - f) * 100 + key  # later files = SMALLER seq
            op = (
                "D"
                if key % 7 == 0 and f == 0  # the max-seq op for these keys
                else ("U" if (key + f) % 3 else "I")
            )
            rows.append((key, seq, op, f"v{key}@{seq}"))
        all_rows.extend(rows)
        pd.DataFrame(
            {
                "key": [r[0] for r in rows],
                "seq": [r[1] for r in rows],
                "op": [r[2] for r in rows],
                "val": [r[3] for r in rows],
            }
        ).to_parquet(cdc_dir / f"part-{f}.parquet")
        t0 = 1_000_000_000 + f * 100
        os.utime(cdc_dir / f"part-{f}.parquet", (t0, t0))
    return str(cdc_dir)


def _run_cdc(spark, cdc_dir, path, chaos=None):
    from cell_kn_mvp_etl_ontologies_spark.streaming.file_stream import (
        run_stream_apply_changes,
    )

    schema = spark.read.parquet(cdc_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(cdc_dir)
    )
    return run_stream_apply_changes(
        stream, path, ["key"], op_col="op", seq_col="seq", chaos_after_batch=chaos
    )


def test_cdc_apply_redelivery_after_crash_in_at_least_once_window(
    spark, tmp_path
):
    cdc_dir = _plant_changelog(tmp_path)

    # quiet run: same misaligned bundling, no fault
    quiet = _run_cdc(spark, cdc_dir, str(tmp_path / "state_quiet"))
    quiet_rows = {tuple(r) for r in quiet.collect()}
    assert len(quiet_rows) == 40  # every key has a resolved winner row

    # chaos run: crash AFTER batch 1's state write, BEFORE its checkpoint
    # offset commit — the restart must REDELIVER batch 1 against state
    # that already contains it
    crashed = {"done": False}

    def chaos(batch_id: int) -> None:
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("chaos: crash in the at-least-once window")

    state_path = str(tmp_path / "state_chaos")
    with pytest.raises(Exception, match="chaos"):
        _run_cdc(spark, cdc_dir, state_path, chaos=chaos)
    assert crashed["done"]
    # restart with the SAME checkpoint: batch 1 is redelivered (applied
    # twice in total), batch 2 then completes the stream
    recovered = _run_cdc(spark, cdc_dir, state_path, chaos=chaos)
    assert {tuple(r) for r in recovered.collect()} == quiet_rows


def test_round10_ivm_twins_bundling_independence(spark, tmp_path, monkeypatch):
    """The three round-10 IVM maintainers must equal their batch twins when
    driven over a REAL multi-batch split (3 files, maxFilesPerTrigger=1) —
    the bundling-independence their census-state contracts claim.  The
    catalog gate only ever sees the one-file (single-batch) case."""
    import cell_kn_mvp_etl_ontologies_spark.streaming as streaming_mod
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    d = tmp_path / "split_sf"
    d.mkdir()
    ev = spark.read.parquet(f"{sf}/events.parquet")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    # first slice keeps the canonical name (the readers' schema probe needs
    # {sf_dir}/events.parquet to exist); the glob picks up all three
    names = {0: "", 1: "_1", 2: "_2"}
    import glob as _glob
    import shutil

    for i in range(3):
        for frame, col, base in ((ev, "event_id", "events"), (docs, "doc_id", "documents")):
            tmp_out = str(d / f"__tmp_{base}_{i}")
            frame.filter(F.col(col) % 3 == i).repartition(1).write.mode(
                "overwrite"
            ).parquet(tmp_out)
            # flatten: the glob filter matches LEAF file names, so each
            # slice must be a single FILE named {base}{suffix}.parquet
            part = _glob.glob(tmp_out + "/part-*.parquet")[0]
            shutil.move(part, str(d / f"{base}{names[i]}.parquet"))
            shutil.rmtree(tmp_out, ignore_errors=True)
    sf_dir = str(d)

    orig_ev, orig_doc = (
        streaming_mod.read_events_stream,
        streaming_mod.read_documents_stream,
    )
    monkeypatch.setattr(
        streaming_mod,
        "read_events_stream",
        lambda sp, sd: orig_ev(sp, sd, max_files_per_trigger=1),
    )
    monkeypatch.setattr(
        streaming_mod,
        "read_documents_stream",
        lambda sp, sd: orig_doc(sp, sd, max_files_per_trigger=1),
    )

    for stream_q, batch_q in [
        ("stream_reciprocity_maintain", "graph_reciprocity"),
        ("stream_hapax_maintain", "text_hapax_ratio"),
        ("stream_seasonal_null_maintain", "quality_seasonal_null_audit"),
    ]:
        # batch twin runs on the ORIGINAL single-file dir — same rows, so
        # multi-batch state folds must converge to the identical table
        batch = {tuple(r) for r in QUERIES[batch_q](spark, sf).collect()}
        stream = {tuple(r) for r in QUERIES[stream_q](spark, sf_dir).collect()}
        assert stream == batch and len(batch) > 0, stream_q


def test_velocity_two_level_stitch_across_batches(spark, tmp_path, monkeypatch):
    """The velocity maintainer's TWO-LEVEL stitch: 5 time-slice files at
    one file per trigger (every user active in every slice, rows shuffled
    within files) must equal the batch profile computed over the combined
    data — per-batch windows alone would drop one d1 per user per
    boundary AND the two d2s each boundary severs."""
    import cell_kn_mvp_etl_ontologies_spark.streaming as streaming_mod
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    ev_dir, rows = _plant_event_slices(tmp_path, n_files=5, users=4, per_slice=6)
    # vary values so d1/d2 are non-trivial
    # (re-plant with value = f(eid): deterministic, mixed signs)
    import pandas as pd

    for f in list(os.listdir(ev_dir)):
        path = os.path.join(ev_dir, f)
        pdf = pd.read_parquet(path)
        pdf["value"] = [((eid * 37) % 19 - 9) / 1.0 for eid in pdf["event_id"]]
        idx = int(f.split("-")[1].split(".")[0])
        # the stream readers probe {dir}/events.parquet for the schema and
        # glob leaf files as events*: rename the slices accordingly
        new_name = "events.parquet" if idx == 0 else f"events_{idx}.parquet"
        new_path = os.path.join(ev_dir, new_name)
        pdf.to_parquet(new_path)
        os.remove(path)
        t0 = 1_000_000_000 + idx * 100
        os.utime(new_path, (t0, t0))

    orig_ev = streaming_mod.read_events_stream
    monkeypatch.setattr(
        streaming_mod,
        "read_events_stream",
        lambda sp, sd: orig_ev(sp, sd, max_files_per_trigger=1),
    )
    stream = {
        tuple(r)
        for r in QUERIES["stream_velocity_maintain"](spark, ev_dir + "/").collect()
    }
    # batch twin over the same combined rows: read all files as one table
    combined_dir = tmp_path / "combined"
    combined_dir.mkdir()
    pdf = pd.concat(
        [pd.read_parquet(os.path.join(ev_dir, f)) for f in os.listdir(ev_dir)]
    )
    pdf.to_parquet(combined_dir / "events.parquet")
    batch = {
        tuple(r)
        for r in QUERIES["temporal_velocity_profile"](
            spark, str(combined_dir)
        ).collect()
    }
    assert stream == batch and len(batch) == 4


def test_round11_ivm_twins_bundling_independence(spark, tmp_path, monkeypatch):
    """The two round-11 orders-stream maintainers must equal their batch
    twins over a REAL multi-batch split (3 files, one per trigger): the
    expectations scorecard (incl. the NON-additive uniqueness census —
    duplicate halves landing in different batches must still count) and
    the schema-drift profile (distinct/new-value faces over the census)."""
    import cell_kn_mvp_etl_ontologies_spark.streaming as streaming_mod
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    d = tmp_path / "split_sf"
    d.mkdir()
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    # customer.parquet must exist beside the split (the FK dim)
    import glob as _glob
    import shutil

    shutil.copy(f"{sf}/customer.parquet", str(d / "customer.parquet"))
    names = {0: "", 1: "_1", 2: "_2"}
    for i in range(3):
        tmp_out = str(d / f"__tmp_orders_{i}")
        orders.filter(F.col("o_orderkey") % 3 == i).repartition(1).write.mode(
            "overwrite"
        ).parquet(tmp_out)
        part = _glob.glob(tmp_out + "/part-*.parquet")[0]
        shutil.move(part, str(d / f"orders{names[i]}.parquet"))
        shutil.rmtree(tmp_out, ignore_errors=True)
    sf_dir = str(d)

    orig = streaming_mod.read_orders_stream
    monkeypatch.setattr(
        streaming_mod,
        "read_orders_stream",
        lambda sp, sd: orig(sp, sd, max_files_per_trigger=1),
    )

    for stream_q, batch_q in [
        ("stream_expectations_maintain", "quality_expectations"),
        ("stream_schema_drift_maintain", "quality_schema_drift"),
    ]:
        batch = {tuple(r) for r in QUERIES[batch_q](spark, sf).collect()}
        stream = {tuple(r) for r in QUERIES[stream_q](spark, sf_dir).collect()}
        assert stream == batch and len(batch) > 0, stream_q


def test_novelty_ivm_bundling_independence_in_corpus_order(spark, tmp_path, monkeypatch):
    """The novelty maintainer equals its batch twin over a REAL 3-batch
    split in CORPUS ORDER (contiguous doc_id ranges, one file per
    trigger) — including the within-batch subtlety: a gram first seen by
    two docs in the SAME batch credits only the smaller id.  Corpus order
    is the maintainer's documented ordering contract (novelty is defined
    against 'everything earlier'), matching how an append-only crawl
    actually lands."""
    import glob as _glob
    import shutil

    import cell_kn_mvp_etl_ontologies_spark.streaming as streaming_mod
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    d = tmp_path / "split_sf"
    d.mkdir()
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    names = {0: "", 1: "_1", 2: "_2"}
    bounds = [(0, 20), (20, 90), (90, 10**9)]  # contiguous ranges
    for i, (lo, hi) in enumerate(bounds):
        tmp_out = str(d / f"__tmp_documents_{i}")
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).repartition(
            1
        ).write.mode("overwrite").parquet(tmp_out)
        part = _glob.glob(tmp_out + "/part-*.parquet")[0]
        shutil.move(part, str(d / f"documents{names[i]}.parquet"))
        shutil.rmtree(tmp_out, ignore_errors=True)
    sf_dir = str(d)

    orig = streaming_mod.read_documents_stream
    monkeypatch.setattr(
        streaming_mod,
        "read_documents_stream",
        lambda sp, sd: orig(sp, sd, max_files_per_trigger=1),
    )

    batch = {tuple(r) for r in QUERIES["text_ngram_novelty_profile"](spark, sf).collect()}
    stream = {tuple(r) for r in QUERIES["stream_novelty_maintain"](spark, sf_dir).collect()}
    assert stream == batch and len(batch) > 0


def test_novelty_ivm_out_of_order_arrival(spark, tmp_path, monkeypatch):
    """ADVICE r11: the novelty maintainer must equal its batch twin under
    id-INTERLEAVED arrival (doc_id % 3 splits, one file per trigger), not
    just contiguous corpus-order bundles.  When a later batch delivers a
    SMALLER doc_id that steals a gram's first_doc from an already-counted
    doc, the revocation delta must fire — with the old frozen counters the
    displaced doc's n_novel could never be corrected and this equality
    breaks."""
    import glob as _glob
    import shutil

    import cell_kn_mvp_etl_ontologies_spark.streaming as streaming_mod
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    d = tmp_path / "split_sf"
    d.mkdir()
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    names = {0: "", 1: "_1", 2: "_2"}
    for i in range(3):
        tmp_out = str(d / f"__tmp_documents_{i}")
        docs.filter(F.col("doc_id") % 3 == i).repartition(1).write.mode(
            "overwrite"
        ).parquet(tmp_out)
        part = _glob.glob(tmp_out + "/part-*.parquet")[0]
        shutil.move(part, str(d / f"documents{names[i]}.parquet"))
        shutil.rmtree(tmp_out, ignore_errors=True)
    sf_dir = str(d)

    orig = streaming_mod.read_documents_stream
    monkeypatch.setattr(
        streaming_mod,
        "read_documents_stream",
        lambda sp, sd: orig(sp, sd, max_files_per_trigger=1),
    )

    batch = {tuple(r) for r in QUERIES["text_ngram_novelty_profile"](spark, sf).collect()}
    stream = {tuple(r) for r in QUERIES["stream_novelty_maintain"](spark, sf_dir).collect()}
    assert stream == batch and len(batch) > 0
