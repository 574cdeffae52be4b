"""Guard against driver testdata storage drift (round-2 postmortem).

Round 2 died because ``events.ts`` silently changed from parquet
TIMESTAMP(NANOS) to TIMESTAMP(MICROS) between rounds and ``load_table``
assumed the old storage.  These tests open every testdata table through
``load_table`` and pin the engine-facing dtypes, so the next storage change
fails loudly here instead of in the driver gate.
"""

from __future__ import annotations

import os

import pytest

from cell_kn_mvp_etl_ontologies_spark.io import TABLES, load_table, normalize_event_time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

# Engine-facing dtypes we promise to every downstream operator, regardless of
# how the driver chose to store the column on disk this round.
EXPECTED_DTYPES = {
    "events": {
        "event_id": "bigint",
        "ts": "timestamp_ntz",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {"doc_id": "bigint", "text": "string", "lang": "string"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
    "lineitem": {
        "l_orderkey": "bigint",
        "l_quantity": "double",
        "l_shipdate": "timestamp_ntz",
    },
    "orders": {"o_orderkey": "bigint", "o_orderdate": "timestamp_ntz"},
    "customer": {"c_custkey": "bigint", "c_nationkey": "int"},
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} not present"
)


@pytest.mark.parametrize("name", TABLES)
def test_load_table_opens_and_types(spark, name):
    df = load_table(spark, SF_DIR, name)
    assert df.limit(1).count() >= 0  # materializes the scan, catching read errors
    dtypes = dict(df.dtypes)
    for col, want in EXPECTED_DTYPES.get(name, {}).items():
        assert dtypes.get(col) == want, (
            f"{name}.{col}: engine-facing dtype {dtypes.get(col)!r} != {want!r} "
            "— driver testdata storage drifted; update io.normalize_event_time"
        )


def test_normalize_event_time_branches(spark):
    # bigint (nanos-as-long legacy storage) -> rebuilt NTZ
    legacy = spark.createDataFrame(
        [(1_700_000_000_123_456_789,)], "ts bigint"
    )
    out = normalize_event_time(legacy, ["ts"])
    assert dict(out.dtypes)["ts"] == "timestamp_ntz"
    micros = out.selectExpr(
        "unix_micros(cast(ts as timestamp)) as us"
    ).head()["us"]
    assert micros == 1_700_000_000_123_456  # truncating ns->us division

    # native timestamp flavors -> cast straight through, value preserved
    for src_type in ("timestamp", "timestamp_ntz"):
        native = spark.sql(
            f"select cast(timestamp'2024-01-02 03:04:05.678901' as {src_type}) as ts"
        )
        out = normalize_event_time(native, ["ts"])
        assert dict(out.dtypes)["ts"] == "timestamp_ntz"
        assert str(out.head()["ts"]) == "2024-01-02 03:04:05.678901"

    # unknown storage raises instead of producing garbage
    with pytest.raises(TypeError):
        normalize_event_time(spark.createDataFrame([("x",)], "ts string"), ["ts"])

    # absent column is a no-op (loader maps are table-keyed, frames vary)
    passthrough = spark.createDataFrame([(1,)], "other bigint")
    assert normalize_event_time(passthrough, ["ts"]) is passthrough


def test_events_stream_reader_types(spark, tmp_path):
    from cell_kn_mvp_etl_ontologies_spark.streaming.file_stream import (
        read_events_stream,
    )

    stream = read_events_stream(spark, SF_DIR)
    assert stream.isStreaming
    # LTZ TIMESTAMP so watermarks/windows accept it
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_read_state_parquet_first_batch_vs_transient_failure(spark, tmp_path):
    """ADVICE r10: the IVM maintainers must treat ONLY a genuinely absent
    state path as 'first batch'.  A path that EXISTS but cannot be read
    (mid-rewrite wreckage, corrupt footer) raises instead of silently
    resetting accumulated state."""
    import os

    import pytest

    from cell_kn_mvp_etl_ontologies_spark.io import read_state_parquet

    missing = str(tmp_path / "never_written")
    assert read_state_parquet(spark, missing) is None

    # a state dir that exists but holds no readable parquet is NOT a
    # first batch — schema inference fails and the error must propagate
    broken = tmp_path / "broken_state"
    broken.mkdir()
    (broken / "part-00000.parquet").write_text("this is not parquet")
    with pytest.raises(Exception):
        df = read_state_parquet(spark, str(broken))
        if df is not None:  # force plan+action if planning survived
            df.collect()

    # round-trip sanity: a real state reads back
    good = str(tmp_path / "good_state")
    spark.range(5).write.parquet(good)
    assert os.path.exists(good)
    got = read_state_parquet(spark, good)
    assert got is not None and got.count() == 5
