"""Multimodal column handling (SURVEY.md §2.12).

Images/audio/video are opaque BinaryType payloads with typed metadata
structs.  Decode / feature-extract run as Arrow-batched ``mapInPandas``
stages — the Spark-side plumbing (schema, batch shape, partition flow) is
real; the actual codec calls are import-gated because decode libraries are
not in this container, with a clearly-marked deterministic stub fallback so
plans remain testable end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("decoder", StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Opaque binary payload + typed metadata struct.  In production the
    payload comes from ``spark.read.format('binaryFile')``; here it is the
    utf-8 bytes of the text column so plans are runnable on the synthetic
    tables."""
    return df.select(
        "doc_id",
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
        ).alias("meta"),
    )


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    try:  # real decoders are not installed in this environment
        import PIL.Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        if have_pil:
            # Real path would decode pdf["payload"] via PIL here.
            raise NotImplementedError("real image decode not exercised in this container")
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                # Deterministic fake decode: dimensions derived from payload
                # size and id so the stage is oracle-checkable.
                "width": (n_bytes % 64) + 1,
                "height": ((pdf["doc_id"] * 7) % 64) + 1,
                "n_frames": (n_bytes % 10) + 1,
                "decoder": "stub",
            }
        )
        yield out


def decode_payloads(df: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: (doc_id, payload) -> decode metadata."""
    return df.select("doc_id", "payload").mapInPandas(_decode_batch, DECODE_SCHEMA)
