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
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

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


def _decode_batch(
    batches: Iterator[pd.DataFrame], use_stub: bool = True
) -> Iterator[pd.DataFrame]:
    if not use_stub:
        # Import errors surface at task start, not per-row — a cluster
        # missing pillow fails the stage loudly instead of half-decoding.
        import io

        import PIL.Image

    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        if use_stub:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    # Deterministic fake decode: dimensions derived from
                    # payload size and id so the stage is oracle-checkable.
                    "width": (n_bytes % 64) + 1,
                    "height": ((pdf["doc_id"] * 7) % 64) + 1,
                    "n_frames": (n_bytes % 10) + 1,
                    "decoder": "stub",
                }
            )
        else:
            widths, heights, frames, decoders = [], [], [], []
            for p in pdf["payload"]:
                try:
                    with PIL.Image.open(io.BytesIO(bytes(p))) as img:
                        widths.append(int(img.size[0]))
                        heights.append(int(img.size[1]))
                        frames.append(int(getattr(img, "n_frames", 1)))
                        decoders.append((img.format or "pil").lower())
                except Exception:
                    # Undecodable payloads are DATA, not configuration:
                    # null dims + a counting-friendly decoder tag instead
                    # of failing the 100 TB job on one corrupt image.
                    widths.append(None)
                    heights.append(None)
                    frames.append(None)
                    decoders.append("undecodable")
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "width": pd.array(widths, dtype="Int64"),
                    "height": pd.array(heights, dtype="Int64"),
                    "n_frames": pd.array(frames, dtype="Int64"),
                    "decoder": decoders,
                }
            )
        yield out


def decode_payloads(df: DataFrame, use_stub: bool = True) -> DataFrame:
    """Arrow-batched decode stage: (doc_id, payload) -> decode metadata.

    ``use_stub`` is an EXPLICIT configuration switch (VERDICT r5 #6), not
    an import sniff: True (default) runs the deterministic oracle-checkable
    fake used by the catalog queries; False runs the real PIL decode and
    raises ImportError at task start if pillow is absent — installing or
    removing pillow can never silently change which branch executes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _decode_batch(batches, use_stub=use_stub)

    return df.select("doc_id", "payload").mapInPandas(run, DECODE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("out_width", LongType()),
        StructField("out_height", LongType()),
    ]
)


def resize_stub(decoded: DataFrame, max_w: int = 32, max_h: int = 32) -> DataFrame:
    """Arrow-batched resize stage over decode metadata: fit (width, height)
    into (max_w, max_h) preserving aspect ratio with integer-only math so the
    result is exact in any engine.  Real pixel resampling is import-gated
    like decode; the box computation IS the production logic."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            w, h = pdf["width"], pdf["height"]
            # integer scale-to-fit: try width-bound, fall back to height-bound
            out_w = w.clip(upper=max_w)
            out_h = (h * out_w) // w
            over = out_h > max_h
            out_h = out_h.mask(over, max_h)
            out_w = out_w.mask(over, (w * max_h) // h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "out_width": out_w.clip(lower=1),
                    "out_height": out_h.clip(lower=1),
                }
            )

    return decoded.select("doc_id", "width", "height").mapInPandas(batches, RESIZE_SCHEMA)


def sample_frames(
    decoded: DataFrame,
    payloads: DataFrame,
    every_k: int = 3,
    frame_bytes: int = 8,
) -> DataFrame:
    """Frame sampling: one row per k-th frame index in [0, n_frames); the
    stub frame payload is the frame_bytes-wide slice of the payload at the
    frame offset.  All JVM-side (sequence + explode + substr) — the decode
    stage bounded n_frames, so the explode fan-out is bounded too."""
    joined = decoded.join(payloads.select("doc_id", "payload"), "doc_id")
    idx = F.explode(
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
    ).alias("frame_idx")
    rows = joined.select("doc_id", "n_frames", F.col("payload").cast("string").alias("p"), idx)
    return rows.select(
        "doc_id",
        "frame_idx",
        F.col("p")
        .substr(F.col("frame_idx") * frame_bytes + 1, F.lit(frame_bytes))
        .alias("frame_stub"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Arrow-batched feature-extraction stage: (doc_id, payload) →
    fixed-width embedding, the bridge from opaque payloads into the
    similarity/dedup operators (cosine top-k, ANN, embedding near-dup).

    A real deployment runs a vision/audio encoder here (import-gated like
    the decoder); the container stand-in derives component j from byte j of
    md5(payload) scaled to [0, 1] — deterministic, so the whole stage is
    oracle-checkable, while keeping the production plumbing (Arrow batches,
    pure per-row map, no shuffle) real.  ``dim`` ≤ 16 (one md5 digest).
    """
    if not 1 <= dim <= 16:
        raise ValueError("dim must be in [1, 16] (one md5 digest)")
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            embs = [
                [b / 255.0 for b in hashlib.md5(bytes(p)).digest()[:dim]]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": embs})

    return df.select("doc_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)
