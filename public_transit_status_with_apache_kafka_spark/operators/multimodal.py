"""Multimodal column handling (SURVEY.md E5): image/audio/video as opaque
binary columns + typed metadata, with decode / feature-extraction as
Arrow-batched Pandas functions over mapInPandas.

The container has no image/audio codecs, so the decode kernel is STUBBED:
``decode_stub=True`` (default) produces deterministic fake features from
the raw bytes; ``decode_stub=False`` raises NotImplementedError where a
real libjpeg/ffmpeg call would go. The Spark-side plumbing — schema,
binary payloads, Arrow batch shape, partition sizing — is real and tested.

100 TB stance: payloads at scale are *pointers* (path, offset, length)
into object storage, not inlined bytes; ``with_pointer_payload`` models
that layout. Inline binary is for small assets only. mapInPandas streams
one Arrow batch at a time so executor memory is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch, not by partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType(), False), False),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Model a multimodal table: opaque binary payload + typed metadata
    struct. (Test data has no real media, so the payload is the utf-8
    bytes of the text column — the plumbing is identical.)"""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.octet_length(payload).alias("n_bytes"),
        F.lit("text/plain").alias("mime"),
        F.substring(F.hex(payload), 1, 8).alias("magic"),
    )
    return df.select(F.col(id_col).alias("id"), payload.alias("payload"), meta.alias("meta"))


def with_pointer_payload(df: DataFrame, id_col: str, store_prefix: str = "warehouse/blobs") -> DataFrame:
    """The 100 TB layout: payload pointer (path, offset, length) instead of
    inline bytes; readers fetch lazily per batch."""
    return df.select(
        F.col(id_col).alias("id"),
        F.struct(
            F.concat(F.lit(store_prefix + "/part-"), (F.col(id_col) % 1024).cast("string"))
            .alias("path"),
            (F.col(id_col) * 4096).cast("long").alias("offset"),
            F.lit(4096).cast("long").alias("length"),
        ).alias("ptr"),
    )


def _fake_features(buf: bytes) -> list[float]:
    """Deterministic stand-in for a decoder+featurizer: chunk byte sums,
    normalized. Replace with a real decode (PIL/ffmpeg) in production."""
    if not buf:
        return [0.0] * FEATURE_DIM
    chunk = max(1, len(buf) // FEATURE_DIM)
    feats = []
    for i in range(FEATURE_DIM):
        seg = buf[i * chunk : (i + 1) * chunk]
        feats.append(float(sum(seg)) / (255.0 * max(1, len(seg))))
    return feats


def extract_features(
    df: DataFrame, decode_stub: bool = True, batch_hint: int | None = None
) -> DataFrame:
    """Decode + featurize binary payloads via mapInPandas (Arrow batches).

    ``df`` must have columns (id: long, payload: binary). Each pandas
    batch maps to one output batch; no state is held across batches so
    the operator scales linearly with input splits."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires image/audio libraries not "
                    "present in this environment; use decode_stub=True"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "features": payloads.map(lambda b: _fake_features(bytes(b))),
                }
            )

    return df.select("id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' on the opaque payload: take every Nth byte as a
    frame marker (stands in for video frame extraction; same partitioning
    and explode shape as the real thing)."""
    n = F.octet_length(F.col("payload"))
    idx = F.sequence(F.lit(1), F.greatest((n / every_n_bytes).cast("int"), F.lit(1)))
    exploded = df.select("id", F.explode(idx).alias("frame_no"))
    return exploded.select(
        "id", "frame_no", (F.col("frame_no") * every_n_bytes).cast("long").alias("byte_offset")
    )


def audio_segments(
    df: DataFrame,
    sample_rate: int = 16000,
    win: int = 64,
    hop: int = 32,
) -> DataFrame:
    """Audio chunking plumbing: treat the opaque payload as PCM16 mono
    (n_samples = n_bytes // 2) and emit one row per sliding analysis
    window — (seg_no, start/end sample, start/end ms) — the exact batch
    geometry a real STFT / VAD / whisper-style featurizer consumes.
    Payloads shorter than one window yield a single (padded) segment,
    matching how real segmenters handle stubs.

    Map-side sequence+explode only: no shuffle, no UDF; at 100 TB this
    is a pure scan whose output is bounded by n_samples/hop per row."""
    n_samples = F.floor(F.octet_length(F.col("payload")) / 2).cast("long")
    n_segs = F.greatest(
        (F.floor((n_samples - win) / hop) + 1).cast("int"), F.lit(1)
    )
    seg = df.select(
        "id", F.explode(F.sequence(F.lit(1), n_segs)).alias("seg_no")
    )
    start = (F.col("seg_no").cast("long") - 1) * hop
    end = start + win
    return seg.select(
        "id",
        F.col("seg_no").cast("long").alias("seg_no"),
        start.alias("start_sample"),
        end.alias("end_sample"),
        F.floor(start * 1000 / sample_rate).cast("long").alias("start_ms"),
        F.floor(end * 1000 / sample_rate).cast("long").alias("end_ms"),
    )


def resize(
    df: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    decode_stub: bool = True,
) -> DataFrame:
    """'Resize' the binary payload to out_w x out_h via mapInPandas —
    the Spark-side plumbing (binary in/out schema, Arrow batch shape,
    bounded memory) of an image resize, with the pixel kernel STUBBED:
    a deterministic stride-downsample of the raw bytes stands in for
    the real decoder+scaler (PIL/libjpeg absent from this container;
    ``decode_stub=False`` marks where it goes).

    Output payload is always exactly out_w*out_h bytes (short inputs
    zero-pad), so downstream batch geometry is what a real thumbnail
    pipeline sees."""
    target = out_w * out_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real image resize requires a decoder (PIL/ffmpeg) not "
                    "present in this environment; use decode_stub=True"
                )

            def shrink(b: bytes) -> bytes:
                b = bytes(b)
                if len(b) >= target:
                    stride = len(b) // target
                    out = b[:: stride][:target]
                else:
                    out = b
                return out.ljust(target, b"\x00")

            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "payload": payloads.map(shrink),
                    "out_w": out_w,
                    "out_h": out_h,
                    "in_bytes": payloads.map(len).astype("int32"),
                }
            )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
            T.StructField("out_w", T.IntegerType(), False),
            T.StructField("out_h", T.IntegerType(), False),
            T.StructField("in_bytes", T.IntegerType(), False),
        ]
    )
    return df.select("id", "payload").mapInPandas(batches, schema)
