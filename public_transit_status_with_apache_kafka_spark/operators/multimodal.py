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


_PHASH_SIDE = 32  # fake-decode raster side; DCT input is SIDE x SIDE
_PHASH_KEEP = 8  # top-left low-frequency block -> 64-bit hash


def _dct_basis(n: int) -> "np.ndarray":
    """Orthonormal DCT-II basis matrix (the classic image-hash
    transform), pure numpy."""
    import numpy as np

    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


def _fake_pixels(buf: bytes, side: int) -> "np.ndarray":
    """Deterministic decode stand-in that is LOCALLY smooth in the
    payload bytes: the buffer is index-resampled onto a side x side
    raster, so a small byte edit perturbs few pixels — exactly the
    property a real lossy re-encode has and the one pHash exploits.
    Replace with a real decoder (PIL) in production."""
    import numpy as np

    if not buf:
        return np.zeros((side, side))
    arr = np.frombuffer(buf, dtype=np.uint8)
    idx = np.linspace(0, len(arr) - 1, side * side).astype(np.int64)
    return arr[idx].reshape(side, side).astype(np.float64)


def phash64(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Perceptual hash (the classic DCT pHash): decode to a small
    grayscale raster, 2-D DCT, keep the top-left low-frequency block
    minus DC, threshold at its median -> 64 bits packed into one
    BIGINT. Near-duplicate media differ in few bits (robust to
    re-encode/resize noise), byte-identical media hash identically.

    ``df`` needs (id: long, payload: binary). One Arrow-batched numpy
    kernel — two 32x32 matmuls per item, no shuffle; the hash column
    is what downstream banding/dedup operates on."""
    import numpy as np
    import pandas as pd

    basis = _dct_basis(_PHASH_SIDE)

    def batches(it):
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires image libraries not present "
                    "in this environment; use decode_stub=True"
                )
            hashes = []
            for b in pdf["payload"]:
                px = _fake_pixels(bytes(b), _PHASH_SIDE)
                coef = basis @ px @ basis.T
                block = coef[:_PHASH_KEEP, :_PHASH_KEEP].flatten()
                vals = np.delete(block, 0)  # drop DC
                med = np.median(vals)
                bits = np.zeros(64, dtype=np.uint64)
                bits[: len(vals)] = (vals > med).astype(np.uint64)
                h = np.uint64(0)
                for j, bit in enumerate(bits):
                    h |= bit << np.uint64(j)
                hashes.append(np.int64(h.astype(np.uint64).view(np.int64)))
            yield pd.DataFrame({"id": pdf["id"], "phash": hashes})

    return df.select("id", "payload").mapInPandas(batches, "id long, phash long")


def phash_neardup_pairs(
    df: DataFrame, max_hamming: int = 6, bands: int = 8
) -> DataFrame:
    """Near-duplicate media pairs by pHash multi-index banding (the
    standard hamming-search decomposition): split the 64-bit hash into
    ``bands`` equal bands; by PIGEONHOLE, any two hashes within
    ``bands - 1`` differing bits MUST agree on at least one whole band,
    so a band-equality join has GUARANTEED recall for
    ``max_hamming <= bands - 1`` (the default 6 < 8 qualifies — no
    probabilistic miss, unlike MinHash banding). Candidates then verify
    with an exact `bit_count(a ^ b)` — JVM codegen over colliding pairs
    only, never all pairs. Returns (id_a, id_b, hamming)."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"recall guarantee needs max_hamming <= bands - 1 "
            f"(got {max_hamming} > {bands - 1})"
        )
    width = 64 // bands
    banded = df.select(
        "id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.expr(
                            f"(phash >> {i * width}) & {(1 << width) - 1}"
                        ).alias("band_val"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", "phash", "b.band_idx", "b.band_val")
    a = banded.select(
        F.col("id").alias("id_a"),
        F.col("phash").alias("ph_a"),
        "band_idx",
        "band_val",
    )
    b = banded.select(
        F.col("id").alias("id_b"),
        F.col("phash").alias("ph_b"),
        "band_idx",
        "band_val",
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.expr("bit_count(ph_a ^ ph_b)").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
