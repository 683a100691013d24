"""Multimodal column handling (SURVEY.md E5): image/audio/video as opaque
binary columns + typed metadata, with decode / feature-extraction as
Arrow-batched Pandas functions over mapInPandas.

Since round 8 the decode kernel is REAL for two uncompressed public
formats: ``decode_stub=False`` decodes 24-bit BI_RGB BMP pixels (and
the audio path RIFF/WAVE PCM16 samples) via the pure-numpy codecs in
operators/media_codecs.py — no added dependencies, loud ValueError on
foreign/truncated payloads. ``decode_stub=True`` (default) remains the
deterministic byte-level stand-in for payloads that are NOT real media
(the text/plain modeled tables) — kept because compressed formats
(JPEG/MP3) would still need external codecs this container lacks.

The fixture media themselves are REAL files: ``bmp_payloads`` /
``wav_payloads`` raster each document into md5-row pixels / samples
(row r = the 16 digest bytes of (id, r, text chars r*16..r*16+15)) and
encode genuine BMP/WAV bytes. That construction buys two properties at
once: LOCALITY (an edit in text row r perturbs only raster row r — the
re-encode-noise analog pHash needs) and a FULL DuckDB ORACLE (the
digest is md5, so SQL recomputes every pixel/sample and hash-verifies
decoded statistics end to end — encode, parse, decode, aggregate).

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

    def _real_features(buf: bytes) -> list[float]:
        # real decode (round 8): per-channel means + extremes + aspect
        # from actual BMP pixels — the classic cheap-vision feature row
        import numpy as np

        from . import media_codecs as mc

        px = mc.decode_bmp(buf).astype(np.float64)
        h, w = px.shape[0], px.shape[1]
        ch = px.mean(axis=(0, 1)) / 255.0  # r, g, b
        return [
            float(w),
            float(h),
            float(ch[0]),
            float(ch[1]),
            float(ch[2]),
            float(px.min() / 255.0),
            float(px.max() / 255.0),
            float(w / h),
        ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        featurize = _fake_features if decode_stub else _real_features
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "features": payloads.map(lambda b: featurize(bytes(b))),
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
    """Resize the binary payload to out_w x out_h via mapInPandas.

    ``decode_stub=False`` (round 8): REAL image resize — decode the
    BMP, exact-integer AREA AVERAGE (each output pixel is the floor
    mean of its input block; dims must divide), re-encode as a genuine
    out_w x out_h BMP. Integer block means make the thumbnail
    bit-deterministic, so the DuckDB oracle can recompute every output
    pixel from the fixture construction.

    ``decode_stub=True``: the byte-stride stand-in for non-media
    payloads — output is exactly out_w*out_h raw bytes (short inputs
    zero-pad), preserving the downstream batch geometry."""
    target = out_w * out_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from . import media_codecs as mc

        def shrink(b: bytes) -> bytes:
            b = bytes(b)
            if len(b) >= target:
                stride = len(b) // target
                out = b[:: stride][:target]
            else:
                out = b
            return out.ljust(target, b"\x00")

        def real_resize(b: bytes) -> bytes:
            px = mc.decode_bmp(bytes(b)).astype(np.int64)
            h, w = px.shape[0], px.shape[1]
            if h % out_h or w % out_w:
                raise ValueError(
                    f"area-average resize needs divisible dims "
                    f"({h}x{w} -> {out_h}x{out_w})"
                )
            fh, fw = h // out_h, w // out_w
            thumb = (
                px.reshape(out_h, fh, out_w, fw, 3).sum(axis=(1, 3)) // (fh * fw)
            ).astype(np.uint8)
            return mc.encode_bmp(thumb)

        kernel = shrink if decode_stub else real_resize
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "payload": payloads.map(kernel),
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

    ``decode_stub=False`` (round 8): REAL decode — the raster is the
    BMP's pixel grid (any square side; the DCT basis is built per
    side), so the hash is computed from actual image content.
    ``decode_stub=True`` keeps the byte-resample stand-in for
    non-media payloads.

    ``df`` needs (id: long, payload: binary). One Arrow-batched numpy
    kernel — two small matmuls per item, no shuffle; the hash column
    is what downstream banding/dedup operates on."""
    import numpy as np
    import pandas as pd

    basis = _dct_basis(_PHASH_SIDE)

    def batches(it):
        from . import media_codecs as mc

        real_basis = {}  # side -> DCT basis (real decode path)

        def raster(b: bytes) -> "np.ndarray":
            if decode_stub:
                return _fake_pixels(b, _PHASH_SIDE), basis
            px = mc.decode_bmp(b)[:, :, 0].astype(np.float64)
            side = px.shape[0]
            if px.shape[1] != side:
                raise ValueError(f"pHash needs a square raster, got {px.shape}")
            if side not in real_basis:
                real_basis[side] = _dct_basis(side)
            return px, real_basis[side]

        for pdf in it:
            hashes = []
            for b in pdf["payload"]:
                px, bas = raster(bytes(b))
                coef = bas @ px @ bas.T
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


# ----------------------- real media fixtures + real decode (round 8)

RASTER_SIDE = 16  # md5-row raster: 16 rows x 16 digest bytes
_TEXT_STRIDE = 16  # text chars feeding each row digest
WAV_BLOCKS = 16  # 16 digests x 8 int16 samples = 128 samples
WAV_RATE = 16000


def _row_digest(r: int, text: str, salt: str = "") -> bytes:
    """The shared pixel/sample source: md5 over (row, a 16-char text
    slice). LOCAL by construction (editing chars in slice r perturbs
    only row r), CONTENT-keyed (identical texts raster identically, so
    planted dups stay dups), and ORACLE-REPLAYABLE (DuckDB's md5 of
    the same concat produces the same hex; plans/llm_data.py builds
    the SQL twin)."""
    import hashlib

    sl = text[r * _TEXT_STRIDE : (r + 1) * _TEXT_STRIDE]
    return hashlib.md5(f"{salt}{r}:{sl}".encode()).digest()


def bmp_payloads(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "md5",
) -> DataFrame:
    """Raster each document into a REAL 16x16 grayscale 24-bit BMP and
    return (id, payload, width, height). The payload is a genuine,
    validating BMP file — decode_bmp parses it like any other —
    generated deterministically so fixtures need no binary blobs on
    disk. Two rasterizations for two jobs:

    - ``mode="md5"``: row r's 16 pixels = the md5 digest bytes of
      (r, text slice r) — every pixel is SQL-recomputable, so decoded
      statistics get a full DuckDB oracle (e5_bmp_decode_stats).
    - ``mode="bytes"``: the utf-8 text bytes index-resampled onto the
      raster (the _fake_pixels map, now stored as a real file) —
      LOCALLY SMOOTH, so a small text splice perturbs few pixels: the
      re-encode-noise analog the pHash near-dup path needs (an md5 row
      avalanche flips a whole raster row, which can exceed the hamming
      budget)."""
    import numpy as np

    from . import media_codecs as mc

    if mode not in ("md5", "bytes"):
        raise ValueError(f"unknown raster mode {mode!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf[text_col]:
                text = str(text)
                if mode == "md5":
                    rows = np.frombuffer(
                        b"".join(
                            _row_digest(r, text) for r in range(RASTER_SIDE)
                        ),
                        dtype=np.uint8,
                    ).reshape(RASTER_SIDE, RASTER_SIDE)
                else:
                    rows = _fake_pixels(text.encode(), RASTER_SIDE).astype(
                        np.uint8
                    )
                rgb = np.repeat(rows[:, :, None], 3, axis=2)
                payloads.append(mc.encode_bmp(rgb))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "width": RASTER_SIDE,
                    "height": RASTER_SIDE,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        batches, "id long, payload binary, width int, height int"
    )


def wav_payloads(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Render each document as a REAL RIFF/WAVE PCM16 mono payload:
    block r contributes 8 little-endian int16 samples from its digest
    bytes (salt 'w' decouples audio from pixels). Returns
    (id, payload)."""
    import numpy as np

    from . import media_codecs as mc

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf[text_col]:
                raw = b"".join(
                    _row_digest(r, str(text), salt="w")
                    for r in range(WAV_BLOCKS)
                )
                samples = np.frombuffer(raw, dtype="<i2")
                payloads.append(mc.encode_wav(samples, WAV_RATE))
            yield pd.DataFrame(
                {"id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    return df.select(id_col, text_col).mapInPandas(batches, "id long, payload binary")


def decode_bmp_stats(df: DataFrame) -> DataFrame:
    """REAL image decode -> exact-integer statistics: parse the BMP
    payload (validating), take the R channel (fixtures are grayscale),
    and report (width, height, n_px, sum_px, min_px, max_px). All
    integers, so the DuckDB oracle hash-matches the DECODED pixels —
    the end-to-end proof that encode, header parse, stride/bottom-up
    handling, and channel order are all right."""
    import numpy as np

    from . import media_codecs as mc

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"id": [], "width": [], "height": [], "n_px": [],
                   "sum_px": [], "min_px": [], "max_px": []}
            for doc_id, buf in zip(pdf["id"], pdf["payload"]):
                px = mc.decode_bmp(bytes(buf))[:, :, 0].astype(np.int64)
                out["id"].append(int(doc_id))
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["n_px"].append(int(px.size))
                out["sum_px"].append(int(px.sum()))
                out["min_px"].append(int(px.min()))
                out["max_px"].append(int(px.max()))
            yield pd.DataFrame(out)

    return df.select("id", "payload").mapInPandas(
        batches,
        "id long, width int, height int, n_px int, sum_px long, min_px int, max_px int",
    )


def decode_wav_stats(df: DataFrame) -> DataFrame:
    """REAL audio decode -> exact-integer statistics: walk the RIFF
    chunks, decode PCM16 samples, report (n_samples, sample_rate,
    sum_amp, min_amp, max_amp) — the WAV twin of decode_bmp_stats,
    oracle-verified the same way."""
    import numpy as np

    from . import media_codecs as mc

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"id": [], "n_samples": [], "sample_rate": [],
                   "sum_amp": [], "min_amp": [], "max_amp": []}
            for doc_id, buf in zip(pdf["id"], pdf["payload"]):
                samples, rate = mc.decode_wav(bytes(buf))
                s = samples.astype(np.int64)
                out["id"].append(int(doc_id))
                out["n_samples"].append(int(s.size))
                out["sample_rate"].append(int(rate))
                out["sum_amp"].append(int(s.sum()))
                out["min_amp"].append(int(s.min()))
                out["max_amp"].append(int(s.max()))
            yield pd.DataFrame(out)

    return df.select("id", "payload").mapInPandas(
        batches,
        "id long, n_samples int, sample_rate int, sum_amp long, min_amp int, max_amp int",
    )


def write_media_files(media: DataFrame, out_dir: str, ext: str) -> None:
    """Distributed media-file writer (round 9, VERDICT r8 #8): each
    partition writes its own rows as individual ``doc_{id}.{ext}``
    files — the driver never sees payload bytes (foreachPartition, the
    same executor-side write stance as the kafka_sim segment writer).
    Atomic per file (tmp + rename). At 100 TB the open() targets
    object storage through the cluster's FS layer; here it is the
    local directory a binaryFile-source corpus arrives through."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def _write(rows) -> None:
        import os as _os

        for r in rows:
            p = _os.path.join(out_dir, f"doc_{int(r['id'])}.{ext}")
            tmp = f"{p}.tmp-{_os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(bytes(r["payload"]))
            _os.replace(tmp, p)

    media.select("id", "payload").foreachPartition(_write)


def audio_fingerprints(df: DataFrame) -> DataFrame:
    """REAL audio decode -> integer acoustic fingerprint (the
    Haitsma-Kalker / Chromaprint shape reduced to its deterministic
    core): decode PCM16, split into 16 contiguous 8-sample windows,
    exact integer energy per window (sum of squares), fingerprint bit i
    = [energy(i+1) > energy(i)] — a 15-bit energy-contour signature.
    Everything integer, so the DuckDB oracle rebuilds fingerprints
    sample-by-sample. Returns (id, fp, n_windows)."""
    import numpy as np

    from . import media_codecs as mc

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"id": [], "fp": [], "n_windows": []}
            for doc_id, buf in zip(pdf["id"], pdf["payload"]):
                samples, _rate = mc.decode_wav(bytes(buf))
                s = samples.astype(np.int64)
                en = (s.reshape(-1, 8) ** 2).sum(axis=1)
                fp = 0
                for i in range(len(en) - 1):
                    if en[i + 1] > en[i]:
                        fp |= 1 << i
                out["id"].append(int(doc_id))
                out["fp"].append(int(fp))
                out["n_windows"].append(int(len(en)))
            yield pd.DataFrame(out)

    return df.select("id", "payload").mapInPandas(
        batches, "id long, fp long, n_windows int"
    )
