"""Pure-numpy codecs for two UNCOMPRESSED public media formats —
24-bit BI_RGB Windows BMP and RIFF/WAVE PCM16 mono — so the E5
multimodal operators decode REAL pixels and REAL samples with zero
added dependencies (round-7 item #6; the container ships no
PIL/ffmpeg, and these formats need none: they are headers + raw
arrays).

Clean-room from the public specifications: BMP per the documented
BITMAPFILEHEADER/BITMAPINFOHEADER layout (14 + 40 byte headers,
little-endian fields, bottom-up BGR rows padded to 4 bytes), WAV per
the RIFF chunk grammar ('RIFF' size 'WAVE', then 'fmt ' and 'data'
chunks; PCM16 little-endian samples).

Decoders VALIDATE (magic, bpp, compression, chunk sizes) and raise
ValueError on anything else — a truncated or foreign payload fails
loudly, never yields garbage pixels. Encoders emit the minimal
canonical form the decoders accept, so encode->decode round-trips
bit-exactly (tests/test_media_codecs.py, including hypothesis
round-trips)."""

from __future__ import annotations

import struct

import numpy as np

_BMP_HEADER = 14
_BMP_INFO = 40


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes (bottom-up rows,
    BGR byte order, rows padded to 4-byte multiples)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"need (h, w, 3) RGB, got {px.shape}")
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    data_size = stride * h
    file_size = _BMP_HEADER + _BMP_INFO + data_size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, _BMP_HEADER + _BMP_INFO)
    info = struct.pack(
        "<IiiHHIIiiII", _BMP_INFO, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    rows = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        rows += px[r, :, ::-1].tobytes()  # BGR
        rows += b"\x00" * pad
    return header + info + bytes(rows)


def decode_bmp(buf: bytes) -> "np.ndarray":
    """24-bit BI_RGB BMP bytes -> (h, w, 3) uint8 RGB."""
    buf = bytes(buf)
    if len(buf) < _BMP_HEADER + _BMP_INFO or buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, file_size, _, _, data_off = struct.unpack("<2sIHHI", buf[:_BMP_HEADER])
    (
        info_size, w, h, planes, bpp, compression, _ds, _xr, _yr, _cu, _ci
    ) = struct.unpack("<IiiHHIIiiII", buf[_BMP_HEADER : _BMP_HEADER + _BMP_INFO])
    if info_size < _BMP_INFO or planes != 1:
        raise ValueError(f"unsupported BMP info header ({info_size}, {planes})")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    if w <= 0 or h == 0:
        raise ValueError(f"bad dimensions {w}x{h}")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = data_off + stride * h
    if len(buf) < need:
        raise ValueError(f"truncated BMP: {len(buf)} < {need} bytes")
    raw = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_wav(samples: "np.ndarray", sample_rate: int = 16000) -> bytes:
    """1-D int16 array -> RIFF/WAVE PCM16 mono bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim != 1:
        raise ValueError(f"need 1-D mono samples, got shape {s.shape}")
    data = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )  # PCM, mono, rate, byte-rate, block-align, bits
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple["np.ndarray", int]:
    """RIFF/WAVE PCM16 mono bytes -> (int16 samples, sample_rate).
    Walks the chunk list, so extra chunks (LIST/INFO) are tolerated."""
    buf = bytes(buf)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(buf), 8 + struct.unpack("<I", buf[4:8])[0])
    rate, data = None, None
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            fmt_tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt_tag != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"only PCM16 mono supported (tag={fmt_tag}, ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return np.frombuffer(data, dtype="<i2").copy(), rate
