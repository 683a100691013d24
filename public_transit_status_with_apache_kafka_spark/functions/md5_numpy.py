"""Vectorized single-block MD5 over numpy arrays (RFC 1321).

Why this exists: the Arrow kernels (winnowing char-grams, word-shingle
hashing) need md5-derived 56-bit values for MILLIONS of short strings
per Arrow batch, bit-identical to Spark's ``md5()`` and DuckDB's
``md5()`` (functions/hashing.md5_long). ``hashlib.md5`` costs ~0.5-1 us
of per-call Python overhead — at one call per character position
(winnowing) that overhead IS the runtime. Every message here is shorter
than 56 bytes, so it always fits ONE padded MD5 block, and the MD5
compression function is just 64 rounds of 32-bit adds/rotates/boolean
ops — which numpy evaluates for the whole message array at once.

Semantics contract: ``md5_u56_*`` returns exactly
``int(hashlib.md5(msg).hexdigest()[:14], 16)`` (the first 7 digest
bytes, big-endian) as int64 — the same value md5_long computes in
Spark SQL and md5_long_sql in DuckDB. Equality is property-tested
against hashlib in tests/test_dedup_properties.py.

Only the MD5 specification from RFC 1321 (public) is used; uint32
arithmetic relies on numpy's wrapping overflow semantics.
"""

from __future__ import annotations

import math

import numpy as np

_S = [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4
_K = np.array(
    [int(abs(math.sin(i + 1)) * (1 << 32)) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
# per-round message-word index g(i)
_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.int64,
)

_INIT = (np.uint32(0x67452301), np.uint32(0xEFCDAB89), np.uint32(0x98BADCFE), np.uint32(0x10325476))

# rows per compression call: the 64-round loop touches every row ~10
# times per round through several temporaries, so the working set must
# stay L2-resident — 16k rows x 4B x ~8 live arrays ≈ 512 KB. Measured
# 2.4M msgs/s vs 2.0M unchunked and 0.8M for a hashlib-per-call loop.
_CHUNK = 16384


def _compress(M: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One MD5 compression over (G, 16) little-endian uint32 blocks.
    Returns the first two digest words (a, b) — 8 bytes, more than the
    7 the 56-bit family consumes."""
    if M.shape[0] > _CHUNK:
        parts = [
            _compress(M[i : i + _CHUNK]) for i in range(0, M.shape[0], _CHUNK)
        ]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )
    n = M.shape[0]
    A = np.full(n, _INIT[0], np.uint32)
    B = np.full(n, _INIT[1], np.uint32)
    C = np.full(n, _INIT[2], np.uint32)
    D = np.full(n, _INIT[3], np.uint32)
    for i in range(64):
        if i < 16:
            f = (B & C) | (~B & D)
        elif i < 32:
            f = (D & B) | (~D & C)
        elif i < 48:
            f = B ^ C ^ D
        else:
            f = C ^ (B | ~D)
        tmp = f + A + _K[i] + M[:, _G[i]]  # uint32 wrap-around adds
        s = np.uint32(_S[i])
        A, D, C, B = D, C, B, B + ((tmp << s) | (tmp >> np.uint32(32 - s)))
    return A + _INIT[0], B + _INIT[1]


def _u56(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """First 14 hex digits of the digest as int64: digest bytes are the
    words little-endian, the hex prefix reads them big-endian."""
    a64 = a.astype(np.uint64)
    b64 = b.astype(np.uint64)
    v = (
        ((a64 & np.uint64(0xFF)) << np.uint64(48))
        | (((a64 >> np.uint64(8)) & np.uint64(0xFF)) << np.uint64(40))
        | (((a64 >> np.uint64(16)) & np.uint64(0xFF)) << np.uint64(32))
        | (((a64 >> np.uint64(24)) & np.uint64(0xFF)) << np.uint64(24))
        | ((b64 & np.uint64(0xFF)) << np.uint64(16))
        | (((b64 >> np.uint64(8)) & np.uint64(0xFF)) << np.uint64(8))
        | ((b64 >> np.uint64(16)) & np.uint64(0xFF))
    )
    return v.astype(np.int64)


def md5_u56_fixed(msgs: np.ndarray) -> np.ndarray:
    """56-bit md5 family value for (G, L) uint8 messages, L <= 55
    (fixed length, e.g. char k-grams). Returns int64 (G,)."""
    if msgs.size == 0:
        return np.empty(0, dtype=np.int64)
    g, L = msgs.shape
    if L > 55:
        raise ValueError(f"message length {L} exceeds one MD5 block")
    block = np.zeros((g, 64), dtype=np.uint8)
    block[:, :L] = msgs
    block[:, L] = 0x80
    bitlen = L * 8
    block[:, 56] = bitlen & 0xFF
    block[:, 57] = (bitlen >> 8) & 0xFF
    a, b = _compress(block.view("<u4"))
    return _u56(a, b)


def md5_u56_ragged(data: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """56-bit md5 family value for G variable-length byte messages laid
    out in one flat uint8 buffer: message i is data[starts[i] :
    starts[i] + lengths[i]], every lengths[i] <= 55. Returns int64 (G,)."""
    g = len(starts)
    if g == 0:
        return np.empty(0, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    if lengths.max(initial=0) > 55:
        raise ValueError("a message exceeds one MD5 block")
    block = np.zeros((g, 64), dtype=np.uint8)
    # scatter the ragged bytes row-wise; per-row copy is a memcpy, the
    # Python loop costs ~100ns/row vs ~1us/row for hashlib call+parse
    for i in range(g):
        ln = lengths[i]
        block[i, :ln] = data[starts[i] : starts[i] + ln]
    rows = np.arange(g)
    block[rows, lengths] = 0x80
    bits = (lengths * 8).astype(np.uint64)
    block[:, 56] = (bits & 0xFF).astype(np.uint8)
    block[:, 57] = ((bits >> np.uint64(8)) & 0xFF).astype(np.uint8)
    a, b = _compress(block.view("<u4"))
    return _u56(a, b)
