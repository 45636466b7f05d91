"""Batch-vectorized MD5 (RFC 1321) in numpy — the portable-hash kernel.

Why this exists: the engine's portable hash (`functions/hashing.py`,
`operators/sampling.py:hash60`) is "first 15 hex chars of md5" so the
DuckDB oracle can replay every hash bit-for-bit. JVM-side that hash is
cheap as a scalar expression, but inside a higher-order `F.transform`
lambda it is evaluated INTERPRETED per array element (HOF lambdas never
enter whole-stage codegen) — the one remaining per-element cost in the
quality-classifier scoring scan (VERDICT r4 / ADVICE r4: "hash features
in numpy inside the same Arrow kernel").

This module is that kernel: MD5's 64 rounds are plain uint32
add/and/or/xor/rotate ops, so a BATCH of short messages vectorizes
perfectly — one (n_messages,)-shaped uint32 lane per state word, the
whole batch advancing through each round together. Messages of unequal
block counts are handled with a per-lane active mask (state only
advances while the lane still has blocks). The result is bit-identical
to `hashlib.md5` (pinned by `tests/test_functions.py`) and therefore to
Spark's `F.md5` / DuckDB's `md5()` on the same UTF-8 bytes.

Cost model: ~64 rounds × ~6 numpy elementwise ops over the flattened
token batch ≈ 0.4 µs/token, vs ~20 µs/token for the interpreted HOF
chain it replaces (measured in BENCH.md §qualclf-kernel).

Public-domain algorithm (Rivest 1992, RFC 1321); implementation from the
RFC pseudocode, no third-party code.
"""

from __future__ import annotations

import math

import numpy as np

# per-round left-rotate amounts (RFC 1321 §3.4)
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4
    + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
# K[i] = floor(2^32 * |sin(i+1)|)
_K = np.array(
    [int(abs(math.sin(i + 1)) * 4294967296.0) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
_INIT = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476)


def md5_h60_batch(bufs: list[bytes]) -> np.ndarray:
    """int64 array: for each byte string, the integer value of the first
    15 hex chars of its md5 hex digest — exactly
    ``int(hashlib.md5(b).hexdigest()[:15], 16)``, i.e. Spark's
    ``conv(substring(md5(s),1,15),16,10)`` and DuckDB's
    ``('0x' || substr(md5(s),1,15))::bigint`` on the same bytes.
    Vectorized across the batch; per-message Python is limited to the
    padding-buffer fill (a memcpy per message)."""
    n = len(bufs)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter(map(len, bufs), count=n, dtype=np.int64)
    nb = (lens + 8) // 64 + 1  # 64-byte blocks after 0x80 + length pad
    maxb = int(nb.max())
    data = np.zeros((n, maxb * 64), dtype=np.uint8)
    for i, b in enumerate(bufs):
        ln = lens[i]
        data[i, :ln] = np.frombuffer(b, dtype=np.uint8)
        data[i, ln] = 0x80
    # 64-bit little-endian bit length in the last 8 bytes of each lane's
    # final block (vectorized byte-at-a-time scatter)
    bitlen = (lens * 8).astype(np.uint64)
    pos = nb * 64 - 8
    rows = np.arange(n)
    for k in range(8):
        data[rows, pos + k] = (
            (bitlen >> np.uint64(8 * k)) & np.uint64(0xFF)
        ).astype(np.uint8)
    words = data.view("<u4").reshape(n, maxb * 16)
    A = np.full(n, _INIT[0], dtype=np.uint32)
    B = np.full(n, _INIT[1], dtype=np.uint32)
    C = np.full(n, _INIT[2], dtype=np.uint32)
    D = np.full(n, _INIT[3], dtype=np.uint32)
    for j in range(maxb):
        a, b, c, d = A.copy(), B.copy(), C.copy(), D.copy()
        base = j * 16
        for i in range(64):
            if i < 16:
                f = (b & c) | (~b & d)
                g = i
            elif i < 32:
                f = (d & b) | (~d & c)
                g = (5 * i + 1) % 16
            elif i < 48:
                f = b ^ c ^ d
                g = (3 * i + 5) % 16
            else:
                f = c ^ (b | ~d)
                g = (7 * i) % 16
            # uint32 arithmetic wraps mod 2^32 — exactly MD5's model
            x = f + a + _K[i] + words[:, base + g]
            s = int(_S[i])
            a = d
            d = c
            c = b
            b = b + ((x << np.uint32(s)) | (x >> np.uint32(32 - s)))
        if j == 0:
            A, B, C, D = A + a, B + b, C + c, D + d
        else:
            # lanes whose message ended in an earlier block keep their
            # finished state; only still-active lanes absorb this block
            act = nb > j
            A = np.where(act, A + a, A)
            B = np.where(act, B + b, B)
            C = np.where(act, C + c, C)
            D = np.where(act, D + d, D)
    # digest byte order: A,B,C,D each little-endian; hex chars 1..15 are
    # digest bytes 0..6 plus the high nibble of byte 7
    v = A.astype(np.int64) & 0xFF
    for sh in (8, 16, 24):
        v = (v << 8) | ((A.astype(np.int64) >> sh) & 0xFF)
    for sh in (0, 8, 16):
        v = (v << 8) | ((B.astype(np.int64) >> sh) & 0xFF)
    v = (v << 4) | ((B.astype(np.int64) >> 28) & 0xF)
    return v


def hash60_batch(strs: list[str], seed: int) -> np.ndarray:
    """Vectorized twin of `operators.sampling.hash60` in portable mode:
    md5-h60 of ``s + chr(31) + str(seed)`` over UTF-8 bytes."""
    salt = ("\x1f" + str(seed)).encode()
    return md5_h60_batch([s.encode("utf-8") + salt for s in strs])
