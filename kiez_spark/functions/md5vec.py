"""Vectorized single-block MD5 over sliding byte windows (numpy).

Worker-side twin of ``functions.text.token_hash`` for the winnowing
kernel tier: computes the 60-bit token hash (first 15 hex digits of the
md5 digest, i.e. ``int.from_bytes(digest[:8], "big") >> 4``) of EVERY
k-byte sliding window of a byte buffer in one vectorized pass — the
per-gram ``hashlib.md5`` loop costs ~0.7 µs/gram in call overhead alone,
while this runs the 64 MD5 rounds as in-place uint32 array ops on
L2-resident chunks (~5.8 Mgrams/s/core measured, ~4x hashlib).

Bit-exactness: MD5 is computed by the book (RFC 1321) for messages of
k <= 55 bytes (single 64-byte block: data, 0x80 pad, zero fill, 64-bit
little-endian bit length in bytes 56-57 — k <= 55 keeps the length
inside two bytes and the pad inside one block). Parity-tested against
``hashlib.md5`` over random bytes for k in 5..55, and end-to-end against
the pure-Python winnowing reference (see tests/test_winnowing.py).

Unsigned uint32 arithmetic wraps naturally in numpy — no masking needed.
"""

from __future__ import annotations

import numpy as np

_S = [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4
_K = [int(abs(np.sin(i + 1)) * 2**32) & 0xFFFFFFFF for i in range(64)]
_G = (
    list(range(16))
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)]
)

# 64k-window chunks: 22 live uint32 arrays x 256 KB = ~5.6 MB working
# set, L2/L3-resident on any modern core (measured fastest of 16k-128k)
_CHUNK = 1 << 16


def _schedule_and_rounds(byte_col, k: int, n: int, scratch) -> np.ndarray:
    """One chunk of single-block MD5s: build the 16-word message schedule
    for n k-byte messages (``byte_col(p)`` yields byte p of every message
    as a uint8 view of length n), run the 64 rounds, return the 60-bit
    token-hash convention as int64[n]."""
    pool, fv0, tv0, M, w32 = scratch
    # message schedule: 16 little-endian words per message — data bytes,
    # the 0x80 pad at byte k, bit length 8k at bytes 56-57
    for j in range(16):
        w = M[j][:n]
        w[:] = 0
        for i in range(4):
            p = 4 * j + i
            if p < k:
                src = w32[:n]
                src[:] = byte_col(p)
                np.left_shift(src, np.uint32(8 * i), out=src)
                np.bitwise_or(w, src, out=w)
            elif p == k:
                np.bitwise_or(w, np.uint32(0x80 << (8 * i)), out=w)
            elif p in (56, 57):
                byte = ((8 * k) >> (8 * (p - 56))) & 0xFF
                if byte:
                    np.bitwise_or(w, np.uint32(byte << (8 * i)), out=w)
    a, b, c, d = (p_[:n] for p_ in pool)
    a[:] = 0x67452301
    b[:] = 0xEFCDAB89
    c[:] = 0x98BADCFE
    d[:] = 0x10325476
    fv = fv0[:n]
    tv = tv0[:n]
    for i in range(64):
        if i < 16:
            np.bitwise_and(b, c, out=fv)
            np.invert(b, out=tv)
            np.bitwise_and(tv, d, out=tv)
            np.bitwise_or(fv, tv, out=fv)
        elif i < 32:
            np.bitwise_and(d, b, out=fv)
            np.invert(d, out=tv)
            np.bitwise_and(tv, c, out=tv)
            np.bitwise_or(fv, tv, out=fv)
        elif i < 48:
            np.bitwise_xor(b, c, out=fv)
            np.bitwise_xor(fv, d, out=fv)
        else:
            np.invert(d, out=fv)
            np.bitwise_or(b, fv, out=fv)
            np.bitwise_xor(c, fv, out=fv)
        np.add(fv, a, out=fv)
        fv += np.uint32(_K[i])
        np.add(fv, M[_G[i]][:n], out=fv)
        s = np.uint32(_S[i])
        np.left_shift(fv, s, out=tv)
        np.right_shift(fv, np.uint32(32) - s, out=fv)
        np.bitwise_or(tv, fv, out=tv)  # tv = rotl(F, s)
        newb = a  # old a's storage is free after F consumed it
        np.add(b, tv, out=newb)
        a, b, c, d = d, newb, b, c
    # token_hash convention: first 8 digest bytes big-endian, >> 4.
    # digest bytes 0-7 are words a,b little-endian, so byteswap each
    # word and pack (a_swapped << 32) | b_swapped.
    hi = (a + np.uint32(0x67452301)).byteswap().astype(np.uint64)
    lob = (b + np.uint32(0xEFCDAB89)).byteswap().astype(np.uint64)
    np.left_shift(hi, np.uint64(32), out=hi)
    np.bitwise_or(hi, lob, out=hi)
    np.right_shift(hi, np.uint64(4), out=hi)
    return hi.astype(np.int64)


def _scratch(chunk: int):
    return (
        [np.empty(chunk, np.uint32) for _ in range(4)],
        np.empty(chunk, np.uint32),
        np.empty(chunk, np.uint32),
        [np.empty(chunk, np.uint32) for _ in range(16)],
        np.empty(chunk, np.uint32),
    )


def md5_windows_60bit(u8: np.ndarray, k: int, chunk: int = _CHUNK) -> np.ndarray:
    """int64[n-k+1] of 60-bit md5 hashes of every k-byte window of u8."""
    if not 1 <= k <= 55:
        raise ValueError(f"single-block MD5 path requires 1 <= k <= 55, got {k}")
    n_total = len(u8) - k + 1
    if n_total <= 0:
        return np.empty(0, np.int64)
    chunk = min(chunk, n_total)
    scratch = _scratch(chunk)
    out = np.empty(n_total, np.int64)
    for lo in range(0, n_total, chunk):
        n = min(chunk, n_total - lo)
        out[lo : lo + n] = _schedule_and_rounds(
            lambda p: u8[lo + p : lo + p + n], k, n, scratch
        )
    return out


def md5_rows_60bit(mat: np.ndarray, chunk: int = _CHUNK) -> np.ndarray:
    """int64[n] of 60-bit md5 hashes of every ROW of an (n, L) uint8
    matrix, L <= 55 — the variable-length companion of
    ``md5_windows_60bit``: callers group byte segments by length and hash
    each group's stacked matrix in one vectorized pass (the shingle
    kernel in operators/dedup.py)."""
    n_total, L = mat.shape
    if not 1 <= L <= 55:
        raise ValueError(f"single-block MD5 path requires 1 <= L <= 55, got {L}")
    if n_total == 0:
        return np.empty(0, np.int64)
    chunk = min(chunk, n_total)
    scratch = _scratch(chunk)
    out = np.empty(n_total, np.int64)
    for lo in range(0, n_total, chunk):
        n = min(chunk, n_total - lo)
        out[lo : lo + n] = _schedule_and_rounds(
            lambda p: mat[lo : lo + n, p], L, n, scratch
        )
    return out
