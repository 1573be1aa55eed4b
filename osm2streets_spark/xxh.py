"""Pure-Python XXH64 matching Spark's `xxhash64(...)` expression.

Spark hashes each argument in sequence, seeding each step with the
previous result (initial seed 42): longs via the 8-byte specialization,
strings via XXH64 over their UTF-8 bytes. The XXH64 algorithm itself is
public (Yann Collet, BSD). Used by the single-node sequential replay
(plans/sequential.py) so its road/intersection ids — and therefore the
order-sensitive collapse kernels — are bit-identical with the
distributed path.
"""

from __future__ import annotations

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def _hash_long(value: int, seed: int) -> int:
    """XXH64 of one 64-bit integer (Spark XxHash64.hashLong)."""
    hash_ = (seed + P5 + 8) & M
    k1 = (value & M) * P2 & M
    k1 = _rotl(k1, 31)
    k1 = (k1 * P1) & M
    hash_ ^= k1
    hash_ = ((_rotl(hash_, 27) * P1) + P4) & M
    return _fmix(hash_)


def _hash_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte buffer."""
    n = len(data)
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        i = 0
        while i <= n - 32:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                v = (v + lane * P2) & M
                v = (_rotl(v, 31) * P1) & M
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            k = (v * P2) & M
            k = (_rotl(k, 31) * P1) & M
            h ^= k
            h = ((h * P1) + P4) & M
    else:
        h = (seed + P5) & M
        i = 0
    h = (h + n) & M
    while i <= n - 8:
        k = int.from_bytes(data[i:i + 8], "little")
        k = (k * P2) & M
        k = (_rotl(k, 31) * P1) & M
        h ^= k
        h = ((_rotl(h, 27) * P1) + P4) & M
        i += 8
    if i <= n - 4:
        k = int.from_bytes(data[i:i + 4], "little")
        h ^= (k * P1) & M
        h = ((_rotl(h, 23) * P2) + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64(*args) -> int:
    """Spark-compatible xxhash64 over longs and strings (signed int64)."""
    h = 42
    for a in args:
        if a is None:
            continue
        if isinstance(a, str):
            h = _hash_bytes(a.encode("utf-8"), h)
        else:
            h = _hash_long(int(a), h)
    return _signed(h)
