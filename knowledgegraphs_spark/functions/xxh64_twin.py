"""Independent pure-Python XXH64 — the oracle twin of Spark's ``xxhash64``.

Written from the public XXH64 spec (public-domain reference algorithm),
independently of Spark's implementation, so it can serve as the value
oracle for the production MinHash hash family (``operators/dedup.py``):
DuckDB has no Spark-compatible ``xxhash64``, so the driver-level oracle
for the xxhash64 MinHash family inlines pairs computed with THIS twin at
oracle-build time (see ``__spark_entry__._d2b_sql``), and pytest asserts
the twin equals Spark hash-by-hash (``tests/test_training_ops.py``).

This module is oracle/test support — the production plan never calls it;
the engine's hot path uses the JVM ``F.xxhash64`` expression exclusively.
"""

from __future__ import annotations

import struct

_M64 = (1 << 64) - 1
_P1, _P2, _P3, _P4, _P5 = (
    0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
    0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int) -> int:
    """Standard XXH64 over ``data`` with ``seed`` (unsigned 64-bit out)."""
    n, i = len(data), 0

    def rd8(j):
        return int.from_bytes(data[j:j + 8], "little")

    def rd4(j):
        return int.from_bytes(data[j:j + 4], "little")

    if n >= 32:
        v1, v2 = (seed + _P1 + _P2) & _M64, (seed + _P2) & _M64
        v3, v4 = seed & _M64, (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = (_rotl((v1 + rd8(i) * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + rd8(i + 8) * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + rd8(i + 16) * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + rd8(i + 24) * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= (_rotl((rd8(i) * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (rd4(i) * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def spark_xxhash64_twin(i: int, s: str) -> int:
    """``F.xxhash64(lit(i), col)`` as an unsigned 64-bit int: seed 42, each
    argument's hash seeds the next; an int argument hashes as its 4
    little-endian bytes, a string as its UTF-8 bytes."""
    return xxh64(s.encode("utf-8"), xxh64(struct.pack("<i", i), 42))


def minhash_signature_twin(shingles: list[str], k: int) -> list[str]:
    """The xxhash64-family MinHash signature exactly as the JVM plan formats
    it (``operators/dedup.py:_salted_hashes``): per salt ``i``, the min
    over shingles of ``spark_xxhash64_twin(i, s)`` as 16-char zero-padded
    UPPERCASE hex (``F.lpad(F.hex(...), 16, '0')``)."""
    return [
        format(min(spark_xxhash64_twin(i, s) for s in shingles), "016X")
        for i in range(k)
    ]


def minhash_band_keys_twin(shingles: list[str], k: int, bands: int) -> list[str]:
    """Band keys as ``operators/dedup.py:minhash_band_keys`` emits them:
    md5 hex of the '|'-joined band slice of the signature."""
    import hashlib

    sig = minhash_signature_twin(shingles, k)
    rows = k // bands
    return [
        hashlib.md5("|".join(sig[b * rows:(b + 1) * rows]).encode()).hexdigest()
        for b in range(bands)
    ]
