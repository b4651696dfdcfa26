"""Pure-Python SipHash-2-4 (Aumasson & Bernstein, "SipHash: a fast
short-input PRF", 2012 — public reference algorithm).

Exact parity target for the reference's ``hash`` / ``hash.sip`` builtins
(/root/reference/expr/builtins/hash_and_encode.go:25, backed by a
SipHash-2-4 library with key (0, 1)) and its file/index partitioners
(key (456729, 1111581582): datasource/files/filesource.go:49,
datasource/memdb/index.go:28, datasource/sqlite/conn.go:326).

This is deliberately the SLOW exact path (Arrow-batched pandas UDF when
used from the SQL dialect). For scale pipelines that only need a stable
64-bit hash, prefer the JVM-native ``hash.xx64`` (xxhash64) builtin —
same distributional properties, whole-stage codegen, no Python.
"""

from __future__ import annotations

import struct

_MASK = 0xFFFFFFFFFFFFFFFF


def siphash24(k0: int, k1: int, data: bytes) -> int:
    """SipHash-2-4 of ``data`` under 128-bit key (k0, k1); returns uint64."""
    v0 = k0 ^ 0x736F6D6570736575
    v1 = k1 ^ 0x646F72616E646F6D
    v2 = k0 ^ 0x6C7967656E657261
    v3 = k1 ^ 0x7465646279746573

    def rotl(x: int, b: int) -> int:
        return ((x << b) | (x >> (64 - b))) & _MASK

    def sipround(v0: int, v1: int, v2: int, v3: int):
        v0 = (v0 + v1) & _MASK
        v1 = rotl(v1, 13) ^ v0
        v0 = rotl(v0, 32)
        v2 = (v2 + v3) & _MASK
        v3 = rotl(v3, 16) ^ v2
        v0 = (v0 + v3) & _MASK
        v3 = rotl(v3, 21) ^ v0
        v2 = (v2 + v1) & _MASK
        v1 = rotl(v1, 17) ^ v2
        v2 = rotl(v2, 32)
        return v0, v1, v2, v3

    n = len(data) - (len(data) % 8)
    for off in range(0, n, 8):
        m = struct.unpack_from("<Q", data, off)[0]
        v3 ^= m
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
        v0 ^= m
    m = (len(data) & 0xFF) << 56
    for j, ch in enumerate(data[n:]):
        m |= ch << (8 * j)
    v3 ^= m
    v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
    v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
    v0 ^= m
    v2 ^= 0xFF
    for _ in range(4):
        v0, v1, v2, v3 = sipround(v0, v1, v2, v3)
    return (v0 ^ v1 ^ v2 ^ v3) & _MASK


def siphash24_i64(k0: int, k1: int, data: bytes) -> int:
    """Signed-int64 view of siphash24 — matches Go's int64(hash) cast."""
    h = siphash24(k0, k1, data)
    return h - (1 << 64) if h >= (1 << 63) else h
