"""Pure-Python XXH64 — an INDEPENDENT reimplementation of the public
xxHash algorithm (Cyan4973/xxHash, BSD), used to generate golden oracle
files for the hash-based dedup operators without touching Spark.

Spark's ``F.xxhash64(stringCol, seed)`` hashes the UTF-8 bytes of the
string with XXH64 and returns the result as a SIGNED 64-bit long;
``xxh64_signed`` matches that contract (verified against Spark in
tests/test_golden_oracles.py).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64 of ``data`` with ``seed``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_int(v: int, seed: int) -> int:
    """XXH64 of one 32-bit int with ``seed`` (Spark's per-child step for
    IntegerType inputs)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((v & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_long(v: int, seed: int) -> int:
    """XXH64 of one 64-bit long with ``seed`` (Spark's per-child step for
    LongType inputs)."""
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl(((v & _M) * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_signed(s: str, seed: int = 42) -> int:
    """Signed-long XXH64 of a string's UTF-8 bytes — Spark's single-arg
    ``F.xxhash64(col)`` contract (seed 42)."""
    return _signed(xxh64(s.encode("utf-8"), seed))


def spark_xxhash64_str_int(s: str, int_lit: int) -> int:
    """Replicates Spark's ``F.xxhash64(stringCol, F.lit(i))``: children
    are hashed in a CHAIN (each child's hash seeds the next), starting
    from the default seed 42 — the int literal is a hashed child, NOT
    the seed (verified against Spark in tests/test_golden_oracles.py)."""
    return _signed(hash_int(int_lit, xxh64(s.encode("utf-8"), 42)))
