"""Pure-Python XXH64 (public xxHash spec, github.com/Cyan4973/xxHash
doc/xxhash_spec.md) — used by the fixture generator to reproduce Spark's
``F.xxhash64`` deterministic entity ids WITHOUT running Spark, so the
entity-graph golden is an independent single-process oracle.

Spark semantics (documented public behavior of the xxhash64 expression):
strings hash as their UTF-8 bytes with seed 42; multi-argument calls
chain — each argument's hash becomes the seed for the next.
"""

from __future__ import annotations

_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 of ``data`` with ``seed`` -> uint64."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h ^ k, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M), 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64_strings(*args: str, seed: int = 42) -> int:
    """Spark ``F.xxhash64(lit(a), lit(b), ...)`` on string columns:
    chained XXH64 over UTF-8 bytes, previous hash = next seed. Returns
    the SIGNED int64 Spark produces."""
    h = seed
    for a in args:
        h = xxh64(a.encode("utf-8"), h)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_entity_id(entity_type: str, cache_key: str) -> str:
    """The engine's deterministic entity id (upsert.find_or_create):
    ``<type lower>-<lower hex of xxhash64(entity_type, cache_key)>``.
    Spark's ``hex`` of a signed long prints the unsigned 64-bit value."""
    h = spark_xxhash64_strings(entity_type, cache_key) & _M
    return f"{entity_type.lower()}-{h:x}"
