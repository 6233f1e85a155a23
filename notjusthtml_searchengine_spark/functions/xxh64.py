"""Pure-Python XXH64, bit-compatible with Spark's ``xxhash64``.

Spark's ``F.xxhash64(col)`` hashes the UTF-8 bytes of a string with
the standard XXH64 algorithm at seed 42 and returns a *signed* 64-bit
long. The engine uses ``xxhash64(url_norm)`` as its deterministic
surrogate id / bucket key / tie-break everywhere (SURVEY.md §2.5 W1),
so the Python reference simulator and the checkpoint layer need a
bit-identical implementation. Verified against Spark in
tests/test_xxh64.py.

Public XXH64 spec: https://github.com/Cyan4973/xxHash (BSD).
No code is copied from the reference repo (it does not contain an
xxhash implementation).
"""

from __future__ import annotations

MASK64 = 0xFFFFFFFFFFFFFFFF
PRIME64_1 = 0x9E3779B185EBCA87
PRIME64_2 = 0xC2B2AE3D27D4EB4F
PRIME64_3 = 0x165667B19E3779F9
PRIME64_4 = 0x85EBCA77C2B2AE63
PRIME64_5 = 0x27D4EB2F165667C5

SPARK_SEED = 42  # org.apache.spark.sql.catalyst.expressions.XxHash64 default


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * PRIME64_2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * PRIME64_1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * PRIME64_1 + PRIME64_4) & MASK64


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` → unsigned 64-bit int."""
    n = len(data)
    if n >= 32:
        v1 = (seed + PRIME64_1 + PRIME64_2) & MASK64
        v2 = (seed + PRIME64_2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - PRIME64_1) & MASK64
        i = 0
        limit = n - 32
        while i <= limit:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + PRIME64_5) & MASK64
        i = 0

    h = (h + n) & MASK64

    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * PRIME64_1 + PRIME64_4) & MASK64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * PRIME64_1) & MASK64
        h = (_rotl(h, 23) * PRIME64_2 + PRIME64_3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * PRIME64_5) & MASK64
        h = (_rotl(h, 11) * PRIME64_1) & MASK64
        i += 1

    h ^= h >> 33
    h = (h * PRIME64_2) & MASK64
    h ^= h >> 29
    h = (h * PRIME64_3) & MASK64
    h ^= h >> 32
    return h


def to_signed64(x: int) -> int:
    """Unsigned → two's-complement signed 64-bit (Spark LongType)."""
    return x - (1 << 64) if x >= (1 << 63) else x


def xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Spark-compatible ``xxhash64(string_col)``: signed 64-bit."""
    return to_signed64(xxh64(s.encode("utf-8"), seed))
