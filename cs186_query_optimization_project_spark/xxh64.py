"""Driver-side xxHash64 matching Spark SQL's ``xxhash64`` expression.

Pure-Python implementation of the public XXH64 algorithm (Yann Collet's
xxHash, BSD — the reference spec at github.com/Cyan4973/xxHash) with the
per-type framing Spark's ``XxHash64`` expression applies (one value at a
time, the running hash threading through as the next value's seed,
stream seed 42):

- integral 32-bit-or-narrower types (int/short/byte/boolean/date) hash
  their int value through the 4-byte finalizer,
- longs hash through the 8-byte finalizer,
- strings hash their UTF-8 bytes through the full streaming algorithm.

Why this exists: the per-directory Bloom indexes (``partitioned.py``)
store positions computed JVM-side with ``F.xxhash64(col, lit(seed))``.
A point lookup used to launch a 1-row Spark job just to replay that
hash for the probe value; replicating the hash here makes
``read_point`` zero-Spark-jobs before the pruned scan.  Correctness is
pinned by a differential test hashing thousands of values through BOTH
implementations (``tests/test_xxh64.py``) — any divergence from the
JVM would produce wrong skips, so the probe helpers return ``None``
(caller falls back to the JVM path) for any type not covered by that
test.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import types as T

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1

#: Spark's XxHash64 expression seed (`XxHash64(children, 42L)`).
SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    """XXH64 of one 64-bit value (Spark hashes LongType this way)."""
    inp = value & _M64
    h = (seed + _P5 + 8) & _M64
    k1 = (_rotl((inp * _P2) & _M64, 31) * _P1) & _M64
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """XXH64 of one 32-bit value (int/short/byte/boolean/date)."""
    inp = value & 0xFFFFFFFF
    h = (seed + _P5 + 4) & _M64
    h ^= (inp * _P1) & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte string (Spark hashes StringType's
    UTF-8 bytes this way)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            k = int.from_bytes(data[i:i + 8], "little")
            v1 = (_rotl((v1 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[i + 8:i + 16], "little")
            v2 = (_rotl((v2 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[i + 16:i + 24], "little")
            v3 = (_rotl((v3 + k * _P2) & _M64, 31) * _P1) & _M64
            k = int.from_bytes(data[i + 24:i + 32], "little")
            v4 = (_rotl((v4 + k * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i:i + 4], "little")
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _fmix(h)


def _hash_typed(value, dtype: T.DataType, seed: int) -> int | None:
    """One Spark-framed hash step for ``value`` AS ``dtype``, or None
    when (type, value) is outside the differentially-tested surface —
    the caller must fall back to the JVM.  The value's Python type
    must already BE the column type's (no driver-side cast
    re-implementation: a mismatched probe takes the JVM path, which
    applies Spark's own cast)."""
    if isinstance(dtype, T.BooleanType):
        if isinstance(value, bool):
            return hash_int(1 if value else 0, seed)
        return None
    if isinstance(dtype, T.LongType):
        if isinstance(value, int) and not isinstance(value, bool) \
                and -(1 << 63) <= value < (1 << 63):
            return hash_long(value, seed)
        return None
    if isinstance(dtype, (T.IntegerType, T.ShortType, T.ByteType)):
        bits = {T.IntegerType: 31, T.ShortType: 15, T.ByteType: 7}[
            type(dtype)]
        if isinstance(value, int) and not isinstance(value, bool) \
                and -(1 << bits) <= value < (1 << bits):
            return hash_int(value, seed)
        return None
    if isinstance(dtype, T.StringType):
        if isinstance(value, str):
            return hash_bytes(value.encode("utf-8"), seed)
        return None
    if isinstance(dtype, T.DateType):
        if type(value) is _dt.date:
            days = (value - _dt.date(1970, 1, 1)).days
            return hash_int(days, seed)
        return None
    return None


def to_signed(h: int) -> int:
    """The unsigned 64-bit hash as Spark's signed long."""
    return h - (1 << 64) if h >= (1 << 63) else h


def native_match(value, dtype: T.DataType) -> bool:
    """True when ``value``'s Python type IS ``dtype``'s native type
    (and in range), i.e. no cast would change it — the precondition
    for every driver-side replay here."""
    return _hash_typed(value, dtype, 0) is not None


def xxhash64_typed(value, dtype: T.DataType,
                   salt: int | None = None) -> int | None:
    """Replay ``F.xxhash64(col)`` / ``F.xxhash64(col, lit(salt))`` for
    one probe value driver-side: stream seed 42, the value's hash
    seeding the (IntegerType) salt literal's — exactly the expression
    the Bloom writers evaluate.  Signed, like the JVM result.  None =
    unsupported (type, value): fall back to a JVM evaluation."""
    h = _hash_typed(value, dtype, SPARK_SEED)
    if h is None:
        return None
    if salt is not None:
        h = hash_int(salt, h)
    return to_signed(h)
