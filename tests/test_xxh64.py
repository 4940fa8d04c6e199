"""Driver-side XXH64 (xxh64.py) must replay Spark's ``xxhash64``
expression BIT-FOR-BIT — a divergence would make the Bloom point
lookups skip directories that hold the value (wrong results, not just
wrong I/O).  Differential over every supported type, all bloom salts,
plus the unsupported-type fallback contract."""

from __future__ import annotations

import datetime
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cs186_query_optimization_project_spark import xxh64


def _jvm(spark, vals, dtype, salt):
    df = spark.createDataFrame(
        [(v,) for v in vals], T.StructType([T.StructField("v", dtype)]))
    col = F.xxhash64("v") if salt is None else \
        F.xxhash64("v", F.lit(salt))
    return [r[0] for r in df.select(col).collect()]


def test_reference_vectors():
    # the published xxHash test vectors (seed 0)
    assert xxh64.hash_bytes(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64.hash_bytes(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert xxh64.hash_bytes(b"abc", 0) == 0x44BC2CF5AD770999


def test_differential_against_jvm(spark):
    random.seed(7)
    epoch = datetime.date(1970, 1, 1)
    cases = [
        ([0, 1, -1, 42, 2**63 - 1, -2**63]
         + [random.randint(-2**63, 2**63 - 1) for _ in range(60)],
         T.LongType()),
        ([0, 1, -1, 2**31 - 1, -2**31]
         + [random.randint(-2**31, 2**31 - 1) for _ in range(60)],
         T.IntegerType()),
        ([0, -5, 32767, -32768], T.ShortType()),
        ([0, -128, 127], T.ByteType()),
        (["", "a", "abc", "abcdefgh", "x" * 31, "x" * 32, "x" * 33,
          "x" * 100, "héllo wörld", "日本語テキスト"]
         + ["".join(random.choice("abcDEF012 _%-é")
                    for _ in range(random.randint(0, 64)))
            for _ in range(60)],
         T.StringType()),
        ([True, False], T.BooleanType()),
        ([epoch, datetime.date(2026, 8, 15), datetime.date(1900, 1, 1)]
         + [epoch + datetime.timedelta(
                days=random.randint(-30000, 30000))
            for _ in range(20)],
         T.DateType()),
    ]
    for salt in (None, 0, 3):
        for vals, dtype in cases:
            got = [xxh64.xxhash64_typed(v, dtype, salt) for v in vals]
            want = _jvm(spark, vals, dtype, salt)
            assert got == want, (dtype, salt)


def test_unsupported_returns_none_for_fallback():
    # a mismatched or uncovered (type, value) must hand off to the JVM
    assert xxh64.xxhash64_typed(5.0, T.LongType()) is None
    assert xxh64.xxhash64_typed("5", T.LongType()) is None
    assert xxh64.xxhash64_typed(True, T.LongType()) is None
    assert xxh64.xxhash64_typed(2**63, T.LongType()) is None
    assert xxh64.xxhash64_typed(2**31, T.IntegerType()) is None
    assert xxh64.xxhash64_typed(1.5, T.DoubleType()) is None
    assert xxh64.xxhash64_typed(b"x", T.BinaryType()) is None
    assert xxh64.xxhash64_typed(
        datetime.datetime(2026, 1, 1), T.DateType()) is None
    assert not xxh64.native_match(5, T.StringType())
    assert xxh64.native_match("5", T.StringType())
    assert xxh64.native_match(5, T.LongType())
