"""Schema-checked readers.

The reference verifies every inserted record against the declared schema
(``Schema.verify``, ``db/table/Schema.java:45–64``); the Spark analog is
reading with an explicit ``StructType`` (never ``inferSchema`` at scale —
inference is an extra full pass) and failing fast on mismatch
(``mode=FAILFAST``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from cs186_query_optimization_project_spark.errors import DatabaseException


def read_parquet(spark: SparkSession, path: str,
                 expected_schema: T.StructType | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    if expected_schema is not None:
        _check_schema(df.schema, expected_schema, path)
    return df


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             header: bool = False, sep: str = ",") -> DataFrame:
    """CSV with a declared schema; malformed rows fail the job (the
    reference's insert-time verification, moved to read time)."""
    return (spark.read
            .option("header", header)
            .option("sep", sep)
            .option("mode", "FAILFAST")
            .schema(schema)
            .csv(path))


def read_json(spark: SparkSession, path: str,
              schema: T.StructType) -> DataFrame:
    return (spark.read.option("mode", "FAILFAST")
            .schema(schema).json(path))


def read_orc(spark: SparkSession, path: str,
             expected_schema: T.StructType | None = None) -> DataFrame:
    """ORC, the other columnar format a lake migration brings along.
    Self-describing like parquet (no declared schema needed to read), so
    verification is the parquet shape: read, then fail fast if the file's
    schema doesn't match the expectation."""
    df = spark.read.orc(path)
    if expected_schema is not None:
        _check_schema(df.schema, expected_schema, path)
    return df


def _check_schema(actual: T.StructType, expected: T.StructType,
                  path: str) -> None:
    a = [(f.name, f.dataType.simpleString()) for f in actual.fields]
    e = [(f.name, f.dataType.simpleString()) for f in expected.fields]
    if a != e:
        raise DatabaseException(
            f"schema mismatch for {path}: expected {e}, found {a}")


def read_text(spark: SparkSession, path: str,
              column: str = "value") -> DataFrame:
    """Line-delimited raw text (one row per line, single string column)
    — the rawest ingestion format a corpus arrives in (log shards, WET
    extracts).  No schema to check: the contract IS one string column;
    downstream parsing is the query's job."""
    df = spark.read.text(path)
    return df.withColumnRenamed("value", column) if column != "value" else df
