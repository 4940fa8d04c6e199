"""Shared pytest fixtures: one SparkSession per test session, and a
Database registered over the smallest driver testdata (sf0.001)."""

from __future__ import annotations

import math

import pytest

from cs186_query_optimization_project_spark import Database, get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_001 = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: spawns a second Spark driver process")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="cs186-tests")
    # SPARK_GRAFT_METAIO=hadoop reruns the whole suite with ALL
    # lakehouse metadata I/O routed through the Hadoop-FS backend (the
    # cluster deployment configuration) — proving the two backends are
    # semantically interchangeable, not just contract-compatible:
    #   SPARK_GRAFT_METAIO=hadoop python -m pytest tests/ -q
    import os
    if os.environ.get("SPARK_GRAFT_METAIO") == "hadoop":
        from cs186_query_optimization_project_spark import metaio
        metaio.use_hadoop_io(spark)
    yield spark


@pytest.fixture(scope="session")
def db(spark):
    return Database(spark, SF_DIR)


def rows(df, ndigits: int = 4):
    """Collect a DataFrame to an order-insensitive, float-rounded list of
    tuples for comparison."""
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, ndigits)
        return v

    out = [tuple(norm(v) for v in r) for r in df.collect()]
    return sorted(out, key=repr)


def duck_rows(sql: str, sf_dir: str = SF_DIR, ndigits: int = 4):
    """Run ANSI SQL on the same parquet via DuckDB (the oracle) and return
    comparable rows."""
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    res = con.execute(sql).fetchall()
    con.close()

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, ndigits)
        if hasattr(v, "timestamp") and not isinstance(v, str):
            return v
        return v

    return sorted([tuple(norm(v) for v in r) for r in res], key=repr)
