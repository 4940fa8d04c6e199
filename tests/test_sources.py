"""Sources & sinks: schema-checked CSV/JSON readers, indexed (sorted)
writes with file pruning, bucketed tables with shuffle-free joins."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cs186_query_optimization_project_spark.errors import DatabaseException
from cs186_query_optimization_project_spark.sources import readers, writers


def test_csv_roundtrip(spark, tmp_path):
    p = tmp_path / "people.csv"
    p.write_text("1,alice,3.5\n2,bob,2.75\n")
    schema = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("gpa", T.DoubleType()),
    ])
    df = readers.read_csv(spark, str(p), schema)
    rows = sorted((r["id"], r["name"], r["gpa"]) for r in df.collect())
    assert rows == [(1, "alice", 3.5), (2, "bob", 2.75)]


def test_json_reader(spark, tmp_path):
    p = tmp_path / "d.json"
    p.write_text('{"id": 1, "tag": "x"}\n{"id": 2, "tag": "y"}\n')
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("tag", T.StringType())])
    df = readers.read_json(spark, str(p), schema)
    assert df.count() == 2


def test_parquet_schema_check(spark, db, tmp_path):
    region = db.table("region")
    out = str(tmp_path / "r.parquet")
    region.write.parquet(out)
    readers.read_parquet(spark, out, region.schema)  # ok
    wrong = T.StructType([T.StructField("nope", T.IntegerType())])
    with pytest.raises(DatabaseException, match="schema mismatch"):
        readers.read_parquet(spark, out, wrong)


def test_write_indexed_prunes_files(spark, db, tmp_path):
    out = str(tmp_path / "orders_by_key")
    writers.write_indexed(db.table("orders"), out, ("o_orderkey",),
                          num_files=8)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 8
    df = spark.read.parquet(out).filter(F.col("o_orderkey") < 100)
    # range-partitioned + sorted → only 1 of 8 files holds keys < 100;
    # parquet row-group stats let Spark skip the rest at scan time
    n_all = spark.read.parquet(out).count()
    assert df.count() < n_all
    got = sorted(r["o_orderkey"] for r in df.collect())
    want = sorted(r["o_orderkey"] for r in
                  db.table("orders").filter(F.col("o_orderkey") < 100)
                  .collect())
    assert got == want


def test_write_bucketed_join_no_shuffle(spark, db):
    import shutil

    # the in-memory catalog forgets managed tables between sessions but
    # their warehouse dirs persist — clear both layers
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"/tmp/spark_graft_warehouse/{t}", ignore_errors=True)
    writers.write_bucketed(db.table("orders"), "b_orders",
                           ("o_orderkey",), num_buckets=4)
    writers.write_bucketed(
        db.table("lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ("o_orderkey",), num_buckets=4)
    a = spark.table("b_orders")
    b = spark.table("b_lineitem").select("o_orderkey", "l_quantity")
    joined = a.join(b, "o_orderkey").hint("merge")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # bucketed-on-join-key tables sort-merge join without an Exchange
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert joined.count() > 0


def test_vanilla_session_database(spark, tmp_path):
    """Database must work on ANY SparkSession handed to it — it sets its
    own compat confs rather than requiring get_spark()'s configured
    session (the driver harness builds a vanilla one)."""
    from cs186_query_optimization_project_spark.database import Database

    # simulate a vanilla session: unset the conf, then let Database set it
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        db = Database(spark, "/root/testdata/sf0.001")
        assert spark.conf.get(
            "spark.sql.legacy.parquet.nanosAsLong") == "true"
        assert db.query("region").execute().count() == 5
        # events carries the timestamp column (micros, read natively;
        # the conf only matters for legacy TIMESTAMP(NANOS) files)
        assert db.table("events").count() == 1000
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_lazy_registration_isolates_bad_table(spark, tmp_path):
    """One poisoned parquet in the data dir fails only its own table's
    queries, not unrelated ones (lazy per-table resolution)."""
    import shutil

    from cs186_query_optimization_project_spark.database import Database
    from cs186_query_optimization_project_spark.errors import (
        DatabaseException)

    d = tmp_path / "data"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/region.parquet",
                d / "region.parquet")
    (d / "poisoned.parquet").write_bytes(b"this is not parquet at all")
    db = Database(spark, str(d))
    # registration itself must not throw, and good tables must work
    assert sorted(db.table_names()) == ["poisoned", "region"]
    assert db.query("region").execute().count() == 5
    # pinned: the loader must surface an ENGINE error naming the table,
    # not a raw Py4J stack (and not pass via some unrelated exception)
    with pytest.raises(DatabaseException, match="poisoned"):
        db.table("poisoned").count()


def test_timestamp_read_matches_duckdb(spark):
    """events.ts must come back as a microsecond timestamp type whose
    values equal DuckDB's read of the same file.  Current testdata is
    TIMESTAMP(MICROS) → TIMESTAMP_NTZ natively (naive wall time, same as
    DuckDB); a legacy TIMESTAMP(NANOS) file would take the
    nanosAsLong+restore path and land on TIMESTAMP instead."""
    import duckdb

    from cs186_query_optimization_project_spark.database import Database

    db = Database(spark, "/root/testdata/sf0.001")
    got = db.table("events").select("event_id", "ts")
    assert got.schema["ts"].dataType.typeName() in (
        "timestamp", "timestamp_ntz")
    spark_rows = {r["event_id"]: r["ts"] for r in got.limit(50).collect()}
    ids = ",".join(str(i) for i in spark_rows)
    duck = duckdb.sql(
        "SELECT event_id, ts FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet') "
        f"WHERE event_id IN ({ids})").fetchall()
    for event_id, ts in duck:
        assert spark_rows[event_id] == ts, (
            event_id, spark_rows[event_id], ts)


def test_zordered_write_prunes_on_both_columns(db, tmp_path):
    """Row-group min/max stats must be narrow on BOTH z-ordered columns:
    a probe on either column may touch only a fraction of the files,
    whereas a lexicographic sort leaves the trailing column full-width
    in every file."""
    import glob

    import pyarrow.parquet as pq

    from cs186_query_optimization_project_spark.sources import writers

    li = db.table("lineitem")
    zpath, ppath = str(tmp_path / "z"), str(tmp_path / "p")
    writers.write_zordered(li, zpath, ("l_partkey", "l_suppkey"),
                           num_files=16)
    writers.write_indexed(li, ppath, ("l_partkey",), num_files=16)

    def files_hit(path, col, probes):
        files = sorted(glob.glob(path + "/*.parquet"))
        hit = 0
        for v in probes:
            for f in files:
                md = pq.ParquetFile(f).metadata
                for rg in range(md.num_row_groups):
                    stats = {
                        md.row_group(rg).column(i).path_in_schema:
                        md.row_group(rg).column(i).statistics
                        for i in range(md.row_group(rg).num_columns)}
                    s = stats[col]
                    if s.min <= v <= s.max:
                        hit += 1
                        break
        return hit, len(files) * len(probes)

    def probes_for(col):
        lo, hi = li.agg(F.min(col), F.max(col)).first()
        return sorted({lo + (hi - lo) * i // 5 for i in range(1, 5)})

    supp_probes, part_probes = probes_for("l_suppkey"), probes_for("l_partkey")
    z_supp, total = files_hit(zpath, "l_suppkey", supp_probes)
    p_supp, _ = files_hit(ppath, "l_suppkey", supp_probes)
    z_part, total_part = files_hit(zpath, "l_partkey", part_probes)
    assert p_supp == total            # trailing column: no pruning at all
    assert z_supp < total // 2        # z-order: most files skipped
    assert z_part < total_part // 2   # ...on the leading column too
    # and the data round-trips
    assert (db.spark.read.parquet(zpath).count() == li.count())


def test_compact_table_reduces_files_preserves_rows(spark, tmp_path):
    from cs186_query_optimization_project_spark.sources import writers
    from tests.conftest import SF_DIR

    path = str(tmp_path / "orders")
    orig = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    orig.repartition(37).write.parquet(path)
    before, after = writers.compact_table(
        spark, path, target_file_bytes=512 << 20,
        sort_by=("o_orderkey",))
    assert before == 37 and after < 5
    got = spark.read.parquet(path)
    assert got.count() == orig.count()
    # compaction re-clustered: the key filter prunes to one file's rows
    assert (got.filter("o_orderkey = 1").count()
            == orig.filter("o_orderkey = 1").count())
