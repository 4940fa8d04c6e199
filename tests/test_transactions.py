"""Optimistic snapshot transactions (§2.12 analog): snapshot reads,
read-your-writes, first-committer-wins conflict detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark import Database
from cs186_query_optimization_project_spark.errors import (
    ConflictException,
    DatabaseException,
)
from tests.conftest import SF_DIR


@pytest.fixture
def mdb(spark, tmp_path):
    """A Database with a private, writable copy of nation."""
    db = Database(spark, SF_DIR)
    out = Database(spark)
    out.create_table("nation", db.table("nation"),
                     str(tmp_path / "nation"))
    return out


def test_snapshot_read_ignores_concurrent_writes(mdb):
    txn = mdb.begin()
    before = txn.table("nation").count()
    mdb.delete_rows("nation", F.col("n_regionkey") == 0)
    assert txn.table("nation").count() == before          # pinned snapshot
    assert mdb.table("nation").count() < before           # world moved on


def test_read_your_writes_and_isolation_until_commit(mdb, spark):
    txn = mdb.begin()
    txn.insert_rows("nation", spark.createDataFrame(
        [(100, "ATLANTIS", 0)], schema=mdb.schema("nation")))
    txn.update_rows("nation", F.col("n_nationkey") == 100,
                    {"n_name": "SUNKEN"})
    got = txn.table("nation").filter(F.col("n_nationkey") == 100).collect()
    assert [r.n_name for r in got] == ["SUNKEN"]          # sees own writes
    assert mdb.table("nation").filter(
        F.col("n_nationkey") == 100).count() == 0         # others don't
    txn.commit()
    assert mdb.table("nation").filter(
        F.col("n_nationkey") == 100).count() == 1         # published


def test_first_committer_wins(mdb):
    t1, t2 = mdb.begin(), mdb.begin()
    t1.delete_rows("nation", F.col("n_regionkey") == 0)
    t2.update_rows("nation", F.col("n_regionkey") == 0,
                   {"n_name": "LOST-UPDATE"})
    t1.commit()
    with pytest.raises(ConflictException, match="nation"):
        t2.commit()
    # the loser is dead; the winner's delete survived un-clobbered
    with pytest.raises(DatabaseException, match="no longer active"):
        t2.table("nation")
    assert mdb.table("nation").filter(
        F.col("n_name") == "LOST-UPDATE").count() == 0


def test_conflict_checked_only_for_written_tables(mdb, spark):
    scratch = Database(spark)
    scratch.register_dataframe(
        "other", spark.createDataFrame([(1, "x")], ["id", "v"]))
    txn = scratch.begin()
    txn.delete_rows("other", F.col("id") == 1)
    # a DIFFERENT table in the same catalog advances; no conflict
    scratch.register_dataframe(
        "bystander", spark.createDataFrame([(2, "y")], ["id", "v"]))
    scratch.delete_rows("bystander", F.col("id") == 2)
    txn.commit()
    assert scratch.table("other").count() == 0


def test_rollback_discards_intents(mdb):
    before = mdb.table("nation").count()
    txn = mdb.begin()
    txn.delete_rows("nation", F.lit(True))
    txn.rollback()
    assert mdb.table("nation").count() == before
    with pytest.raises(DatabaseException, match="no longer active"):
        txn.commit()


def test_insert_schema_checked_at_buffer_time(mdb, spark):
    txn = mdb.begin()
    bad = spark.createDataFrame([(1,)], ["only_one_col"])
    with pytest.raises(DatabaseException, match="schema mismatch"):
        txn.insert_rows("nation", bad)


def test_txn_query_builder_over_snapshot(mdb, spark):
    txn = mdb.begin()
    txn.insert_rows("nation", spark.createDataFrame(
        [(100, "ATLANTIS", 0)], schema=mdb.schema("nation")))
    # outside write after the pin: must be invisible to the builder
    mdb.delete_rows("nation", F.col("n_regionkey") == 0)
    got = (txn.query("nation")
           .where("n_regionkey", "=", 0)
           .select("n_nationkey", "n_name")
           .execute().collect())
    names = {r.n_name for r in got}
    assert "ATLANTIS" in names                 # read-your-writes
    assert len(names) > 1                      # snapshot kept region-0 rows
    assert mdb.query("nation").where("n_regionkey", "=", 0) \
              .execute().count() == 0          # published state differs
