"""Cross-process commit honesty probe.

The transaction surface (2PL + optimistic, concurrency.py /
transactions.py) serializes writers through ONE in-process LockManager
and ONE in-memory catalog per ``Database`` — the documented boundary:
multi-process publication would move the commit CAS into a shared
catalog service (the Delta-log role, transactions.py:204).

Two ``Database`` instances on the same warehouse path model two driver
processes.  This test PINS the limitation: their commits do NOT
serialize — each instance's writes are invisible to the other, and the
second writer's lineage silently omits the first's committed update (a
lost update across instances).  If this test ever starts failing
because the anomaly disappeared, the single-process documentation is
stale and must be rewritten — cross-process safety must never be
claimed while this probe passes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cs186_query_optimization_project_spark import Database


def _vals(db) -> dict:
    return {r["k"]: r["x"] for r in db.table("t").collect()}


def test_cross_instance_commits_do_not_serialize(spark, tmp_path):
    path = str(tmp_path / "t")
    (spark.createDataFrame([(1, 10), (2, 20)], ["k", "x"])
     .write.parquet(path))
    db1 = Database(spark).register_parquet("t", path)
    db2 = Database(spark).register_parquet("t", path)

    db1.update_rows("t", F.col("k") == 1, {"x": F.lit(111)})
    assert _vals(db1) == {1: 111, 2: 20}
    # db1's COMMITTED update is invisible to db2: no shared catalog
    assert _vals(db2) == {1: 10, 2: 20}

    db2.update_rows("t", F.col("k") == 2, {"x": F.lit(222)})
    # the cross-instance lost update, pinned: db2's new version derives
    # from the ORIGINAL table, silently dropping db1's k=1 write —
    # exactly what a shared lock table prevents within one process
    # (test_transactions.py) and what a shared catalog service would
    # prevent across processes
    assert _vals(db2) == {1: 10, 2: 222}
    # and the instances have permanently diverged
    assert _vals(db1) == {1: 111, 2: 20}
