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


def test_partitioned_manifest_commits_serialize_across_instances(
        spark, tmp_path):
    """The partitioned manifest layer (partitioned.py) CLOSES the gap
    pinned above: its commit CAS lives in the FILESYSTEM (exclusive
    manifest create), not in per-instance memory, so two independent
    instances over the same root serialize — each statement re-reads
    the latest manifest, and a true same-version race loses with
    ConflictException (tests/test_partitioned_table.py) instead of
    silently deriving from a stale snapshot."""
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    root = str(tmp_path / "p")
    PartitionedTable.create(
        spark, spark.createDataFrame([(1, "A", 10), (2, "B", 20)],
                                     "k long, g string, x long"),
        root, "g")
    t1 = PartitionedTable(spark, root)
    t2 = PartitionedTable(spark, root)

    t1.update(F.col("k") == 1, {"x": F.lit(111)})
    # unlike the Database case above, instance 2 SEES instance 1's
    # committed version immediately...
    assert {r["k"]: r["x"] for r in t2.read().collect()} == \
        {1: 111, 2: 20}
    t2.update(F.col("k") == 2, {"x": F.lit(222)})
    # ...and its own commit derives from it: no lost update
    for t in (t1, t2):
        assert {r["k"]: r["x"] for r in t.read().collect()} == \
            {1: 111, 2: 222}
    assert t1.versions() == t2.versions() == [0, 1, 2]


def test_mview_refresh_lock_serializes_across_processes(spark, tmp_path):
    """The mview refresh lock is FILESYSTEM-scoped like the manifest
    CAS: a lock held by another LIVE process blocks refresh with the
    named conflict; when that process dies the lock is stale and the
    next refresh reclaims it and proceeds."""
    import os
    import subprocess

    import pytest

    from cs186_query_optimization_project_spark.errors import (
        ConflictException,
    )
    from cs186_query_optimization_project_spark.mview import (
        MaterializedView,
    )
    from cs186_query_optimization_project_spark.partitioned import (
        PartitionedTable,
    )

    df = spark.createDataFrame([(1, "A", 1.0), (2, "B", 2.0)],
                               "id long, grp string, amt double")
    src = PartitionedTable.create(spark, df, str(tmp_path / "s"), "grp")
    mv = MaterializedView.create(spark, src, str(tmp_path / "mv"),
                                 keys=["grp"], sum_cols=["amt"])
    src.insert(spark.createDataFrame([(3, "A", 3.0)],
                                     "id long, grp string, amt double"))
    holder = subprocess.Popen(["sleep", "300"])  # the "other process"
    lock = os.path.join(mv.root, "_refresh.lock")
    try:
        with open(lock, "x") as f:
            f.write(str(holder.pid))
        with pytest.raises(ConflictException, match="in progress"):
            mv.refresh()
        holder.kill()
        holder.wait()                             # now the pid is dead
        assert mv.refresh() > 0                   # stale lock reclaimed
        assert not os.path.exists(lock)
    finally:
        if holder.poll() is None:
            holder.kill()
            holder.wait()
