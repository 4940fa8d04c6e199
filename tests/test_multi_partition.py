"""Hierarchical (multi-column) hive partitioning — the standard 100 TB
layout (e.g. date/source).  The scale claims under test: manifest keys
are the hive path tuple, every partition-aware read prunes EXACTLY on
any key prefix or component (directories outside the prune set are
never listed), DML stays O(touched leaf partitions), and the
single-column behavior every existing table depends on is bit-for-bit
unchanged (the whole rest of the suite runs against it).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark.errors import (
    DatabaseException,
)
from cs186_query_optimization_project_spark.partitioned import (
    PartitionedTable,
)


@pytest.fixture()
def mpt(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2024-01-01", "web", 10.0), (2, "2024-01-01", "app", 20.0),
         (3, "2024-01-02", "web", 30.0), (4, "2024-01-02", "app", 40.0),
         (5, "2024-01-02", "app", 50.0), (6, "2024-01-03", "web", 60.0)],
        "id long, d string, src string, amt double")
    return PartitionedTable.create(spark, df, str(tmp_path / "t"),
                                   ["d", "src"])


def _leaf_dirs(df):
    return {os.path.normpath(os.path.dirname(f.removeprefix("file:")))
            for f in df.inputFiles()}


def test_create_layout_and_keys(mpt):
    man = mpt._manifest()
    assert mpt.partition_cols() == ["d", "src"]
    with pytest.raises(DatabaseException, match="partition_cols"):
        mpt.partition_col()
    assert sorted(man["parts"]) == [
        "2024-01-01/app", "2024-01-01/web", "2024-01-02/app",
        "2024-01-02/web", "2024-01-03/web"]
    # nested hive layout on disk
    d, = man["parts"]["2024-01-02/app"]
    assert d.endswith(os.path.join("__p0=2024-01-02", "__p1=app"))
    assert mpt.read().count() == 6


def test_exact_and_prefix_pruning(mpt):
    man = mpt._manifest()
    # full-tuple read lists exactly one leaf directory
    out = mpt.read(partition_values=[("2024-01-02", "app")])
    assert sorted(r["id"] for r in out.collect()) == [4, 5]
    assert _leaf_dirs(out) == {os.path.normpath(d) for d in
                               man["parts"]["2024-01-02/app"]}
    # prefix (scalar = first component) lists only that date's leaves
    out = mpt.read(partition_values=["2024-01-02"])
    assert sorted(r["id"] for r in out.collect()) == [3, 4, 5]
    want = {os.path.normpath(d) for k in
            ("2024-01-02/app", "2024-01-02/web")
            for d in man["parts"][k]}
    assert _leaf_dirs(out) == want
    # over-long tuples are refused
    with pytest.raises(DatabaseException, match="more components"):
        mpt.read(partition_values=[("a", "b", "c")]).count()


def test_point_read_prunes_on_any_component(mpt):
    man = mpt._manifest()
    # first component: exact manifest pruning
    dirs = mpt._point_dirs("d", "2024-01-01")
    assert {os.path.normpath(d) for d in dirs} == {
        os.path.normpath(d) for k in ("2024-01-01/app", "2024-01-01/web")
        for d in man["parts"][k]}
    # SECOND component prunes exactly too (not just prefixes)
    dirs = mpt._point_dirs("src", "app")
    assert {os.path.normpath(d) for d in dirs} == {
        os.path.normpath(d) for k in ("2024-01-01/app", "2024-01-02/app")
        for d in man["parts"][k]}
    out = mpt.read_point("src", "app")
    assert sorted(r["id"] for r in out.collect()) == [2, 4, 5]


def test_read_skipping_intersects_components(mpt):
    man = mpt._manifest()
    out = mpt.read_skipping(eq={"d": "2024-01-02", "src": "app"})
    assert sorted(r["id"] for r in out.collect()) == [4, 5]
    assert _leaf_dirs(out) == {os.path.normpath(d) for d in
                               man["parts"]["2024-01-02/app"]}
    # partition component + stats conjunct compose
    out = mpt.read_skipping(eq={"src": "app"}, ranges={"id": (5, None)})
    assert sorted(r["id"] for r in out.collect()) == [5]


def test_dml_touches_only_named_leaves(mpt, spark):
    man0 = mpt._manifest()
    mpt.insert(spark.createDataFrame(
        [(7, "2024-01-03", "app", 70.0)],
        "id long, d string, src string, amt double"))
    man1 = mpt._manifest()
    assert man1["parts"]["2024-01-03/app"]
    for k in man0["parts"]:  # untouched leaves re-link
        assert man1["parts"][k] == man0["parts"][k]
    # update rewrites only the owning leaf
    mpt.update(F.col("id") == 4, {"amt": 99.0})
    man2 = mpt._manifest()
    assert man2["parts"]["2024-01-02/app"] != man1["parts"][
        "2024-01-02/app"]
    for k in man1["parts"]:
        if k != "2024-01-02/app":
            assert man2["parts"][k] == man1["parts"][k]
    got = {r["id"]: r["amt"] for r in mpt.read().collect()}
    assert got[4] == 99.0 and got[5] == 50.0 and len(got) == 7
    # delete drops matching rows; partition emptied to zero stays
    # exact via empty dir-list
    mpt.delete(F.col("d") == "2024-01-01")
    assert sorted(r["id"] for r in mpt.read().collect()) == \
        [3, 4, 5, 6, 7]
    # assigning any partition column is refused
    with pytest.raises(DatabaseException, match="partition column"):
        mpt.update(F.col("id") == 3, {"src": "app"})


def test_overwrite_named_tuples(mpt, spark):
    mpt.overwrite_partitions(
        spark.createDataFrame([(40, "2024-01-02", "app", 1.0)],
                              "id long, d string, src string, "
                              "amt double"),
        [("2024-01-02", "app")])
    assert sorted(r["id"] for r in mpt.read().collect()) == \
        [1, 2, 3, 6, 40]
    # stray rows outside the named tuples are refused
    with pytest.raises(DatabaseException, match="outside the named"):
        mpt.overwrite_partitions(
            spark.createDataFrame([(9, "2024-01-09", "web", 1.0)],
                                  "id long, d string, src string, "
                                  "amt double"),
            [("2024-01-02", "app")])


def test_merge_multi(mpt, spark):
    src = spark.createDataFrame(
        [(4, "2024-01-02", "app", 444.0),     # matched update
         (8, "2024-01-04", "ads", 80.0)],     # unmatched insert
        "id long, d string, src string, amt double")
    mpt.merge(src, "id")
    got = {r["id"]: r["amt"] for r in mpt.read().collect()}
    assert got[4] == 444.0 and got[8] == 80.0 and len(got) == 7
    # a matched row changing either partition column is refused
    bad = spark.createDataFrame(
        [(4, "2024-01-02", "web", 1.0)],
        "id long, d string, src string, amt double")
    with pytest.raises(DatabaseException, match="partition column"):
        mpt.merge(bad, "id")


def test_metadata_count_and_groups(mpt):
    assert mpt.metadata_count() == 6
    groups = mpt.metadata_group_counts()
    assert groups == {"2024-01-01/app": 1, "2024-01-01/web": 1,
                      "2024-01-02/app": 2, "2024-01-02/web": 1,
                      "2024-01-03/web": 1}
    mpt.delete_soft("id = 5")
    assert mpt.metadata_count() == 5
    assert mpt.metadata_group_counts()["2024-01-02/app"] == 1


def test_metadata_group_min_max_multi(mpt):
    got = mpt.metadata_group_min_max("id")
    assert got == {"2024-01-01/web": (1, 1), "2024-01-01/app": (2, 2),
                   "2024-01-02/web": (3, 3), "2024-01-02/app": (4, 5),
                   "2024-01-03/web": (6, 6)}


def test_optimize_and_vacuum_nested(mpt, spark):
    for i in range(3):  # accrete directories in one leaf
        mpt.insert(spark.createDataFrame(
            [(100 + i, "2024-01-02", "app", 1.0)],
            "id long, d string, src string, amt double"))
    man = mpt._manifest()
    assert len(man["parts"]["2024-01-02/app"]) == 4
    before = sorted(r["id"] for r in mpt.read().collect())
    compacted = mpt.optimize()
    assert "2024-01-02/app" in compacted
    assert len(mpt._manifest()["parts"]["2024-01-02/app"]) == 1
    assert sorted(r["id"] for r in mpt.read().collect()) == before
    # vacuum reclaims the superseded nested leaves, keeps live ones
    removed = mpt.vacuum(keep_last=1)
    assert removed                      # old leaf dirs went
    live = {os.path.normpath(d)
            for ds in mpt._manifest()["parts"].values() for d in ds}
    assert sorted(r["id"] for r in mpt.read().collect()) == before
    assert not (live & {os.path.normpath(r) for r in removed})


def test_bloom_skipping_on_multi(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"d{i % 2}", f"s{i % 3}", f"user_{i}") for i in range(60)],
        "id long, d string, src string, uid string")
    pt = PartitionedTable.create(spark, df, str(tmp_path / "b"),
                                 ["d", "src"], bloom_cols=["uid"])
    dirs = pt._point_dirs("uid", "user_7")
    all_dirs = [d for ds in pt._manifest()["parts"].values() for d in ds]
    assert len(dirs) < len(all_dirs)    # bloom pruned some leaves
    out = pt.read_point("uid", "user_7")
    assert [r["id"] for r in out.collect()] == [7]


def test_slash_values_are_refused_multi_only(spark, tmp_path):
    bad = spark.createDataFrame([(1, "a/b", "x", 1.0)],
                                "id long, d string, src string, "
                                "amt double")
    with pytest.raises(DatabaseException, match="contains '/'"):
        PartitionedTable.create(spark, bad, str(tmp_path / "s"),
                                ["d", "src"])
    # single-column tables keep accepting '/' values (hive-escaped)
    pt = PartitionedTable.create(spark, bad, str(tmp_path / "s1"), "d")
    assert pt.read(partition_values=["a/b"]).count() == 1


def test_idempotent_append_multi(mpt, spark):
    """Exactly-once streaming appends work unchanged on hierarchical
    tables: a replayed batch id is a dedup no-op, NULL in EITHER
    partition column is refused."""
    batch = spark.createDataFrame(
        [(9, "2024-01-04", "ads", 90.0)],
        "id long, d string, src string, amt double")
    assert mpt.idempotent_append(batch, "sink1", 1) is True
    assert mpt.idempotent_append(batch, "sink1", 1) is False  # replay
    assert mpt.read().count() == 7
    bad = spark.createDataFrame(
        [(10, "2024-01-05", None, 1.0)],
        "id long, d string, src string, amt double")
    with pytest.raises(DatabaseException, match="NULL partition"):
        mpt.idempotent_append(bad, "sink1", 2)


def test_clone_and_restore_multi(mpt, spark, tmp_path):
    """Shallow clone and metadata-only restore carry the partition
    column LIST through their commits; DML on the clone never touches
    source bytes."""
    mpt.delete(F.col("id") == 1)                         # v1
    cl = mpt.clone(str(tmp_path / "cl"))
    assert cl.partition_cols() == ["d", "src"]
    assert cl.read().count() == 5
    cl.insert(spark.createDataFrame(
        [(50, "2024-01-09", "web", 5.0)],
        "id long, d string, src string, amt double"))
    assert cl.read().count() == 6 and mpt.read().count() == 5
    mpt.restore(0)
    assert mpt.partition_cols() == ["d", "src"]
    assert mpt.read().count() == 6                       # v0 content
    # exact tuple read still prunes after the restore
    assert mpt.read(partition_values=[("2024-01-01", "web")]) \
        .count() == 1


def test_optimize_zorder_multi(spark, tmp_path):
    """OPTIMIZE ... ZORDER on a hierarchical table range-partitions on
    every partition column plus the Morton key; rows are unchanged."""
    df = spark.createDataFrame(
        [(i, f"d{i % 2}", f"s{i % 2}", i % 7, i % 5, float(i))
         for i in range(200)],
        "id long, d string, src string, x long, y long, amt double")
    pt = PartitionedTable.create(spark, df, str(tmp_path / "z"),
                                 ["d", "src"])
    pt.insert(df.limit(10))                       # force accretion
    before = sorted(r["id"] for r in pt.read().collect())
    assert pt.optimize(zorder_by=("x", "y"))
    assert sorted(r["id"] for r in pt.read().collect()) == before


def test_repartition_table_layout_evolution(mpt, spark):
    """Partition-layout evolution: one versioned commit rewrites the
    table under a new column list; reads prune on the new layout,
    time travel reads the old one under ITS layout, and changes()
    treats the commit as data-unchanged (dataChange=false) — zero
    spurious churn for incremental consumers."""
    before = sorted(map(tuple, mpt.read().collect()))
    mpt.delete_soft("id = 5")                      # v1 (tombstone)
    mpt.repartition_table("src")                   # v2: multi -> single
    assert mpt.partition_cols() == ["src"]
    assert sorted(mpt._manifest()["parts"]) == ["app", "web"]
    got = sorted(map(tuple, mpt.read().collect()))
    assert got == [t for t in before if t[0] != 5]  # content identical
    # reads prune on the NEW layout
    out = mpt.read(partition_values=["app"])
    assert sorted(r["id"] for r in out.collect()) == [2, 4]
    assert mpt.metadata_count() == 5               # tombstone gone:
    # the rewrite materialized it, counts exact again
    # time travel: v0 still reads under the OLD two-column layout
    old = mpt.read(version=0, partition_values=[("2024-01-02", "app")])
    assert sorted(r["id"] for r in old.collect()) == [4, 5]
    # CDF: the soft delete reported its row; the repartition adds NONE
    feed = {(r["_change_type"], r["id"], r["_commit_version"])
            for r in mpt.changes(0).collect()}
    assert feed == {("delete", 5, 1)}
    # back to a two-column layout, other order
    mpt.repartition_table(["src", "d"])
    assert mpt.partition_cols() == ["src", "d"]
    assert mpt.read_point("d", "2024-01-02").count() == 2
    assert {(r["_change_type"], r["id"]) for r in
            mpt.changes(2).collect()} == set()
    # invalid targets are refused
    with pytest.raises(DatabaseException, match="no column"):
        mpt.repartition_table("nope")
    with pytest.raises(DatabaseException, match="only string"):
        mpt.repartition_table("amt")


def test_changes_and_time_travel_multi(mpt, spark):
    mpt.insert(spark.createDataFrame(
        [(7, "2024-01-03", "app", 70.0)],
        "id long, d string, src string, amt double"))
    mpt.delete(F.col("id") == 1)
    feed = {(r["_change_type"], r["id"])
            for r in mpt.changes(0, 2).collect()}
    assert feed == {("insert", 7), ("delete", 1)}
    assert mpt.read(version=0).count() == 6
    assert mpt.read().count() == 6  # +1 insert -1 delete
