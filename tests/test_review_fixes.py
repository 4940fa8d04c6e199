"""Regressions for the round-6 core review findings: SQL DML semantics
(NULL-condition deletes, simultaneous UPDATE assignment), merge
update_cols=(), optimizer pin orientation and sargability, builder
group-by ambiguity, explain plan staleness, and writer edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark import Database
from cs186_query_optimization_project_spark.errors import (
    DatabaseException,
    QueryPlanException,
)

from tests.conftest import SF_DIR, rows


def test_delete_rows_null_condition_keeps_row(spark, tmp_path):
    db = Database(spark, SF_DIR)
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 3.0)], "id long, x double")
    db.create_table("del_null", df, str(tmp_path / "del_null"))
    try:
        db.delete_rows("del_null", F.col("x") > 5)
        left = {r["id"] for r in db.table("del_null").collect()}
        # SQL DELETE WHERE x > 5: row 1 goes, NULL row 2 STAYS
        assert left == {2, 3}
    finally:
        db.drop_table("del_null")


def test_update_rows_reads_pre_update_row(spark, tmp_path):
    db = Database(spark, SF_DIR)
    df = spark.createDataFrame(
        [(1, "old", False), (2, "other", False)],
        "id long, status string, modified boolean")
    db.create_table("upd_sim", df, str(tmp_path / "upd_sim"))
    try:
        # the classic trap: the condition references an assigned column
        db.update_rows("upd_sim", F.col("status") == "old",
                       {"status": F.lit("new"), "modified": F.lit(True)})
        got = {r["id"]: (r["status"], r["modified"])
               for r in db.table("upd_sim").collect()}
        assert got[1] == ("new", True)       # BOTH assignments applied
        assert got[2] == ("other", False)
    finally:
        db.drop_table("upd_sim")


def test_update_rows_column_swap(spark, tmp_path):
    db = Database(spark, SF_DIR)
    df = spark.createDataFrame([(1, 10, 20)], "id long, a long, b long")
    db.create_table("upd_swap", df, str(tmp_path / "upd_swap"))
    try:
        db.update_rows("upd_swap", F.lit(True),
                       {"a": F.col("b"), "b": F.col("a")})
        r = db.table("upd_swap").collect()[0]
        assert (r["a"], r["b"]) == (20, 10)
    finally:
        db.drop_table("upd_swap")


def test_merge_empty_update_cols_is_insert_only(spark, tmp_path):
    db = Database(spark, SF_DIR)
    df = spark.createDataFrame([(1, "keep")], "id long, v string")
    db.create_table("mrg_io", df, str(tmp_path / "mrg_io"))
    try:
        src = spark.createDataFrame([(1, "clobber"), (2, "new")],
                                    "id long, v string")
        db.merge_rows("mrg_io", src, on="id", update_cols=())
        got = {r["id"]: r["v"] for r in db.table("mrg_io").collect()}
        # matched row 1 untouched (update NOTHING), row 2 inserted
        assert got == {1: "keep", 2: "new"}
    finally:
        db.drop_table("mrg_io")


def test_optimizer_broadcast_pin_follows_declared_table(spark, db):
    """strategy='broadcast' pins the DECLARED joined table; if the DP
    orients the edge the other way, the hint must flip to
    broadcast_left so the same physical table is broadcast."""
    q = (db.query("lineitem")
         .join("nation", "l_suppkey", "n_nationkey",
               strategy="broadcast"))
    from cs186_query_optimization_project_spark.plans.optimizer import (
        optimize,
    )

    plan = optimize(q)
    (step,) = plan.steps
    if step.alias == "nation":
        assert step.strategy == "broadcast"
    else:  # nation seeded as base; lineitem added — broadcast the LEFT
        assert step.alias == "lineitem"
        assert step.strategy == "broadcast_left"


def test_optimizer_additive_ops_never_take_index_path(spark, db,
                                                      tmp_path):
    from cs186_query_optimization_project_spark.plans.optimizer import (
        optimize,
    )

    db.create_table("idx_like", db.table("orders"),
                    str(tmp_path / "idx_like"),
                    index_columns=("o_orderkey",), mode="overwrite")
    try:
        # a LIKE on the indexed column must NOT elect the index path
        # (min/max skipping can't serve it) ...
        q = (db.query("idx_like")
             .where("o_orderkey", "like", "%7%"))
        plan = optimize(q)
        assert plan.access_paths["idx_like"].kind == "SEQSCAN"
        # ... while a selective sargable equality on the same column does
        q2 = db.query("idx_like").where("o_orderkey", "=", 7)
        assert optimize(q2).access_paths["idx_like"].kind == "INDEXSCAN"
    finally:
        db.drop_table("idx_like")


def test_groupby_same_named_columns_from_two_tables(spark, db):
    """Two tables' same-named group columns must survive aggregation
    without an ambiguous-reference crash."""
    df = (db.query("nation", alias="a")
          .join("nation", "n_regionkey", "n_regionkey", alias="b")
          .group_by("a.n_regionkey", "b.n_regionkey")
          .count()
          .execute())
    assert df.columns.count("n_regionkey") == 2
    assert df.count() == 5  # self-join on the key: 5 matched groups


def test_explain_optimal_reoptimizes_after_mutation(db):
    q = (db.query("customer")
         .join("orders", "c_custkey", "o_custkey"))
    q.execute_optimal()
    assert q.cached_plan() is not None
    q.join("lineitem", "o_orderkey", "l_orderkey")
    assert q.cached_plan() is None          # stale plan refused
    out = q.explain(optimal=True)
    assert "lineitem" in out                # re-optimized with 3 tables


def test_zorder_empty_table_writes_cleanly(spark, tmp_path):
    from cs186_query_optimization_project_spark.sources import writers

    empty = spark.createDataFrame([], "x long, y long")
    path = str(tmp_path / "z_empty")
    writers.write_zordered(empty, path, ("x", "y"))
    assert spark.read.parquet(path).count() == 0


def test_compact_refuses_partitioned_layout(spark, tmp_path):
    from cs186_query_optimization_project_spark.sources import writers

    path = str(tmp_path / "part_tbl")
    (spark.range(100).select(F.col("id"), (F.col("id") % 3).alias("p"))
     .write.partitionBy("p").parquet(path))
    with pytest.raises(DatabaseException, match="hive-partitioned"):
        writers.compact_table(spark, path)


# --------------------------------------------------------------------- #
# round-4 review batch: operators / functions edge cases
# --------------------------------------------------------------------- #
def test_salted_join_rejects_all_outer_aliases(spark):
    from cs186_query_optimization_project_spark.operators import joins

    l = spark.range(10).select(F.col("id").alias("k"))
    r = spark.range(5).select(F.col("id").alias("k"))
    for how in ("right", "rightouter", "right_outer", "full",
                "fullouter", "full_outer", "outer"):
        with pytest.raises(ValueError):
            joins.salted_join(l, r, "k", how=how)
    # allowed forms still work
    assert joins.salted_join(l, r, "k", how="left_outer").count() == 10


def test_bloom_and_asof_tolerate_null_keys(spark):
    from cs186_query_optimization_project_spark.operators import joins

    probe = spark.createDataFrame([(1,), (2,), (None,)], "k long")
    build = spark.createDataFrame([(1,), (None,)], "bk long")
    out = joins.bloom_semi_join(probe, build, "k", "bk")
    assert [r["k"] for r in out.collect()] == [1]  # NULL never matches

    left = spark.createDataFrame(
        [(None, 10, "L1"), (1, 10, "L2")], "k long, ts long, lv string")
    right = spark.createDataFrame(
        [(None, 5, "R-null"), (1, 5, "R1")], "k long, ts long, rv string")
    got = {r["lv"]: r["rv"]
           for r in joins.asof_join(left, right, on="k").collect()}
    assert got == {"L1": None, "L2": "R1"}  # NULL key carries nothing


def test_multimodal_custom_id_and_null_meta(spark):
    from cs186_query_optimization_project_spark.functions import multimodal

    df = spark.createDataFrame(
        [("a", b"hello", ("image/x", 1, 1, 0)), ("b", b"", None)],
        "uid string, asset binary, "
        "asset_meta struct<mime:string,width:int,height:int,"
        "duration_ms:int>")
    feats = multimodal.extract_features(df, id_col="uid")
    assert feats.columns[0] == "uid"
    got = {r["uid"]: r["mime"] for r in feats.collect()}
    assert got == {"a": "image/x", "b": None}
    frames = multimodal.sample_frames(df, n_frames=2, id_col="uid")
    assert frames.count() == 4 and frames.columns[0] == "uid"


def test_scd2_preserves_valid_to_type(spark):
    from cs186_query_optimization_project_spark.operators import scd

    dim = spark.createDataFrame(
        [(1, "x", "2020-01-01", None, True)],
        "id long, v string, valid_from string, valid_to timestamp, "
        "is_current boolean")
    batch = spark.createDataFrame([(1, "y")], "id long, v string")
    out = scd.scd2_apply(dim, batch, key="id", tracked=("v",),
                         batch_ts="2024-06-01")
    assert dict(out.dtypes)["valid_to"] == "timestamp"


def test_encode_documents_keeps_empty_docs(spark):
    from cs186_query_optimization_project_spark.functions import text as tx

    df = spark.createDataFrame([(1, "hello world"), (2, ""), (3, "  ")],
                               ["doc_id", "text"])
    vocab = tx.vocab_with_ids(df)
    out = {r["doc_id"]: (r["n_tokens"], r["ids"])
           for r in tx.encode_documents(df, vocab).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2] == (0, "") and out[3] == (0, "")
    assert out[1][0] == 2


def test_vocab_size_zero_is_empty(spark):
    from cs186_query_optimization_project_spark.functions import text as tx

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    assert tx.vocab_with_ids(df, size=0).count() == 0
    assert tx.vocab_with_ids(df, size=2).count() == 2


def test_funnel_escapes_stage_quotes(spark):
    from cs186_query_optimization_project_spark.operators import windows

    df = spark.createDataFrame(
        [(1, "sign'up", "2024-01-01 10:00:00"),
         (1, "buy", "2024-01-01 11:00:00")],
        ["user_id", "event_type", "ts_s"]).select(
            "user_id", "event_type",
            F.col("ts_s").cast("timestamp").alias("ts"))
    out = {r["stage"]: r["n_users"]
           for r in windows.funnel(df, "user_id", "ts", "event_type",
                                   ["sign'up", "buy"]).collect()}
    assert out == {"sign'up": 1, "buy": 1}


def test_funnel_escapes_stage_backslashes(spark):
    from cs186_query_optimization_project_spark.operators import windows

    df = spark.createDataFrame(
        [(1, "path\\", "2024-01-01 10:00:00"),
         (1, "it's\\", "2024-01-01 11:00:00")],
        ["user_id", "event_type", "ts_s"]).select(
            "user_id", "event_type",
            F.col("ts_s").cast("timestamp").alias("ts"))
    # a trailing backslash must not swallow the closing quote (escape
    # order: backslashes before quotes)
    out = {r["stage"]: r["n_users"]
           for r in windows.funnel(df, "user_id", "ts", "event_type",
                                   ["path\\", "it's\\"]).collect()}
    assert out == {"path\\": 1, "it's\\": 1}


def test_weighted_sample_ignores_non_positive_weights(spark):
    from cs186_query_optimization_project_spark.functions import sampling

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate([-5.0, -1.0, 0.0] * 50)],
        ["id", "w"])
    # all weights <= 0: the sample must be EMPTY, not biased toward the
    # most negative weights (negative/negative ratio flip)
    assert sampling.weighted_sample(df, "w", "id", rate=1.0).count() == 0
    mixed = spark.createDataFrame(
        [(i, float(i % 3) - 1.0) for i in range(300)], ["id", "w"])
    picked = sampling.weighted_sample(mixed, "w", "id", rate=1.0)
    got = picked.select("w").distinct().collect()
    # only the positive-weight stratum can ever be sampled
    assert {r["w"] for r in got} <= {1.0}
    assert picked.count() > 0


def test_correlation_matrix_quotes_odd_column_names(spark):
    from cs186_query_optimization_project_spark.functions import profiling

    df = spark.createDataFrame(
        [(1.0, 2.0, 2.0), (2.0, 4.0, 1.0), (3.0, 6.0, 7.0)],
        ["a col", "b-col", "c'col"])
    out = {(r["col_a"], r["col_b"]): r["corr"]
           for r in profiling.correlation_matrix(
               df, ["a col", "b-col", "c'col"]).collect()}
    assert out[("a col", "b-col")] == 1.0
    assert len(out) == 3


def test_sentinel_publish_keeps_concurrent_ready_dir(tmp_path):
    import os

    import __spark_entry__ as entry

    # a concurrent builder published a READY dir between our readiness
    # check and our publish: theirs must survive untouched, ours is
    # discarded
    base, build = str(tmp_path / "base"), str(tmp_path / "b.build_1")
    done = os.path.join(base, "_READY")
    os.makedirs(base)
    with open(os.path.join(base, "winner.parquet"), "w") as f:
        f.write("theirs")
    open(done, "w").close()
    os.makedirs(build)
    open(os.path.join(build, "_READY"), "w").close()
    entry._publish_sentinel_dir(build, base, done)
    assert os.path.exists(os.path.join(base, "winner.parquet"))
    assert not os.path.exists(build)
    # whereas a crashed builder's UNREADY residue is cleared+replaced
    base2, build2 = str(tmp_path / "base2"), str(tmp_path / "b2.build_1")
    done2 = os.path.join(base2, "_READY")
    os.makedirs(base2)
    with open(os.path.join(base2, "stale.parquet"), "w") as f:
        f.write("residue")                     # no _READY marker
    os.makedirs(build2)
    open(os.path.join(build2, "_READY"), "w").close()
    entry._publish_sentinel_dir(build2, base2, done2)
    assert os.path.exists(done2)
    assert not os.path.exists(os.path.join(base2, "stale.parquet"))
