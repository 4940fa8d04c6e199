"""Stats layer + System-R optimizer tests (analog of the reference's
TableStatsTest / IntHistogramTest / OptimalQueryPlanTest)."""

import pytest

from cs186_query_optimization_project_spark.plans import cost as C
from cs186_query_optimization_project_spark.plans.optimizer import optimize
from cs186_query_optimization_project_spark.plans.stats import TableStats
from cs186_query_optimization_project_spark.predicates import EQ, GT, GTE, LT
from tests.conftest import duck_rows, rows


def test_stats_basic(db):
    s = db.stats("customer")
    assert s.num_records == db.table("customer").count()
    ck = s.columns["c_custkey"]
    # approx_count_distinct on a unique key: within 5%
    assert abs(ck.distinct - s.num_records) / s.num_records < 0.05
    assert s.columns["c_mktsegment"].distinct == 5
    assert s.row_bytes > 20


def test_reduction_factors(db):
    s = db.stats("customer")
    rf_eq = s.reduction_factor("c_mktsegment", EQ, "BUILDING")
    assert rf_eq == pytest.approx(0.2, abs=0.01)     # 1/V, V=5
    lo, hi = s.columns["c_acctbal"].min, s.columns["c_acctbal"].max
    mid = (lo + hi) / 2
    rf_half = s.reduction_factor("c_acctbal", GT, mid)
    assert 0.3 < rf_half < 0.7                        # interpolation
    assert s.reduction_factor("c_acctbal", GT, hi + 1) == 0.0
    assert s.reduction_factor("c_acctbal", LT, hi + 1) == 1.0


def test_histogram_refines_rf(spark, db):
    s = TableStats.collect(db.table("orders"), "orders", histograms=True)
    assert s.columns["o_totalprice"].histogram
    total = sum(c for _, _, c in s.columns["o_totalprice"].histogram)
    assert total == s.num_records
    # histogram-based RF ≈ true selectivity within a bucket width
    true_sel = (db.table("orders").filter("o_totalprice > 200000").count()
                / s.num_records)
    rf = s.reduction_factor("o_totalprice", GT, 200000.0)
    assert rf == pytest.approx(true_sel, abs=0.08)


def test_with_predicate_scales(db):
    s = db.stats("customer")
    s2 = s.with_predicate("c_mktsegment", EQ, "BUILDING")
    assert s2.num_records == pytest.approx(s.num_records / 5, rel=0.05)


def test_join_cardinality(db):
    c = db.stats("customer")
    o = db.stats("orders")
    est = c.join_cardinality(o, "c_custkey", "o_custkey")
    true = (db.query("customer").join("orders", "c_custkey", "o_custkey")
            .execute().count())
    assert est == pytest.approx(true, rel=0.15)


def test_optimizer_broadcasts_small_dims(db):
    q = (db.query("lineitem")
         .join("orders", "l_orderkey", "o_orderkey")
         .join("customer", "o_custkey", "c_custkey"))
    q.execute_optimal()
    plan = q._last_plan
    assert plan is not None
    # at sf0.001 every table is tiny → everything broadcast-eligible
    assert all(s.strategy == "broadcast" for s in plan.steps)
    assert {s.alias for s in plan.steps} | {plan.base_alias} == \
        {"lineitem", "orders", "customer"}
    assert plan.total_cost_pages > 0


def test_optimizer_join_order_small_first(db):
    # DP should start from a small table pair, not the big fact table
    q = (db.query("lineitem")
         .join("orders", "l_orderkey", "o_orderkey")
         .join("customer", "o_custkey", "c_custkey"))
    plan = optimize(q)
    order = [plan.base_alias] + [s.alias for s in plan.steps]
    # lineitem (biggest) should not be the DP's base access
    assert order[0] != "lineitem"


def test_optimal_equals_naive_results(db):
    q = (db.query("lineitem")
         .join("orders", "l_orderkey", "o_orderkey")
         .join("customer", "o_custkey", "c_custkey")
         .where("c_acctbal", GTE, 0.0)
         .group_by("c_mktsegment").count())
    assert rows(q.execute()) == rows(q.execute_optimal())


def test_optimizer_single_table(db):
    q = db.query("region")
    plan = optimize(q)
    assert plan.steps == [] and plan.base_table == "region"


def test_declared_order_kept_for_outer(db):
    q = (db.query("customer")
         .join("orders", "c_custkey", "o_custkey", how="left")
         .join("nation", "c_nationkey", "n_nationkey"))
    plan = optimize(q)
    assert [s.alias for s in plan.steps] == ["orders", "nation"]
    assert plan.notes


def test_access_path_index_analog(spark, db, tmp_path):
    from cs186_query_optimization_project_spark.sources import writers

    out = str(tmp_path / "orders_idx")
    writers.write_indexed(db.table("orders"), out, ("o_totalprice",),
                          num_files=4)
    db.register_parquet("orders_idx", out, index_columns=("o_totalprice",))
    # unclustered index scan costs ~1 I/O per matching record
    # (IndexScanOperator.java:170–177), so it only beats the seq scan when
    # RF < pages/records (~1/rows_per_page) — pick a cutoff in the top 0.5%
    s = db.stats("orders_idx")
    lo, hi = s.columns["o_totalprice"].min, s.columns["o_totalprice"].max
    cutoff = hi - 0.005 * (hi - lo)
    q = (db.query("orders_idx")
         .where("o_totalprice", GT, cutoff)
         .select("o_orderkey"))
    plan = optimize(q)
    ap = plan.access_paths["orders_idx"]
    assert ap.kind == "INDEXSCAN" and ap.column == "o_totalprice"
    # and a non-selective predicate keeps the seq scan
    q2 = db.query("orders_idx").where("o_totalprice", GT, 0.0)
    ap2 = optimize(q2).access_paths["orders_idx"]
    assert ap2.kind == "SEQSCAN"


def test_spark_strategy_broadcasts_smaller_side():
    from cs186_query_optimization_project_spark.plans.optimizer import (
        BROADCAST_THRESHOLD_BYTES, _spark_strategy)
    big = BROADCAST_THRESHOLD_BYTES * 10
    small = 1024
    assert _spark_strategy(big, small) == "broadcast"        # right small
    assert _spark_strategy(small, big) == "broadcast_left"   # left small
    assert _spark_strategy(big, big // 4) == "shuffle_hash"
    assert _spark_strategy(big, big) == "auto"


def test_broadcast_left_strategy_in_plan(db):
    plan = (db.query("nation")
            .join("lineitem", "n_nationkey", "l_suppkey",
                  strategy="broadcast_left")
            .select("n_name").execute()
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    got = rows(db.query("nation")
               .join("lineitem", "n_nationkey", "l_suppkey",
                     strategy="broadcast_left")
               .group_by("n_name").count().execute())
    want = duck_rows("SELECT n_name, COUNT(*) AS countAgg FROM nation "
                     "JOIN lineitem ON n_nationkey = l_suppkey "
                     "GROUP BY n_name")
    assert got == want
