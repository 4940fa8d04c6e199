"""Custom join operators: as-of, range (binned), salted — correctness vs
straightforward Spark equivalents on small synthetic frames."""

import pytest
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark.operators import joins
from tests.conftest import rows


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [(1, 10, "t1"), (1, 20, "t2"), (1, 35, "t3"), (2, 5, "t4"),
         (3, 50, "t5")],
        ["sym", "ts", "trade"])


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [(1, 5, 100.0), (1, 20, 101.0), (1, 30, 102.0), (2, 9, 50.0)],
        ["sym", "ts", "px"])


def test_asof_backward(trades, quotes):
    out = {(r["sym"], r["ts"]): r["px"]
           for r in joins.asof_join(trades, quotes, on="sym").collect()}
    assert out[(1, 10)] == 100.0      # latest quote at ts<=10 is ts=5
    assert out[(1, 20)] == 101.0      # tie: ts=20 quote matches ts=20 trade
    assert out[(1, 35)] == 102.0
    assert out[(2, 5)] is None        # quote at ts=9 is in the future
    assert out[(3, 50)] is None       # no quotes for key 3 at all


def test_asof_keeps_left_columns(trades, quotes):
    out = joins.asof_join(trades, quotes, on="sym")
    assert set(out.columns) == {"sym", "ts", "trade", "px"}
    assert out.count() == trades.count()


def test_range_join_binned_equals_plain(spark):
    points = spark.range(0, 1000).select(
        (F.col("id") * 7 % 500).cast("double").alias("v"), "id")
    intervals = spark.createDataFrame(
        [(0.0, 100.0, "lo"), (100.0, 250.0, "mid"), (250.0, 500.0, "hi"),
         (400.0, 450.0, "band")],
        ["lo", "hi", "label"])
    plain = joins.range_join(points, intervals, "v", "lo", "hi")
    binned = joins.range_join(points, intervals, "v", "lo", "hi",
                              bin_size=64.0)
    assert rows(plain.select("id", "label")) == \
        rows(binned.select("id", "label"))
    assert plain.count() > 1000  # overlapping band produces extra matches


def test_salted_join_equals_plain(db):
    nation = db.table("nation")
    region = db.table("region").withColumnRenamed("r_regionkey",
                                                  "n_regionkey")
    plain = nation.join(region, "n_regionkey").select("n_name", "r_name")
    salted = joins.salted_join(nation, region, "n_regionkey") \
        .select("n_name", "r_name")
    assert rows(salted) == rows(plain)


def test_asof_null_value_in_latest_right_row(spark):
    trades = spark.createDataFrame([(1, 30, "t")], ["sym", "ts", "trade"])
    quotes = spark.createDataFrame(
        [(1, 10, 5.0, 100), (1, 20, None, 200)],
        "sym long, ts long, px double, size long")
    row = joins.asof_join(trades, quotes, on="sym").collect()[0]
    # latest right row (ts=20) carries px=NULL and size=200 as a unit —
    # no falling back to the stale ts=10 px, no mixing rows
    assert row["px"] is None and row["size"] == 200


def test_salted_join_rejects_outer(db):
    with pytest.raises(ValueError, match="salted_join does not support"):
        joins.salted_join(db.table("nation"), db.table("region"),
                          "n_regionkey", how="full")
