"""Window/analytic operators (SURVEY.md §2.8 — absent in the reference).

All are thin declarative compositions over ``pyspark.sql.Window``; the
partition column is the shuffle key, so at 100 TB the partitionBy choice is
the whole performance story — these helpers force an explicit partition
column for that reason (no global windows, which would funnel everything
through one task).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(df: DataFrame, partition_by: list[str],
                    order_by: list[Column], k: int,
                    rank_col: str = "rn") -> DataFrame:
    """Top-k rows per group via row_number (ties broken by the caller's
    order_by list — pass a unique tiebreak column for determinism)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (df.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= k))


def running_aggregate(df: DataFrame, partition_by: list[str],
                      order_by: list[Column],
                      aggs: dict[str, Column]) -> DataFrame:
    """Cumulative aggregates from the partition start to the current row.
    ``aggs`` maps output name → aggregate Column (e.g. F.sum(...))."""
    w = (Window.partitionBy(*partition_by).orderBy(*order_by)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out


def lag_lead(df: DataFrame, partition_by: list[str], order_by: list[Column],
             col: str, offsets: tuple[int, int] = (1, 1)) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (df.withColumn(f"{col}_lag", F.lag(col, offsets[0]).over(w))
            .withColumn(f"{col}_lead", F.lead(col, offsets[1]).over(w)))


def sessionize(df: DataFrame, user_col: str, ts_col: str,
               gap_minutes: float = 30.0,
               tiebreak: str | None = None) -> DataFrame:
    """Batch sessionization: a session break occurs where the gap to the
    previous event exceeds ``gap_minutes``; session index = running count
    of breaks (the classic lag + cumulative-sum shape; streaming analog is
    ``session_window`` in streaming/windows.py)."""
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    # timestamp subtraction yields a day-time interval with exact
    # microsecond arithmetic, works on both TIMESTAMP and TIMESTAMP_NTZ,
    # and has no session-timezone dependency — unix_timestamp would floor
    # to seconds and diverge, cast-to-double is illegal on NTZ
    gap = F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0),
                             F.lit(float(gap_minutes) * 60.0))
    is_break = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > gap), 1).otherwise(0)
    return df.withColumn("session_idx",
                         F.sum(is_break).over(
                             w.rowsBetween(Window.unboundedPreceding, 0)))


def pivot_table(df: DataFrame, group_col: str, pivot_col: str,
                values: list, agg: Column) -> DataFrame:
    """Pivot with an explicit value list (never let Spark scan for distinct
    pivot values at scale)."""
    return df.groupBy(group_col).pivot(pivot_col, values).agg(agg)


def frame_aggregate(df: DataFrame, partition_by: list[str],
                    order_by: list[Column], aggs: dict[str, Column],
                    frame: tuple[int, int] = (-2, 0)) -> DataFrame:
    """Sliding-frame aggregates (``ROWS BETWEEN frame[0] AND frame[1]``):
    moving averages / rolling sums.  Frames are evaluated per partition
    after one shuffle on the partition key — no self-join."""
    w = (Window.partitionBy(*partition_by).orderBy(*order_by)
         .rowsBetween(frame[0], frame[1]))
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out


def funnel(df: DataFrame, user_col: str, ts_col: str, type_col: str,
           stages: list[str]) -> DataFrame:
    """Ordered funnel analysis: how many users completed each stage
    prefix IN ORDER — stage i counts only if an event of stage i's type
    occurs strictly after the user's chosen stage-(i−1) event (earliest
    valid, the standard funnel semantics).

    One shuffle total: per user, collect each stage's event times into
    arrays, then chain ``array_min(filter(ts_list, t -> t > prev))``
    row-locally — no join per stage (the join-chain formulation costs
    one shuffle PER stage).  Arrays hold only the stage-typed event
    times of one user; for users with pathological event counts,
    pre-cap with a per-(user, type) earliest-k reduction before calling
    (the aggregate itself min-combines map-side, so the shuffle carries
    at most |stages| arrays per user per input partition).

    Returns (stage_idx, stage, n_users), stage_idx 1-based."""
    aggs = [
        F.collect_list(F.when(F.col(type_col) == s, F.col(ts_col)))
        .alias(f"__ts_{i}")
        for i, s in enumerate(stages)
    ]
    per_user = df.groupBy(user_col).agg(*aggs)
    def _min_after(lst: Column, prev: Column) -> Column:
        # closure (not a default arg: pyspark reads a 2-param lambda as
        # (element, index) and passes an INT index)
        return F.array_min(F.filter(lst, lambda x: x > prev))

    reach_prev: Column | None = None
    reached = []
    for i in range(len(stages)):
        lst = F.col(f"__ts_{i}")
        t = (F.array_min(lst) if reach_prev is None
             else _min_after(lst, reach_prev))
        reached.append(t)
        reach_prev = t
    scored = per_user.select(*[
        t.isNotNull().cast("int").alias(f"__r{i}")
        for i, t in enumerate(reached)
    ])
    counts = scored.agg(*[
        F.sum(f"__r{i}").cast("bigint").alias(f"__n{i}")
        for i in range(len(stages))
    ])
    # escape backslashes THEN quotes: stage names are data, not SQL —
    # an unescaped apostrophe would break (or alter) the generated
    # expression, and a trailing backslash would swallow the closing
    # quote if escaped in the other order
    stack = ", ".join(
        "{}, '{}', __n{}".format(
            i + 1, s.replace("\\", "\\\\").replace("'", "\\'"), i)
        for i, s in enumerate(stages))
    return counts.select(F.expr(
        f"stack({len(stages)}, {stack}) AS (stage_idx, stage, n_users)"))


def cohort_retention(df: DataFrame, user_col: str, ts_col: str,
                     max_weeks: int | None = None) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the ISO week of
    their first event; each (cohort_week, week_offset) cell counts the
    distinct cohort users active in that later week.

    Shape: per-user first-event week (one groupBy shuffle, map-side
    min-combined) joins back onto the per-(user, week) distinct
    activity — both sides keyed on the user, so the join reuses the
    aggregation's partitioning — then one count-distinct per cell.
    Offsets are exact multiples of 7 days (both ends Monday-truncated).

    Returns (cohort_week DATE, week_offset INT, n_users)."""
    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    activity = (df.select(F.col(user_col).alias("__u"),
                          week.alias("__w")).distinct())
    first = (activity.groupBy("__u")
             .agg(F.min("__w").alias("cohort_week")))
    cells = (activity.join(first, "__u")
             .withColumn("week_offset",
                         (F.datediff("__w", "cohort_week") / 7)
                         .cast("int")))
    if max_weeks is not None:
        cells = cells.filter(F.col("week_offset") <= max_weeks)
    return (cells.groupBy("cohort_week", "week_offset")
            .agg(F.count_distinct("__u").alias("n_users"))
            .orderBy("cohort_week", "week_offset"))


def resample_fill(df: DataFrame, key_col: str, ts_col: str,
                  value: Column, unit: str = "hour") -> DataFrame:
    """Regularize an event series: aggregate ``value`` per (key, time
    bucket), materialize EVERY bucket in each key's [first, last] span,
    and forward-fill gaps with the last observed value.

    Returns (key, bucket, value, is_gap).  Shape: one groupBy shuffle
    for the per-bucket aggregate; the dense grid comes from a row-local
    ``sequence`` + explode over the per-key span (never a driver-side
    loop — a key spanning years explodes on its own executor); the
    fill is ``last(..., ignorenulls)`` over the per-key bucket order.
    Buckets are exact unit multiples, so the grid join key matches the
    aggregate's bucket bit-for-bit."""
    bucket = F.date_trunc(unit, F.col(ts_col))
    agg = (df.groupBy(F.col(key_col).alias("__k"),
                      bucket.alias("__b"))
           .agg(value.alias("__v")))
    step = F.expr(f"INTERVAL 1 {unit.upper()}")
    grid = (agg.groupBy("__k")
            .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
            .select("__k", F.explode(F.sequence("__lo", "__hi", step))
                    .alias("__b")))
    w = (Window.partitionBy("__k").orderBy("__b")
         .rowsBetween(Window.unboundedPreceding, 0))
    joined = grid.join(agg, ["__k", "__b"], "left")
    return joined.select(
        F.col("__k").alias(key_col),
        F.col("__b").alias("bucket"),
        F.last("__v", ignorenulls=True).over(w).alias("value"),
        F.col("__v").isNull().alias("is_gap"))


def global_row_number(df: DataFrame, *order_cols: Column,
                      out_col: str = "rn") -> DataFrame:
    """Total-order row numbering WITHOUT a single-partition window.

    ``row_number() OVER (ORDER BY ...)`` funnels every row through one
    task; this is the distributed equivalent: range-repartition on the
    order columns (pinned with a localCheckpoint so both passes see
    identical partitions), collect ONE count row per partition and
    prefix-sum on the driver (bounded by the partition count, never the
    data), then number rows inside each range-sorted partition with an
    Arrow cumcount shifted by the partition's prefix.  Numbers are
    1-based and dense, identical to row_number over the same total
    order — pass a unique tie-break column for determinism, exactly as
    you would with a window.

    Columns must round-trip through Arrow (scalars/strings/arrays —
    true for every vocab/stats shape this engine ranks)."""
    import pandas as pd  # noqa: F401  (mapInPandas contract)
    from pyspark.sql import types as T

    spark = df.sparkSession
    nparts = max(spark.sparkContext.defaultParallelism, 1)
    part = (df.repartitionByRange(nparts, *order_cols)
            .sortWithinPartitions(*order_cols)
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint(eager=False))
    offsets, acc = {}, 0
    for r in sorted(part.groupBy("__pid")
                    .agg(F.count(F.lit(1)).alias("n")).collect(),
                    key=lambda r: r["__pid"]):
        offsets[int(r["__pid"])] = acc
        acc += int(r["n"])
    b_offsets = spark.sparkContext.broadcast(offsets)
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out_col, T.LongType())])

    def run(batches):
        base = None
        for pdf in batches:
            if base is None:
                base = b_offsets.value.get(int(pdf["__pid"].iloc[0]), 0)
            out = pdf.drop(columns="__pid")
            out[out_col] = range(base + 1, base + len(out) + 1)
            base += len(out)
            yield out

    return part.mapInPandas(run, schema)
