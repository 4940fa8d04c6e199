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
