"""Data-profiling operators: key-skew diagnostics and outlier flags.

Operational companions to the optimizer's table stats
(``plans/stats.py``): before running a 100 TB join you want to know
whether the join key is skewed (one reducer gets the hot key's rows)
and whether a numeric column has pathological values.  Both operators
are pure two-level aggregations — the first groupBy shuffles on the
key/group, the second collapses to a handful of rows — so they cost
one pass over the table and are safe to run at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew(df: DataFrame, key_col: str,
             hot_factor: float = 2.0) -> DataFrame:
    """One-row skew profile of ``key_col``'s value distribution.

    ``skew_ratio = max_count / avg_count`` is the headline: it bounds
    how unbalanced a shuffle partitioned on this key can get (ratio 1 =
    uniform; at ratio 50 the hot key's reducer does 50× the average
    work and you want salting or AQE skew-join before running the real
    query).  ``hot_keys`` counts keys above ``hot_factor ×`` average.

    Shape: groupBy(key).count() — the same partial-aggregated shuffle
    the real join would do, but carrying only counts — then a scalar
    aggregate.  Counts are re-aggregated, never collected.
    """
    per_key = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    stats = per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_count"),
        (F.sum("cnt") / F.count(F.lit(1))).alias("__avg"))
    hot = (per_key.crossJoin(F.broadcast(stats.select("__avg")))
           .filter(F.col("cnt") > F.lit(hot_factor) * F.col("__avg"))
           .agg(F.count(F.lit(1)).cast("long").alias("hot_keys")))
    return (stats.crossJoin(hot)
            .select("n_keys", "n_rows", "max_count",
                    F.round("__avg", 6).alias("avg_count"),
                    F.round(F.col("max_count") / F.col("__avg"), 4)
                    .alias("skew_ratio"),
                    "hot_keys"))


def zscore_outliers(df: DataFrame, value_col: str, group_col: str,
                    threshold: float = 3.0) -> DataFrame:
    """Rows whose ``value_col`` is more than ``threshold`` population
    standard deviations from their group's mean.

    Two-pass shape that scales: pass 1 computes per-group (mean, stddev)
    — a tiny aggregate that *broadcasts* back; pass 2 re-scans and
    filters.  No window function, so no per-group sort and no state
    beyond the group stats.  ``stddev_pop`` (not sample) so a 1-row
    group yields 0, never null/NaN division.

    Output: the outlier rows' ids plus their z-score (rounded — ranking
    stable across partitionings).
    """
    stats = (df.groupBy(group_col)
             .agg(F.avg(value_col).alias("__mu"),
                  F.stddev_pop(value_col).alias("__sigma")))
    cols = [F.col(c) for c in df.columns]
    return (df.join(F.broadcast(stats), group_col)
            .filter((F.col("__sigma") > 0)
                    & (F.abs(F.col(value_col) - F.col("__mu"))
                       > F.lit(threshold) * F.col("__sigma")))
            .select(*cols,
                    F.round((F.col(value_col) - F.col("__mu"))
                            / F.col("__sigma"), 4).alias("zscore")))
