"""Parallelism guard for compute-heavy pipelines over small inputs.

A 0.6 MB parquet file arrives as ONE input partition, so any expensive
per-row pipeline downstream of it (shingling, 64-bit sketching, Arrow
mapInPandas feature extraction) runs on one core no matter how many the
cluster has.  ``ensure_parallelism`` repartitions **only when the input has
fewer partitions than the scheduler can use** — at real scale (thousands of
input splits) it is a no-op and costs nothing; on a starved input it pays
one tiny shuffle to unlock every core.

This is the local analog of what a real deployment gets from
``spark.sql.files.maxPartitionBytes`` tuning or splittable inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, *key_cols: str,
                       min_factor: int = 1) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism × min_factor`` partitions
    (hash-partitioned by ``key_cols`` if given) iff it currently has fewer.

    Checking the partition count converts the plan to an RDD lineage (no
    job is triggered)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() >= target:
        return df
    if key_cols:
        return df.repartition(target, *key_cols)
    return df.repartition(target)
