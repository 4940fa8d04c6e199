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


def local_rows_df(spark, data, schema=None) -> DataFrame:
    """``createDataFrame`` for SMALL driver-side literal row lists —
    one input slice instead of ``defaultParallelism``.

    PySpark's list path parallelizes the rows into
    ``sc.defaultParallelism`` slices however few there are, so every
    later action touching a handful of literal rows (a DML insert's
    staged write, a probe-table collect, a broadcast build) schedules
    dozens of near-empty Python tasks.  One slice is the right shape
    for bounded literal batches at ANY cluster size — the work is a
    single task either way, without the per-task scheduling and Python
    worker round-trips of the empty slices.  Measured (interleaved
    A/B, 2-row frame, local[32]): staged partitionBy write 565→405 ms,
    collect 405→250 ms.

    Semantics are identical to ``spark.createDataFrame(data, schema)``
    — same row values, same schema handling (DDL string, StructType,
    or None for Row inference); only the (unobservable) partitioning
    of the literal frame changes.  Type verification moves from the
    driver to the task, which is irrelevant for the fixed literal
    batches this engine feeds it."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), schema)


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
