"""Scale-aware sinks.

Three write shapes, each mapping a reference concept to its cluster-scale
analog (SURVEY.md §2.11, §4.1-O2):

- ``write_table``: plain parquet (the reference's heap file).
- ``write_indexed``: sorted-within-partitions by the "index" columns →
  parquet row-group min/max skipping serves pushed range filters, the
  B+-tree range-scan analog.  Globally range-partitioned first
  (``repartitionByRange``) so each file owns a disjoint key range —
  at 100 TB a filter then prunes whole files, not just row groups.
- ``write_bucketed``: hash-bucketed + sorted saveAsTable → joins and
  aggregations on the bucket key need NO shuffle (the Grace-hash
  partition phase, done once at write time and reused by every query).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def write_table(df: DataFrame, path: str, mode: str = "overwrite",
                partition_by: tuple[str, ...] = ()) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_indexed(df: DataFrame, path: str, index_columns: tuple[str, ...],
                  mode: str = "overwrite",
                  num_files: int | None = None) -> None:
    """Range-partition + sort by ``index_columns`` so pushed predicates
    skip files and row groups (the unclustered-index analog)."""
    out = df
    if num_files:
        out = out.repartitionByRange(num_files, *index_columns)
    else:
        out = out.repartitionByRange(*index_columns)
    out.sortWithinPartitions(*index_columns).write.mode(mode).parquet(path)


def write_bucketed(df: DataFrame, table_name: str, bucket_columns: tuple[str, ...],
                   num_buckets: int = 16, mode: str = "overwrite") -> None:
    """Bucketed managed table: co-locates future joins/aggs on the bucket
    columns (no shuffle — Spark recognizes matching bucketing on both
    sides).

    Overwrite also clears an ORPHANED warehouse location: a fresh session's
    in-memory catalog doesn't know about tables a previous process wrote,
    and saveAsTable refuses to reuse the on-disk location
    (LOCATION_ALREADY_EXISTS) even in overwrite mode."""
    if mode == "overwrite":
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        wh = wh.removeprefix("file:")
        loc = os.path.join(wh, table_name.lower())
        if wh and os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    (df.write.mode(mode)
     .bucketBy(num_buckets, *bucket_columns)
     .sortBy(*bucket_columns)
     .format("parquet")
     .saveAsTable(table_name))
