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

from cs186_query_optimization_project_spark.errors import DatabaseException


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


def _interleave_bits(a, b, bits: int):
    """Morton (Z-order) interleave of two ``bits``-wide non-negative
    ints: a's bit i lands at 2i, b's at 2i+1.  Pure shift/mask Column
    expressions — stays inside whole-stage codegen."""
    from pyspark.sql import functions as F

    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(
            F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def write_zordered(df: DataFrame, path: str, columns: tuple[str, str],
                   bits: int = 8, num_files: int = 16,
                   mode: str = "overwrite") -> None:
    """Z-order clustered write: rows are range-partitioned and sorted by
    the Morton interleave of the two columns' normalized ranks, so
    parquet row-group min/max stats are narrow on BOTH columns — a
    filter on either one (or both) skips most files/row groups.  A
    lexicographic sort (``write_indexed``) only does this for the
    leading column; Z-order is the standard multi-dimension clustering
    trade (Delta OPTIMIZE ZORDER BY does the same): each column's ranges
    widen ~sqrt-fold vs its own dedicated sort, in exchange for every
    clustered column pruning at once.

    One aggregation pass collects each column's min/max (the writer-side
    stats); normalization to ``bits`` wide ranks bounds the interleave
    width.  At 100 TB: ``num_files`` scales with data so files stay
    row-group sized; the range partitioner keeps the z-curve contiguous
    per file.
    """
    from pyspark.sql import functions as F

    c0, c1 = columns
    row = df.agg(F.min(c0).alias("min0"), F.max(c0).alias("max0"),
                 F.min(c1).alias("min1"), F.max(c1).alias("max1")).first()
    if row["min0"] is None or row["min1"] is None:
        # empty table / all-NULL cluster column: nothing to interleave —
        # write as-is (matching write_table's behavior) instead of
        # crashing on None arithmetic
        df.write.mode(mode).parquet(path)
        return
    top = (1 << bits) - 1
    span0 = (row["max0"] - row["min0"]) or 1
    span1 = (row["max1"] - row["min1"]) or 1
    r0 = ((F.col(c0) - F.lit(row["min0"])) * top / F.lit(span0)).cast("long")
    r1 = ((F.col(c1) - F.lit(row["min1"])) * top / F.lit(span1)).cast("long")
    z = _interleave_bits(r0, r1, bits)
    (df.repartitionByRange(num_files, z)
     .sortWithinPartitions(z)
     .write.mode(mode).parquet(path))


def compact_table(spark, path: str, target_file_bytes: int = 128 << 20,
                  sort_by: tuple[str, ...] = ()) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet table into
    ceil(bytes / target) files (optionally re-sorted so compaction
    doubles as re-clustering), then atomically swap via rename.
    Returns (files_before, files_after).

    The small-files problem is THE silent scale killer for streaming /
    incremental sinks: a 100 TB table accreted in 1 MB files costs
    ~10^8 open/footer-parse round trips per scan and floods the driver
    with task scheduling.  At lake scale this is Delta OPTIMIZE /
    Iceberg rewrite_data_files; the same plan (read → repartition to
    size → rewrite → swap) expressed directly.  Sizing uses the real
    on-disk bytes, not row counts — compressed width varies too much
    across tables for a row heuristic.

    Flat layouts only: a hive-partitioned table is refused (its files
    live in subdirectories, and a naive rewrite would both mis-size the
    output and silently DISCARD the partition layout — partition-aware
    compaction rewrites per-partition, the Delta OPTIMIZE WHERE shape).
    The swap itself is two renames; a crash between them leaves the
    table at ``<path>.compact_old`` (recover by renaming it back) —
    single-directory rename is the strongest atomicity a plain
    filesystem offers, which is precisely why lakehouse formats move
    the commit into a log."""
    import math
    import os
    import shutil

    files, part_dirs = [], []
    for entry in os.listdir(path):
        full = os.path.join(path, entry)
        if entry.endswith(".parquet"):
            files.append(full)
        elif os.path.isdir(full) and "=" in entry:
            part_dirs.append(entry)
    if part_dirs:
        raise DatabaseException(
            f"compact_table('{path}'): table is hive-partitioned "
            f"({part_dirs[0]}, ...); flat-layout compaction would "
            f"discard the partition layout — compact per-partition "
            f"instead")
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if sort_by:
        out = (df.repartitionByRange(n_out, *sort_by)
               .sortWithinPartitions(*sort_by))
    else:
        out = df.repartition(n_out)
    tmp = path.rstrip("/") + ".compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".compact_old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    n_after = len([f for f in os.listdir(path)
                   if f.endswith(".parquet")])
    return len(files), n_after
