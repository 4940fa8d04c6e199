"""Type-2 slowly-changing-dimension (SCD2) merge.

Beyond-reference warehouse surface (complements ``Database.merge_rows``:
MERGE overwrites in place, SCD2 preserves history): applying a change
batch to a versioned dimension closes out the current version of every
changed key (``valid_to`` = batch timestamp, ``is_current`` = false),
appends a new current version, inserts brand-new keys, and leaves
no-op change rows (identical tracked attributes) untouched.

Scale shape: one shuffle — the full-outer join of current rows vs the
change batch on the business key.  History rows never enter the join
(filtered out up front and unioned back), so cost is proportional to
|current| + |batch|, not |history|.  All change routing is column
expressions on the joined row; no driver-side iteration.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(dim: DataFrame, changes: DataFrame, key: str,
               tracked: list[str], batch_ts: str,
               from_col: str = "valid_from", to_col: str = "valid_to",
               current_col: str = "is_current") -> DataFrame:
    """Apply ``changes`` (one row per key: the key's latest attribute
    values) to SCD2 table ``dim`` and return the new full-history table.

    A key is *changed* when any tracked attribute differs null-safely
    from its current version.  Closed-out rows keep their original
    ``valid_from``; new versions start at ``batch_ts`` with an open
    ``valid_to``.  Keys absent from the batch — and batch rows whose
    attributes match the current version exactly — pass through with no
    new version (the property that keeps re-running the same batch
    idempotent)."""
    hist = dim.filter(~F.col(current_col))
    cur = dim.filter(F.col(current_col)).alias("cur")
    chg = changes.select(key, *tracked).alias("chg")

    differs: Column = reduce(
        lambda a, b: a | b,
        [~F.col(f"cur.{c}").eqNullSafe(F.col(f"chg.{c}"))
         for c in tracked])
    j = cur.join(chg, F.col(f"cur.{key}") == F.col(f"chg.{key}"),
                 "full_outer")
    has_cur = F.col(f"cur.{key}").isNotNull()
    has_chg = F.col(f"chg.{key}").isNotNull()

    out_cols = [key, *tracked, from_col, to_col, current_col]
    closed = (j.filter(has_cur & has_chg & differs)
              .select(F.col(f"cur.{key}").alias(key),
                      *[F.col(f"cur.{c}").alias(c) for c in tracked],
                      F.col(f"cur.{from_col}").alias(from_col),
                      # cast like the fresh branch does: an uncast
                      # string literal would widen a TIMESTAMP valid_to
                      # column to string through the union
                      F.lit(batch_ts).cast(dim.schema[to_col].dataType)
                      .alias(to_col),
                      F.lit(False).alias(current_col)))
    unchanged = (j.filter(has_cur & (~has_chg | ~differs))
                 .select(F.col(f"cur.{key}").alias(key),
                         *[F.col(f"cur.{c}").alias(c) for c in tracked],
                         F.col(f"cur.{from_col}").alias(from_col),
                         F.col(f"cur.{to_col}").alias(to_col),
                         F.col(f"cur.{current_col}").alias(current_col)))
    fresh = (j.filter(has_chg & (~has_cur | differs))
             .select(F.col(f"chg.{key}").alias(key),
                     *[F.col(f"chg.{c}").alias(c) for c in tracked],
                     F.lit(batch_ts).alias(from_col),
                     F.lit(None).cast(dim.schema[to_col].dataType)
                     .alias(to_col),
                     F.lit(True).alias(current_col)))
    return (hist.select(*out_cols)
            .unionByName(closed)
            .unionByName(unchanged)
            .unionByName(fresh))


def scd2_init(df: DataFrame, key: str, tracked: list[str],
              batch_ts: str, from_col: str = "valid_from",
              to_col: str = "valid_to",
              current_col: str = "is_current") -> DataFrame:
    """Bootstrap an SCD2 table from a plain snapshot: every row becomes
    the open current version as of ``batch_ts``."""
    return df.select(
        key, *tracked,
        F.lit(batch_ts).alias(from_col),
        F.lit(None).cast("string").alias(to_col),
        F.lit(True).alias(current_col))
