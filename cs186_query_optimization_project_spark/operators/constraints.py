"""Declarative data-quality constraint checks (violation counting).

Beyond-reference warehouse surface: the reference engine validates
schemas on write (``db/Database.java`` type checks) but has no
constraint layer; production pipelines gate loads on checks like
these.  Each check returns a one-row DataFrame
(``check_name``, ``violations``) so a report is a plain union and the
whole suite stays declarative (one job, no driver-side row handling).

Scale shape: not-null is a map-side conditional sum (no shuffle
beyond the final 1-row aggregate); unique groups on the key columns
(the natural partitioning of the data being checked); the FK check is
one anti-join against the parent's distinct keys — broadcast when the
parent is a dimension, shuffle otherwise.  Violation COUNTS, not
violating rows, cross the wire.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_not_null(df: DataFrame, col: str) -> DataFrame:
    return df.agg(
        F.coalesce(F.sum(F.col(col).isNull().cast("bigint")), F.lit(0))
        .cast("bigint").alias("violations")).select(
        F.lit(f"not_null({col})").alias("check_name"), "violations")


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations = surplus rows beyond one per key (a key appearing
    3× contributes 2)."""
    name = f"unique({', '.join(cols)})"
    return (df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
                 .cast("bigint").alias("violations"))
            .select(F.lit(name).alias("check_name"), "violations"))


def check_foreign_key(child: DataFrame, fk: str, parent: DataFrame,
                      pk: str, broadcast_parent: bool = True) -> DataFrame:
    """Orphan count: non-null child keys with no parent row (SQL FK
    convention — null FK values pass)."""
    keys = parent.select(F.col(pk).alias(fk)).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    name = f"foreign_key({fk}->{pk})"
    return (child.filter(F.col(fk).isNotNull())
            .join(keys, fk, "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
            .select(F.lit(name).alias("check_name"), "violations"))


def constraint_report(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check results into a single report frame."""
    return reduce(lambda x, y: x.unionByName(y), checks)
