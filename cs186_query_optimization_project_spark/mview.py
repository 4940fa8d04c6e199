"""Incrementally-maintained materialized aggregate views.

A ``MaterializedView`` stores ``groupBy(keys).agg(count, sum(cols))``
over a :class:`~cs186_query_optimization_project_spark.partitioned.
PartitionedTable`, plus the source version it reflects.  ``refresh()``
does NOT rescan the source: it reads the change data feed since the
last refreshed version and folds signed deltas (insert → +1/+value,
delete → −1/−value) into the stored aggregate — the classic
incremental view maintenance algebra for distributive aggregates
(Gupta & Mumick, "Maintenance of Materialized Views", IEEE DE Bulletin
1995).  Groups whose maintained count reaches zero drop out, matching
a from-scratch recompute exactly.

Scale shape: the delta aggregation shuffles only the CHURNED rows'
keys (CDF cost tracks churn, not table size); the merge joins the
delta — grouped, so ≤ |churned keys| rows — against the stored
aggregate, which is |groups|-sized, not table-sized.  A 100 TB fact
table with a 1 GB/day churn refreshes in churn time.  AVG and other
algebraic aggregates derive from (sum, count) at read time; MIN/MAX
are NOT maintainable from deltas alone (a deleted max needs a rescan)
and are deliberately out of scope, like most engines' incremental MV
restrictions.

Refresh is ATOMIC via a store-pointer swap: the merged aggregate
materializes into a fresh generation directory, then one
``os.replace`` of the sidecar flips (source_version, store) together —
a reader re-opening the view sees either the old consistent pair or
the new one, never a half-applied refresh.  Old generations persist
until :meth:`MaterializedView.vacuum` (same reachability discipline as
``PartitionedTable.vacuum``).

Store format: generations persist (keys, mv_count, mv_sum_<c>,
mv_nn_<c>) — the non-null counts are load-bearing for NULL-correct
sums, so a store written by a pre-mv_nn build cannot refresh; rebuild
the view (create) rather than migrating.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs186_query_optimization_project_spark.errors import DatabaseException
from cs186_query_optimization_project_spark.partitioned import (
    PartitionedTable,
)

_META = "_mview.json"


class MaterializedView:
    """Handle to a stored incremental aggregate view."""

    def __init__(self, spark: SparkSession, source: PartitionedTable,
                 root: str):
        self.spark = spark
        self.source = source
        self.root = root.rstrip("/")
        if not os.path.exists(os.path.join(self.root, _META)):
            raise DatabaseException(
                f"no materialized view at '{self.root}'; use "
                f"MaterializedView.create")
        meta = self._meta()
        self.keys: list[str] = meta["keys"]
        self.sum_cols: list[str] = meta["sum_cols"]
        self.filter_sql: str | None = meta.get("filter_sql")

    def _meta(self) -> dict:
        with open(os.path.join(self.root, _META)) as f:
            return json.load(f)

    def _store(self) -> PartitionedTable:
        return PartitionedTable(
            self.spark, os.path.join(self.root, self._meta()["store"]))

    # ------------------------------------------------------------------ #
    @staticmethod
    def _aggregate(df: DataFrame, keys: list[str],
                   sum_cols: list[str]) -> DataFrame:
        # mv_nn_<c> (non-null contribution count) rides along so the
        # incremental merge can preserve SQL SUM's NULL semantics: a
        # group whose contributions are all NULL must stay SUM=NULL,
        # which coalesce-to-0 arithmetic alone cannot represent
        return (df.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("mv_count"),
                     *[e for c in sum_cols for e in
                       (F.sum(F.col(c).cast("double"))
                        .alias(f"mv_sum_{c}"),
                        F.count(F.col(c)).alias(f"mv_nn_{c}"))]))

    @classmethod
    def create(cls, spark: SparkSession, source: PartitionedTable,
               root: str, keys: list[str],
               sum_cols: list[str] | None = None,
               filter_sql: str | None = None) -> "MaterializedView":
        """Materialize the initial aggregate (ONE full-source scan —
        the only one the view will ever do) and record the source
        version it reflects.  ``filter_sql`` makes it a PREDICATE view
        (``SELECT keys, agg FROM src WHERE <filter> GROUP BY keys``):
        selection commutes with the signed-delta algebra, so refresh
        simply applies the same predicate to the change feed before
        folding — rows entering or leaving the predicate via UPDATE
        surface in CDF as delete+insert pairs and fold correctly."""
        sum_cols = sum_cols or []
        root = root.rstrip("/")
        src_version = source.versions()[-1]
        base = source.read()
        if filter_sql:
            base = base.filter(F.expr(filter_sql))
        agg = cls._aggregate(base, keys, sum_cols) \
            .withColumn("__mv", F.lit(0))
        os.makedirs(root, exist_ok=False)
        store = f"gen_{src_version}"
        PartitionedTable.create(spark, agg, os.path.join(root, store),
                                "__mv")
        with open(os.path.join(root, _META), "x") as f:
            f.write(json.dumps({"keys": keys, "sum_cols": sum_cols,
                                "filter_sql": filter_sql,
                                "source_version": src_version,
                                "store": store}))
        return cls(spark, source, root)

    # ------------------------------------------------------------------ #
    def refreshed_version(self) -> int:
        return self._meta()["source_version"]

    def read(self, with_avg: bool = False) -> DataFrame:
        """The stored aggregate as of the last refresh (stale reads are
        the contract — consistency is 'reflects source version N',
        recorded and queryable).  ``with_avg=True`` derives
        ``mv_avg_<c>`` the way SQL AVG does — sum over the NON-NULL
        contribution count (which the store maintains), not over the
        row count — so an all-NULL group averages to NULL, never 0."""
        out = self._store().read().drop("__mv")
        if with_avg:
            for c in self.sum_cols:
                out = out.withColumn(
                    f"mv_avg_{c}",
                    F.when(F.col(f"mv_nn_{c}") > 0,
                           F.col(f"mv_sum_{c}") / F.col(f"mv_nn_{c}")))
        return out.drop(*[f"mv_nn_{c}" for c in self.sum_cols])

    # ------------------------------------------------------------------ #
    def refresh(self) -> int:
        """Fold the source's CDF since the last refreshed version into
        the stored aggregate; returns the number of CHANGE rows folded.
        Never rescans the source.  Row-free source commits (OPTIMIZE,
        constraint changes, a no-op restore) advance the recorded
        version WITHOUT rewriting the store; the group-key merge join
        is NULL-safe (a NULL group key is an ordinary group, as in SQL
        GROUP BY); and an orphaned generation directory left by a
        refresh that crashed before its sidecar swap is reclaimed on
        the retry."""
        meta = self._meta()
        last = meta["source_version"]
        cur = self.source.versions()[-1]
        if cur == last:
            return 0
        # one materialization of the churn (bounded by CDF size): the
        # count, the delta aggregation, and the merge all read it
        feed = self.source.changes(last, cur)
        if self.filter_sql:
            feed = feed.filter(F.expr(self.filter_sql))
        feed = feed.localCheckpoint()
        n_changes = feed.count()
        if n_changes == 0:
            self._swap_meta(dict(meta, source_version=cur))
            return 0
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)) \
            .otherwise(F.lit(-1))
        delta = (feed.withColumn("__sign", sign)
                 .groupBy(*self.keys)
                 .agg(F.sum("__sign").alias("d_count"),
                      *[e for c in self.sum_cols for e in
                        (F.sum(F.col(c).cast("double") * F.col("__sign"))
                         .alias(f"d_sum_{c}"),
                         F.sum(F.col(c).isNotNull().cast("long")
                               * F.col("__sign"))
                         .alias(f"d_nn_{c}"))]))
        stored = self._store().read().drop("__mv")
        cond = None
        for k in self.keys:
            eq = stored[k].eqNullSafe(delta[k])  # NULL key = a group
            cond = eq if cond is None else (cond & eq)

        def _sum(c):
            nn = (F.coalesce(stored[f"mv_nn_{c}"], F.lit(0))
                  + F.coalesce(delta[f"d_nn_{c}"], F.lit(0)))
            s = (F.coalesce(stored[f"mv_sum_{c}"], F.lit(0.0))
                 + F.coalesce(delta[f"d_sum_{c}"], F.lit(0.0)))
            return [F.when(nn > 0, s).alias(f"mv_sum_{c}"),
                    nn.alias(f"mv_nn_{c}")]

        merged = (stored.join(delta, cond, "full_outer")
                  .select(
                      *[F.coalesce(stored[k], delta[k]).alias(k)
                        for k in self.keys],
                      (F.coalesce(stored["mv_count"], F.lit(0))
                       + F.coalesce(delta["d_count"], F.lit(0)))
                      .alias("mv_count"),
                      *[e for c in self.sum_cols for e in _sum(c)])
                  .filter(F.col("mv_count") > 0)
                  .withColumn("__mv", F.lit(0)))
        # pid-suffixed generation name: a CONCURRENT refresher writes
        # its own directory (last sidecar swap wins atomically, nobody
        # rmtrees a live peer's in-flight write), while a crashed
        # refresh's orphan — reclaimed here only when it carries OUR
        # pid, i.e. a recycled-pid leftover, never a live writer — or
        # any non-current generation falls to vacuum()
        store = f"gen_{cur}_{os.getpid()}"
        gen_path = os.path.join(self.root, store)
        if os.path.isdir(gen_path):
            shutil.rmtree(gen_path, ignore_errors=True)
        PartitionedTable.create(
            self.spark, merged.select(*stored.columns, "__mv"),
            gen_path, "__mv")
        self._swap_meta(dict(meta, source_version=cur, store=store))
        return n_changes

    def _swap_meta(self, meta: dict) -> None:
        tmp = os.path.join(self.root, _META + ".tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps(meta))
        os.replace(tmp, os.path.join(self.root, _META))  # the swap

    def vacuum(self) -> list[str]:
        """Delete every generation directory except the current one
        (readers holding an old handle must re-open — same discipline
        as ``PartitionedTable.vacuum``)."""
        keep = self._meta()["store"]
        removed = []
        for name in sorted(os.listdir(self.root)):
            p = os.path.join(self.root, name)
            if name.startswith("gen_") and name != keep \
                    and os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
        return removed
