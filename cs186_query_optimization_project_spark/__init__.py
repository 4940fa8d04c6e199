"""cs186_query_optimization_project_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of the reference
engine (guosiyuan/CS186-Query-Optimization-project, a single-node Java
relational engine with a System R cost-based optimizer) as an idiomatic
PySpark package:

- ``Database`` / ``Query``: fluent relational query builder with the
  reference's verbs (``where/join/select/groupBy/count/sum/average``) plus
  the natural Spark extensions (order-by, limit, distinct, having, outer/
  semi/anti joins, window functions).  Reference: ``db/query/QueryPlan.java``.
- ``plans``: table statistics, a page-mode cost model reproducing the
  reference's I/O-cost formulas, and a System-R bottom-up dynamic-programming
  join orderer that emits join-strategy hints (broadcast / shuffle-hash /
  sort-merge) for Catalyst.  Reference: ``QueryPlan.executeOptimal``.
- ``operators``: DataFrame-first implementations of every operator category
  in SURVEY.md §2 (scans, filters, projections, aggregates, joins, sorts,
  set ops, windows).
- ``functions``: beyond-reference large-scale pipeline operators — exact +
  MinHash-LSH + SimHash dedup with connected-component clustering,
  materialized-index embedding similarity search, text analysis,
  deterministic hash-split / stratified sampling, multimodal column
  plumbing.
- ``streaming``: Structured Streaming windowed aggregation, sessionization,
  stateful dedup, and stream-stream / stream-static joins over the
  ``events`` stream.
- ``transactions``: optimistic snapshot transactions over the copy-on-write
  table versions (the cluster-honest analog of the reference's 2PL,
  ``db/concurrency/LockManager.java``).
- ``PartitionedTable`` / ``MaterializedView``: the delta-lite lakehouse
  layer — partition-level copy-on-write MVCC with MERGE / OPTIMIZE /
  VACUUM / RESTORE / shallow CLONE / CHECK constraints / DESCRIBE
  HISTORY / change data feed / exactly-once streaming sinks, and
  CDF-refreshed incremental aggregate views.

Everything is declarative DataFrame/SQL so Catalyst + Tungsten handle
physical execution (pushdown, pruning, codegen, AQE); nothing from the
reference's physical layer (pages, B+ trees, locks) is ported.
"""

from cs186_query_optimization_project_spark.concurrency import (
    PessimisticTransaction,
)
from cs186_query_optimization_project_spark.database import Database
from cs186_query_optimization_project_spark.mview import MaterializedView
from cs186_query_optimization_project_spark.partitioned import (
    PartitionedTable,
)
from cs186_query_optimization_project_spark.predicates import PredicateOperator
from cs186_query_optimization_project_spark.session import get_spark, stop_spark
from cs186_query_optimization_project_spark.transactions import Transaction

__all__ = ["Database", "MaterializedView", "PartitionedTable",
           "PessimisticTransaction", "PredicateOperator",
           "Transaction", "get_spark", "stop_spark"]

__version__ = "0.1.0"
