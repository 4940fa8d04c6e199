"""Engine exceptions, mirroring the reference's error surface.

The reference signals query-construction problems with ``QueryPlanException``
(e.g. ambiguous column names, ``db/query/QueryOperator.java:143``) and data
problems with ``DatabaseException`` (e.g. schema mismatch on insert,
``db/table/Schema.java:45–64``).  We keep the same two-level split so tests
can assert on error category.
"""

from __future__ import annotations


class DatabaseException(Exception):
    """Data-level errors: unknown table, schema mismatch on write."""


class QueryPlanException(DatabaseException):
    """Query-construction errors: unknown/ambiguous columns, bad predicates,
    invalid group-by/select combinations."""


class ConflictException(DatabaseException):
    """Optimistic-concurrency commit validation failed: a table this
    transaction wrote was republished by another committer after this
    transaction's snapshot was taken.  The analog of being chosen as the
    reference's deadlock victim (``WaitsForGraph.java:58–88``) — the
    caller retries on a fresh snapshot instead of blocking on a lock."""


class DeadlockException(DatabaseException):
    """Pessimistic (2PL) path: granting this lock request would close a
    cycle in the waits-for graph, so it is refused BEFORE blocking — the
    reference's deadlock *prevention* (``WaitsForGraph.java:58–88``,
    ``LockManager.java:49–85``): the requester aborts/retries instead of
    the system ever entering deadlock."""
