"""Reference-style plan pretty-printer.

Reproduces the *format* of ``QueryOperator.toString()``
(``db/query/QueryOperator.java:158–168``, join form
``JoinOperator.java:160–172``; example Project2Spec.md:80–97)::

    type: BNLJ
    leftColumn: S.sid
    rightColumn: E.sid
        (left)
        type: WHERE
        ...
            type: SEQSCAN
            table: E

        (right)
        type: SEQSCAN
        table: S

so plan-shape tests can assert on the same strings the reference's tests
assert on.  For the optimal path each node also carries the engine's
estimates and the Spark strategy hint chosen.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from cs186_query_optimization_project_spark.plans.builder import Query


def _indent(text: str, by: int = 4) -> str:
    pad = " " * by
    return "\n".join(pad + line if line else line
                     for line in text.splitlines())


def explain_query(query: "Query", optimal: bool = False) -> str:
    if optimal:
        from cs186_query_optimization_project_spark.plans.optimizer import optimize

        plan = query.cached_plan() or optimize(query)
        tree = _optimal_tree(query, plan)
    else:
        tree = _naive_tree(query)
    return _wrap_outer(query, tree)


# ------------------------------------------------------------------ #
def _scan_node(query: "Query", alias: str, table: str,
               access_kind: str = "SEQSCAN", column: str | None = None,
               cost: int | None = None,
               predicate: str | None = None,
               value: object | None = None) -> str:
    lines = [f"type: {access_kind}", f"table: {table}"]
    if alias != table:
        lines.append(f"alias: {alias}")
    if column:
        lines.append(f"column: {column}")
    if predicate is not None:
        lines.append(f"predicate: {predicate}")
        lines.append(f"value: {value}")
    if cost is not None:
        lines.append(f"estIOCost: {cost}")
    return "\n".join(lines)


def _naive_index_where(query: "Query"):
    """``checkIndexEligible`` analog (``QueryPlan.java:477–494``): even the
    NAIVE plan takes the index access path iff the query is single-table
    with no group-by and some WHERE hits an indexed base-table column with
    a non-NEQ predicate — the first such WHERE (declaration order) wins
    and is consumed by the scan.  Execution is unchanged (Catalyst pushes
    the predicate into the parquet scan either way); this is the reported
    access-path *decision*, mirrored so plan-shape tests can assert on it
    like the reference's do."""
    from cs186_query_optimization_project_spark.predicates import (
        REFERENCE_OPS,
        PredicateOperator,
    )

    if query.joins or query.group_bys or not query.wheres:
        return None
    idx_cols = set(query.db.index_columns(query.base_table))
    for w in query.wheres:
        # sargable = the reference's comparison subset minus NOT_EQUALS;
        # additive ops (LIKE/IN/IS NULL/...) can't be served by a key
        # descent or min/max row-group skip, so they never take the path
        if (w.ref.alias == query.base_alias and w.ref.column in idx_cols
                and w.op in REFERENCE_OPS
                and w.op is not PredicateOperator.NOT_EQUALS):
            return w
    return None


def _where_nodes(query: "Query", alias_filter, child: str,
                 skip=None) -> str:
    """Stack WHERE nodes over a child, innermost first (reference stacks
    one operator per predicate, ``QueryPlan.java:527–540``).  ``skip`` is
    the WHERE already consumed by an index scan (``generateIndexPlan``
    removes it from the list, ``QueryPlan.java:496–505``)."""
    out = child
    for w in query.wheres:
        if w is skip:
            continue
        if alias_filter is not None and w.ref.alias != alias_filter:
            continue
        out = "\n".join([
            "type: WHERE",
            f"column: {w.ref.qualified}",
            f"predicate: {w.op.name}",
            f"value: {w.value}",
            _indent(out),
        ])
    return out


def _join_node(kind: str, left_col: str, right_col: str, left_tree: str,
               right_tree: str, extra: list[str] | None = None) -> str:
    lines = [f"type: {kind}", f"leftColumn: {left_col}",
             f"rightColumn: {right_col}"]
    lines += extra or []
    lines.append(_indent("(left)\n" + left_tree))
    lines.append("")
    lines.append(_indent("(right)\n" + right_tree))
    return "\n".join(lines)


def _naive_tree(query: "Query") -> str:
    index_where = _naive_index_where(query)
    if index_where is not None:
        tree = _scan_node(query, query.base_alias, query.base_table,
                          "INDEXSCAN", index_where.ref.column,
                          predicate=index_where.op.name,
                          value=index_where.value)
    else:
        tree = _scan_node(query, query.base_alias, query.base_table)
    for j in query.joins:
        right = _scan_node(query, j.alias, j.table)
        kind = "JOIN" if j.how == "inner" else f"JOIN[{j.how.upper()}]"
        tree = _join_node(kind, j.left.qualified, j.right.qualified,
                          tree, right)
    tree = _where_nodes(query, None, tree, skip=index_where)
    return tree


def _optimal_tree(query: "Query", plan) -> str:
    ap = plan.access_paths[plan.base_alias]
    tree = _scan_node(query, plan.base_alias, plan.base_table, ap.kind,
                      ap.column, ap.cost_pages)
    tree = _where_nodes(query, plan.base_alias, tree)
    for step in plan.steps:
        ap = plan.access_paths[step.alias]
        right = _scan_node(query, step.alias, step.table, ap.kind, ap.column,
                           ap.cost_pages)
        right = _where_nodes(query, step.alias, right)
        extra = [
            f"estIOCost: {step.est_cost_pages}",
            f"estRows: {step.est_rows}",
            f"sparkStrategy: {step.strategy}",
        ]
        if step.swapped:
            extra.append("argOrder: swapped")
        tree = _join_node(step.page_algorithm.value, step.left.qualified,
                          step.right.qualified, tree, right, extra)
    return tree


def _wrap_outer(query: "Query", tree: str) -> str:
    if query.group_bys:
        tree = "\n".join([
            "type: GROUPBY",
            f"columns: [{', '.join(g.qualified for g in query.group_bys)}]",
            _indent(tree),
        ])
    if query.selects or query.aggs:
        cols = [s.out for s in query.selects] + [a.out for a in query.aggs]
        lines = ["type: SELECT", f"columns: [{', '.join(cols)}]"]
        for a in query.aggs:
            lines.append(f"agg: {a.sql()}")
        lines.append(_indent(tree))
        tree = "\n".join(lines)
    return tree
