"""Golden tests for the page-mode cost model.

The expected numbers are the reference's own cost assertions
(``test/query/QueryPlanCostsTest.java:94–199``, tabulated in BASELINE.md §1),
re-derived here from the same table shapes: the allTypes schema is 14 bytes
wide (bool 1 + int 4 + string(5) 5 + float 4), giving 288 records per 4 KiB
slotted page.
"""

import math

from cs186_query_optimization_project_spark.plans import cost as C

ALL_TYPES_ROW_BYTES = 14  # bool + int + char(5) + float


def test_entries_per_page_all_types():
    # ((4096*8) // (1 + 8*14)) // 8 * 8  == 288 (Table.java:379–382)
    assert C.entries_per_page(ALL_TYPES_ROW_BYTES) == 288


def test_table_pages():
    assert C.table_pages(576, ALL_TYPES_ROW_BYTES) == 2
    assert C.table_pages(1152, ALL_TYPES_ROW_BYTES) == 4
    assert C.table_pages(288 * 18, ALL_TYPES_ROW_BYTES) == 18


def test_snlj_golden():
    # QueryPlanCostsTest.java:94–119 — 2306 / 2308
    assert C.cost_snlj(576, 2, 4) == 2306
    assert C.cost_snlj(1152, 4, 2) == 2308


def test_pnlj_golden():
    # QueryPlanCostsTest.java:122–147 — 10 / 12
    assert C.cost_pnlj(2, 4) == 10
    assert C.cost_pnlj(4, 2) == 12


def test_bnlj_golden():
    # QueryPlanCostsTest.java:149–174 — 42 / 40 with B=5 → block 3
    assert C.cost_bnlj(18, 4, buffer_pages=5) == 42
    assert C.cost_bnlj(4, 18, buffer_pages=5) == 40


def test_grace_hash_golden():
    # QueryPlanCostsTest.java:176–199 — 66 both orders
    assert C.cost_grace_hash(18, 4) == 66
    assert C.cost_grace_hash(4, 18) == 66


def test_index_scan_formula():
    # ceil((numRecords + indexPages) * RF) — IndexScanOperator.java:170–177
    assert C.cost_index_scan(300, 47, 99 / 299) == math.ceil(347 * 99 / 299)
    assert C.cost_index_scan(1000, 0, 0.5) == 500


def test_min_cost_join_prefers_pnlj_small():
    algo, swapped, cost = C.min_cost_join(576, 2, 1152, 4, buffer_pages=5)
    # candidates: SNLJ 2306/2308, PNLJ 10/12, BNLJ 6/6? BNLJ: ceil(2/3)*4+2=6
    # BNLJ wins at 6 (both orders tie; unswapped kept)
    assert cost <= 10
    assert algo in (C.JoinAlgorithm.PNLJ, C.JoinAlgorithm.BNLJ)


def test_join_cost_dispatch():
    for algo in C.JoinAlgorithm:
        assert C.join_cost(algo, 576, 2, 1152, 4) > 0
