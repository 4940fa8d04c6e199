"""Page-mode I/O cost model — the reference's formulas, verbatim in Python.

The reference costs every operator in 4 KiB-page I/Os (``SURVEY.md §6``,
``BASELINE.md``).  We reproduce the formulas exactly so the golden numbers
from ``test/query/QueryPlanCostsTest.java`` hold, and use them as the
pedagogical cost model inside the System-R planner (plans/optimizer.py).
Separately the planner uses a bytes-based model for real Spark decisions
(broadcast thresholds); the page mode exists for explainability + parity
tests.

Formulas (reference file:line in BASELINE.md §1):

- ``pages(T)``       = ceil(numRecords / entriesPerPage)
- ``entriesPerPage`` = ((pageSize·8) // (1 + 8·rowBytes)) // 8 · 8
                       (slot bitmap math, ``Table.java:379–382``)
- SeqScan            = pages(T)
- IndexScan          = ceil((numRecords + indexPages) · RF)
- SNLJ               = records(L)·pages(R) + pages(L)
- PNLJ               = pages(L)·pages(R) + pages(L)
- BNLJ               = ceil(pages(L)/(B−2))·pages(R) + pages(L)
- GraceHash          = 3·(pages(L) + pages(R))
"""

from __future__ import annotations

import enum
import math

PAGE_SIZE = 4096
#: Reference default buffer budget (``Database.java:36–38``).
DEFAULT_BUFFER_PAGES = 5


class JoinAlgorithm(enum.Enum):
    """The reference's JoinType enum (``db/query/JoinOperator.java:19–24``)."""

    SNLJ = "SNLJ"
    PNLJ = "PNLJ"
    BNLJ = "BNLJ"
    GRACEHASH = "GRACEHASH"


def entries_per_page(row_bytes: int, page_size: int = PAGE_SIZE) -> int:
    """Slotted-page capacity: 1 bitmap bit + 8·rowBytes bits per slot,
    rounded down to a whole byte of bitmap (``Table.java:379–382``)."""
    return ((page_size * 8) // (1 + 8 * row_bytes)) // 8 * 8

def table_pages(num_records: int, row_bytes: int,
                page_size: int = PAGE_SIZE) -> int:
    per_page = max(entries_per_page(row_bytes, page_size), 1)
    return max(math.ceil(num_records / per_page), 1)


def cost_seq_scan(pages: int) -> int:
    return pages


def cost_index_scan(num_records: int, index_pages: int, rf: float) -> int:
    """Unclustered index range scan (``IndexScanOperator.java:170–177``)."""
    return math.ceil((num_records + index_pages) * rf)


def cost_snlj(left_records: int, left_pages: int, right_pages: int) -> int:
    return left_records * right_pages + left_pages


def cost_pnlj(left_pages: int, right_pages: int) -> int:
    return left_pages * right_pages + left_pages


def cost_bnlj(left_pages: int, right_pages: int,
              buffer_pages: int = DEFAULT_BUFFER_PAGES) -> int:
    block = max(buffer_pages - 2, 1)
    return math.ceil(left_pages / block) * right_pages + left_pages


def cost_grace_hash(left_pages: int, right_pages: int) -> int:
    return 3 * (left_pages + right_pages)


def join_cost(algorithm: JoinAlgorithm, left_records: int, left_pages: int,
              right_records: int, right_pages: int,
              buffer_pages: int = DEFAULT_BUFFER_PAGES) -> int:
    if algorithm is JoinAlgorithm.SNLJ:
        return cost_snlj(left_records, left_pages, right_pages)
    if algorithm is JoinAlgorithm.PNLJ:
        return cost_pnlj(left_pages, right_pages)
    if algorithm is JoinAlgorithm.BNLJ:
        return cost_bnlj(left_pages, right_pages, buffer_pages)
    if algorithm is JoinAlgorithm.GRACEHASH:
        return cost_grace_hash(left_pages, right_pages)
    raise ValueError(f"unknown join algorithm {algorithm!r}")


def min_cost_join(left_records: int, left_pages: int, right_records: int,
                  right_pages: int,
                  buffer_pages: int = DEFAULT_BUFFER_PAGES,
                  ) -> tuple[JoinAlgorithm, bool, int]:
    """Reference ``minCostJoinType`` (``QueryPlan.java:336–392``): cost all
    four algorithms in BOTH argument orders (8 candidates), return
    (algorithm, swapped, cost) where ``swapped`` means right became the
    outer/left input."""
    best: tuple[JoinAlgorithm, bool, int] | None = None
    for algo in JoinAlgorithm:
        for swapped in (False, True):
            lr, lp, rp = ((right_records, right_pages, left_pages) if swapped
                          else (left_records, left_pages, right_pages))
            c = join_cost(algo, lr, lp, 0, rp, buffer_pages)
            if best is None or c < best[2]:
                best = (algo, swapped, c)
    return best
