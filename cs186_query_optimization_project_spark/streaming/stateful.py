"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.9/§2.10 — the extension point the reference exposes as
"subclass QueryOperator", re-expressed as Spark's arbitrary-stateful API).

``user_running_totals`` keeps one small state row per user (count + sum),
emitting updated totals per micro-batch; state size is O(distinct users),
partitioned across executors by the groupBy key — the standard scalable
shape for streaming accumulators.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def _update_user(key: tuple[Any, ...],
                 pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [total]})


def user_running_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user running (count, sum) via arbitrary state.
    Batch fallback (tests): plain groupBy aggregation with identical
    output schema — total_value coalesces to 0.0 because the streaming
    path's pandas ``sum`` over an all-null group yields 0.0, and the
    two paths must agree row-for-row (lambda reconciliation)."""
    if events.isStreaming:
        return (events.groupBy("user_id")
                .applyInPandasWithState(
                    _update_user, OUTPUT_SCHEMA, STATE_SCHEMA,
                    "update", GroupStateTimeout.NoTimeout))
    from pyspark.sql import functions as F

    return (events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.coalesce(F.sum("value"), F.lit(0.0))
                 .alias("total_value")))
