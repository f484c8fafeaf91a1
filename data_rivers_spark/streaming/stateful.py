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


SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("event_types", T.StringType()),
    ]
)

SESSION_STATE = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("types", T.StringType()),
    ]
)


def _make_session_updater(gap_ms: int):
    def update(key, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed last_event + gap: the session is FINAL — emit
            # once and drop the state (this is the emission semantics
            # session_window cannot give a custom payload)
            start_ms, end_ms, n, total, types = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "event_types": [types],
                }
            )
            return
        start_ms, end_ms, n, total, types = (
            state.get if state.exists else (None, None, 0, 0.0, "")
        )
        seen = set(types.split(",")) if types else set()
        for pdf in batches:
            if not len(pdf):
                continue
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            lo, hi = min(ts_ms), max(ts_ms)
            start_ms = lo if start_ms is None else min(start_ms, lo)
            end_ms = hi if end_ms is None else max(end_ms, hi)
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            seen.update(pdf["event_type"].dropna().tolist())
        state.update((start_ms, end_ms, n, total, ",".join(sorted(seen))))
        # close when the event-time watermark passes session end + gap;
        # clamp above the current watermark (Spark rejects a timeout already
        # in the past — possible when the group's last event arrived near
        # the lateness bound)
        state.setTimeoutTimestamp(
            max(end_ms + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover - makes this a generator

    return update


def closed_user_sessions(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Gap-based sessions with CUSTOM per-session payloads, emitted exactly
    once when the event-time watermark closes the session — the shape
    ``session_window`` cannot produce (it yields only built-in aggregates in
    append mode; here the session carries a distinct-event-type digest and
    could carry any state machine).

    applyInPandasWithState with EventTimeTimeout: per-user state accumulates
    across micro-batches; ``setTimeoutTimestamp(last_event + gap)`` arms the
    close, and the timed-out branch emits the final row and removes state —
    so state size tracks CONCURRENT sessions, not event volume, and a user
    idle past the gap costs nothing. Requires ``withWatermark`` upstream
    (enforced here) because the timeout clock IS the watermark.

    End-of-input caveat (batch-style runs with trigger availableNow):
    sessions whose close timestamp lands beyond the final watermark are NOT
    emitted — they are genuinely still open; the next run of the same
    checkpointed query resumes their state. That is the correct streaming
    answer; a report that must flush everything unions the emitted rows with
    ``read_open_sessions(spark, checkpoint_dir)`` (state-store data source,
    no restart required)."""
    gap_ms = _duration_ms(gap)
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_updater(gap_ms),
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _duration_ms(s: str) -> int:
    qty, unit = s.split()
    mult = {
        "millisecond": 1, "milliseconds": 1,
        "second": 1000, "seconds": 1000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
        "day": 86_400_000, "days": 86_400_000,
    }[unit]
    return int(qty) * mult


def read_open_sessions(spark, checkpoint_dir: str) -> "DataFrame":
    """Offline view of the OPEN sessions a ``closed_user_sessions`` query is
    still holding — Spark's state-store data source read against the query's
    checkpoint, no streaming restart required.

    This answers the two operational questions the emit-on-close contract
    leaves open: "what is currently in flight?" (monitoring) and "flush
    everything for a final report" (batch-style runs that ended with
    sessions still open — union this with the emitted closed sessions).

    Reads committed state only; safe to run while the stream is down or
    between availableNow runs. Column shape mirrors SESSION_OUTPUT minus
    finality (these sessions may still grow)."""
    from pyspark.sql import functions as F

    state = (
        spark.read.format("statestore")
        .load(checkpoint_dir)
    )
    # statestore rows: key struct = grouping key; for applyInPandasWithState
    # the value struct nests the user state under `groupState` next to the
    # armed `timeoutTimestamp`
    return state.select(
        F.col("key.user_id").alias("user_id"),
        F.timestamp_millis(F.col("value.groupState.start_ms")).alias("session_start"),
        F.timestamp_millis(F.col("value.groupState.end_ms")).alias("session_end"),
        F.col("value.groupState.n").alias("n_events"),
        F.round(F.col("value.groupState.total"), 2).alias("total_value"),
        F.col("value.groupState.types").alias("event_types"),
    )
