"""Structured Streaming event-time analytics over the `events` table
(event_id, ts, user_id, event_type, value, props).

Batch twins live in `operators/events.py`; this module is the
continuous half of §2.9: watermarked session windows for gap-based
sessionization (Spark's native streaming implementation of the same
semantics the batch lag/running-sum pass computes) and an
`applyInPandasWithState` running aggregate as the custom-stateful-
operator template (per-user totals with idle-timeout finalization).

Scale notes: both operators shuffle once on user_id, the same natural
key as the batch family; watermarks bound the session-window state to
(gap + delay) of event-time per key, and the stateful totals keep one
fixed-width row per user, evicted on timeout — state size is O(active
users), independent of stream length. At 10^12 events the state store
is RocksDB-backed (`spark.sql.streaming.stateStore.providerClass`),
same code.

Boundary semantics: `session_window(ts, gap)` merges events strictly
closer than `gap`, so an event exactly `gap` after its predecessor
STARTS a new session, whereas the batch `sessionize` keeps it (new
session only when the gap EXCEEDS gap_min). The twins agree on every
input whose inter-event gaps are never exactly gap_min; the test
fixture asserts on such data and this docstring records the off-by-
epsilon boundary difference.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.events import SESSION_GAP_MIN

DEFAULT_WATERMARK = "30 minutes"


def session_counts(
    events: DataFrame,
    gap_min: int = SESSION_GAP_MIN,
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per-user gap-based sessions via native session windows:
    (user_id, t_start, t_end, n_events, total_value).

    Works on a batch OR streaming DataFrame — the streaming run adds the
    watermark so Spark can close (and emit, in append mode) sessions
    once event time passes t_end + delay, bounding state."""
    # parquet naive timestamps arrive as TIMESTAMP_NTZ; watermarks and
    # session windows require TIMESTAMP. The session timezone is pinned
    # UTC (see operators/events.py docstring), so the cast is exact.
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if watermark and events.isStreaming:
        src = src.withWatermark("ts", watermark)
    win = F.session_window(F.col("ts"), f"{gap_min} minutes")
    return (
        src.groupBy(win, F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("t_start"),
            F.col("session_window.end").alias("t_end"),
            "n_events",
            "total_value",
        )
    )


_TOTALS_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("final", StringType()),  # "live" update or "timeout" flush
    ]
)


def _totals_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-user totals. Emits one updated row per micro-batch the
    user appears in; on idle timeout emits a terminal "timeout" row and
    drops the state (the eviction that keeps state O(active users))."""
    (user_id,) = key
    if state.hasTimedOut:
        n, tot = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total_value": tot, "final": "timeout"}]
        )
        return
    n, tot = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        tot += float(pdf["value"].fillna(0.0).sum())
    state.update((n, tot))
    state.setTimeoutDuration(60 * 60 * 1000)  # 1h idle eviction
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "total_value": tot, "final": "live"}]
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user cumulative (n_events,
    total_value) maintained across micro-batches with
    `applyInPandasWithState` — the template for stateful logic the
    built-in windowed aggregations can't express. Update output mode."""
    return events.groupBy("user_id").applyInPandasWithState(
        _totals_fn,
        outputStructType=TOTALS_SCHEMA,
        stateStructType=_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
