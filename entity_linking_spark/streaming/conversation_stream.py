"""Streaming conversation profiles over the transcripts table.

The batch twin is `operators/conversations.conversation_stats`; this is
the continuous half: agent sessions arrive turn-by-turn, the profile
(turn/role/tool counts, time span, text volume) is maintained per
conversation across micro-batches with `applyInPandasWithState`, and a
conversation is FINALIZED by inactivity — no explicit end-of-session
marker exists in a transcript stream, so idle timeout IS the close
signal. On timeout the operator emits a terminal `final='closed'` row
and drops the state.

Scale shape: one shuffle on conv_id (the table's natural key, same as
the batch aggregate); state is one fixed-width row per OPEN
conversation, evicted on idle timeout, so state size is O(concurrently
active sessions), independent of stream length. At 10^12 turns the
state store is RocksDB-backed — same code.

Downstream use: the closed-row stream is the trigger for the
incremental linking fold (`streaming/incremental_stream.py`) — a
conversation's turns are linked once its profile closes, not while it
is still being written.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("n_user_turns", LongType()),
        StructField("n_assistant_turns", LongType()),
        StructField("n_tool_calls", LongType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
        StructField("total_chars", LongType()),
        StructField("final", StringType()),
    ]
)

_PROFILE_STATE = StructType(
    [
        StructField("n_turns", LongType()),
        StructField("n_user", LongType()),
        StructField("n_assistant", LongType()),
        StructField("n_tool", LongType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
        StructField("chars", LongType()),
    ]
)

IDLE_TIMEOUT_MS = 30 * 60 * 1000  # conversation closes after 30 min idle


def _profile_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key

    def row(vals, final):
        n, nu, na, nt, f_us, l_us, ch = vals
        return pd.DataFrame(
            [
                {
                    "conv_id": conv_id,
                    "n_turns": n,
                    "n_user_turns": nu,
                    "n_assistant_turns": na,
                    "n_tool_calls": nt,
                    "first_us": f_us,
                    "last_us": l_us,
                    "total_chars": ch,
                    "final": final,
                }
            ]
        )

    if state.hasTimedOut:
        vals = state.get
        state.remove()
        yield row(vals, "closed")
        return

    n, nu, na, nt, f_us, l_us, ch = (
        state.get if state.exists else (0, 0, 0, 0, None, None, 0)
    )
    for pdf in pdfs:
        n += len(pdf)
        nu += int((pdf["role"] == "user").sum())
        na += int((pdf["role"] == "assistant").sum())
        nt += int(pdf["tool"].notna().sum())
        us = pdf["ts"].astype("int64")  # ns since epoch
        lo, hi = int(us.min()) // 1000, int(us.max()) // 1000
        f_us = lo if f_us is None else min(f_us, lo)
        l_us = hi if l_us is None else max(l_us, hi)
        ch += int(pdf["text"].str.len().fillna(0).sum())
    state.update((n, nu, na, nt, f_us, l_us, ch))
    state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    yield row((n, nu, na, nt, f_us, l_us, ch), "live")


def conversation_running_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation running profile across micro-batches; emits a
    `final='live'` row whenever a conversation appears in a batch and a
    terminal `final='closed'` row (then evicts) after IDLE_TIMEOUT_MS of
    processing-time inactivity. Update output mode."""
    return transcripts.groupBy("conv_id").applyInPandasWithState(
        _profile_fn,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=_PROFILE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
