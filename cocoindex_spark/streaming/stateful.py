"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.11 / task brief: "applyInPandasWithState for custom
stateful operators").

``sessionize_stream`` is the cross-batch sessionizer: per-key session
state (start, last-seen, count) lives in the streaming state store and
survives micro-batch boundaries — a session that spans three batches
emits once, when a gap or a processing-time timeout closes it. The
batch-mode q51 sessionization is the same semantics over a static
frame; this is its live form. Arrival-time gap logic, no event-time
watermark — matching the engine's (and the reference's) last-writer
arrival-order model.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("count", LongType()),
    ]
)


def make_sessionizer(gap_sec: int, timeout_ms: int = 0):
    """The per-group state function. Factored out of the stream wiring
    so its logic is unit-testable with plain pandas frames + a fake
    GroupState (the streaming harness test injects batches instead)."""
    gap = gap_sec

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        closed: list[tuple[str, int, int, int]] = []
        if state.hasTimedOut:
            if state.exists:
                start, last, count = state.get
                closed.append((key[0], start, last, count))
            state.remove()
        else:
            ts_all: list[int] = []
            for pdf in pdfs:
                ts_all.extend(int(t) for t in pdf["ts"])
            ts_all.sort()
            if state.exists:
                start, last, count = state.get
            else:
                start = last = count = None
            for t in ts_all:
                if start is None:
                    start, last, count = t, t, 1
                elif t - last > gap:
                    closed.append((key[0], start, last, count))
                    start, last, count = t, t, 1
                else:
                    last, count = t, count + 1
            if start is not None:
                state.update((start, last, count))
                if timeout_ms:
                    state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(
                closed, columns=["key", "session_start", "session_end", "n_events"]
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    gap_sec: int = 30,
    timeout_ms: int = 0,
) -> DataFrame:
    """events(key, ts[long]) stream → closed sessions stream.

    Sessions close when the next event for the key arrives more than
    ``gap_sec`` after the previous one, or (with ``timeout_ms`` > 0)
    when no event arrives for that long in processing time — the idle
    flush that makes the last session of a quiet key eventually emit.
    State is per-key and bounded (three longs), so the state store
    scales with live keys, not with events.
    """
    from pyspark.sql import functions as F

    keyed = events.select(
        F.col(key_col).cast("string").alias("key"), F.col(ts_col).cast("long").alias("ts")
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if timeout_ms else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("key").applyInPandasWithState(
        make_sessionizer(gap_sec, timeout_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
