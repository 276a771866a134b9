"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the streaming twin of
``ops.events.sessionize`` (whose docstring promises exactly this
mapping).

Semantics: per ``user_id``, a session closes when the event-time gap to
the next event exceeds ``gap_minutes``; a closed session row
(user_id, started_at, ended_at, n_events) is emitted either when a
later event arrives past the gap, or when the event-time watermark
passes ``ended_at + gap`` (state timeout) — so state is bounded by the
number of OPEN sessions, never by history.

Equivalence contract (tested): over a static corpus replayed as a
stream, the emitted sessions equal the batch ``sessionize`` output —
including each user's final session, which the timeout flushes once the
watermark advances past it (availableNow runs flush on the terminal
batch's timeout pass when later data advances the watermark; the test
appends a sentinel event far in the future for exactly this).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("started_at", T.TimestampType()),
        T.StructField("ended_at", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# state: (started_us, last_us, n) for the single open session of the key
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """events stream (user_id, ts, ...) → closed-session rows."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (uid,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            # watermark passed the open session's end + gap: flush it
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((uid, start_us, last_us, n))
                state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                # pandas Timestamp.value is ns
                ts_us.extend(int(v) // 1000 for v in pdf["ts"].astype("int64"))
            ts_us.sort()
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us, last_us, n = None, None, 0
            for t in ts_us:
                if last_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    closed.append((uid, start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
                else:
                    last_us, n = t, n + 1
            if last_us is not None:
                state.update((start_us, last_us, n))
                # event-time timeout once the watermark passes end + gap
                state.setTimeoutTimestamp((last_us + gap_us) // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "started_at": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "ended_at": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, SESSION_SCHEMA, STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
