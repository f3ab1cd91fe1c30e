"""Custom stateful streaming operator: event sessionization with
``applyInPandasWithState`` — the Structured Streaming escape hatch for
operators Spark lacks (per-key custom state + processing-time timeouts).

A session = consecutive events of one user separated by gaps < ``gap``;
per-key state holds (session_start, last_ts, n_events, sum_value) and a
closed session is emitted when a new event arrives after the gap, or when
the key's timeout fires with no new data.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["sessionize"]

OUTPUT_DDL = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long, sum_value double"
)
STATE_DDL = "start long, last long, n long, sv double"


def _session_fold(key, pdfs: Iterator[pd.DataFrame], state, gap_us: int, ts_col: str):
    """The per-key fold behind :func:`sessionize`, module-level so the
    state-machine logic is unit-testable against a fake GroupState
    (driving a live query per edge case is a minute of polling each)."""
    (user_id,) = key
    closed = []
    if state.hasTimedOut:
        if state.exists:
            s, last, n, sv = state.get
            closed.append((user_id, s, last, n, sv))
            state.remove()
    else:
        rows = pd.concat(list(pdfs))
        # a NULL ts is NaT, whose int64 sentinel is a huge NEGATIVE
        # "timestamp" that would seed session_start in year ~-290k
        # and gap-split every real event; an event that can't be
        # ordered can't sessionize — drop it
        rows = rows[rows[ts_col].notna()].sort_values(ts_col)
        ts_us = (rows[ts_col].astype("int64") // 1000).to_numpy()
        # SQL SUM semantics for the value: NULL contributes nothing
        # (NaN would otherwise poison sum_value for the whole session)
        vals = rows["value"].fillna(0.0).to_numpy()
        if state.exists:
            s, last, n, sv = state.get
        else:
            s = last = None
            n, sv = 0, 0.0
        for t, v in zip(ts_us.tolist(), vals.tolist()):
            if s is None:
                s, last, n, sv = t, t, 1, float(v)
            elif t - last >= gap_us:
                closed.append((user_id, s, last, n, sv))
                s, last, n, sv = t, t, 1, float(v)
            else:
                # late (cross-batch out-of-order) events extend the
                # session but must never move its bounds BACKWARD:
                # last=t could emit session_end < session_start and
                # falsely split the next in-order event off
                last, n, sv = max(last, t), n + 1, sv + float(v)
                s = min(s, t)
        if s is not None:  # a batch of only null-ts events opens nothing
            state.update((s, last, n, sv))
            state.setTimeoutDuration(gap_us // 1000)
    if closed:
        out = pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events", "sum_value"]
        )
        out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        yield out


def sessionize(events: DataFrame, gap_seconds: int = 1800, ts_col: str = "ts") -> DataFrame:
    """Streaming sessionization keyed by user_id. Input: a streaming
    DataFrame with (user_id long, ts timestamp, value double)."""
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        yield from _session_fold(key, pdfs, state, gap_us, ts_col)

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_DDL,
            stateStructType=STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
