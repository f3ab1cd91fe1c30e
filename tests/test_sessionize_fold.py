"""Unit pins for the sessionize state fold (no live streaming query):
NULL timestamps must not seed NaT-sentinel sessions, NULL values follow
SQL SUM semantics, and an all-null batch must not open state.
"""

from __future__ import annotations

import pandas as pd
import pytest

from parquet_go_spark.streaming.sessionize import _session_fold

GAP_US = 600 * 1_000_000


class FakeState:
    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.timeout_ms = None
        self.removed = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v, self.removed = None, True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def _frame(rows):
    return pd.DataFrame(rows, columns=["user_id", "ts", "value"]).astype(
        {"ts": "datetime64[ns]", "value": "float64"}
    )


def _run(rows, state=None):
    state = state or FakeState()
    out = list(_session_fold((7,), iter([_frame(rows)]), state, GAP_US, "ts"))
    return out, state


def test_null_ts_rows_are_dropped_not_nat_sessions():
    t0 = pd.Timestamp("2026-01-01 10:00:00")
    rows = [
        (7, pd.NaT, 5.0),  # NaT first: would otherwise seed a year -290k session
        (7, t0, 1.0),
        (7, t0 + pd.Timedelta(seconds=10), 2.0),
        (7, pd.NaT, 9.0),
    ]
    out, state = _run(rows)
    assert out == []  # nothing closed yet
    s, last, n, sv = state.get
    assert n == 2 and sv == 3.0
    assert s == t0.value // 1000 and last == (t0 + pd.Timedelta(seconds=10)).value // 1000


def test_null_value_follows_sql_sum_semantics():
    t0 = pd.Timestamp("2026-01-01 10:00:00")
    rows = [(7, t0, 1.5), (7, t0 + pd.Timedelta(seconds=5), None)]
    out, state = _run(rows)
    _s, _last, n, sv = state.get
    assert n == 2 and sv == 1.5  # NULL contributes nothing, event still counts


def test_all_null_batch_opens_no_state():
    out, state = _run([(7, pd.NaT, 1.0), (7, pd.NaT, None)])
    assert out == [] and not state.exists and state.timeout_ms is None


def test_gap_closes_session_and_timeout_flushes():
    t0 = pd.Timestamp("2026-01-01 10:00:00")
    rows = [(7, t0, 1.0), (7, t0 + pd.Timedelta(seconds=700), 2.0)]
    out, state = _run(rows)
    assert len(out) == 1 and len(out[0]) == 1
    r = out[0].iloc[0]
    assert r["n_events"] == 1 and r["sum_value"] == 1.0
    assert r["session_start"] == t0 and r["session_end"] == t0
    # timeout path flushes the open session and clears state
    out2 = list(_session_fold((7,), iter([]), FakeStateTimedOut(state.get), GAP_US, "ts"))
    assert len(out2) == 1 and out2[0].iloc[0]["n_events"] == 1


class FakeStateTimedOut(FakeState):
    def __init__(self, value):
        super().__init__(value=value, timed_out=True)


def test_out_of_order_event_never_moves_bounds_backward():
    t0 = pd.Timestamp("2026-01-01 10:00:00")
    state = FakeState(value=(t0.value // 1000, t0.value // 1000, 1, 1.0))
    late = t0 - pd.Timedelta(seconds=30)  # cross-batch late arrival
    out, state = _run([(7, late, 2.0)], state=state)
    assert out == []
    s, last, n, sv = state.get
    assert s == late.value // 1000 and last == t0.value // 1000  # extended, not reversed
    assert n == 2 and sv == 3.0
