"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9 — no reference analogue; the engine's demonstration of
arbitrary-state streaming for operators Spark's built-in windows can't express).

``streaming_sessionize``: per-user session tracking with an inactivity gap. The
state (session counter, last-seen timestamp, open-session event count) lives in
the state store keyed by user_id; EVENT-TIME timeouts (watermark-driven) close
idle sessions, so a lagging source cannot split a logical session the way a
wall-clock timeout would — gap decisions stay in event time end to end, matching
the batch twin plans/relational.q_events_sessionize (lag + running sum), which
the test compares against after draining a stream.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800

OUTPUT_SCHEMA = "user_id long, session_id long, n_events long, closed boolean"
STATE_SCHEMA = "session_id long, last_ts double, n_events long"


_NO_TS = -1.0  # sentinel: no open session activity (state schema keeps doubles)


def _sessionize_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events (sorted by time) into the running session
    state; emit one row per session touched, closed=True when the gap rolled it
    over."""
    (user_id,) = key
    if state.hasTimedOut:
        session_id, last_ts, n_events = state.get
        # keep the counter in state (don't remove!): dropping it would restart
        # the user's next session at id 0 and collide with already-emitted ids
        state.update((session_id + 1, _NO_TS, 0))
        if n_events > 0:
            yield pd.DataFrame(
                [(user_id, session_id, n_events, True)],
                columns=["user_id", "session_id", "n_events", "closed"],
            )
        return

    events = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    if state.exists:
        session_id, last_ts, n_events = state.get
        if last_ts == _NO_TS:
            last_ts = None
    else:
        session_id, last_ts, n_events = 0, None, 0

    out: list[tuple] = []
    for ts in events["ts"].astype("int64") / 1e9:  # ns → s
        if last_ts is not None and ts - last_ts > SESSION_GAP_SECONDS:
            out.append((user_id, session_id, n_events, True))
            session_id += 1
            n_events = 0
        last_ts = ts
        n_events += 1
    state.update((session_id, float(last_ts), int(n_events)))
    # event-time timeout: fires when the WATERMARK passes last_ts + gap — a
    # stalled source can't prematurely split a session (processing-time would)
    state.setTimeoutTimestamp(int((last_ts + SESSION_GAP_SECONDS) * 1000))
    out.append((user_id, session_id, n_events, False))  # still-open session
    yield pd.DataFrame(out, columns=["user_id", "session_id", "n_events", "closed"])


def streaming_sessionize(events_stream: DataFrame) -> DataFrame:
    """events stream (event_id, ts, user_id, ...) → per-session rows.

    State is per-user and O(1); the only shuffle keys events by user_id into the
    state store — the same partitioning any keyed stateful operator needs. At
    scale, state-store size = #active users × 3 scalars, independent of history.
    """
    return (
        events_stream.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
