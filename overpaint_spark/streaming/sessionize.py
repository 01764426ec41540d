"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY §7.4.5 — the "custom stateful
operator" extension point).

Spark has no built-in session windows with arbitrary per-session
aggregates in PySpark's stateful API surface prior to
``transformWithStateInPandas``; this is the portable pattern: state per
``user_id`` holds the open session (start, last ts, count); an event
past the 30-minute gap emits the closed session and opens a new one.
A processing-time timeout flushes idle sessions.

The batch twin (identical output on a closed dataset) is
``queries.q_events_sessionize`` — window functions over event time.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP = dt.timedelta(minutes=30)

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start long, last long, n long"  # epoch micros + count


def _sessionize_group(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    _set_timeout: bool = True,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    gap_us = int(SESSION_GAP.total_seconds() * 1_000_000)

    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {"user_id": [user_id],
             "session_start": [pd.Timestamp(start, unit="us")],
             "session_end": [pd.Timestamp(last, unit="us")],
             "n_events": [n]}
        )
        return

    ts_all = pd.concat([p["ts"] for p in pdfs]).sort_values()
    us = (ts_all.astype("int64") // 1000).to_list()  # ns → µs

    closed: list[tuple[int, int, int]] = []
    if state.exists:
        start, last, n = state.get
        rest = us
    else:
        start, last, n = us[0], us[0], 1
        rest = us[1:]
    for t in rest:
        if t - last > gap_us:
            closed.append((start, last, n))
            start, last, n = t, t, 1
        elif t < start - gap_us:
            # cross-batch late arrival older than the open session's
            # reach: emit it as its own already-closed singleton — with
            # O(1) single-session state that is the honest policy (the
            # alternative, folding it into the open session, would move
            # `last` BACKWARDS and emit sessions whose end precedes
            # their start)
            closed.append((t, t, 1))
        else:
            # in-gap event, possibly late: the session's bounds only
            # ever widen — never let a late event drag `last` backwards
            start, last, n = min(start, t), max(last, t), n + 1
    state.update((start, last, n))
    if _set_timeout:
        state.setTimeoutDuration(60 * 60 * 1000)  # flush idle sessions after 1h

    if closed:
        yield pd.DataFrame(
            {"user_id": user_id,
             "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
             "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
             "n_events": [c for _, _, c in closed]}
        )


def streaming_sessionize(events: DataFrame, idle_timeout: bool = True) -> DataFrame:
    """30-minute-gap sessions per user over a stream of (user_id, ts, …).

    Emits a session only once it is *closed* (by a later event or by the
    idle timeout) — the append-mode contract. State per user is O(1).

    ``idle_timeout=False`` disables the processing-time flush: the right
    mode for FINITE availableNow runs, where the timeout's extra no-data
    micro-batches would keep the query alive long past the data (the
    engine schedules batches just to fire timeouts) — a live 24/7 ingest
    keeps the default so idle users' sessions eventually emit."""
    if idle_timeout:
        fn, conf = _sessionize_group, GroupStateTimeout.ProcessingTimeTimeout
    else:
        def fn(key, pdfs, state):
            return _sessionize_group(key, pdfs, state, _set_timeout=False)

        conf = GroupStateTimeout.NoTimeout
    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )
