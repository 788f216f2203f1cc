"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState``.

The batch shape of this operator is `q_sessionize` in `__spark_entry__.py`
(lag + cumulative-sum windows, DuckDB-oracled); this is the streaming
shape: per-user session state survives across micro-batches, closed
sessions emit as soon as the closing event arrives, and idle sessions are
flushed by an event-time timeout driven by the watermark — so state is
BOUNDED (each user holds one small tuple, removed on timeout), which is
the property that matters at crawl scale.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id LONG, session_start_ms LONG, n_events LONG"
STATE_SCHEMA = "session_start_ms LONG, n_events LONG, last_ts DOUBLE"


def sessionize_stream(
    events: DataFrame, gap_sec: int = 1800, lateness: str = "1 hour"
) -> DataFrame:
    """events (user_id, ts, ...) stream → closed sessions
    (user_id, session_start_ms, n_events).

    The session key is its START TIMESTAMP, not a per-user counter: a
    counter would have to survive after the session closes (unbounded
    per-user state forever, or duplicate ids when a timed-out user
    returns and the counter restarts at 0). The start time is unique per
    (user, session) by construction, so timed-out state can be REMOVED
    outright and state stays bounded by the watermark.

    A session closes when a later event arrives more than `gap_sec` after
    its last event (emitted immediately) or when the watermark passes
    last_ts + gap_sec (event-time timeout flushes the idle session)."""

    def update(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            start_ms, n, _last = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start_ms": [start_ms], "n_events": [n]}
            )
            return

        batch = pd.concat(list(pdf_iter)).sort_values("ts")
        epochs = batch["ts"].astype("int64").to_numpy() / 1e9

        if state.exists:
            start_ms, n, last = state.get
        else:
            start_ms, n, last = None, 0, None

        closed: list[dict[str, Any]] = []
        for e in epochs:
            if last is not None and e - last > gap_sec:
                closed.append(
                    {"user_id": user_id, "session_start_ms": start_ms, "n_events": n}
                )
                start_ms, n = None, 0
            if start_ms is None:
                start_ms = int(e * 1000)
            n += 1
            last = e
        state.update((int(start_ms), int(n), float(last)))
        # flush the open session once the watermark passes its gap window
        state.setTimeoutTimestamp(int((last + gap_sec) * 1000))
        yield pd.DataFrame(closed, columns=["user_id", "session_start_ms", "n_events"])

    return (
        events.withWatermark("ts", lateness)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
