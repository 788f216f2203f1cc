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

OUTPUT_SCHEMA = "user_id LONG, session_id LONG, n_events LONG"
STATE_SCHEMA = "session_id LONG, n_events LONG, last_ts DOUBLE"


def sessionize_stream(
    events: DataFrame, gap_sec: int = 1800, lateness: str = "1 hour"
) -> DataFrame:
    """events (user_id, ts, ...) stream → closed sessions
    (user_id, session_id, n_events).

    A session closes when a later event arrives more than `gap_sec` after
    its last event (emitted immediately) or when the watermark passes
    last_ts + gap_sec (event-time timeout flushes the idle session and
    REMOVES its state)."""

    def update(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            sid, n, _last = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_id": [sid], "n_events": [n]}
            )
            return

        batch = pd.concat(list(pdf_iter)).sort_values("ts")
        epochs = batch["ts"].astype("int64").to_numpy() / 1e9

        if state.exists:
            sid, n, last = state.get
        else:
            sid, n, last = 0, 0, None

        closed: list[dict[str, Any]] = []
        for e in epochs:
            if last is not None and e - last > gap_sec:
                closed.append({"user_id": user_id, "session_id": sid, "n_events": n})
                sid += 1
                n = 0
            n += 1
            last = e
        state.update((int(sid), int(n), float(last)))
        # flush the open session once the watermark passes its gap window
        state.setTimeoutTimestamp(int((last + gap_sec) * 1000))
        yield pd.DataFrame(closed, columns=["user_id", "session_id", "n_events"])

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
