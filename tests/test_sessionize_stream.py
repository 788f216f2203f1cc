"""Stateful streaming sessionization: closed sessions from the
applyInPandasWithState operator must match the batch window computation
(the q_sessionize shape) on the same input."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from auth2wd_spark.streaming.sessionize_stream import sessionize_stream

GAP = 1800


def _mk_events():
    """3 users × 2-3 sessions with >GAP gaps, interleaved timestamps."""
    rows = []
    eid = 0
    base = pd.Timestamp("2026-01-01 00:00:00")
    for user in (1, 2, 3):
        t = base + pd.Timedelta(minutes=user)
        for session in range(3 if user != 2 else 2):
            for k in range(2 + user + session):
                rows.append((eid, t, user))
                eid += 1
                t += pd.Timedelta(seconds=60)
            t += pd.Timedelta(seconds=GAP + 600)  # close the session
    return pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])


def test_stream_matches_batch_sessionization(spark, tmp_path):
    # global time order: micro-batches must be near-ordered in event time
    # or the advancing watermark would drop other users' earlier events
    pdf = _mk_events().sort_values("ts").reset_index(drop=True)
    df = spark.createDataFrame(pdf)

    # batch truth: lag + cumsum windows (same as q_sessionize), sessions
    # keyed by their start timestamp (ms) to match the stream's identity
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("double")
    prev = F.lag(epoch).over(w)
    gap = F.when(prev.isNull() | ((epoch - prev) > GAP), 1).otherwise(0)
    batch = (
        df.withColumn("new_session", gap)
        .withColumn("session_id", F.sum("new_session").over(w))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.min(epoch) * 1000).cast("long").alias("session_start_ms"),
        )
    )
    batch_sessions = {
        (r["user_id"], r["session_start_ms"]): r["n_events"] for r in batch.collect()
    }

    # stream the same events in several micro-batches (one file per trigger)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    n = len(pdf)
    for i, lo in enumerate(range(0, n, n // 4 + 1)):
        spark.createDataFrame(pdf.iloc[lo : lo + n // 4 + 1]).coalesce(1).write.parquet(
            f"{in_dir}/part{i}"
        )
    stream = (
        spark.readStream.schema("event_id LONG, ts TIMESTAMP, user_id LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{in_dir}/part*")
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        sessionize_stream(stream, gap_sec=GAP)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    out_rows = spark.read.parquet(out_dir).collect()
    got = {
        (r["user_id"], r["session_start_ms"]): r["n_events"] for r in out_rows
    }
    assert len(got) == len(out_rows), "duplicate (user, session_start) keys emitted"
    # every streamed (closed) session must match the batch count exactly;
    # the LAST session per user may stay open (watermark never passes it
    # in an availableNow run), so subset-match is the correct assertion
    assert got, "stream emitted no closed sessions"
    for key, n_events in got.items():
        assert batch_sessions.get(key) == n_events, (key, n_events, batch_sessions.get(key))
    # at least one closed session per user must have emitted mid-stream
    assert {u for u, _ in got} == {1, 2, 3}
