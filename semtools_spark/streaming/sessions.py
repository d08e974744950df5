"""Custom stateful streaming operator: sessionization with
``applyInPandasWithState``.

The batch engine's events_sessions gate (gaps-and-islands: a silence
longer than the gap closes the session) lifted onto Structured Streaming
as per-user state: each user's open session lives in the state store and
is emitted exactly once — when a later event proves the gap elapsed, or
when the event-time timeout fires. This is the ``applyInPandasWithState``
pattern for operators the built-in windowed aggregations can't express
(session windows keyed by inactivity, not fixed buckets).

Scale shape: state is O(active users), one shuffle on user_id per
micro-batch; emitted sessions are final (append semantics downstream).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("start_us", T.LongType(), False),
        T.StructField("end_us", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("start_us", T.LongType(), False),
        T.StructField("end_us", T.LongType(), False),
    ]
)


def _session_fn(gap_us: int):
    """Per-user state transition: fold this batch's (sorted) event times
    into the open session; emit every session closed by an observed gap;
    keep the still-open one in state (emitted on timeout)."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            sid, n, start, end = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, sid, n, start, end)],
                columns=["user_id", "session_id", "n_events", "start_us", "end_us"],
            )
            return

        ts = sorted(
            int(t) for pdf in pdfs for t in pdf["ts_us"].tolist()
        )
        if state.exists:
            sid, n, start, end = state.get
        else:
            sid, n, start, end = 0, 0, None, None

        closed: list[tuple] = []
        for t in ts:
            if start is None:
                start = end = t
                n = 1
            elif t - end > gap_us:
                closed.append((user_id, sid, n, start, end))
                sid, n, start, end = sid + 1, 1, t, t
            else:
                n += 1
                end = t
        state.update((sid, n, start, end))
        # event-time timeout: close the open session once the watermark
        # passes end + gap (no more on-time events can extend it)
        state.setTimeoutTimestamp(end // 1000 + gap_us // 1000)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_id", "n_events", "start_us", "end_us"],
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming sessionization: (user_id, session_id, n_events, start_us,
    end_us), each session emitted exactly once. session_id numbers a
    user's sessions 0, 1, 2… in time order — the same contract as the
    batch events_sessions gate."""
    gap_us = gap_minutes * 60 * 1_000_000
    src = events.withWatermark(ts_col, watermark).select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(ts_col),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_us),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_sessionize_available(
    spark: Any,
    source_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    out_dir: str,
    *,
    gap_minutes: int = 30,
) -> DataFrame:
    """Drain pending event files through the stateful sessionizer into an
    append parquet sink (the memory sink cannot recover from a checkpoint,
    so cross-run draining needs a durable sink anyway); returns all
    sessions emitted so far."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    out = sessionize_stream(stream, gap_minutes=gap_minutes)
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(SESSION_SCHEMA).parquet(out_dir)
