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

import numpy as np
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


def _batch_islands(ts: np.ndarray, gap_us: int):
    """Vectorized gaps-and-islands over a SORTED int64 time array:
    (starts, ends, counts) per island — the same np.diff split the batch
    twin (events_sessions) computes with window functions."""
    brk = np.flatnonzero(np.diff(ts) > gap_us) + 1
    starts = ts[np.concatenate(([0], brk))]
    ends = ts[np.concatenate((brk - 1, [len(ts) - 1]))]
    counts = np.diff(np.concatenate(([0], brk, [len(ts)])))
    return starts, ends, counts


def _session_fn(gap_us: int):
    """Per-user state transition: split this batch's event times into
    inactivity islands (vectorized ``np.diff``), merge them against the
    open session's INTERVAL, emit every session that a later island
    proves closed; keep the last one open in state (emitted on timeout).

    Late-data semantics (the watermark admits events up to the watermark
    horizon late, so a batch may carry events with t < the open session's
    end — or even < its start):

    * an island within ``gap_us`` of (or overlapping) the open session's
      [start, end] MERGES into it — start/end only ever widen
      (``min(start, …)`` / ``max(end, …)``), never regress;
    * islands entirely before the open session (> gap earlier) are
      emitted immediately as their own closed sessions — their original
      session was already emitted or timed out, and retraction is not
      expressible in append mode;
    * islands after the open session close it exactly as on-time data.

    Sessions are numbered per user in EMIT order (monotonic); for on-time
    (nondecreasing) arrivals this is identical to time order and to the
    batch twin's numbering.
    """

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

        ts = np.sort(
            np.concatenate(
                [pdf["ts_us"].to_numpy(dtype=np.int64) for pdf in pdfs]
            )
        )
        if len(ts) == 0:
            if state.exists:
                sid, n, start, end = state.get
                state.update((sid, n, start, end))
                state.setTimeoutTimestamp(end // 1000 + gap_us // 1000)
            return
        starts, ends, counts = _batch_islands(ts, gap_us)

        if state.exists:
            sid, n, start, end = state.get
            # islands within gap of [start, end] merge into the open
            # session; they are contiguous in index (islands are >gap
            # apart from each other, and anything between two merging
            # islands lies inside the merged span)
            lo = int(np.searchsorted(ends, start - gap_us, side="left"))
            hi = int(np.searchsorted(starts, end + gap_us, side="right"))
            if lo < hi:
                start = min(start, int(starts[lo]))
                end = max(end, int(ends[hi - 1]))
                n += int(counts[lo:hi].sum())
            # sequence in time order: pre-islands (late, isolated), the
            # open session, post-islands; all but the last close now
            seq = (
                [(int(starts[i]), int(ends[i]), int(counts[i])) for i in range(lo)]
                + [(start, end, n)]
                + [(int(starts[i]), int(ends[i]), int(counts[i])) for i in range(hi, len(starts))]
            )
        else:
            sid = 0
            seq = [(int(starts[i]), int(ends[i]), int(counts[i])) for i in range(len(starts))]

        closed = [
            (user_id, sid + k, cnt, s, e)
            for k, (s, e, cnt) in enumerate(seq[:-1])
        ]
        o_start, o_end, o_n = seq[-1]
        state.update((sid + len(seq) - 1, o_n, o_start, o_end))
        # event-time timeout: close the open session once the watermark
        # passes end + gap (no more on-time events can extend it)
        state.setTimeoutTimestamp(o_end // 1000 + gap_us // 1000)
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
