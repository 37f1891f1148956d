"""Custom stateful streaming operators via ``applyInPandasWithState``.

Spark's built-in streaming aggregations cover windowed counts
(:mod:`.windows`); session windows with a *data-dependent* close
condition (gap timeout per key) need arbitrary per-key state. This is
the canonical ``applyInPandasWithState`` shape.

Design: per key, state buffers the event timestamps of all sessions
that are not yet final. On every invocation (new data or event-time
timeout) the buffer is sessionized; a session is emitted — exactly
once — when ``session_end + gap <= watermark``, because any event that
could still extend it would have ``ts <= session_end + gap`` and is by
then beyond the watermark. Out-of-order arrival *within* the watermark
is therefore handled exactly (the buffer re-sorts), and the emitted
rows equal the batch :mod:`elephant_twin_spark.operators.sessionize`
answer over the non-late data (tested).

Scale shape: the streaming engine hash-partitions state by key across
executors and hands each updated key's rows to Python as Arrow batches.
State per key is O(events of the open tail), bounded by the watermark
horizon — not by stream length.
"""

from __future__ import annotations

from typing import Iterable, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("ts_us", ArrayType(LongType()))])


def _to_us(ts: pd.Series) -> List[int]:
    s = pd.to_datetime(ts).astype("datetime64[ns]")
    return (s.astype("int64") // 1_000).tolist()


def _sessions(sorted_us: List[int], gap_us: int) -> List[Tuple[int, int, int]]:
    """(start, end, n) runs where consecutive gaps are <= gap_us."""
    out = []
    start = last = sorted_us[0]
    n = 1
    for t in sorted_us[1:]:
        if t - last <= gap_us:
            last, n = t, n + 1
        else:
            out.append((start, last, n))
            start = last = t
            n = 1
    out.append((start, last, n))
    return out


def _session_fn(gap_us: int):
    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (user_id,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        buf = list(state.get[0]) if state.exists else []
        if not state.hasTimedOut:
            for p in pdfs:
                # drop rows already beyond the watermark: the stateful
                # operator itself must enforce lateness (withWatermark
                # only *computes* the watermark for this op)
                buf.extend(t for t in _to_us(p["ts"]) if t >= wm_us or wm_us == 0)
        if not buf:
            state.remove()
            return

        buf.sort()
        emitted = {"user_id": [], "session_start": [], "session_end": [], "n_events": []}
        keep: List[int] = []
        consumed = 0
        sessions = _sessions(buf, gap_us)
        for start, end, n in sessions:
            # STRICT comparison (r9 review): a session is final only
            # when no admissible event can still extend it. Admissible
            # events have t >= wm (the lateness filter above keeps
            # t == wm), and extension needs t - end <= gap, so at
            # end + gap == wm an on-time event at exactly the watermark
            # could still merge in — emitting then would split one
            # batch-semantics session into two.
            if end + gap_us < wm_us:
                emitted["user_id"].append(user_id)
                emitted["session_start"].append(pd.Timestamp(start, unit="us"))
                emitted["session_end"].append(pd.Timestamp(end, unit="us"))
                emitted["n_events"].append(n)
            else:
                keep.extend(buf[consumed : consumed + n])
            consumed += n

        if keep:
            state.update((keep,))
            # wake up once the watermark (ms) can close the earliest open
            # session: closure needs wm STRICTLY past end+gap (see above),
            # so the first closing ms is ceil past that boundary
            first_close_ms = (_sessions(keep, gap_us)[0][1] + gap_us) // 1000 + 1
            state.setTimeoutTimestamp(max(first_close_ms, state.getCurrentWatermarkMs() + 1))
        else:
            state.remove()
        if emitted["user_id"]:
            yield pd.DataFrame(emitted)

    return fn


def streaming_sessionize(
    stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user over a streaming DataFrame: one row per
    finalized session ``(user_id, session_start, session_end, n_events)``,
    gap semantics identical to the batch ``sessionize`` (new session when
    the gap from the previous event exceeds ``gap_seconds``)."""
    from elephant_twin_spark.functions.timeutil import ensure_event_time

    sel = stream.select(
        stream[user_col].cast("long").alias("user_id"), stream[ts_col].alias("ts")
    )
    sel = ensure_event_time(sel, "ts").withWatermark("ts", watermark)
    return sel.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds * 1_000_000),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
