"""Stream-stream joins with event-time bounds.

Beyond the reference (streaming is absent there, SURVEY §2.9); the
north-star pipeline needs streaming enrichment/attribution: two live
streams joined on keys within a time window. Spark's stream-stream join
keeps both sides' unmatched rows in state; the BOUNDED time-range
condition plus watermarks is what lets it evict state — without them
state grows with the stream. Inner-join matches emit eagerly (no
watermark wait), so an ``availableNow`` drain equals the batch join
exactly; outer variants additionally emit NULL-padded rows once the
watermark passes the bound.

The batch twin is :func:`elephant_twin_spark.operators.temporal.interval_join`
— same semantics, same key+range shape, which is the point: one logical
definition, two execution regimes.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on equi-keys where
    ``left_ts - lower <= right_ts <= left_ts + upper``.

    Both sides get the same watermark; the time-range condition bounds
    the join state to (watermark + upper - (-lower)) per key — the state
    store holds only rows that could still find a partner. ``left_ts``
    and ``right_ts`` must be distinct names (rename before calling); the
    right side's key columns are dropped from the output.
    """
    if left_ts == right_ts:
        raise ValueError("rename ts columns to distinct names before joining")
    from elephant_twin_spark.functions.timeutil import ensure_event_time

    lw = ensure_event_time(left, left_ts).withWatermark(left_ts, watermark)
    rw = ensure_event_time(right, right_ts).withWatermark(right_ts, watermark)
    keys = [lw[k] == rw[k] for k in on]
    rng = [
        rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {lower}"),
        rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper}"),
    ]
    cond = reduce(lambda a, b: a & b, keys + rng)
    out = lw.join(rw, cond, how)
    for k in on:
        out = out.drop(rw[k])
    return out
