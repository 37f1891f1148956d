"""Time-bucketed rollups — the CountTimestampSamplesWritable analog (A5).

The reference carries ``(count, epochMs)`` and ``(count, epochMs,
list<sample>)`` accumulator values for time-bucketed count aggregations
(core/retrieval/CountTimestampWritable.java:28-68,
CountTimestampSamplesWritable.java:25-68). Spark-first: one groupBy per
(time bucket, key) with count / max-timestamp / bounded sorted sample
list — the sample bound keeps per-group state O(k), so a hot key cannot
blow up an executor (partial aggregation truncates via slice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_rollup(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    id_col: str,
    unit: str = "hour",
    k_samples: int = 5,
) -> DataFrame:
    """``(bucket, key, cnt, last_ts, samples)`` per (time-trunc bucket, key).

    ``samples`` = first ``k_samples`` ids in sorted order — deterministic,
    unlike the reference's arrival-order samples (which depend on MR
    iteration order anyway).
    """
    return (
        df.groupBy(
            F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max(ts_col).alias("last_ts"),
            F.slice(F.sort_array(F.collect_list(id_col)), 1, k_samples).alias("samples"),
        )
    )


def windowed_rollup(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
) -> DataFrame:
    """Tumbling/sliding window counts via ``F.window`` (struct bucket) —
    the streaming-compatible variant (same expression works under
    Structured Streaming with a watermark)."""
    w = (
        F.window(ts_col, window_duration)
        if slide_duration is None
        else F.window(ts_col, window_duration, slide_duration)
    )
    return df.groupBy(w.alias("w"), F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt"), F.max(ts_col).alias("last_ts")
    )
