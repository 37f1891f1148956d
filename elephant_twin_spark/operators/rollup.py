"""Time-bucketed rollups — the CountTimestampSamplesWritable analog (A5).

The reference carries ``(count, epochMs)`` and ``(count, epochMs,
list<sample>)`` accumulator values for time-bucketed count aggregations
(core/retrieval/CountTimestampWritable.java:28-68,
CountTimestampSamplesWritable.java:25-68). Spark-first: one partitioning
per (time bucket, key) with count / max-timestamp / bounded sorted
sample list. The sample bound is enforced BEFORE any list materializes:
a row_number window (sort-based, disk-spillable) ranks ids within the
group and only ranks ≤ k enter the collect_list, so per-group aggregate
state is O(k) and a hot key cannot blow up an executor. (The tempting
one-liner ``slice(sort_array(collect_list(id)), 1, k)`` does NOT bound
state — collect_list's partial aggregation buffers carry the ENTIRE
per-group list through the shuffle and the slice runs only on the final
merged array; a 10^9-row hot (bucket, key) materializes 10^9 ids in one
reducer before slicing. r10 review finding.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def time_rollup(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    id_col: str,
    unit: str = "hour",
    k_samples: int = 5,
) -> DataFrame:
    """``(bucket, key, cnt, last_ts, samples)`` per (time-trunc bucket, key).

    ``samples`` = first ``k_samples`` non-null ids in sorted order —
    deterministic, unlike the reference's arrival-order samples (which
    depend on MR iteration order anyway).

    Shape: ONE hash partitioning on (bucket, key) reused by both the
    window (sort-based rank, spills to disk instead of holding a
    per-group array) and the groupBy (Exchange reuse — the aggregate
    runs on the window's output partitioning without a second shuffle).
    ``collect_list`` only ever receives the ≤ k rank-filtered ids per
    group; nulls sort last so they never consume a sample slot
    (collect_list drops them, matching the old null semantics).
    """
    ranked = df.select(
        F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
    ).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("bucket", "key").orderBy(F.col("_id").asc_nulls_last())
        ),
    )
    return ranked.groupBy("bucket", "key").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max("_ts").alias("last_ts"),
        F.sort_array(
            F.collect_list(F.when(F.col("_rn") <= k_samples, F.col("_id")))
        ).alias("samples"),
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
