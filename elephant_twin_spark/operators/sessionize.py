"""Sessionization — gap-based event sessions per user.

A standard training-data/analytics operator (no reference analog; the
reference's only time handling is directory-date pruning, S13). Window
functions over (user, ts): a new session starts when the gap from the
previous event exceeds ``gap_seconds``.

Scale shape: ONE shuffle on user_id (both window and the follow-up
groupBy reuse the same partitioning — Catalyst plans a single Exchange),
sort within partitions by ts. Skewed users are bounded by per-user event
counts, not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign ``session_id`` (0-based per user, ordered by time)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.when(
        F.col(ts_col).cast("long") - F.lag(ts_col).over(w).cast("long") > gap_seconds,
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn("session_id", F.sum(gap).over(w))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """``(user, session_id, n_events, sess_start, sess_end)``."""
    s = sessionize(df, user_col, ts_col, gap_seconds)
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("sess_start"),
        F.max(ts_col).alias("sess_end"),
    )
