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

from elephant_twin_spark.functions import timeutil


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign ``session_id`` (0-based per user, ordered by time)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    secs = timeutil.epoch_seconds(df, ts_col)
    gap = F.when(
        secs - F.lag(secs).over(w) > gap_seconds,
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


def session_kpis(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-user session KPI rollup over :func:`session_stats`:
    ``(user, n_sessions, n_bounce, avg_duration_s, avg_events)`` where
    a bounce is a 1-event session. One extra user-keyed aggregate on
    the session_stats output — same single window shuffle, the
    follow-up groupBy reuses the user partitioning (one Exchange in
    the plan). Duration is ``sess_end - sess_start`` in seconds;
    averages rounded to 4 digits so the rollup is
    engine-deterministic."""
    s = session_stats(df, user_col, ts_col, gap_seconds)
    dur = F.col("sess_end").cast("timestamp").cast("double") - F.col(
        "sess_start"
    ).cast("timestamp").cast("double")
    return s.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("long")).alias("n_bounce"),
        F.round(F.avg(dur), 4).alias("avg_duration_s"),
        F.round(F.avg(F.col("n_events").cast("double")), 4).alias("avg_events"),
    )


def funnel(
    df,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages,
):
    """Funnel analysis: per user, how far through the ordered ``stages``
    sequence their events progress — ``(user, stage_reached)`` with
    stage_reached in 0..len(stages). An event advances the funnel only
    if it is the next expected stage AND strictly later than the event
    that matched the previous stage (the greedy earliest-chain, i.e.
    min(view) → min(click > that) → …).

    One shuffle: groupBy(user) + sorted-struct fold entirely JVM-side —
    the per-user state is (stage, ts-of-last-match), never the event
    list on the driver."""
    from pyspark.sql import functions as F

    # single array literal, element types preserved (str() coercion
    # would silently cast non-string stages and change match semantics)
    stage_arr = F.lit(list(stages))
    ev = F.sort_array(
        F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("y")))
    )
    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("last")
    )
    n = len(stages)

    def step(acc, x):
        is_next = (acc["stage"] < n) & (
            x["y"] == F.element_at(stage_arr, acc["stage"] + 1)
        )
        strictly_later = F.when(acc["stage"] == 0, F.lit(True)).otherwise(
            x["t"] > acc["last"]
        )
        return F.when(
            is_next & strictly_later,
            F.struct((acc["stage"] + 1).alias("stage"), x["t"].alias("last")),
        ).otherwise(acc)

    folded = F.aggregate(ev, init, step)
    return (
        df.groupBy(F.col(user_col).alias("user"))
        .agg(folded["stage"].alias("stage_reached"))
    )
