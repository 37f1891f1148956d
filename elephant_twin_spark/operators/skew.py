"""Skew-mitigation utilities for hot keys at 100 TB scale.

Spark's first line of defense is built in: map-side partial aggregation
absorbs count-like skew, and AQE (``spark.sql.adaptive.enabled`` +
``skewJoin.enabled``) splits oversized shuffle partitions at runtime.
These helpers cover the two cases AQE cannot fix:

- ``salted_aggregate``: high-cardinality agg state per key (e.g.
  ``collect_set``/``collect_list``) where ONE reducer would hold a hot
  key's entire state — pre-aggregate on (key, salt), then merge.
- ``salted_join``: broadcast is impossible (both sides large) and one
  side has a few dominant keys — explode the small side per salt,
  salt the big side randomly, join on (key, salt).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: Sequence[str],
    partial_aggs: List[Column],
    merge_aggs: List[Column],
    num_salts: int = 32,
) -> DataFrame:
    """Two-stage aggregation: stage 1 groups on (keys..., random salt) so a
    hot key's state is split across ``num_salts`` reducers; stage 2 merges
    the partials per key.

    ``partial_aggs`` run in stage 1 (aliases define the columns
    ``merge_aggs`` see in stage 2). Example — distinct users per event
    type with a hot 'click' key::

        salted_aggregate(
            df, ["event_type"],
            [F.collect_set("user_id").alias("us")],
            [F.array_distinct(F.flatten(F.collect_list("us"))).alias("users")])
    """
    salted = df.withColumn("_salt", (F.rand(seed=0) * num_salts).cast("int"))
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*merge_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (large, skewed) left side with a
    random salt in [0, num_salts); replicate each right row across all
    salts; join on (key, salt). Output columns = left ++ right (minus the
    duplicate key), like a plain ``left.join(right, key)``.

    Use only when broadcast is impossible AND AQE skew handling is
    insufficient (e.g. a single key larger than one executor's memory).

    Join types that preserve UNMATCHED RIGHT rows are rejected: the
    right side is replicated once per salt, so an unmatched right row
    would surface ``num_salts`` times null-extended instead of once —
    silently wrong output, not a performance problem. Left-preserving
    types (inner/left/leftsemi/leftanti) are unaffected: every left row
    carries exactly one salt and its key's right matches exist in every
    salt bucket.
    """
    right_preserving = {
        "right", "rightouter", "right_outer",
        "outer", "full", "fullouter", "full_outer",
    }
    if how.lower().replace(" ", "") in right_preserving:
        raise ValueError(
            f"salted_join(how={how!r}) would duplicate unmatched right rows "
            f"{num_salts}x (the right side is replicated per salt); salt the "
            "right side instead, or use AQE skew-join for outer joins"
        )
    l = left.withColumn("_salt", (F.rand(seed=0) * num_salts).cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    joined = l.join(r, [key, "_salt"], how)
    return joined.drop("_salt")


def top_frequent_keys(df: DataFrame, key_col: str, n: int = 10) -> DataFrame:
    """Cheap skew diagnosis: the n heaviest keys and their share."""
    total = df.count()
    return (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("share", F.col("cnt") / F.lit(float(total)))
        .orderBy(F.col("cnt").desc())
        .limit(n)
    )
