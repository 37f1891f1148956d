"""Per-group quota capping — the CCNet/RefinedWeb-style "domain cap".

Web-scale corpora are dominated by a few hosts; capping documents per
source (keeping the best-quality ones first) is a standard gate before
training-data mixing. No reference analog (the reference has no corpus
semantics); first-class here because the north-star pipeline needs it.

Scale shape: ONE shuffle on the group column; each group is ranked with
a window ``row_number`` and cut at the cap. Output per group is bounded
by ``cap`` regardless of group skew; the sort within a mega-group is
Spark's external sort (spills, never OOMs). For corpora where even one
group's row COUNT breaks a task, pre-aggregate a per-group quality
threshold (quantile sketch) and pre-filter before ranking — documented
escape hatch, not needed at fixture scales.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def per_group_cap(
    df: DataFrame,
    group_col: str,
    cap: int,
    order_col: Optional[str] = None,
    id_col: Optional[str] = None,
    descending: bool = True,
) -> DataFrame:
    """Keep at most ``cap`` rows per ``group_col`` value.

    Deterministic choice: by ``order_col`` (descending by default — keep
    the highest quality first), tie-broken by ``id_col`` ascending; with
    no ``order_col`` the ``id_col`` alone orders (stable under re-runs —
    a quota gate must not keep a random subset each run).
    """
    if order_col is None and id_col is None:
        raise ValueError("need order_col and/or id_col for deterministic capping")
    order = []
    if order_col is not None:
        c = F.col(order_col)
        order.append(c.desc() if descending else c.asc())
    if id_col is not None:
        order.append(F.col(id_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )
