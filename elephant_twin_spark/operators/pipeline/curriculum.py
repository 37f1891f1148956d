"""Curriculum / interleaved data ordering for training-corpus layout.

North-star addition (no reference analog; the nearest reference shape
is the sorted index write, `core/indexing/TextLongPairWritable.java:134-142`
ordering postings — here the same discipline orders training examples).

Training pipelines want two properties from example order: (1) within
each source/language, examples appear best-first (or easiest-first —
any per-group score), and (2) sources are INTERLEAVED, not
concatenated, so every training window sees the full mixture instead
of a megabatch of one domain. A naive global ``orderBy`` gives (1)+(2)
but funnels the whole corpus through a global sort; this module
computes a deterministic interleave key instead, so the final layout
is just a range-partitioned write on that key — Spark's sampled range
partitioner spreads it evenly, no single-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def curriculum_interleave(
    df: DataFrame,
    id_col: str,
    score_col: str,
    group_col: str,
) -> DataFrame:
    """``(id, grp, rank_in_group, global_pos)``: rank examples within
    each group by score (best first, id tiebreak), then assign a
    global round-robin position ``(rank_in_group - 1) * n_groups +
    group_index`` — rank-1 docs of every group come first, then every
    rank-2, and so on. Positions are unique and deterministic; writing
    sorted by ``global_pos`` (a range-partitioned sort — parallel) is
    the curriculum layout.

    One per-group window shuffle + a broadcast join against the
    (tiny) group dimension. Group count and index are computed from a
    #groups-row aggregate, never the fact table.

    A NULL group is a REAL group (its own rank sequence and round-robin
    slot, sorted first in the group ordering) — silently dropping
    unlabeled documents from a training layout would be a data-loss
    bug, so the internal join key is null-safe.
    """
    gdim = (
        df.select(F.col(group_col).alias("_g"))
        .distinct()
        .withColumn(
            "gidx",
            F.row_number().over(
                Window.partitionBy(F.lit(1)).orderBy(F.col("_g").asc_nulls_first())
            )
            - 1,
        )
    )
    n_groups = gdim.count()
    # window partitioning already treats NULL as one group; the dim join
    # must be null-safe for the same rows to survive
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    ranked = df.select(
        F.col(id_col),
        F.col(group_col).alias("grp"),
        F.row_number().over(w).alias("rank_in_group"),
    )
    return ranked.join(
        F.broadcast(gdim), ranked["grp"].eqNullSafe(gdim["_g"])
    ).select(
        id_col,
        "grp",
        "rank_in_group",
        (
            (F.col("rank_in_group") - 1).cast("long") * n_groups + F.col("gidx")
        ).alias("global_pos"),
    )


def write_curriculum(
    df: DataFrame,
    path: str,
    id_col: str,
    score_col: str,
    group_col: str,
    num_files: int = 64,
) -> None:
    """Materialize the interleaved curriculum layout: range-partition
    on ``global_pos`` (parallel sampled-range sort, no single reducer)
    and write position-ordered parquet files."""
    out = curriculum_interleave(df, id_col, score_col, group_col)
    keyed = df.join(out.select(id_col, "global_pos"), id_col)
    (
        keyed.repartitionByRange(num_files, "global_pos")
        .sortWithinPartitions("global_pos")
        .write.mode("overwrite")
        .parquet(path)
    )
