"""Physical layout optimization — clustering tables for index locality.

Secondary indexes prune at file granularity, so they pay off exactly when
key values cluster spatially within files (the reference's event logs are
time-ordered, so event-name ranges cluster per LZO block — that locality
is WHY its block index works; README.md:10 context). A randomly-written
table has every key in every file and file-level pruning saves nothing.

``cluster_table`` rewrites a table range-partitioned + sorted by the
index column — the Delta OPTIMIZE ZORDER-lite analog, one shuffle:

    cluster_table(spark, src, dst, "event_type", files_per_key_range=...)
    engine.build_index(dst, "event_type")
    engine.query(dst, col("event_type") == "x")   # reads ~1/N of the files

At 100 TB you cluster once (or per ingest partition) and every subsequent
selective query reads a selectivity-proportional byte count — the
reference's own logged success metric.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def compact_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
    cluster_cols: Optional[Sequence[str]] = None,
) -> int:
    """Small-file compaction: rewrite ``src`` at ``dst`` with
    ``ceil(total_bytes / target_file_mb)`` output files (at 100 TB the
    small-files problem dominates listing + task-scheduling overhead; a
    table ingested in many micro-batches needs periodic compaction).
    With ``cluster_cols`` the rewrite also range-clusters (see
    :func:`cluster_table`), folding two maintenance passes into one
    shuffle. Returns the output file count."""
    from elephant_twin_spark.sources import fsio

    total = sum(size for _, size, _ in fsio.list_data_files(spark, src_path))
    n = max(1, -(-total // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    if cluster_cols:
        out = df.repartitionByRange(n, *[F.col(c) for c in cluster_cols]).sortWithinPartitions(
            *cluster_cols
        )
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst_path)
    return int(n)


def cluster_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    cluster_cols: Sequence[str],
    num_files: int = 32,
    sort_within: bool = True,
) -> str:
    """Rewrite ``src`` at ``dst`` range-partitioned by ``cluster_cols``
    (each output file covers a contiguous key range → parquet footer
    min/max prune whole files) and sorted within files (→ row-group stats
    prune within files)."""
    df = spark.read.parquet(src_path)
    out = df.repartitionByRange(num_files, *[F.col(c) for c in cluster_cols])
    if sort_within:
        out = out.sortWithinPartitions(*cluster_cols)
    out.write.mode("overwrite").parquet(dst_path)
    return dst_path
