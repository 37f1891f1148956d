"""Verification harness — index-driven results vs full-scan oracle (M5).

The reference's correctness strategy: for EVERY distinct key in an index,
run an index-pruned scan and count matches, then compare against a
full-scan ``GROUP BY key COUNT(*)``
(core/retrieval/ScanUsingIndexJob.java:45-79,
core/verification/IndexScanMapper.java:22-95). The reference warns this is
one scan per key and slow beyond 10k keys
(ScanUsingIndexJob.java:55-66); per SURVEY §7.5 the Spark harness uses the
set-based comparison — ONE aggregation on each side — and keeps the
per-key path only for targeted debugging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elephant_twin_spark.operators import build as build_mod
from elephant_twin_spark.sources import catalog


def index_vs_fullscan_counts(
    spark: SparkSession, table_path: str, column: str, index_root: str
) -> DataFrame:
    """One-shot comparison: per-key counts derived from the postings table
    (sum of per-file ``cnt``) full-outer-joined against the full-scan
    group-count. Returns ``(key, index_cnt, scan_cnt, ok)`` — every row
    must have ``ok = true`` for a fresh index.
    """
    idx_dir = catalog.index_dir(index_root, table_path, column, kind="block")
    idx_counts = (
        build_mod.read_postings(spark, idx_dir)
        .groupBy("key")
        .agg(F.sum("cnt").alias("index_cnt"))
    )
    scan_counts = (
        spark.read.parquet(table_path)
        .where(F.col(column).isNotNull())
        .groupBy(F.col(column).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("scan_cnt"))
    )
    joined = idx_counts.join(scan_counts, "key", "full_outer")
    return joined.select(
        "key",
        "index_cnt",
        "scan_cnt",
        (
            F.coalesce("index_cnt", F.lit(-1)) == F.coalesce("scan_cnt", F.lit(-2))
        ).alias("ok"),
    )


def assert_index_consistent(
    spark: SparkSession, table_path: str, column: str, index_root: str
) -> int:
    """Raise if any key's index-derived count disagrees with the full scan.
    Returns the number of verified keys."""
    df = index_vs_fullscan_counts(spark, table_path, column, index_root).cache()
    try:
        bad = df.where(~F.col("ok")).limit(20).collect()
        if bad:
            raise AssertionError(f"index/fullscan mismatch for keys: {bad}")
        return df.count()
    finally:
        df.unpersist()
