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


def _norm_file_col():
    from elephant_twin_spark.sources import fsio

    return fsio.file_path_col(F.col("_metadata.file_path")).alias("file")


def zone_violations(
    spark: SparkSession, table_path: str, column: str, index_root: str
) -> DataFrame:
    """Zone-map soundness: per file, the stored [min_v, max_v] must bound
    the actual data (a too-narrow zone silently drops rows). Returns the
    violating files — must be empty for a fresh index."""
    idx_dir = catalog.index_dir(index_root, table_path, column, kind="zone")
    zones = build_mod.read_zones(spark, idx_dir)
    actual = (
        spark.read.parquet(table_path)
        .select(_norm_file_col(), F.col(column).alias("v"))
        .groupBy("file")
        .agg(F.min("v").alias("a_min"), F.max("v").alias("a_max"))
    )
    j = zones.join(actual, "file", "full_outer")
    return j.where(
        ~(
            F.col("a_min").isNull()  # all-null file: nothing to bound
            | (F.col("min_v").isNotNull() & (F.col("min_v") <= F.col("a_min"))
               & (F.col("max_v") >= F.col("a_max")))
        )
    )


def bloom_violations(
    spark: SparkSession, table_path: str, column: str, index_root: str
) -> DataFrame:
    """Bloom soundness: every (file, key) actually present must test
    positive against that file's bit array (false NEGATIVES are
    correctness bugs; false positives are just wasted IO). Distributed:
    distinct (file, key) pairs join the sketch table and re-hash
    JVM-side. Returns violating pairs — must be empty."""
    idx_dir = catalog.index_dir(index_root, table_path, column, kind="bloom")
    desc = catalog.read_descriptor(spark, idx_dir)
    num_bits = int(desc.options["num_bits"])
    num_hashes = int(desc.options["num_hashes"])
    present = (
        spark.read.parquet(table_path)
        .select(_norm_file_col(), F.col(column).cast("string").alias("key"))
        .where(F.col("key").isNotNull())
        .distinct()
    )
    sketch = build_mod.read_bloom_sketch(spark, idx_dir)
    j = present.join(sketch, "file", "left")
    # bit test as one SQL expr per hash (same md5 derivation as the build)
    conds = []
    for i in range(num_hashes):
        pos_sql = (
            f"cast(conv(substring(md5(concat('{i}|', key)), 1, 15), 16, 10) as bigint)"
            f" % {num_bits}"
        )
        conds.append(
            f"(element_at(bits, cast(({pos_sql}) / 64 as int) + 1)"
            f" & shiftleft(1L, cast(({pos_sql}) % 64 as int))) != 0"
        )
    ok = F.expr(" AND ".join(conds))
    return j.where(F.col("bits").isNull() | ~ok)


def verify_all(spark: SparkSession, table_path: str, index_root: str, engine) -> dict:
    """Run the soundness check appropriate to every index of the table;
    returns {(kind, column): n_violations} (all zeros for fresh indexes)."""
    out = {}
    for s in engine.stats(table_path):
        kind, column = s["kind"], s["column"]
        if kind == "block" and "key_expr" not in s["options"]:
            df = index_vs_fullscan_counts(spark, table_path, column, index_root)
            out[(kind, column)] = df.where(~F.col("ok")).count()
        elif kind == "zone":
            out[(kind, column)] = zone_violations(
                spark, table_path, column, index_root
            ).count()
        elif kind == "bloom":
            out[(kind, column)] = bloom_violations(
                spark, table_path, column, index_root
            ).count()
        elif kind == "ivf":
            out[(kind, column)] = ann_violations(
                spark, table_path, column, index_root
            ).count()
        elif kind == "lsh":
            out[(kind, column)] = lsh_violations(
                spark, table_path, column, index_root
            ).count()
    return out


def lsh_violations(
    spark: SparkSession, table_path: str, text_column: str, index_root: str
) -> DataFrame:
    """LSH soundness: every corpus document must have ALL its band rows
    in the bucket table (a missing row is a potential missed near-dup —
    the gate's no-false-negative contract for exact duplicates). Bands
    are re-derived with the descriptor's frozen parameters and
    anti-joined against the stored table; returns missing rows — empty
    when sound. Streaming-grown rows are extra, never violations."""
    from elephant_twin_spark.operators import lsh as lsh_mod

    idx = lsh_mod.LshIndex(spark, table_path, text_column, index_root)
    expected = lsh_mod.banded_docs(
        spark.read.parquet(table_path),
        text_column,
        idx.id_column,
        num_perm=idx.num_perm,
        num_bands=idx.num_bands,
        shingle_k=idx.shingle_k,
        hash_fn=idx.hash_fn,
        file_label="_expected",
    ).drop("file")
    stored = idx.bands().select("id", "band", "band_hash")
    return expected.join(stored, ["id", "band", "band_hash"], "left_anti")


def ann_violations(
    spark: SparkSession, table_path: str, vec_column: str, index_root: str
) -> DataFrame:
    """IVF soundness: every stored vector's cluster must equal the argmax
    centroid similarity under the PERSISTED centroids (the invariant
    incremental refresh preserves even as centroids drift from the
    kmeans optimum). Returns violating rows — empty when sound."""
    from elephant_twin_spark.operators.pipeline import similarity as sim
    from elephant_twin_spark.sources import catalog as _catalog

    idx_dir = _catalog.index_dir(index_root, table_path, vec_column, kind="ivf")
    centroids = [
        list(r["centroid"])
        for r in sorted(
            spark.read.parquet(f"{idx_dir}/centroids").collect(),
            key=lambda r: r["cluster"],
        )
    ]
    vecs = spark.read.parquet(f"{idx_dir}/vectors")
    re_assigned = sim.ivf_assign(
        vecs.withColumnRenamed("cluster", "stored_cluster"), "vec", centroids
    )
    return re_assigned.where(F.col("cluster") != F.col("stored_cluster")).select(
        "id", "stored_cluster", F.col("cluster").alias("expected_cluster")
    )
