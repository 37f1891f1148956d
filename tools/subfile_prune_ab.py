"""Sub-file pruning ACTION A/B — measures bytes ACTUALLY read from disk.

The reference turns matched posting byte ranges into sub-file input
splits (core/retrieval/BlockIndexedFileInputFormat.java:189-241); this
repo's planner uses matched ranges for AND-exclusion and bytes metrics
but reads whole matched files (operators/scan.py:query), delegating
sub-file skipping to Parquet row-group stats. That delegation is exactly
right for CLUSTERED keys (row-group min/max prune) and was assumed —
not measured — for the adversarial case: a large file with many row
groups and an UNCLUSTERED key, where min/max stats are useless but the
postings know precisely which blocks hold the key.

This harness builds that adversarial layout (few files x many row
groups, uniform-random key over a domain >> rows-per-key; the key
column chunk is PLAIN-encoded — dictionary row-group filtering, which
handles low-cardinality keys natively, is out of play) and measures
bytes ACTUALLY read by the JVM (``/proc/<jvm>/io`` rchar — Hadoop's
GlobalStorageStatistics undercounts Spark 4's parquet reads because
the vectored-IO path bypasses the Statistics wrapper, measured 0.1 MB
counted vs 43.8 MB real) for one SELECT*-shaped point lookup
(``sum(length(payload))`` forces payload materialization — a count()
reads only the key column and understates every variant) under:

  (c) full scan + Catalyst filter      — Parquet row-group stats alone
  (a) engine index-pruned scan         — today's file-level action
  (b) (a) + `_metadata.file_block_start` range filter on matched ranges
      (the read_byte_range pattern, one filter per matched range)
  (d) full scan over a bloom-enabled copy of the layout
      (`parquet.bloom.filter.enabled#<col>`) — the Spark/Parquet-native
      sub-file mechanism the engine could recommend at write time

All variants must return the same row count (correctness gate).

Usage: python tools/subfile_prune_ab.py [--rows N] [--files N] [--reps N]
Writes nothing under the repo; layouts live in /tmp/ets_subfile_ab.
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from elephant_twin_spark.operators import build as build_mod
from elephant_twin_spark.operators import scan as scan_mod
from elephant_twin_spark.plans import expr as E
from elephant_twin_spark.sources import fsio

ROOT = "/tmp/ets_subfile_ab"
ROW_GROUP_BYTES = 16 * 1024 * 1024  # parquet.block.size → ~13 row groups/file


def make_rchar(spark):
    """Cumulative bytes read by the (single, local-mode) JVM at the OS
    API level — ground truth that vectored/positioned reads can't dodge.
    Includes page-cache hits (rchar, not read_bytes) — we want bytes
    DECODED, not disk physics."""
    jvm_pid = spark._jvm.java.lang.ProcessHandle.current().pid()

    def rchar() -> int:
        with open(f"/proc/{jvm_pid}/io") as f:
            d = dict(line.split(": ") for line in f.read().strip().splitlines())
        return int(d["rchar"])

    return rchar


def build_layout(spark, rows: int, files: int, key_domain: int, bloom: bool) -> str:
    path = f"{ROOT}/data_bloom" if bloom else f"{ROOT}/data"
    df = (
        spark.range(rows)
        .select(
            # uniform pseudo-random key, UNCLUSTERED in id (= write) order:
            # row-group min/max spans ~the whole domain everywhere
            (F.xxhash64(F.col("id")) % key_domain).cast("long").alias("k"),
            F.col("id"),
            # ~96 B payload so data bytes dominate footers
            F.concat(
                F.md5(F.col("id").cast("string")),
                F.md5((F.col("id") + 1).cast("string")),
                F.md5((F.col("id") + 2).cast("string")),
            ).alias("payload"),
        )
        .repartition(files)
    )
    w = df.write.mode("overwrite").option("parquet.block.size", ROW_GROUP_BYTES)
    if bloom:
        # NDV is per ROW GROUP (~rows/row-group distinct keys), not the
        # table-wide domain — a domain-sized bitset is allocated per open
        # row group and OOMs the writer with many small row groups
        w = (
            w.option("parquet.bloom.filter.enabled#k", "true")
            .option("parquet.bloom.filter.expected.ndv#k", "200000")
            .option("parquet.bloom.filter.max.bytes", str(512 * 1024))
        )
    w.parquet(path)
    return path


def describe_layout(path: str) -> dict:
    import pyarrow.parquet as pq

    parts = [
        f"{path}/{f}" for f in sorted(os.listdir(path)) if f.endswith(".parquet")
    ]
    rgs = [pq.ParquetFile(p).metadata.num_row_groups for p in parts]
    sizes = [os.path.getsize(p) for p in parts]
    # encodings of the key column in the first row group — PLAIN (not
    # PLAIN_DICTIONARY/RLE_DICTIONARY) means parquet's dictionary-filter
    # row-group pruning is unavailable, the layout we're stressing
    md = pq.ParquetFile(parts[0]).metadata
    k_idx = md.schema.names.index("k")
    return {
        "files": len(parts),
        "row_groups": sum(rgs),
        "total_bytes": sum(sizes),
        "rg_per_file": rgs,
        "k_encodings": list(md.row_group(0).column(k_idx).encodings),
    }


def matched_ranges(spark, idx_dir: str, key: str) -> dict:
    """file -> [(start, end)] for one key, straight from the postings."""
    rows = (
        build_mod.read_postings(spark, idx_dir)
        .where(F.col("key") == key)
        .select("file", "ranges")
        .collect()
    )
    return {
        fsio.normalize_path(r["file"]): [(x["start"], x["end"]) for x in r["ranges"]]
        for r in rows
    }


def run_variant(spark, rchar, label: str, df_factory, reps: int, split_bytes: int) -> dict:
    """Best-of-reps bytesRead. ``split_bytes`` sets maxPartitionBytes for
    the read — variant (b) MUST use the build-time split size (recorded
    range starts are build-split starts; a different read split size maps
    every row to block_start values the ranges don't contain and silently
    drops rows — itself a finding about the approach's fragility)."""
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split_bytes))
    best = None
    for _ in range(reps):
        b0 = rchar()
        t0 = time.time()
        row = (
            df_factory()
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("payload")).alias("pl"),
            )
            .collect()[0]
        )
        wall = time.time() - t0
        delta = rchar() - b0
        rec = {
            "variant": label, "rows": row["n"], "payload_len": row["pl"],
            "bytes_read": delta, "wall_s": round(wall, 3),
            "split_bytes": split_bytes,
        }
        if best is None or delta < best["bytes_read"]:
            best = rec
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--files", type=int, default=4)
    ap.add_argument("--key-domain", type=int, default=8_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    shutil.rmtree(ROOT, ignore_errors=True)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        # split ≈ row group, both at build and at read, so recorded
        # posting ranges line up with `_metadata.file_block_start` values
        .config("spark.sql.files.maxPartitionBytes", str(ROW_GROUP_BYTES))
        .config("spark.sql.files.openCostInBytes", "0")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rchar = make_rchar(spark)

    data = build_layout(spark, args.rows, args.files, args.key_domain, bloom=False)
    data_bloom = build_layout(spark, args.rows, args.files, args.key_domain, bloom=True)
    layout = describe_layout(data)
    print("layout:", json.dumps(layout))

    idx_root = f"{ROOT}/idx"
    build_mod.build_block_index(spark, data, "k", idx_root)
    idx_dir = f"{idx_root}/{__import__('elephant_twin_spark.sources.catalog', fromlist=['x']).table_id(data)}/block/k"

    # probe key: one that exists; with rows >> domain each key holds
    # rows/domain ≈ 2 rows spread over ~2 of the hundreds of row groups
    key = str(
        spark.read.parquet(data).select("k").limit(1).collect()[0]["k"]
    )
    ranges = matched_ranges(spark, idx_dir, key)
    n_ranges = sum(len(v) for v in ranges.values())
    matched_bytes = sum(e - s for v in ranges.values() for s, e in v)
    print(
        f"probe key={key} matched_files={len(ranges)} "
        f"matched_ranges={n_ranges} matched_bytes={matched_bytes}"
    )

    results = []
    DEFAULT_SPLIT = 128 * 1024 * 1024

    # (c) full scan — Parquet row-group stats alone (normal split sizing;
    # a second run at build-split size isolates per-task footer re-reads)
    for split in (DEFAULT_SPLIT, ROW_GROUP_BYTES):
        results.append(
            run_variant(
                spark, rchar, "c_fullscan_rowgroup_stats",
                lambda: spark.read.parquet(data).where(F.col("k") == int(key)),
                args.reps, split,
            )
        )

    # (a) engine index-pruned scan — file-level action (today)
    for split in (DEFAULT_SPLIT, ROW_GROUP_BYTES):
        results.append(
            run_variant(
                spark, rchar, "a_engine_file_level",
                lambda: scan_mod.query(spark, data, E.col("k") == key, idx_root),
                args.reps, split,
            )
        )

    # (b) file-level + block-range filter from the matched postings —
    # only meaningful at the build-time split size (see run_variant)
    def range_scan():
        files = sorted(ranges)
        df = spark.read.parquet(*files)
        cond = F.lit(False)
        for f, rs in ranges.items():
            fcond = F.lit(False)
            for s, e in rs:
                fcond = fcond | (
                    (F.col("_metadata.file_block_start") >= F.lit(int(s)))
                    & (F.col("_metadata.file_block_start") < F.lit(int(e)))
                )
            cond = cond | (
                (fsio.file_path_col(F.col("_metadata.file_path")) == F.lit(f)) & fcond
            )
        return df.where(cond & (F.col("k") == int(key)))

    results.append(
        run_variant(spark, rchar, "b_block_range_filter", range_scan, args.reps,
                    ROW_GROUP_BYTES)
    )

    # (d) full scan over the bloom-enabled copy — parquet-native sub-file
    results.append(
        run_variant(
            spark, rchar, "d_parquet_bloom",
            lambda: spark.read.parquet(data_bloom).where(F.col("k") == int(key)),
            args.reps, DEFAULT_SPLIT,
        )
    )

    # (e) COMPOSITION — the adoption candidate: block index prunes files,
    # write-time parquet bloom prunes row groups inside matched files
    # (the engine's pushed residual Eq filter reaches the bloom for free)
    build_mod.build_block_index(spark, data_bloom, "k", idx_root)
    results.append(
        run_variant(
            spark, rchar, "e_index_plus_bloom",
            lambda: scan_mod.query(spark, data_bloom, E.col("k") == key, idx_root),
            args.reps, DEFAULT_SPLIT,
        )
    )

    answers = {(r["variant"], r["split_bytes"]): (r["rows"], r["payload_len"]) for r in results}
    assert len(set(answers.values())) == 1, f"variants disagree: {answers}"

    print(json.dumps({"layout": layout, "key": key, "results": results}, indent=2))


if __name__ == "__main__":
    main()
