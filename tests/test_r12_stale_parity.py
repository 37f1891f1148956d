"""Zone/bloom staleness parity through the DISTRIBUTED planner (r11
verdict item 6).

The r11 ``distinct_keys`` leak was a fresh-file-filter omission on an
index-only read. The driver path and the cluster-side twin
(``scan._eval_tree_df``) both apply fresh-file semi-joins, but only the
BLOCK kind had a mutate/delete equivalence test. These clone it for
zone and bloom leaves, forced through the distributed evaluator via
``distributed_threshold=0``:

- one source file MUTATED in place (new values the old index never saw
  → the file must be not_covered and always scanned),
- another source file DELETED (its stale index rows must not resurrect
  rows or break the read),

and assert rows + pruning metrics are identical between the driver and
distributed planners, and equal to a ground-truth full scan.
"""

import glob
import os
import shutil

import pyspark.sql.functions as F

from elephant_twin_spark import Engine, col
from elephant_twin_spark.operators import scan
from elephant_twin_spark.sources import tables

from conftest import SF_DIR


def _rows(df):
    return sorted(r["event_id"] for r in df.collect())


def _mutate_file(spark, tbl, part, mutate_fn):
    """Rewrite one part file in place with mutated values."""
    df = spark.read.parquet(part)
    tmp = f"{tbl}/_mut_tmp_out"
    mutate_fn(df).coalesce(1).write.mode("overwrite").parquet(tmp)
    new_part = sorted(glob.glob(f"{tmp}/part-*.parquet"))[0]
    shutil.copyfile(new_part, part)
    shutil.rmtree(tmp)
    for crc in glob.glob(f"{tbl}/.*.crc"):
        os.remove(crc)
    spark.catalog.refreshByPath(tbl)


def _delete_file(spark, tbl, part):
    os.remove(part)
    crc = f"{os.path.dirname(part)}/.{os.path.basename(part)}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    spark.catalog.refreshByPath(tbl)


def _parity(spark, tbl, pred, index_root, expect_stale=1):
    md, mc = scan.ScanMetrics(), scan.ScanMetrics()
    drv = scan.query(spark, tbl, pred, index_root,
                     metrics=md, distributed_threshold=10**9)
    dist = scan.query(spark, tbl, pred, index_root,
                      metrics=mc, distributed_threshold=0)
    assert md.planner == "driver" and mc.planner == "distributed"
    got_d, got_c = _rows(drv), _rows(dist)
    assert got_d == got_c, repr(pred)
    assert mc.scanned_files == md.scanned_files, repr(pred)
    assert mc.scanned_bytes == md.scanned_bytes, repr(pred)
    assert mc.stale_files == md.stale_files == expect_stale, repr(pred)
    return got_d


def test_zone_stale_parity_mutated_and_deleted(spark, workdir):
    tbl = f"{workdir}/zone_stale_tbl"
    ev = tables.load_raw(spark, f"{SF_DIR}/events.parquet")
    ev.repartitionByRange(8, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(tbl)
    eng = Engine(spark, f"{workdir}/zone_stale_root")
    eng.build_zone_index(tbl, "ts")

    parts = sorted(glob.glob(f"{tbl}/part-*.parquet"))
    # mutate the FIRST (oldest-ts) file to a far-future sentinel the
    # recorded zone [min,max] cannot contain
    _mutate_file(
        spark, tbl, parts[0],
        lambda df: df.withColumn("ts", F.lit("2031-06-01 00:00:00").cast(df.schema["ts"].dataType)),
    )
    # delete the LAST (newest-ts) file: its zone row still exists in the
    # index table and must not resurrect its rows
    deleted_df = spark.read.parquet(parts[-1]).cache()
    deleted_ids = _rows(deleted_df)
    del_min_ts = deleted_df.agg(F.min("ts")).first()[0]
    deleted_df.unpersist()
    _delete_file(spark, tbl, parts[-1])

    full = spark.read.parquet(tbl)

    # (a) sentinel range: only the mutated file holds matches, and only
    # staleness (not the zone row) makes it scannable
    got = _parity(spark, tbl, col("ts") >= "2030-01-01", eng.index_root)
    want = _rows(full.where(F.col("ts") >= "2030-01-01"))
    assert got == want and len(got) > 0

    # (b) range aimed at the DELETED file's old zone: nothing resurrects
    got = _parity(spark, tbl, col("ts") >= str(del_min_ts), eng.index_root)
    want = _rows(full.where(F.col("ts") >= F.lit(str(del_min_ts))))
    assert got == want
    assert not set(got) & set(deleted_ids) - set(want)

    # (c) ordinary mid-range predicate still prunes and matches
    got = _parity(
        spark, tbl,
        (col("ts") >= "2024-01-10") & (col("ts") < "2024-01-12"),
        eng.index_root,
    )
    want = _rows(full.where((F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-12")))
    assert got == want and len(got) > 0


def test_bloom_stale_parity_mutated_and_deleted(spark, workdir):
    tbl = f"{workdir}/bloom_stale_tbl"
    ev = tables.load_raw(spark, f"{SF_DIR}/events.parquet")
    ev.repartitionByRange(8, "user_id").write.mode("overwrite").parquet(tbl)
    eng = Engine(spark, f"{workdir}/bloom_stale_root")
    eng.build_bloom_index(tbl, "user_id")

    parts = sorted(glob.glob(f"{tbl}/part-*.parquet"))
    # mutate file 0: all its rows get a user_id the old bloom never saw
    _mutate_file(
        spark, tbl, parts[0],
        lambda df: df.withColumn("user_id", F.lit(987_654_321).cast(df.schema["user_id"].dataType)),
    )
    # pick a user that lives ONLY in the to-be-deleted last file, then
    # delete it: the stale bloom row says "maybe here" forever
    last = spark.read.parquet(parts[-1])
    rest = spark.read.parquet(*parts[:-1])
    only_last = (
        last.select("user_id").distinct()
        .join(rest.select("user_id").distinct(), "user_id", "left_anti")
        .first()
    )
    deleted_only_uid = only_last["user_id"] if only_last is not None else None
    _delete_file(spark, tbl, parts[-1])

    full = spark.read.parquet(tbl)

    # (a) sentinel lookup: found via staleness, parity across planners
    got = _parity(spark, tbl, col("user_id") == 987_654_321, eng.index_root)
    want = _rows(full.where(F.col("user_id") == 987_654_321))
    assert got == want and len(got) > 0

    # (b) a user only the deleted file had: zero rows, no read error,
    # identical (stale-file-only) scan on both planners
    if deleted_only_uid is not None:
        got = _parity(spark, tbl, col("user_id") == deleted_only_uid, eng.index_root)
        assert got == []

    # (c) ordinary lookup still correct and pruned identically
    some_uid = full.where(F.col("user_id") != 987_654_321).first()["user_id"]
    got = _parity(spark, tbl, col("user_id") == some_uid, eng.index_root)
    want = _rows(full.where(F.col("user_id") == some_uid))
    assert got == want and len(got) > 0
