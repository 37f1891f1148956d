"""Index-only COUNT: postings-sum answers with zero data files read."""

import pytest
from pyspark.sql import functions as F

from elephant_twin_spark.engine import Engine
from elephant_twin_spark.plans.expr import col


@pytest.fixture(scope="module")
def indexed(spark, events_multifile, workdir):
    eng = Engine(spark, f"{workdir}/countonly_idx")
    eng.build_index(events_multifile, "event_type", num_buckets=4)
    return eng, events_multifile


def test_count_matches_full_scan_zero_files(spark, indexed):
    eng, tbl = indexed
    full = spark.read.parquet(tbl)
    for pred, colname, val in [
        (col("event_type") == "click", "event_type", "click"),
        (col("event_type") == "nope_never", "event_type", "nope_never"),
    ]:
        want = full.where(F.col(colname) == val).count()
        got = eng.count(tbl, pred)
        assert got == want
        assert eng.last_metrics.scanned_files == 0  # index-only
        assert eng.last_metrics.scanned_bytes == 0


def test_count_in_list_or_chain(spark, indexed):
    eng, tbl = indexed
    full = spark.read.parquet(tbl)
    want = full.where(F.col("event_type").isin("click", "signup")).count()
    got = eng.count(tbl, "event_type IN ('click', 'signup')")
    assert got == want and eng.last_metrics.scanned_files == 0
    got2 = eng.count(tbl, (col("event_type") == "click") | (col("event_type") == "signup"))
    assert got2 == want


def test_count_falls_back_for_other_shapes(spark, indexed):
    eng, tbl = indexed
    full = spark.read.parquet(tbl)
    want = full.where((F.col("event_type") == "click") & (F.col("user_id") == 7)).count()
    got = eng.count(tbl, (col("event_type") == "click") & (col("user_id") == 7))
    assert got == want  # AND shape -> query().count() fallback
    # unindexed column -> fallback too
    want2 = full.where(F.col("user_id") == 7).count()
    assert eng.count(tbl, col("user_id") == 7) == want2


def test_count_stale_file_hybrid(spark, events_multifile, workdir):
    import shutil

    tbl = f"{workdir}/countonly_stale_tbl"
    shutil.copytree(events_multifile, tbl)
    eng = Engine(spark, f"{workdir}/countonly_stale_idx")
    eng.build_index(tbl, "event_type", num_buckets=4)
    # append new rows AFTER the build: not covered by the index
    extra = spark.read.parquet(events_multifile).where(
        F.col("event_type") == "click"
    ).limit(7)
    extra.write.mode("append").parquet(tbl)
    spark.catalog.refreshByPath(tbl)

    want = spark.read.parquet(tbl).where(F.col("event_type") == "click").count()
    got = eng.count(tbl, col("event_type") == "click")
    assert got == want
    assert eng.last_metrics.scanned_files >= 1  # the appended file was read
    assert eng.last_metrics.stale_files >= 1
