"""Staged publish for the re-layout writers (r12 verdict #7).

``compact_table`` / ``cluster_table`` / ``zorder_table`` rewrote their
destination IN PLACE with ``mode("overwrite")`` — but a re-layout of a
BASE table is exactly the read-while-rewrite case the r12 index-builder
fix closed: a reader mid-rewrite saw partial data with no failure.
Each writer now stages to ``<dst>.staging`` and publishes via
``fsio.publish_dir`` (delete + rename), which also makes in-place
``src == dst`` re-layout safe and crashed publishes self-healing.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from elephant_twin_spark.operators import layout
from elephant_twin_spark.sources import fsio, tables

from conftest import SF_DIR


@pytest.fixture()
def src_events(spark, workdir):
    return tables.materialize(
        spark, f"{SF_DIR}/events.parquet", f"{workdir}/layout_src_events"
    )


def _truth(spark, path):
    df = spark.read.parquet(path)
    return (
        df.count(),
        # decimal sum: a long sum of xxhash64 overflows under ANSI mode
        df.agg(
            F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)"))
        ).first()[0],
    )


def test_reader_mid_compact_sees_complete_old_table(
    spark, workdir, src_events, monkeypatch
):
    dst = f"{workdir}/layout_compact_dst"
    layout.compact_table(spark, src_events, dst, target_file_mb=1)
    truth = _truth(spark, dst)

    observed = {}
    real_publish = fsio.publish_dir

    def publish_with_probe(s, tmp_dir, final_dir):
        # the rewrite's heavy write is DONE, the publish has not
        # happened: a concurrent reader must still see the complete
        # old table
        observed["probe"] = _truth(spark, dst)
        real_publish(s, tmp_dir, final_dir)

    monkeypatch.setattr(fsio, "publish_dir", publish_with_probe)
    layout.compact_table(spark, src_events, dst, target_file_mb=1)
    monkeypatch.undo()

    assert observed["probe"] == truth
    assert _truth(spark, dst) == truth
    assert not os.path.exists(f"{dst}.staging")


def test_inplace_recluster_is_safe_and_equal(spark, workdir, src_events):
    """src == dst: the staged write reads the live table while writing
    the staging dir; the publish swaps — previously this overwrite
    corrupted or raised (Spark cannot overwrite a path it is reading)."""
    tbl = f"{workdir}/layout_inplace"
    tables.materialize(spark, f"{SF_DIR}/events.parquet", tbl)
    truth = _truth(spark, tbl)

    layout.cluster_table(spark, tbl, tbl, ["event_type"], num_files=4)
    assert _truth(spark, tbl) == truth
    # clustered: each event_type now spans few files
    df = spark.read.parquet(tbl).select(
        "event_type", F.input_file_name().alias("f")
    )
    per_key_files = (
        df.groupBy("event_type").agg(F.countDistinct("f").alias("nf")).collect()
    )
    assert all(r["nf"] <= 2 for r in per_key_files), per_key_files

    layout.zorder_table(spark, tbl, tbl, ["user_id", "value"], num_files=4)
    assert _truth(spark, tbl) == truth
    assert not glob.glob(f"{tbl}.staging")


def test_crashed_layout_publish_self_heals(spark, workdir, src_events):
    dst = f"{workdir}/layout_crash_dst"
    layout.compact_table(spark, src_events, dst, target_file_mb=1)
    truth = _truth(spark, dst)

    # simulate the crash between delete and rename
    os.rename(dst, f"{dst}.staging")
    with pytest.raises(FileNotFoundError, match="recover_publish"):
        fsio.require_published(spark, dst)
        spark.read.parquet(dst).count()

    # the next maintenance call heals before rewriting
    layout.compact_table(spark, src_events, dst, target_file_mb=1)
    assert _truth(spark, dst) == truth
    assert not os.path.exists(f"{dst}.staging")
