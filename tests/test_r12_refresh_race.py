"""Mid-REFRESH file-landing race (r11 verdict item 5).

The r11 builder fix pinned pre-listing for all six full builders: a
file appended after the source listing must never be recorded as
covered-with-valid-checksum, or its rows are silently pruned forever.
The incremental refresh paths use the same safe ordering (list first,
descriptor records that pre-write listing) but had no equivalent race
test — these pin it for the block, text, and LSH refreshers.

Contract under a mid-refresh landing:
1. the published descriptor must NOT claim the late file (it carries
   no postings/bands for it), and
2. the NEXT refresh must see it as new and index it — the failure mode
   being guarded is permanent invisible loss, not one-cycle lag.
For the block index additionally: queries between the two refreshes
already return the late rows (not_covered → full-scanned).
"""

import glob
import shutil

import pyspark.sql.functions as F

from elephant_twin_spark import Engine, col
from elephant_twin_spark.operators import build as build_mod
from elephant_twin_spark.sources import catalog, fsio, tables
from elephant_twin_spark.streaming import refresh

from conftest import SF_DIR


def _land_on_first_write(monkeypatch, land):
    """Monkeypatch build.write_range_partitioned (the shared index-table
    writer every refresher funnels through) to land a file after the
    refresher's source listing but before its descriptor write."""
    real_write = build_mod.write_range_partitioned
    state = {"done": False}

    def write_then_land(*args, **kwargs):
        real_write(*args, **kwargs)
        if not state["done"]:
            land()
            state["done"] = True

    monkeypatch.setattr(build_mod, "write_range_partitioned", write_then_land)
    return state


def _first_part(src_dir):
    return sorted(glob.glob(f"{src_dir.replace('file://', '')}/part-*.parquet"))[0]


def test_block_refresh_mid_landing_not_claimed_covered(
    spark, workdir, events_multifile, monkeypatch
):
    tbl = tables.materialize(
        spark, f"{SF_DIR}/events.parquet", f"{workdir}/rr_block_tbl", 4
    )
    root = f"{workdir}/rr_block_idx"
    eng = Engine(spark, root)
    eng.build_index(tbl, "event_type", num_buckets=4)

    # a normal new file so the refresh has a delta to write
    trigger_src = f"{workdir}/rr_block_trigger"
    spark.read.parquet(tbl).limit(7).withColumn(
        "event_type", F.lit("refresh_trigger")
    ).coalesce(1).write.mode("overwrite").parquet(trigger_src)
    shutil.copy(_first_part(trigger_src), f"{tbl.replace('file://','')}/part-trigger.parquet")
    spark.catalog.refreshByPath(tbl)

    # the racing ingest: lands DURING the refresh, after its listing
    late_src = f"{workdir}/rr_block_late"
    spark.read.parquet(tbl).limit(5).withColumn(
        "event_type", F.lit("landed_mid_refresh")
    ).coalesce(1).write.mode("overwrite").parquet(late_src)

    def land():
        shutil.copy(_first_part(late_src), f"{tbl.replace('file://','')}/part-late.parquet")
        spark.catalog.refreshByPath(tbl)

    _land_on_first_write(monkeypatch, land)
    out = refresh.refresh_block_index(spark, tbl, "event_type", root)
    assert out["mode"] == "incremental" and out["files_indexed"] == 1

    late_file = fsio.normalize_path(f"{tbl}/part-late.parquet")
    desc = catalog.read_descriptor(
        spark, catalog.index_dir(root, tbl, "event_type", "block")
    )
    assert late_file not in set(desc.files)

    # between refreshes: not_covered → scanned, rows never pruned
    got = eng.query(tbl, col("event_type") == "landed_mid_refresh").count()
    assert got == 5
    assert eng.last_metrics.stale_files == 1

    # next cycle picks it up; the index becomes fully consistent
    out2 = refresh.refresh_block_index(spark, tbl, "event_type", root)
    assert out2["mode"] == "incremental" and out2["files_indexed"] == 1
    eng2 = Engine(spark, root)
    assert eng2.query(tbl, col("event_type") == "landed_mid_refresh").count() == 5
    assert eng2.last_metrics.stale_files == 0
    eng2.assert_index_consistent(tbl, "event_type")


def test_text_refresh_mid_landing_not_claimed_covered(spark, workdir, monkeypatch):
    src = f"{workdir}/rr_text_tbl"
    docs = tables.load_raw(spark, f"{SF_DIR}/documents.parquet")
    docs.where(F.col("doc_id") < 80).coalesce(2).write.mode("overwrite").parquet(src)

    root = f"{workdir}/rr_text_idx"
    eng = Engine(spark, root)
    eng.build_text_index(src, "text", "doc_id")

    # trigger doc (normal append) so the refresh runs its delta write
    spark.createDataFrame(
        [(9_001, "trigger_term appears here", "en", "synthetic", 25)],
        schema=docs.schema,
    ).coalesce(1).write.mode("append").parquet(src)
    spark.catalog.refreshByPath(src)

    late_src = f"{workdir}/rr_text_late"
    spark.createDataFrame(
        [(9_002, "zzz_mid_refresh sentinel", "en", "synthetic", 24)],
        schema=docs.schema,
    ).coalesce(1).write.mode("overwrite").parquet(late_src)

    def land():
        shutil.copy(_first_part(late_src), f"{src}/part-late.parquet")
        spark.catalog.refreshByPath(src)

    _land_on_first_write(monkeypatch, land)
    out = refresh.refresh_text_index(spark, src, "text", root)
    assert out["mode"] == "incremental" and out["files_indexed"] == 1

    late_file = fsio.normalize_path(f"{src}/part-late.parquet")
    desc = catalog.read_descriptor(spark, catalog.index_dir(root, src, "text", "text"))
    assert late_file not in set(desc.files)

    # the next refresh must SEE the late file (not claimed fresh) and
    # index it — afterwards its sentinel term is searchable
    out2 = refresh.refresh_text_index(spark, src, "text", root)
    assert out2["mode"] == "incremental" and out2["files_indexed"] == 1
    ti = eng.text_index(src, "text")
    assert ti.count("zzz_mid_refresh") == 1
    assert {r["doc_id"] for r in ti.matches("zzz_mid_refresh").collect()} == {9_002}


def test_lsh_refresh_mid_landing_not_claimed_covered(spark, workdir, monkeypatch):
    from elephant_twin_spark.operators import lsh as lsh_mod

    src = f"{workdir}/rr_lsh_tbl"
    docs = tables.load_raw(spark, f"{SF_DIR}/documents.parquet")
    docs.where(F.col("doc_id") < 60).coalesce(2).write.mode("overwrite").parquet(src)

    root = f"{workdir}/rr_lsh_idx"
    lsh_mod.build_lsh_index(spark, src, "text", "doc_id", root)

    # an exact copy of doc 5's text under a new id — once indexed, the
    # gate MUST flag a re-submission of that text as a duplicate
    dup_text = docs.where(F.col("doc_id") == 5).first()["text"]

    spark.createDataFrame(
        [(9_101, "unrelated trigger document body", "en", "synthetic", 30)],
        schema=docs.schema,
    ).coalesce(1).write.mode("append").parquet(src)
    spark.catalog.refreshByPath(src)

    late_src = f"{workdir}/rr_lsh_late"
    spark.createDataFrame(
        [(9_102, dup_text, "en", "synthetic", len(dup_text.split()))],
        schema=docs.schema,
    ).coalesce(1).write.mode("overwrite").parquet(late_src)

    def land():
        shutil.copy(_first_part(late_src), f"{src}/part-late.parquet")
        spark.catalog.refreshByPath(src)

    _land_on_first_write(monkeypatch, land)
    out = refresh.refresh_lsh_index(spark, src, "text", root)
    assert out["mode"] == "incremental" and out["files_indexed"] == 1

    late_file = fsio.normalize_path(f"{src}/part-late.parquet")
    desc = catalog.read_descriptor(spark, catalog.index_dir(root, src, "text", "lsh"))
    assert late_file not in set(desc.files)

    # between refreshes the gap is LOUD, not silent
    idx = lsh_mod.LshIndex(spark, src, "text", root)
    assert idx.stale_files() == [late_file]

    out2 = refresh.refresh_lsh_index(spark, src, "text", root)
    assert out2["mode"] == "incremental" and out2["files_indexed"] == 1
    idx2 = lsh_mod.LshIndex(spark, src, "text", root)
    assert idx2.stale_files() == []
    # the late doc's bands are live: its text now collides with doc 5
    probe = spark.createDataFrame(
        [(1, dup_text)], "probe_id long, text string"
    )
    cands = idx2.candidate_pairs(probe, "text", "probe_id")
    assert {r["corpus_id"] for r in cands.collect()} >= {5, 9_102}
