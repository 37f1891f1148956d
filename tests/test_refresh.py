"""Incremental index maintenance tests (M1 semantics: index only new
files; changed files re-indexed; deleted files dropped)."""

import glob
import os
import shutil

import pyspark.sql.functions as F
import pytest

from elephant_twin_spark import Engine, col
from elephant_twin_spark.sources import tables
from elephant_twin_spark.streaming import refresh

from conftest import SF_DIR


@pytest.fixture()
def growing_table(spark, workdir, events_multifile):
    """A table directory that starts with the events files and can grow."""
    dst = f"{workdir}/events_growing"
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for p in sorted(glob.glob(f"{events_multifile}/part-*.parquet"))[:4]:
        shutil.copy(p, dst)
    return dst


def _add_files(spark, src_glob, dst, n):
    added = 0
    for p in sorted(glob.glob(src_glob)):
        base = os.path.basename(p)
        if not os.path.exists(f"{dst}/{base}"):
            shutil.copy(p, dst)
            added += 1
            if added == n:
                break
    import time

    return added


def test_refresh_full_then_incremental(spark, workdir, growing_table, events_multifile):
    root = f"{workdir}/refresh_root"
    r1 = refresh.refresh_block_index(spark, growing_table, "event_type", root)
    assert r1["mode"] == "full_build"

    r2 = refresh.refresh_block_index(spark, growing_table, "event_type", root)
    assert r2["mode"] == "noop"

    # add 4 more files → only those are indexed
    assert _add_files(spark, f"{events_multifile}/part-*.parquet", growing_table, 4) == 4
    spark.catalog.refreshByPath(growing_table)
    r3 = refresh.refresh_block_index(spark, growing_table, "event_type", root)
    assert r3["mode"] == "incremental" and r3["files_indexed"] == 4

    # post-refresh: index-derived counts equal full scan for every key
    eng = Engine(spark, root)
    eng.assert_index_consistent(growing_table, "event_type")

    # and a pruned query returns exact rows
    got = eng.query(growing_table, col("event_type") == "click")
    want = spark.read.parquet(growing_table).where(F.col("event_type") == "click")
    assert sorted([r["event_id"] for r in got.collect()]) == sorted(
        [r["event_id"] for r in want.collect()]
    )
    assert eng.last_metrics.stale_files == 0


def test_refresh_handles_deleted_files(spark, workdir, growing_table):
    root = f"{workdir}/refresh_del_root"
    refresh.refresh_block_index(spark, growing_table, "event_type", root)
    victim = sorted(glob.glob(f"{growing_table}/part-*.parquet"))[0]
    os.remove(victim)
    for crc in glob.glob(f"{growing_table}/.*.crc"):
        os.remove(crc)
    spark.catalog.refreshByPath(growing_table)
    r = refresh.refresh_block_index(spark, growing_table, "event_type", root)
    assert r["mode"] == "incremental" and r["files_removed"] == 1
    Engine(spark, root).assert_index_consistent(growing_table, "event_type")


def test_stream_index_updates(spark, workdir, growing_table, events_multifile):
    root = f"{workdir}/stream_root"
    ckpt = f"{workdir}/stream_ckpt"
    q = refresh.stream_index_updates(
        spark, growing_table, "event_type", root, ckpt, trigger_once=True
    )
    q.awaitTermination(120)
    eng = Engine(spark, root)
    eng.assert_index_consistent(growing_table, "event_type")

    # new files arrive → next availableNow pass picks them up
    _add_files(spark, f"{events_multifile}/part-*.parquet", growing_table, 2)
    spark.catalog.refreshByPath(growing_table)
    q2 = refresh.stream_index_updates(
        spark, growing_table, "event_type", root, ckpt, trigger_once=True
    )
    q2.awaitTermination(120)
    eng.assert_index_consistent(growing_table, "event_type")


def test_refresh_bloom_index_incremental(spark, workdir):
    from elephant_twin_spark import Engine, col
    from elephant_twin_spark.streaming.refresh import refresh_bloom_index
    from elephant_twin_spark.sources import tables

    src = f"{workdir}/bloom_refresh_tbl"
    base = tables.load_raw(spark, f"{SF_DIR}/events.parquet").where(F.col("user_id") < 10)
    base.repartitionByRange(4, "user_id").write.mode("overwrite").parquet(src)

    root = f"{workdir}/bloom_refresh_root"
    eng = Engine(spark, root)
    out = refresh_bloom_index(spark, src, "user_id", root)
    assert out["mode"] == "full_build"

    # noop on unchanged table
    assert refresh_bloom_index(spark, src, "user_id", root)["mode"] == "noop"

    # append new files with previously-unseen users
    extra = tables.load_raw(spark, f"{SF_DIR}/events.parquet").where(
        F.col("user_id") >= 10
    )
    extra.coalesce(1).write.mode("append").parquet(src)
    spark.catalog.refreshByPath(src)
    out = refresh_bloom_index(spark, src, "user_id", root)
    assert out["mode"] == "incremental" and out["files_indexed"] >= 1

    # new users are findable and exact after the incremental refresh
    got = eng.query(src, col("user_id") == 12).count()
    want = spark.read.parquet(src).where(F.col("user_id") == 12).count()
    assert got == want > 0
    m = eng.last_metrics
    assert "user_id" in (m.pushed or "")


def test_refresh_text_index_incremental(spark, workdir):
    from elephant_twin_spark.streaming.refresh import refresh_text_index

    src = f"{workdir}/text_refresh_tbl"
    docs = tables.load_raw(spark, f"{SF_DIR}/documents.parquet")
    docs.where(F.col("doc_id") < 80).coalesce(2).write.mode("overwrite").parquet(src)

    root = f"{workdir}/text_refresh_root"
    eng = Engine(spark, root)
    eng.build_text_index(src, "text", "doc_id")
    ti = eng.text_index(src, "text")
    base_count = ti.count("spark")

    assert refresh_text_index(spark, src, "text", root)["mode"] == "noop"

    # append a new file containing a doc with a sentinel term
    new = spark.createDataFrame(
        [(9_999, "zzz_sentinel spark zzz_sentinel", "en", "synthetic", 30)],
        schema=docs.schema,
    )
    new.coalesce(1).write.mode("append").parquet(src)
    spark.catalog.refreshByPath(src)
    out = refresh_text_index(spark, src, "text", root)
    assert out["mode"] == "incremental" and out["files_indexed"] == 1

    ti2 = eng.text_index(src, "text")
    assert ti2.count("zzz_sentinel") == 1
    assert ti2.count("spark") == base_count + 1
    # phrase search sees the new positional postings too
    assert {r["doc_id"] for r in ti2.matches('"zzz_sentinel spark"').collect()} == {9_999}


def test_refresh_text_index_maintains_doclens_and_stats(spark, workdir):
    """doclens (BM25 length + lnc norm) and corpus stats follow the
    incremental refresh — idf/avgdl never go stale."""
    from elephant_twin_spark.streaming.refresh import refresh_text_index

    src = f"{workdir}/text_refresh_lens_tbl"
    docs = tables.load_raw(spark, f"{SF_DIR}/documents.parquet")
    docs.where(F.col("doc_id") < 60).coalesce(2).write.mode("overwrite").parquet(src)

    root = f"{workdir}/text_refresh_lens_root"
    eng = Engine(spark, root)
    eng.build_text_index(src, "text", "doc_id")
    n0 = int(eng.text_index(src, "text").desc.options["n_docs"])
    assert n0 == 60

    new = spark.createDataFrame(
        [(7_777, "alpha beta beta gamma", "en", "synthetic", 20)],
        schema=docs.schema,
    )
    new.coalesce(1).write.mode("append").parquet(src)
    spark.catalog.refreshByPath(src)
    refresh_text_index(spark, src, "text", root)

    ti = eng.text_index(src, "text")
    assert int(ti.desc.options["n_docs"]) == 61
    lens = {r["doc_id"]: r for r in ti.doclens().collect()}
    assert lens[7_777]["dl"] == 4
    import math

    want_norm = math.sqrt(2 * 1.0 + (1 + math.log(2)) ** 2)
    assert abs(lens[7_777]["norm"] - want_norm) < 1e-9
    # more_like_this works against the refreshed corpus
    top = ti.more_like_this(7_777, k=3).collect()
    assert all(r["doc_id"] != 7_777 for r in top)



def test_refresh_ann_index_incremental(spark, workdir):
    """New vector files assign with the persisted centroids and append;
    verify_all's IVF soundness stays at zero violations; the new vectors
    become searchable."""
    from elephant_twin_spark.streaming.refresh import refresh_ann_index

    src = f"{workdir}/ann_refresh_tbl"
    emb = tables.load_raw(spark, f"{SF_DIR}/embeddings.parquet")
    emb.where(F.col("vec_id") < 400).coalesce(2).write.mode("overwrite").parquet(src)

    root = f"{workdir}/ann_refresh_root"
    eng = Engine(spark, root)
    eng.build_ann_index(src, "embedding", "vec_id", nlist=8, max_iter=2)
    assert refresh_ann_index(spark, src, "embedding", root)["mode"] == "noop"

    # append new vectors: an exact copy of vec 3 under a fresh id
    target = emb.where(F.col("vec_id") == 3).first()
    new = spark.createDataFrame(
        [(90_000, list(target["embedding"]), target["label"])], schema=emb.schema
    )
    new.coalesce(1).write.mode("append").parquet(src)
    spark.catalog.refreshByPath(src)
    out = refresh_ann_index(spark, src, "embedding", root)
    assert out["mode"] == "incremental" and out["files_indexed"] == 1

    ai = eng.ann_index(src, "embedding")
    assert ai.stale_files() == []
    qvec = [float(x) for x in target["embedding"]]
    top = ai.topk(qvec, k=2, nprobe=8).collect()
    assert {r["id"] for r in top} == {3, 90_000}  # twin found at cosine 1

    violations = eng.verify_all(src)
    assert violations[("ivf", "embedding")] == 0
