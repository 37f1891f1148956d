"""Round-9 streaming/refresh review closure tests.

The r9 fresh-eyes review of elephant_twin_spark/streaming/ found: the
zone/block refreshes recomputed deltas with raw-column defaults instead
of the descriptor's recorded build parameters (wrong index rows for new
files); the publish step never checked FileSystem.rename's boolean and
could not recover an interrupted delete→rename; the ingest gate's plain
appends duplicated rows under foreachBatch's at-least-once replay; and
the stateful sessionizer finalized sessions one watermark-tick early.
"""

import os
import time

import pytest
from pyspark.sql import Row, functions as F

from conftest import SF_DIR
from elephant_twin_spark.sources import fsio


# ---------------------------------------------- refresh option fidelity

def test_refresh_zone_index_preserves_key_expr(spark, workdir):
    from elephant_twin_spark.operators import build
    from elephant_twin_spark.streaming.refresh import refresh_zone_index

    src = f"{workdir}/r9_zone_src"
    root = f"{workdir}/r9_zone_root"
    spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, value double"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    build.build_zone_index(spark, src, "v2", root, key_expr="value * 2")

    # a new file whose EXPRESSION range differs from its raw range
    spark.createDataFrame(
        [(i, float(i)) for i in range(100, 150)], "id long, value double"
    ).coalesce(1).write.mode("append").parquet(src)
    out = refresh_zone_index(spark, src, "v2", root)
    assert out["mode"] == "incremental" and out["files_indexed"] == 1

    from elephant_twin_spark.sources import catalog

    idx_dir = catalog.index_dir(root, src, "v2", kind="zone")
    zones = {r["file"]: r for r in spark.read.parquet(f"{idx_dir}/zones").collect()}
    # the refreshed file's zones must be over value*2 (200..298), not the
    # raw column (100..149) — pre-fix the delta aggregated F.col("v2"),
    # which would have CRASHED here (no such physical column) or, with a
    # shadowing column, silently produced raw-valued zones
    new_zone = [z for z in zones.values() if z["min_v"] >= 200.0]
    assert len(new_zone) == 1
    assert new_zone[0]["min_v"] == 200.0 and new_zone[0]["max_v"] == 298.0


def test_refresh_block_index_preserves_key_expr(spark, workdir):
    from elephant_twin_spark.operators import build
    from elephant_twin_spark.streaming.refresh import refresh_block_index

    src = f"{workdir}/r9_block_src"
    root = f"{workdir}/r9_block_root"
    spark.createDataFrame(
        [(i, f"k{i % 5}") for i in range(200)], "id long, tag string"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    build.build_block_index(
        spark, src, "tag_uc", root, key_expr="upper(tag)", num_buckets=2
    )
    spark.createDataFrame(
        [(i, f"k{i % 5}") for i in range(200, 260)], "id long, tag string"
    ).coalesce(1).write.mode("append").parquet(src)
    out = refresh_block_index(spark, src, "tag_uc", root)
    assert out["mode"] == "incremental" and out["files_indexed"] == 1

    from elephant_twin_spark.sources import catalog

    idx_dir = catalog.index_dir(root, src, "tag_uc", kind="block")
    postings = spark.read.parquet(f"{idx_dir}/postings")
    # every file's keys — including the refreshed one's — are the
    # EXPRESSION's values (pre-fix the delta was keyed on the raw
    # column, which here does not physically exist -> AnalysisException)
    keys = {r["key"] for r in postings.select("key").distinct().collect()}
    assert keys == {"K0", "K1", "K2", "K3", "K4"}
    n_files = postings.select("file").distinct().count()
    assert n_files == 2


# ---------------------------------------------------- publish machinery

def test_publish_dir_checks_rename_and_recovers(spark, workdir):
    base = f"{workdir}/r9_publish"
    tmp, final = f"{base}/data_tmp", f"{base}/data"
    spark.range(10).coalesce(1).write.mode("overwrite").parquet(tmp)
    fsio.publish_dir(spark, tmp, final)
    assert spark.read.parquet(final).count() == 10
    assert not fsio.exists(spark, tmp)

    # missing staging dir is a loud error, not a silent False
    with pytest.raises(OSError, match="does not exist"):
        fsio.publish_dir(spark, tmp, final)

    # interrupted publish: final deleted, fully-written tmp left behind
    spark.range(25).coalesce(1).write.mode("overwrite").parquet(tmp)
    fsio.delete(spark, final)
    assert fsio.recover_publish(spark, tmp, final) is True
    assert spark.read.parquet(final).count() == 25

    # stale staging next to a LIVE final dir is swept, final untouched
    spark.range(7).coalesce(1).write.mode("overwrite").parquet(tmp)
    assert fsio.recover_publish(spark, tmp, final) is False
    assert not fsio.exists(spark, tmp)
    assert spark.read.parquet(final).count() == 25


# ------------------------------------------------- gate replay idempotence

def test_append_docs_batch_tag_is_idempotent(spark, workdir):
    from elephant_twin_spark.operators.build import DEFAULT_NUM_BUCKETS  # noqa: F401
    from elephant_twin_spark.operators import lsh

    src = f"{workdir}/r9_lshidx_src"
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"completely unrelated document number {i} "
                            f"with unique tail {i * 7}") for i in range(20)]
    )
    docs.write.mode("overwrite").parquet(src)
    root = f"{workdir}/r9_lshidx_root"
    lsh.build_lsh_index(spark, src, "text", "doc_id", root, num_perm=8, num_bands=4)
    idx = lsh.LshIndex(spark, src, "text", root)
    base = idx.bands().count()

    grown = spark.createDataFrame([Row(doc_id=900, text="fresh grown doc about runtime")])
    idx.append_docs(grown, "text", "doc_id", batch_tag="run1-0")
    n1 = idx.bands().count()
    assert n1 == base + 4  # num_bands rows for the one grown doc
    # at-least-once replay: same tag rewrites the same partition
    idx.append_docs(grown, "text", "doc_id", batch_tag="run1-0")
    assert idx.bands().count() == n1
    # a DIFFERENT batch lands in its own partition
    grown2 = spark.createDataFrame([Row(doc_id=901, text="second grown doc about state")])
    idx.append_docs(grown2, "text", "doc_id", batch_tag="run1-1")
    assert idx.bands().count() == n1 + 4


def test_streaming_gate_replay_does_not_duplicate(spark, workdir):
    """Simulate foreachBatch's at-least-once replay: after a drained run,
    delete the streaming checkpoint's commit marker so a restart re-runs
    the final batch. Accepted output and grown bands must be unchanged
    (pre-fix: plain appends doubled both)."""
    from elephant_twin_spark.operators import lsh
    from elephant_twin_spark.streaming.gate import stream_near_dup_gate

    corpus = f"{workdir}/r9_gate_corpus"
    spark.createDataFrame(
        [Row(doc_id=i, text=f"seed doc {i} about topic {i % 3} and filler {i * 13}")
         for i in range(10)]
    ).write.mode("overwrite").parquet(corpus)
    root = f"{workdir}/r9_gate_root"
    lsh.build_lsh_index(spark, corpus, "text", "doc_id", root, num_perm=8, num_bands=4)
    idx = lsh.LshIndex(spark, corpus, "text", root)

    src = f"{workdir}/r9_gate_src"
    spark.createDataFrame(
        [Row(doc_id=500, text="a novel incoming document about adaptive execution")]
    ).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    accepted = f"{workdir}/r9_gate_accepted"
    ckpt = f"{workdir}/r9_gate_ckpt"

    stream_near_dup_gate(
        spark.readStream.schema(schema).parquet(src), idx, "text", "doc_id",
        accepted, ckpt, threshold=0.5,
    )
    n_acc = spark.read.parquet(accepted).count()
    n_bands = idx.bands().count()
    assert n_acc == 1

    # force a replay of batch 0: planned (offsets/0) but uncommitted
    # (the local FS keeps a .crc sidecar that must go too, or the
    # re-commit's rename trips over it)
    os.remove(f"{ckpt}/commits/0")
    crc = f"{ckpt}/commits/.0.crc"
    if os.path.exists(crc):
        os.remove(crc)
    stream_near_dup_gate(
        spark.readStream.schema(schema).parquet(src), idx, "text", "doc_id",
        accepted, ckpt, threshold=0.5,
    )
    assert spark.read.parquet(accepted).count() == n_acc
    assert idx.bands().count() == n_bands


# ------------------------------------------- session finalize boundary

def test_streaming_session_not_finalized_at_exact_watermark(spark, workdir):
    """An on-time event with ts == watermark can still extend a session
    whose end+gap == watermark — finalizing at <= split one batch
    session into two (r9 review off-by-one). gap=30min, delay=1h:
    batch 1 (u1@10:00, u2@11:30) moves wm to exactly 10:30; batch 2 adds
    u1@10:30 (admissible, within gap) — the stream must emit ONE u1
    session 10:00-10:30 with 2 events, matching batch semantics."""
    from elephant_twin_spark.streaming import stateful

    src = f"{workdir}/r9_sess_src"
    rows1 = [
        Row(user_id=1, ts="2024-01-01 10:00:00"),
        Row(user_id=2, ts="2024-01-01 11:30:00"),
    ]
    rows2 = [
        Row(user_id=1, ts="2024-01-01 10:30:00"),
        Row(user_id=2, ts="2024-01-01 14:00:00"),  # pushes wm past closure
    ]
    os.makedirs(src, exist_ok=True)
    df1 = spark.createDataFrame(rows1).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    df2 = spark.createDataFrame(rows2).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    df1.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    df2.coalesce(1).write.mode("append").parquet(src)
    # modification-time order decides batch order under maxFilesPerTrigger
    parts = sorted(
        (os.path.getmtime(f"{src}/{p}"), p)
        for p in os.listdir(src) if p.startswith("part-")
    )
    assert len(parts) == 2 and parts[0][0] < parts[1][0]

    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sdf = stateful.streaming_sessionize(stream, gap_seconds=1800, watermark="1 hour")
    out, ckpt = f"{workdir}/r9_sess_out", f"{workdir}/r9_sess_ckpt"
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = [
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.read.parquet(out).where("user_id = 1").collect()
    ]
    # exactly one finalized u1 session covering BOTH events — the
    # pre-fix code emitted (10:00, 10:00, 1) from batch 1 and the
    # 10:30 event became a spurious second session
    assert got == [(1, "2024-01-01 10:00:00", "2024-01-01 10:30:00", 2)]
