"""Mid-REBUILD reader race, pinned for the remaining four index kinds
(r12 verdict #5).

``test_r12_publish_race`` pins the staged-write + publish contract for
the block and text builders; zone, bloom, ANN, and LSH take the same
two-line pattern, and SCALE_EXPERIMENTS claimed they "ride the
existing suites". This file makes that claim executable: one
first-publish interposition probe per kind — the rebuild's staging
write is complete, the live data dirs and descriptor are still
entirely the OLD index, and a reader at that instant must get the
complete old-index answer.
"""

import glob

import pyspark.sql.functions as F

from elephant_twin_spark import Engine, col
from elephant_twin_spark.operators import layout
from elephant_twin_spark.sources import fsio, tables

from conftest import SF_DIR


def _probe_on_first_publish(monkeypatch, probe):
    real_publish = fsio.publish_dir
    state = {"probed": False}

    def publish_with_probe(spark, tmp_dir, final_dir):
        if not state["probed"]:
            state["probed"] = True
            probe()
        real_publish(spark, tmp_dir, final_dir)

    monkeypatch.setattr(fsio, "publish_dir", publish_with_probe)
    return state


def test_zone_rebuild_reader_sees_complete_old_index(
    spark, workdir, monkeypatch
):
    tbl = f"{workdir}/zrace_events"
    tables.materialize(spark, f"{SF_DIR}/events.parquet", tbl)
    layout.cluster_table(spark, tbl, tbl, ["ts"], num_files=4)
    eng = Engine(spark, f"{workdir}/zrace_idx")
    eng.build_zone_index(tbl, "ts")
    pred = col("ts") < "2024-01-06"
    truth = spark.read.parquet(tbl).where(F.col("ts") < "2024-01-06").count()

    observed = {}

    def probe():
        observed["count"] = eng.query(tbl, pred).count()

    state = _probe_on_first_publish(monkeypatch, probe)
    eng.build_zone_index(tbl, "ts")
    monkeypatch.undo()

    assert state["probed"], "rebuild never reached a publish — hook miswired"
    assert observed["count"] == truth
    assert eng.query(tbl, pred).count() == truth
    assert not glob.glob(f"{workdir}/zrace_idx/**/*.staging", recursive=True)


def test_bloom_rebuild_reader_sees_complete_old_index(
    spark, workdir, monkeypatch
):
    tbl = f"{workdir}/brace_events"
    tables.materialize(spark, f"{SF_DIR}/events.parquet", tbl)
    eng = Engine(spark, f"{workdir}/brace_idx")
    eng.build_bloom_index(tbl, "user_id")
    uid = int(spark.read.parquet(tbl).first()["user_id"])
    truth = spark.read.parquet(tbl).where(F.col("user_id") == uid).count()

    observed = {}

    def probe():
        observed["count"] = eng.query(tbl, col("user_id") == uid).count()

    state = _probe_on_first_publish(monkeypatch, probe)
    eng.build_bloom_index(tbl, "user_id")
    monkeypatch.undo()

    assert state["probed"]
    assert observed["count"] == truth
    assert eng.query(tbl, col("user_id") == uid).count() == truth


def test_lsh_rebuild_reader_sees_complete_old_index(
    spark, workdir, monkeypatch
):
    tbl = tables.materialize(
        spark, f"{SF_DIR}/documents.parquet", f"{workdir}/lrace_docs"
    )
    eng = Engine(spark, f"{workdir}/lrace_idx")
    eng.build_lsh_index(tbl, "text", "doc_id")
    docs = spark.read.parquet(tbl)
    probes = docs.limit(5).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    idx = eng.lsh_index(tbl, "text")
    truth = {
        (r["doc_id"], r["is_near_dup"])
        for r in idx.gate(probes, "text", "doc_id", threshold=0.5).collect()
    }

    observed = {}

    def probe():
        observed["gate"] = {
            (r["doc_id"], r["is_near_dup"])
            for r in eng.lsh_index(tbl, "text")
            .gate(probes, "text", "doc_id", threshold=0.5)
            .collect()
        }

    state = _probe_on_first_publish(monkeypatch, probe)
    eng.build_lsh_index(tbl, "text", "doc_id")
    monkeypatch.undo()

    assert state["probed"]
    assert observed["gate"] == truth
    assert not glob.glob(f"{workdir}/lrace_idx/**/*.staging", recursive=True)


def test_ann_rebuild_reader_sees_complete_old_index(
    spark, workdir, monkeypatch
):
    """ANN's probe fires before the FIRST publish of the pair — both
    live dirs and their epochs are still the complete old generation,
    so the reader passes the pair gate and answers from the old index."""
    src = f"{workdir}/arace_emb"
    emb = tables.load_raw(spark, f"{SF_DIR}/embeddings.parquet")
    emb.where(F.col("vec_id") < 300).coalesce(2).write.mode("overwrite").parquet(src)
    eng = Engine(spark, f"{workdir}/arace_idx")
    eng.build_ann_index(src, "embedding", "vec_id", nlist=4, max_iter=2)
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]]
    truth = [
        r["id"]
        for r in eng.ann_index(src, "embedding").topk(qvec, k=5, nprobe=4).collect()
    ]

    observed = {}

    def probe():
        observed["ids"] = [
            r["id"]
            for r in eng.ann_index(src, "embedding")
            .topk(qvec, k=5, nprobe=4)
            .collect()
        ]

    state = _probe_on_first_publish(monkeypatch, probe)
    eng.build_ann_index(src, "embedding", "vec_id", nlist=4, max_iter=2)
    monkeypatch.undo()

    assert state["probed"]
    assert observed["ids"] == truth
    assert eng.ann_index(src, "embedding").topk(qvec, k=5, nprobe=4).count() == 5
    assert not glob.glob(f"{workdir}/arace_idx/**/*.staging", recursive=True)
