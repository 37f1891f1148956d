"""URI-encoding parity for table paths (r13 review probe).

``_metadata.file_path`` renders the URI-ENCODED spelling (a space
becomes ``%20``) while Hadoop listings — the other side of every
file-set comparison — render the LITERAL disk path. Before r13, every
index built over a table path containing a space pruned to an EMPTY
file set: the descriptor claimed full coverage in literal form, the
postings referenced ``%20`` spellings no listing ever produced, and
queries silently returned ZERO rows (not an error). At 100 TB table
paths are user-provided; "a space in the path" cannot mean "silently
no data". ``fsio.file_path_col`` now decodes the metadata column (with
the ``+``-protection dance — ``url_decode`` is form-decoding), and all
builders/refreshers store the literal form.
"""

import glob
import os
import shutil

import pyspark.sql.functions as F

from elephant_twin_spark import Engine, col
from elephant_twin_spark.sources import fsio, tables

from conftest import SF_DIR


def test_file_path_col_decoding(spark):
    df = spark.createDataFrame(
        [
            ("file:/tmp/a%20b/part-0.parquet",),      # encoded space
            ("file:/tmp/c+d/part-0.parquet",),        # literal + must survive
            ("file:///tmp/plain/part-0.parquet",),    # already canonical
        ],
        "p string",
    )
    got = [r["v"] for r in df.select(fsio.file_path_col("p").alias("v")).collect()]
    assert got == [
        "file:///tmp/a b/part-0.parquet",
        "file:///tmp/c+d/part-0.parquet",
        "file:///tmp/plain/part-0.parquet",
    ]


def test_index_over_path_with_spaces(spark, workdir):
    base = f"{workdir}/space dir"
    tbl = tables.materialize(spark, f"{SF_DIR}/events.parquet", f"{base}/my events")
    eng = Engine(spark, f"{base}/idx root")

    eng.build_index(tbl, "event_type", num_buckets=4)
    truth = spark.read.parquet(tbl).where(F.col("event_type") == "click").count()
    got = eng.query(tbl, col("event_type") == "click")
    assert got.count() == truth and truth > 0
    # the index actually PRUNED (paths matched — not a fell-back full
    # scan that happens to be right)
    assert eng.last_metrics.as_dict()["stale_files"] == 0

    # refresh path: a late file whose name ALSO contains a space
    src = sorted(glob.glob(f"{tbl}/*.parquet"))[0]
    shutil.copy(src, f"{tbl}/late file.parquet")
    crc = f"{tbl}/.{os.path.basename(src)}.crc"
    if os.path.exists(crc):
        shutil.copy(crc, f"{tbl}/.late file.parquet.crc")
    spark.catalog.refreshByPath(tbl)
    from elephant_twin_spark.streaming.refresh import refresh_block_index

    out = refresh_block_index(spark, tbl, "event_type", f"{base}/idx root")
    assert out["mode"] == "incremental" and out["files_indexed"] == 1
    truth2 = spark.read.parquet(tbl).where(F.col("event_type") == "click").count()
    assert eng.query(tbl, col("event_type") == "click").count() == truth2 > truth


def test_spelling_equivalence_and_spacey_column(spark, workdir):
    """Companion probes (r13): (1) the same table queried under
    trailing-slash / file:// URI / doubled-slash spellings resolves to
    the SAME index (r9 normalize_path holds); (2) a column literally
    named with a space indexes and prunes end-to-end."""
    tbl = tables.materialize(
        spark, f"{SF_DIR}/events.parquet", f"{workdir}/spellings_tbl"
    )
    eng = Engine(spark, f"{workdir}/spellings_idx")
    eng.build_index(tbl, "event_type", num_buckets=4)
    truth = spark.read.parquet(tbl).where(F.col("event_type") == "click").count()
    for spelling in (tbl + "/", "file://" + tbl, tbl.replace("/spellings_tbl", "//spellings_tbl")):
        assert eng.query(spelling, col("event_type") == "click").count() == truth
        # resolved the EXISTING index, not a fresh full-scan identity
        assert eng.last_metrics.as_dict()["planner"] == "driver"

    spaced = f"{workdir}/spacey_col_tbl"
    tables.load_raw(spark, f"{SF_DIR}/events.parquet").withColumnRenamed(
        "event_type", "event type"
    ).write.mode("overwrite").parquet(spaced)
    eng.build_index(spaced, "event type", num_buckets=4)
    t2 = spark.read.parquet(spaced).where(F.col("`event type`") == "click").count()
    assert eng.query(spaced, col("event type") == "click").count() == t2 > 0


def test_index_over_unicode_path(spark, workdir):
    """Non-ASCII path segments URI-encode as multi-byte %XX runs in
    _metadata.file_path (é -> %C3%A9) — same mechanism, own pin."""
    base = f"{workdir}/tablé ünïcode"
    tbl = tables.materialize(spark, f"{SF_DIR}/events.parquet", f"{base}/événements")
    eng = Engine(spark, f"{base}/idx")
    eng.build_index(tbl, "event_type", num_buckets=4)
    truth = spark.read.parquet(tbl).where(F.col("event_type") == "click").count()
    assert eng.query(tbl, col("event_type") == "click").count() == truth > 0
    assert eng.last_metrics.as_dict()["stale_files"] == 0


def test_text_and_ann_over_path_with_spaces(spark, workdir):
    base = f"{workdir}/space dir2"
    docs = tables.materialize(spark, f"{SF_DIR}/documents.parquet", f"{base}/my docs")
    eng = Engine(spark, f"{base}/idx root")
    eng.build_text_index(docs, "text", "doc_id")
    ti = eng.text_index(docs, "text")
    assert ti.count("the") > 0
    assert ti.matches("the", scoring="bm25").count() > 0

    emb = tables.materialize(
        spark, f"{SF_DIR}/embeddings.parquet", f"{base}/my emb"
    )
    eng.build_ann_index(emb, "embedding", "vec_id", nlist=4, max_iter=2)
    ai = eng.ann_index(emb, "embedding")
    # file-set parity: encoded vs literal spellings used to make every
    # covered file look unknown here
    assert ai.stale_files() == []
    qv = [float(x) for x in spark.read.parquet(emb).first()["embedding"]]
    assert len(ai.topk(qv, k=3, nprobe=4).collect()) == 3
