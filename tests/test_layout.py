"""Clustered layout → observable selectivity-proportional pruning."""

import pyspark.sql.functions as F

from elephant_twin_spark import Engine, col
from elephant_twin_spark.operators import layout


def test_clustered_layout_prunes(spark, workdir, events_multifile):
    clustered = layout.cluster_table(
        spark, events_multifile, f"{workdir}/events_clustered", ["event_type"], num_files=10
    )
    eng = Engine(spark, f"{workdir}/layout_root")
    eng.build_index(clustered, "event_type", num_buckets=4)

    got = eng.query(clustered, col("event_type") == "click")
    want = spark.read.parquet(clustered).where(F.col("event_type") == "click")
    assert got.count() == want.count() > 0

    m = eng.last_metrics
    # 5 event types clustered into 10 range files → 'click' lives in ~2
    assert m.scanned_files < m.total_files, m.as_dict()
    assert m.bytes_ratio > 2.0, m.as_dict()


def test_compact_table(spark, workdir, events_multifile):
    from elephant_twin_spark.sources import fsio

    dst = f"{workdir}/events_compacted"
    n = layout.compact_table(spark, events_multifile, dst, target_file_mb=128)
    assert n == 1  # tiny table compacts to a single file
    files = fsio.list_data_files(spark, dst)
    assert len(files) == 1
    # content preserved exactly
    a = spark.read.parquet(events_multifile)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
