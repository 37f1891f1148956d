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
