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


def test_zorder_multi_column_pruning(spark, workdir, events_multifile):
    """Z-order gives BOTH columns file-level locality: zone indexes on
    each column prune files for point/range queries on either."""
    dst = layout.zorder_table(
        spark, events_multifile, f"{workdir}/events_zorder",
        ["user_id", "value"], num_files=16, bits=6,
    )
    eng = Engine(spark, f"{workdir}/zorder_root")
    eng.build_zone_index(dst, "user_id")
    eng.build_zone_index(dst, "value")

    full = spark.read.parquet(dst)
    # content preserved exactly
    src = spark.read.parquet(events_multifile)
    assert src.count() == full.count()
    assert src.exceptAll(full).count() == 0

    ratios = []
    for pred, naive in [
        ((col("user_id") >= 2) & (col("user_id") <= 4),
         (F.col("user_id") >= 2) & (F.col("user_id") <= 4)),
        ((col("value") >= 10.0) & (col("value") <= 30.0),
         (F.col("value") >= 10.0) & (F.col("value") <= 30.0)),
    ]:
        got = eng.query(dst, pred)
        assert got.count() == full.where(naive).count() > 0
        m = eng.last_metrics
        assert m.scanned_files < m.total_files, m.as_dict()
        ratios.append(m.bytes_ratio)
    # both dimensions pruned — neither got all the locality
    assert all(r > 1.2 for r in ratios), ratios


def test_zorder_string_column_hash_buckets(spark, workdir, events_multifile):
    dst = layout.zorder_table(
        spark, events_multifile, f"{workdir}/events_zorder_str",
        ["event_type", "user_id"], num_files=12, bits=5,
    )
    eng = Engine(spark, f"{workdir}/zorder_str_root")
    eng.build_index(dst, "event_type", num_buckets=4)
    got = eng.query(dst, col("event_type") == "click")
    want = spark.read.parquet(dst).where(F.col("event_type") == "click")
    assert got.count() == want.count() > 0
    m = eng.last_metrics
    # 5 event types hash-bucketed into the top bits → clustered subsets
    assert m.scanned_files < m.total_files, m.as_dict()


def test_interleave_bits_is_morton_code(spark):
    """_interleave_bits equals the reference Morton encoding for every
    4-bit pair, and is monotonic per dimension with the other fixed."""
    from elephant_twin_spark.operators.layout import _interleave_bits

    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", _interleave_bits([F.col("a"), F.col("b")], 4).alias("z")
        ).collect()
    }

    def morton(a, b):
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == morton(a, b), (a, b, z)
    for fixed in range(16):
        zs = [got[(a, fixed)] for a in range(16)]
        assert zs == sorted(zs)
        zs = [got[(fixed, b)] for b in range(16)]
        assert zs == sorted(zs)


def test_bucketed_join_has_no_exchange(spark, workdir):
    """Co-located join: two tables bucketed on the join key with equal
    bucket counts must sort-merge join with ZERO shuffle exchanges —
    the write-once/join-forever layout contract."""
    import shutil

    from conftest import SF_DIR

    from elephant_twin_spark.sources import tables

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("ets_bkt_a", "ets_bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    ev = tables.load_raw(spark, f"{SF_DIR}/events.parquet")
    a = ev.select("event_id", "user_id", "value")
    b = ev.select("user_id", "event_type").distinct()
    layout.bucket_table(spark, a, "ets_bkt_a", ["user_id"], 8, sort_cols=["user_id"])
    layout.bucket_table(spark, b, "ets_bkt_b", ["user_id"], 8, sort_cols=["user_id"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    except Exception:
        old_aqe = None
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("ets_bkt_a")
            .join(spark.table("ets_bkt_b"), "user_id")
            .groupBy("event_type")
            .agg(F.sum("value").alias("rev"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan.split("HashAggregate")[-1], plan
        # the join itself: no exchange between the scans and the join
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS ets_bkt_a")
        spark.sql("DROP TABLE IF EXISTS ets_bkt_b")
