"""Zone-map index: per-file typed min/max serving ORDERED predicates —
pushdown beyond the reference's EQ-only contract."""

import pyspark.sql.functions as F
import pytest

from elephant_twin_spark import Engine, col
from elephant_twin_spark.sources import tables

from conftest import SF_DIR


@pytest.fixture(scope="module")
def time_clustered(spark, workdir):
    src = f"{workdir}/events_zone_tbl"
    ev = tables.load_raw(spark, f"{SF_DIR}/events.parquet")
    ev.repartitionByRange(8, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(src)
    return src


@pytest.fixture(scope="module")
def zeng(spark, workdir, time_clustered):
    e = Engine(spark, f"{workdir}/zone_root")
    e.build_zone_index(time_clustered, "ts")
    return e


def test_zone_range_query_exact_and_pruned(spark, zeng, time_clustered):
    full = tables.load_raw(spark, time_clustered)
    for pred, ref in [
        (col("ts") < "2024-01-06", F.col("ts") < "2024-01-06"),
        (col("ts") >= "2024-01-25", F.col("ts") >= "2024-01-25"),
        (
            (col("ts") >= "2024-01-10") & (col("ts") < "2024-01-12"),
            (F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-12"),
        ),
    ]:
        got = zeng.query(time_clustered, pred)
        want = full.where(ref)
        assert got.count() == want.count() > 0, repr(pred)
        m = zeng.last_metrics
        assert "Cmp" in (m.pushed or ""), m.as_dict()
        # time-clustered files → a narrow range touches few of the 8 files
        assert m.scanned_files < m.total_files, m.as_dict()


def test_zone_eq_and_empty_range(spark, zeng, time_clustered):
    # Eq on a zone-only column prunes by interval containment
    row = tables.load_raw(spark, time_clustered).select("ts").first()
    got = zeng.query(time_clustered, col("ts") == row["ts"])
    assert got.count() >= 1
    assert zeng.last_metrics.scanned_files < zeng.last_metrics.total_files

    # out-of-range predicate prunes everything
    assert zeng.query(time_clustered, col("ts") < "1999-01-01").count() == 0
    assert zeng.last_metrics.scanned_files == 0


def test_zone_inequality_stays_residual(spark, zeng, time_clustered):
    info = zeng.pushdown_info(time_clustered, col("ts") != "2024-01-05")
    assert info["pushable"] is None  # != prunes nothing at file granularity
    got = zeng.query(time_clustered, col("ts") != "2024-01-05 00:00:00")
    assert got.count() == tables.load_raw(spark, time_clustered).where(
        F.col("ts") != "2024-01-05 00:00:00"
    ).count()


def test_zone_combines_with_block_index(spark, workdir, zeng, time_clustered):
    zeng.build_index(time_clustered, "event_type", num_buckets=4)
    pred = (col("event_type") == "click") & (col("ts") < "2024-01-08")
    got = zeng.query(time_clustered, pred)
    want = tables.load_raw(spark, time_clustered).where(
        (F.col("event_type") == "click") & (F.col("ts") < "2024-01-08")
    )
    assert got.count() == want.count() > 0
    m = zeng.last_metrics
    assert "Eq" in m.pushed and "Cmp" in m.pushed, m.as_dict()
    assert m.scanned_files < m.total_files


def test_between_parses_and_pushes_to_zone(spark, zeng, time_clustered):
    from elephant_twin_spark.plans.expr import parse_predicate

    e = parse_predicate("ts BETWEEN '2024-01-10' AND '2024-01-12' AND event_type = 'click'")
    assert "Cmp('ts', '>='" in repr(e) and "Cmp('ts', '<='" in repr(e)

    got = zeng.query(time_clustered, "ts BETWEEN '2024-01-10' AND '2024-01-12'")
    want = tables.load_raw(spark, time_clustered).where(
        (F.col("ts") >= "2024-01-10") & (F.col("ts") <= "2024-01-12")
    )
    assert got.count() == want.count() > 0
    assert zeng.last_metrics.scanned_files < zeng.last_metrics.total_files


def test_refresh_zone_index_incremental(spark, workdir):
    from elephant_twin_spark.streaming.refresh import refresh_zone_index

    src = f"{workdir}/zone_refresh_tbl"
    ev = tables.load_raw(spark, f"{SF_DIR}/events.parquet")
    early = ev.where(F.col("ts") < "2024-01-20")
    late = ev.where(F.col("ts") >= "2024-01-20")
    early.repartitionByRange(4, "ts").write.mode("overwrite").parquet(src)

    root = f"{workdir}/zone_refresh_root"
    eng = Engine(spark, root)
    assert refresh_zone_index(spark, src, "ts", root)["mode"] == "full_build"
    assert refresh_zone_index(spark, src, "ts", root)["mode"] == "noop"

    late.coalesce(1).write.mode("append").parquet(src)
    spark.catalog.refreshByPath(src)
    out = refresh_zone_index(spark, src, "ts", root)
    assert out["mode"] == "incremental" and out["files_indexed"] >= 1

    got = eng.query(src, col("ts") >= "2024-01-25")
    want = spark.read.parquet(src).where(F.col("ts") >= "2024-01-25")
    assert got.count() == want.count() > 0
    # the late file is the only zone candidate for this range
    assert eng.last_metrics.scanned_files < eng.last_metrics.total_files


def test_zone_all_null_file_prunes_safely(spark, workdir):
    src = f"{workdir}/zone_null_tbl"
    some = spark.range(0, 50).selectExpr("id", "timestamp '2024-01-05' + id * interval 1 hour AS ts")
    nulls = spark.range(50, 60).selectExpr("id", "CAST(NULL AS timestamp) AS ts")
    some.coalesce(1).write.mode("overwrite").parquet(src)
    nulls.coalesce(1).write.mode("append").parquet(src)

    eng = Engine(spark, f"{workdir}/zone_null_root")
    eng.build_zone_index(src, "ts")
    got = eng.query(src, col("ts") >= "2024-01-06")
    want = spark.read.parquet(src).where(F.col("ts") >= "2024-01-06")
    assert got.count() == want.count() > 0
    # the all-null file can never satisfy an ordered predicate → pruned
    assert eng.last_metrics.scanned_files < eng.last_metrics.total_files


def test_zone_expression_index(spark, workdir, time_clustered):
    """Zone an expression (day-of-month) under a virtual name: ordered
    predicates on it prune files and the residual resolves the virtual
    name back to the expression."""
    eng = Engine(spark, f"{workdir}/zone_expr_root")
    eng.build_zone_index(time_clustered, "event_day", key_expr="day(ts)")

    got = eng.query(time_clustered, (col("event_day") >= 5) & (col("event_day") <= 7))
    want = tables.load_raw(spark, time_clustered).where(
        (F.dayofmonth("ts") >= 5) & (F.dayofmonth("ts") <= 7)
    )
    assert got.count() == want.count() > 0
    m = eng.last_metrics
    assert "Cmp('event_day'" in (m.pushed or ""), m.as_dict()
    assert m.scanned_files < m.total_files, m.as_dict()


def test_mixed_index_kinds_one_predicate(spark, workdir):
    """One predicate spanning all three point/range index kinds — block
    (event_type), zone (ts), bloom (user_id) — plans through interval
    AND-intersection across kinds and stays exact vs the full scan."""
    src = f"{workdir}/events_mixed_tbl"
    ev = tables.load_raw(spark, f"{SF_DIR}/events.parquet")
    ev.repartitionByRange(8, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(src)
    eng = Engine(spark, f"{workdir}/mixed_root")
    eng.build_index(src, "event_type", num_buckets=4)
    eng.build_zone_index(src, "ts")
    eng.build_bloom_index(src, "user_id")

    import datetime

    lo = datetime.datetime(2024, 1, 8)
    pred = (
        (col("event_type") == "click")
        & (col("ts") >= lo)
        & (col("user_id") == 7)
    )
    got = eng.query(src, pred)
    want = spark.read.parquet(src).where(
        (F.col("event_type") == "click") & (F.col("ts") >= lo) & (F.col("user_id") == 7)
    )
    assert got.count() == want.count() > 0
    m = eng.last_metrics
    # zone (time clustering) must prune at least the pre-cutoff files
    assert m.scanned_files < m.total_files, m.as_dict()
    assert "Eq('event_type'" in m.pushed and "Cmp('ts'" in m.pushed, m.pushed
    assert "Eq('user_id'" in m.pushed, m.pushed


def test_zone_distributed_planner_matches(zeng, spark, time_clustered):
    """Zone (range) leaves evaluated cluster-side equal the driver path."""
    from elephant_twin_spark.operators import scan
    from elephant_twin_spark.plans import expr as E

    pred = E.parse_predicate("ts >= '2024-01-10' AND ts < '2024-01-12'")
    md, mc = scan.ScanMetrics(), scan.ScanMetrics()
    drv = scan.query(spark, time_clustered, pred, zeng.index_root,
                     metrics=md, distributed_threshold=10**9)
    dist = scan.query(spark, time_clustered, pred, zeng.index_root,
                      metrics=mc, distributed_threshold=0)
    assert mc.planner == "distributed"
    assert drv.count() == dist.count() > 0
    assert mc.scanned_files == md.scanned_files < mc.total_files
