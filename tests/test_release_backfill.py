"""Dataset releases (manifest snapshots) and partition backfill."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from elephant_twin_spark.operators import layout
from elephant_twin_spark.operators.pipeline import release


def _df(spark, n=20, tag="x"):
    return spark.createDataFrame([Row(id=i, tag=tag, val=float(i)) for i in range(n)])


def test_publish_read_verify_release(spark, workdir):
    root = f"{workdir}/rel"
    m1 = release.publish_release(spark, _df(spark, 20), root, 1, num_files=2)
    assert m1["n_rows"] == 20 and m1["n_files"] == 2
    assert release.latest_version(spark, root) == 1
    assert release.read_release(spark, root).count() == 20
    assert release.verify_release(spark, root, 1) == []

    m2 = release.publish_release(spark, _df(spark, 30, "y"), root, 2)
    d = release.diff_manifests(m1, m2)
    assert d["rows"] == 10 and not d["schema_changed"]
    assert release.read_release(spark, root).count() == 30      # latest
    assert release.read_release(spark, root, 1).count() == 20   # pinned


def test_release_immutable_and_drift_detection(spark, workdir):
    import glob, os

    root = f"{workdir}/rel2"
    release.publish_release(spark, _df(spark, 10), root, 1)
    with pytest.raises(FileExistsError):
        release.publish_release(spark, _df(spark, 10), root, 1)
    # tamper: remove one data file -> verify reports it
    victim = glob.glob(f"{root}/v1/data/part-*.parquet")[0]
    os.remove(victim)
    os.remove(f"{victim}.crc") if os.path.exists(f"{victim}.crc") else None
    viols = release.verify_release(spark, root, 1)
    assert viols and "missing file" in viols[0]


def test_release_content_hash(spark, workdir):
    root = f"{workdir}/rel3"
    m = release.publish_release(spark, _df(spark, 15), root, 1, content_hash=True)
    assert m["content_hash"].isdigit()
    # same rows, different file layout -> same content hash
    m2 = release.publish_release(
        spark, _df(spark, 15).repartition(5), f"{workdir}/rel3b", 1,
        num_files=3, content_hash=True,
    )
    assert m2["content_hash"] == m["content_hash"]


def test_upsert_partitioned(spark, workdir):
    dst = f"{workdir}/ups_tbl"
    base = spark.createDataFrame(
        [Row(id=i, day=f"d{d}", v=1) for d in (1, 2, 3) for i in range(5)]
    )
    layout.upsert_partitioned(spark, base, dst, ["id", "day"], ["day"])
    assert spark.read.parquet(dst).count() == 15

    # update 2 existing keys in d2, insert 1 new key in d2; d1/d3 untouched
    ups = spark.createDataFrame(
        [Row(id=0, day="d2", v=9), Row(id=1, day="d2", v=9), Row(id=77, day="d2", v=9)]
    )
    layout.upsert_partitioned(spark, ups, dst, ["id", "day"], ["day"])
    out = spark.read.parquet(dst)
    assert out.count() == 16
    d2 = {r["id"]: r["v"] for r in out.where("day = 'd2'").collect()}
    assert d2[0] == 9 and d2[1] == 9 and d2[77] == 9 and d2[2] == 1
    assert out.where("day = 'd1' AND v != 1").count() == 0

    # empty updates is a no-op
    layout.upsert_partitioned(spark, ups.limit(0), dst, ["id", "day"], ["day"])
    assert spark.read.parquet(dst).count() == 16


def test_overwrite_partitions_backfill(spark, workdir):
    dst = f"{workdir}/bf_tbl"
    base = spark.createDataFrame(
        [Row(id=i, day=f"2024-01-{d:02d}", v=1) for d in (1, 2, 3) for i in range(10)]
    )
    layout.overwrite_partitions(spark, base, dst, ["day"])
    assert spark.read.parquet(dst).count() == 30

    # recompute day 2 only (different values, fewer rows)
    fix = spark.createDataFrame([Row(id=i, day="2024-01-02", v=9) for i in range(4)])
    layout.overwrite_partitions(spark, fix, dst, ["day"], files_per_partition=2)
    out = spark.read.parquet(dst)
    assert out.count() == 24  # 10 + 4 + 10
    assert out.where("day = '2024-01-02'").agg(F.min("v")).first()[0] == 9
    assert out.where("day = '2024-01-01'").agg(F.max("v")).first()[0] == 1


def test_snapshot_diff_statuses(spark):
    from pyspark.sql import Row

    from elephant_twin_spark.operators.pipeline import release

    old = spark.createDataFrame(
        [Row(id=1, text="a"), Row(id=2, text="b"), Row(id=3, text="c")],
        "id long, text string",
    )
    new = spark.createDataFrame(
        [Row(id=2, text="b"), Row(id=3, text="C2"), Row(id=4, text="d")],
        "id long, text string",
    )
    got = {r["status"]: r["n"] for r in release.snapshot_diff(old, new, "id", "text").collect()}
    assert got == {"removed": 1, "unchanged": 1, "changed": 1, "added": 1}


def test_snapshot_diff_null_text_rows_classified_by_presence(spark):
    """r11 review fix: status is decided by id presence, not signature
    nullness — md5(NULL text) is NULL, and the old shape misfiled an
    existing NULL-text row as 'added' (or 'removed'). NULL vs NULL is
    unchanged; NULL vs text is changed."""
    from elephant_twin_spark.operators.pipeline import release

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "id long, text string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, "now has text"), (3, None)], "id long, text string"
    )
    got = {r["status"]: r["n"] for r in release.snapshot_diff(old, new, "id", "text").collect()}
    assert got == {"unchanged": 1, "changed": 2}


def test_upsert_partitioned_null_partition_keeps_unmatched_keys(spark, workdir):
    """r11 review fix: an update row with a NULL partition value must
    upsert INTO the existing NULL partition (__HIVE_DEFAULT_PARTITION__),
    not replace it wholesale — plain == never matches NULL, so `kept`
    came out empty and every non-updated key in that partition was
    silently dropped by the dynamic overwrite."""
    dst = f"{workdir}/ups_null_tbl"
    base = spark.createDataFrame(
        [Row(id=0, day=None, v=1), Row(id=1, day=None, v=1), Row(id=2, day="d1", v=1)]
    )
    layout.upsert_partitioned(spark, base, dst, ["id", "day"], ["day"])
    ups = spark.createDataFrame([(0, None, 9)], "id bigint, day string, v bigint")
    layout.upsert_partitioned(spark, ups, dst, ["id", "day"], ["day"])
    out = spark.read.parquet(dst)
    got = {r["id"]: (r["day"], r["v"]) for r in out.collect()}
    assert got == {0: (None, 9), 1: (None, 1), 2: ("d1", 1)}
