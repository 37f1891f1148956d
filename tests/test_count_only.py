"""Index-only COUNT: postings-sum answers with zero data files read."""

import pytest
from pyspark.sql import functions as F

from elephant_twin_spark.engine import Engine
from elephant_twin_spark.plans.expr import col


@pytest.fixture(scope="module")
def indexed(spark, events_multifile, workdir):
    eng = Engine(spark, f"{workdir}/countonly_idx")
    eng.build_index(events_multifile, "event_type", num_buckets=4)
    return eng, events_multifile


def test_count_matches_full_scan_zero_files(spark, indexed):
    eng, tbl = indexed
    full = spark.read.parquet(tbl)
    for pred, colname, val in [
        (col("event_type") == "click", "event_type", "click"),
        (col("event_type") == "nope_never", "event_type", "nope_never"),
    ]:
        want = full.where(F.col(colname) == val).count()
        got = eng.count(tbl, pred)
        assert got == want
        assert eng.last_metrics.scanned_files == 0  # index-only
        assert eng.last_metrics.scanned_bytes == 0


def test_count_in_list_or_chain(spark, indexed):
    eng, tbl = indexed
    full = spark.read.parquet(tbl)
    want = full.where(F.col("event_type").isin("click", "signup")).count()
    got = eng.count(tbl, "event_type IN ('click', 'signup')")
    assert got == want and eng.last_metrics.scanned_files == 0
    got2 = eng.count(tbl, (col("event_type") == "click") | (col("event_type") == "signup"))
    assert got2 == want


def test_count_falls_back_for_other_shapes(spark, indexed):
    eng, tbl = indexed
    full = spark.read.parquet(tbl)
    want = full.where((F.col("event_type") == "click") & (F.col("user_id") == 7)).count()
    got = eng.count(tbl, (col("event_type") == "click") & (col("user_id") == 7))
    assert got == want  # AND shape -> query().count() fallback
    # unindexed column -> fallback too
    want2 = full.where(F.col("user_id") == 7).count()
    assert eng.count(tbl, col("user_id") == 7) == want2


def test_distinct_values_index_only_and_hybrid(spark, events_multifile, workdir):
    import shutil

    eng, tbl = Engine(spark, f"{workdir}/distinct_idx"), events_multifile
    eng.build_index(tbl, "event_type", num_buckets=4)
    want = {
        r["event_type"]
        for r in spark.read.parquet(tbl).select("event_type").distinct().collect()
    }
    got = {r["key"] for r in eng.distinct_values(tbl, "event_type").collect()}
    assert got == want

    # stale-file hybrid: new value appears only in an appended file
    tbl2 = f"{workdir}/distinct_stale_tbl"
    shutil.copytree(tbl, tbl2)
    eng2 = Engine(spark, f"{workdir}/distinct_stale_idx")
    eng2.build_index(tbl2, "event_type", num_buckets=4)
    one = spark.read.parquet(tbl).limit(1).withColumn(
        "event_type", F.lit("brand_new_type")
    )
    one.write.mode("append").parquet(tbl2)
    spark.catalog.refreshByPath(tbl2)
    got2 = {r["key"] for r in eng2.distinct_values(tbl2, "event_type").collect()}
    assert got2 == want | {"brand_new_type"}

    with pytest.raises(FileNotFoundError):
        eng.distinct_values(tbl, "user_id")  # no index -> explicit error


def test_zone_min_max_index_only_and_hybrid(spark, events_multifile, workdir):
    import shutil

    tbl = f"{workdir}/minmax_tbl"
    shutil.copytree(events_multifile, tbl)
    eng = Engine(spark, f"{workdir}/minmax_idx")
    eng.build_zone_index(tbl, "value")
    full = spark.read.parquet(tbl)
    want = full.agg(F.min("value"), F.max("value")).first()
    assert eng.min_max(tbl, "value") == (want[0], want[1])

    # appended file extends the max
    big = full.limit(1).withColumn("value", F.lit(10_000_000).cast(full.schema["value"].dataType))
    big.write.mode("append").parquet(tbl)
    spark.catalog.refreshByPath(tbl)
    mn, mx = eng.min_max(tbl, "value")
    assert mn == want[0] and mx == 10_000_000


def test_sql_count_star_routes_through_index(spark, indexed):
    eng, tbl = indexed
    want = spark.read.parquet(tbl).where(F.col("event_type") == "click").count()
    row = eng.sql(f"SELECT count(*) AS n FROM '{tbl}' WHERE event_type = 'click'").first()
    assert row["n"] == want
    assert eng.last_metrics.scanned_files == 0  # index-only
    # default alias
    row2 = eng.sql(f"SELECT COUNT(*) FROM '{tbl}' WHERE event_type = 'click'").first()
    assert row2["count"] == want


def test_apply_score_gate_multi_group(spark):
    from elephant_twin_spark.operators.pipeline import textstats
    from pyspark.sql import Row

    rows = [
        Row(a="x", b="p", id=i, s=float(i)) for i in range(8)
    ] + [Row(a="y", b="q", id=100 + i, s=float(i)) for i in range(8)]
    df = spark.createDataFrame(rows)
    thr = textstats.quality_thresholds(df, "s", 0.5, group_cols=["a", "b"])
    assert set(thr) == {("x", "p"), ("y", "q")}  # tuple keys
    kept = textstats.apply_score_gate(df, "s", thr, ["a", "b"])
    by_group = {}
    for r in kept.collect():
        by_group.setdefault((r["a"], r["b"]), []).append(r["s"])
    for g, vals in by_group.items():
        assert min(vals) >= thr[g]


def test_count_stale_file_hybrid(spark, events_multifile, workdir):
    import shutil

    tbl = f"{workdir}/countonly_stale_tbl"
    shutil.copytree(events_multifile, tbl)
    eng = Engine(spark, f"{workdir}/countonly_stale_idx")
    eng.build_index(tbl, "event_type", num_buckets=4)
    # append new rows AFTER the build: not covered by the index
    extra = spark.read.parquet(events_multifile).where(
        F.col("event_type") == "click"
    ).limit(7)
    extra.write.mode("append").parquet(tbl)
    spark.catalog.refreshByPath(tbl)

    want = spark.read.parquet(tbl).where(F.col("event_type") == "click").count()
    got = eng.count(tbl, col("event_type") == "click")
    assert got == want
    assert eng.last_metrics.scanned_files >= 1  # the appended file was read
    assert eng.last_metrics.stale_files >= 1


def test_count_distributed_matches_driver(spark, workdir, events_multifile):
    """The cluster-side covering count equals the driver-side sum, with
    and without stale files."""
    from elephant_twin_spark import Engine, col
    from elephant_twin_spark.operators import scan
    from elephant_twin_spark.plans import expr as E

    eng = Engine(spark, f"{workdir}/cnt_dist_root")
    eng.build_index(events_multifile, "event_type", num_buckets=4)
    pred = E._coerce(col("event_type") == "click")
    md, mc = scan.ScanMetrics(), scan.ScanMetrics()
    a = scan.count(spark, events_multifile, pred, eng.index_root,
                   metrics=md, distributed_threshold=10**9)
    b = scan.count(spark, events_multifile, pred, eng.index_root,
                   metrics=mc, distributed_threshold=0)
    assert a == b > 0
    assert mc.planner == "distributed" and md.planner == "driver"
    # OR-of-eq (IN) shape too
    pred_in = E._coerce((col("event_type") == "click") | (col("event_type") == "error"))
    assert scan.count(spark, events_multifile, pred_in, eng.index_root,
                      distributed_threshold=0) == scan.count(
        spark, events_multifile, pred_in, eng.index_root, distributed_threshold=10**9)


def test_apply_score_gate_null_group(spark):
    """r10 review fix: quality_thresholds emits a cutoff for a NULL
    group (groupBy keeps it), but the equality join in apply_score_gate
    could never match it back — the untagged population was silently
    dropped despite having a declared threshold. The join is now
    null-safe."""
    from elephant_twin_spark.operators.pipeline import textstats
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(g="a", id=i, s=float(i)) for i in range(4)]
        + [Row(g=None, id=10 + i, s=float(i)) for i in range(4)],
        "g string, id long, s double",
    )
    thr = textstats.quality_thresholds(df, "s", 0.5, group_cols=["g"])
    assert None in thr  # the NULL group HAS a declared cutoff
    kept = textstats.apply_score_gate(df, "s", thr, ["g"])
    by_group = {}
    for r in kept.collect():
        by_group.setdefault(r["g"], set()).add(r["id"])
    assert by_group.get("a"), by_group
    assert by_group.get(None), by_group  # null group passes its own gate


def test_distinct_values_drops_stale_and_deleted_file_keys(spark, events_multifile, workdir):
    """r11 review fix: obsolete postings keys must NOT survive into the
    distinct answer — a modified file's OLD values (its current values
    come from the not-covered re-scan) and a deleted file's values both
    disappear, keeping the 'equals the full-scan answer' contract."""
    import glob
    import os
    import shutil

    tbl = f"{workdir}/distinct_mut_tbl"
    shutil.copytree(events_multifile.replace("file://", ""), tbl)
    eng = Engine(spark, f"{workdir}/distinct_mut_idx")
    eng.build_index(tbl, "event_type", num_buckets=4)

    parts = sorted(glob.glob(f"{tbl}/part-*.parquet"))
    # make every row of part 0 a unique type, then REWRITE it mutated and
    # DELETE part 1 — 'only_in_part0'/'only_in_part1' become obsolete keys
    df = spark.read.parquet(parts[0]).withColumn("event_type", F.lit("only_in_part0"))
    df.write.mode("overwrite").parquet(f"{workdir}/_p0_tagged")
    shutil.copyfile(
        sorted(glob.glob(f"{workdir}/_p0_tagged/part-*.parquet"))[0], parts[0]
    )
    for crc in glob.glob(f"{tbl}/.*.crc"):
        os.remove(crc)
    spark.catalog.refreshByPath(tbl)
    eng2 = Engine(spark, f"{workdir}/distinct_mut_idx2")
    eng2.build_index(tbl, "event_type", num_buckets=4)  # postings now know the tag

    # mutate part 0 again (tag vanishes) and delete part 1 entirely
    df2 = spark.read.parquet(parts[0]).withColumn("event_type", F.lit("replacement"))
    df2.write.mode("overwrite").parquet(f"{workdir}/_p0_replaced")
    shutil.copyfile(
        sorted(glob.glob(f"{workdir}/_p0_replaced/part-*.parquet"))[0], parts[0]
    )
    os.remove(parts[1])
    for crc in glob.glob(f"{tbl}/.*.crc"):
        os.remove(crc)
    spark.catalog.refreshByPath(tbl)

    want = {
        r["event_type"]
        for r in spark.read.parquet(tbl).select("event_type").distinct().collect()
    }
    got = {r["key"] for r in eng2.distinct_values(tbl, "event_type").collect()}
    assert "only_in_part0" not in got and got == want
