"""Tests for the parity surface added around the core: predicate string
parsing + serde (F3/M4), one-split scans (S4), split-doc file value sets
(T3/A4), time rollups (A5)."""

import pyspark.sql.functions as F
import pytest

from elephant_twin_spark import Engine, col
from elephant_twin_spark.operators import rollup, text
from elephant_twin_spark.plans import expr as E
from elephant_twin_spark.sources import tables


@pytest.fixture(scope="module")
def engine(spark, workdir, events_multifile):
    eng = Engine(spark, f"{workdir}/surface_root")
    eng.build_index(events_multifile, "event_type", num_buckets=4)
    return eng


def test_parse_predicate_roundtrip():
    p = E.parse_predicate("event_type = 'click' AND (user_id = 7 OR user_id = 9)")
    d = E.to_json_dict(p)
    p2 = E.from_json_dict(d)
    assert E.to_json_dict(p2) == d
    assert d["op"] == "and"

    # residual comparisons parse to lazy Cmp nodes (serializable, never pushed)
    r = E.parse_predicate("value > 50")
    assert isinstance(r, E.Cmp)
    assert E.to_json_dict(r)["cmp"] == ">"
    assert E.extract_pushable(r, {"value"}) is None

    with pytest.raises(ValueError):
        E.parse_predicate("a ~ 3")
    with pytest.raises(ValueError):
        E.parse_predicate("")
    with pytest.raises(ValueError):
        E.parse_predicate("a =")


def test_string_predicate_query(engine, spark, events_multifile):
    got = engine.query(events_multifile, "event_type = 'click' AND value > 50")
    want = spark.read.parquet(events_multifile).where(
        (F.col("event_type") == "click") & (F.col("value") > 50)
    )
    assert got.count() == want.count() > 0
    assert "click" in engine.last_metrics.pushed


def test_pushdown_info(engine, events_multifile):
    info = engine.pushdown_info(events_multifile, "event_type = 'click' AND value > 5")
    assert info["indexed_columns"] == ["event_type"]
    assert "click" in info["pushable"]
    assert info["total_files"] == 8

    info2 = engine.pushdown_info(events_multifile, "value > 5")
    assert info2["pushable"] is None


def test_read_byte_range(engine, spark, events_multifile):
    import glob

    f = sorted(glob.glob(f"{events_multifile}/part-*.parquet"))[0]
    all_rows = engine.read_byte_range(f, 0, 1 << 40).count()
    assert all_rows == spark.read.parquet(f).count()
    none = engine.read_byte_range(f, 1 << 40, 1 << 41).count()
    assert none == 0


def test_file_value_sets(spark, events_multifile):
    df = spark.read.parquet(events_multifile)
    vs = text.file_value_sets(df, ["event_type"]).cache()
    assert vs.count() == 8
    # lookup: every file containing 'click' + oracle comparison
    got = {r["file"] for r in text.files_containing(vs, "event_type", "click").collect()}
    want = {
        r["f"]
        for r in df.select(
            F.regexp_replace(
                F.col("_metadata.file_path"), r"^file:/(?=[^/])", "file:///"
            ).alias("f"),
            "event_type",
        )
        .where(F.col("event_type") == "click")
        .distinct()
        .collect()
    }
    assert got == want


def test_time_rollup(spark, events_multifile):
    df = spark.read.parquet(events_multifile)
    r = rollup.time_rollup(df, "ts", "event_type", "event_id", unit="hour", k_samples=3)
    row = r.where(F.col("key") == "click").orderBy("bucket").first()
    assert row["cnt"] >= 1
    assert len(row["samples"]) <= 3
    assert row["samples"] == sorted(row["samples"])
    # counts agree with a plain group-by
    total = r.agg(F.sum("cnt")).collect()[0][0]
    assert total == df.count()

    w = rollup.windowed_rollup(df, "ts", "event_type", "2 hours")
    assert w.agg(F.sum("cnt")).collect()[0][0] == df.count()


def test_sql_front_door(spark, workdir, events_multifile):
    from elephant_twin_spark import Engine

    eng = Engine(spark, f"{workdir}/sqlfd_root")
    eng.build_index(events_multifile, "event_type", num_buckets=4)

    got = eng.sql(
        f"SELECT event_id, value FROM '{events_multifile}' "
        "WHERE event_type = 'click' AND value > 5 "
        "ORDER BY value DESC, event_id LIMIT 20"
    ).collect()
    want = (
        spark.read.parquet(events_multifile)
        .where((F.col("event_type") == "click") & (F.col("value") > 5))
        .select("event_id", "value")
        .orderBy(F.col("value").desc(), "event_id")
        .limit(20)
        .collect()
    )
    assert got == want and len(got) == 20
    # the WHERE went through pushdown negotiation (every file contains
    # 'click' in this random split, so no files prune — but the EQ leaf
    # must have been pushed to the index)
    m = eng.last_metrics
    assert m is not None and "event_type" in (m.pushed or "")

    # star projection + no WHERE = plain scan
    n = eng.sql(f"SELECT * FROM '{events_multifile}'").count()
    assert n == spark.read.parquet(events_multifile).count()

    with pytest.raises(ValueError):
        eng.sql("DELETE FROM 'x'")


def test_in_list_predicate(spark, workdir, events_multifile):
    from elephant_twin_spark import Engine
    from elephant_twin_spark.plans.expr import parse_predicate

    e = parse_predicate("event_type IN ('click', 'signup') AND user_id = 3")
    assert "Eq('event_type', 'click')" in repr(e) and "Eq('event_type', 'signup')" in repr(e)

    eng = Engine(spark, f"{workdir}/inlist_root")
    eng.build_index(events_multifile, "event_type", num_buckets=4)
    got = eng.query(events_multifile, "event_type IN ('click', 'signup') AND user_id = 3")
    want = spark.read.parquet(events_multifile).where(
        F.col("event_type").isin("click", "signup") & (F.col("user_id") == 3)
    )
    assert got.count() == want.count() > 0
    assert "event_type" in (eng.last_metrics.pushed or "")


def test_engine_stats(spark, workdir, events_multifile):
    from elephant_twin_spark import Engine

    eng = Engine(spark, f"{workdir}/stats_root")
    eng.build_index(events_multifile, "event_type", num_buckets=4)
    eng.build_bloom_index(events_multifile, "user_id")
    eng.build_zone_index(events_multifile, "ts")

    stats = {(s["kind"], s["column"]): s for s in eng.stats(events_multifile)}
    assert set(stats) == {("block", "event_type"), ("bloom", "user_id"), ("zone", "ts")}
    for s in stats.values():
        assert s["index_bytes"] > 0
        assert s["covered_files"] == 8 and s["fresh_files"] == 8
        assert s["stale_or_new_files"] == 0


def test_verify_all_kinds(spark, workdir, events_multifile):
    from elephant_twin_spark import Engine

    eng = Engine(spark, f"{workdir}/verify_all_root")
    eng.build_index(events_multifile, "event_type", num_buckets=4)
    eng.build_bloom_index(events_multifile, "user_id")
    eng.build_zone_index(events_multifile, "ts")

    out = eng.verify_all(events_multifile)
    assert set(out) == {
        ("block", "event_type"),
        ("bloom", "user_id"),
        ("zone", "ts"),
    }
    assert all(v == 0 for v in out.values()), out

    # sabotage the zone table: corrupt bounds must surface as violations
    from elephant_twin_spark.operators import build as B
    from elephant_twin_spark.sources import catalog

    zdir = catalog.index_dir(f"{workdir}/verify_all_root", events_multifile, "ts", "zone")
    zones = B.read_zones(spark, zdir).collect()
    import pyspark.sql.functions as FF

    bad = B.read_zones(spark, zdir).withColumn(
        "min_v", FF.col("max_v")  # min := max → bounds too narrow
    )
    bad.write.mode("overwrite").parquet(f"{zdir}/zones_bad")
    import shutil

    shutil.rmtree(f"{zdir}/zones".replace("file://", ""), ignore_errors=True)
    shutil.move(f"{zdir}/zones_bad".replace("file://", ""), f"{zdir}/zones".replace("file://", ""))
    spark.catalog.refreshByPath(f"{zdir}/zones")
    out2 = eng.verify_all(events_multifile)
    assert out2[("zone", "ts")] > 0, out2


def test_funnel_stage_machine(spark):
    from elephant_twin_spark.operators import sessionize
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # user 1: full funnel in order
        (1, at(0), "view"), (1, at(1), "click"), (1, at(2), "purchase"),
        # user 2: click before any view → only reaches stage 1 via later view
        (2, at(0), "click"), (2, at(1), "view"), (2, at(2), "error"),
        # user 3: view then purchase (skips click) → stage 1
        (3, at(0), "view"), (3, at(5), "purchase"),
        # user 4: out-of-order full set: purchase, click, view → stage 1
        (4, at(0), "purchase"), (4, at(1), "click"), (4, at(2), "view"),
        # user 5: nothing relevant
        (5, at(0), "error"),
        # user 6: view, click, view, purchase → stage 3
        (6, at(0), "view"), (6, at(1), "click"), (6, at(2), "view"), (6, at(3), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["user"]: r["stage_reached"]
        for r in sessionize.funnel(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {1: 3, 2: 1, 3: 1, 4: 1, 5: 0, 6: 3}


def test_time_rollup_null_ids_and_bounded_samples(spark):
    """r10 review fix: samples must be the k smallest NON-NULL ids even
    when null ids are present (nulls sort last in the rank window so
    they never consume a sample slot), and the plan must bound sample
    state via the pre-rank (one Exchange; the groupBy reuses the
    window's partitioning — no unbounded collect_list of the group)."""
    from pyspark.sql import Row

    rows = [Row(ts="2024-01-01 01:00:00", k="a", i=i) for i in (7, None, 3, 9, None, 1, 5)]
    df = spark.createDataFrame(rows, "ts string, k string, i int").select(
        F.col("ts").cast("timestamp").alias("ts"), "k", "i"
    )
    r = rollup.time_rollup(df, "ts", "k", "i", unit="hour", k_samples=3).first()
    assert r["cnt"] == 7  # nulls still counted
    assert r["samples"] == [1, 3, 5]  # k smallest non-null, sorted
    plan = rollup.time_rollup(df, "ts", "k", "i")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
