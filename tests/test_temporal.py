"""As-of and interval joins vs brute-force oracles on real fixture data."""

import pyspark.sql.functions as F

from elephant_twin_spark.operators import temporal
from elephant_twin_spark.sources import tables

from conftest import SF_DIR


def _events(spark):
    return tables.load_raw(spark, f"{SF_DIR}/events.parquet")


def test_asof_join_matches_bruteforce(spark):
    ev = _events(spark).where(F.col("user_id") < 40)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("click_ts"),
    )

    got = temporal.asof_join(
        purchases, clicks.withColumnRenamed("click_ts", "ts2"),
        keys=["user_id"], left_ts="ts", right_ts="ts2", right_values=["ts2"],
    ).select("event_id", F.col("ts2").alias("last_click_ts"))

    # Brute-force oracle: greatest click ts <= purchase ts per purchase.
    want = (
        purchases.alias("p")
        .join(clicks.alias("c"), "user_id", "left")
        .where(F.col("c.click_ts").isNull() | (F.col("c.click_ts") <= F.col("p.ts")))
        .groupBy("event_id")
        .agg(F.max("click_ts").alias("last_click_ts"))
    )
    assert got.count() == purchases.count()  # left-outer: every purchase kept
    diff = got.join(want, "event_id").where(
        ~(
            got["last_click_ts"].eqNullSafe(want["last_click_ts"])
        )
    )
    assert diff.count() == 0


def test_asof_join_strict_excludes_equal_ts(spark):
    rows = [(1, 10, "L"), (1, 20, "L")]
    left = spark.createDataFrame(rows, "k int, t int, tag string")
    right = spark.createDataFrame([(1, 10, "a"), (1, 15, "b")], "k int, t2 int, v string")
    inclusive = temporal.asof_join(left, right, ["k"], "t", "t2", ["v"])
    strict = temporal.asof_join(left, right, ["k"], "t", "t2", ["v"], strict=True)
    inc = {r["t"]: r["v"] for r in inclusive.collect()}
    st = {r["t"]: r["v"] for r in strict.collect()}
    assert inc == {10: "a", 20: "b"}
    assert st == {10: None, 20: "b"}


def test_interval_join_keyed_and_bucketed_agree(spark):
    ev = _events(spark).where(F.col("user_id") < 30)
    intervals = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("iv_id"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end"),
    )
    points = ev.select(F.col("event_id").alias("pt_id"), "user_id", "ts")

    keyed = temporal.interval_join(points, intervals, "ts", "start", "end", keys=["user_id"])
    bucketed = temporal.interval_join(
        points.drop("user_id"),
        intervals.drop("user_id"),
        "ts",
        "start",
        "end",
        bucket_width_s=3600,
    )
    # keyed result is a subset of the keyless bucketed result restricted
    # to same-user pairs; compare via the (pt, iv) pair sets
    keyed_pairs = {(r["pt_id"], r["iv_id"]) for r in keyed.select("pt_id", "iv_id").collect()}
    same_user = {
        (r["pt_id"], r["iv_id"])
        for r in temporal.interval_join(
            points, intervals, "ts", "start", "end", keys=["user_id"]
        ).collect()
    }
    buck_pairs = {(r["pt_id"], r["iv_id"]) for r in bucketed.select("pt_id", "iv_id").collect()}
    assert keyed_pairs == same_user
    assert keyed_pairs <= buck_pairs  # keyless join has strictly more pairs
    assert len(keyed_pairs) > 0

    # bucketed must equal the naive theta join exactly
    theta = temporal.interval_join(
        points.drop("user_id"), intervals.drop("user_id"), "ts", "start", "end"
    )
    theta_pairs = {(r["pt_id"], r["iv_id"]) for r in theta.collect()}
    assert buck_pairs == theta_pairs


def test_interval_join_subsecond_interval_covers_start_bucket(spark):
    points = spark.createDataFrame(
        [(1, "2024-01-01 00:00:10.3")], "pt_id int, ts string"
    ).select("pt_id", F.to_timestamp("ts").alias("ts"))
    iv = spark.createDataFrame(
        [(7, "2024-01-01 00:00:10.2", "2024-01-01 00:00:10.8")],
        "iv_id int, s string, e string",
    ).select("iv_id", F.to_timestamp("s").alias("start"), F.to_timestamp("e").alias("end"))
    got = temporal.interval_join(points, iv, "ts", "start", "end", bucket_width_s=60)
    assert [(r["pt_id"], r["iv_id"]) for r in got.collect()] == [(1, 7)]


def test_asof_join_right_ts_ties_deterministic(spark):
    """r10 verdict fix: two right rows of one key sharing a timestamp
    must yield a stable winner (keep-max over the right_values struct
    by default; keep-max by `tiebreak=` when given) regardless of how
    the right side is partitioned or ordered on input."""
    left = spark.createDataFrame([(1, 20)], "k int, t int")
    tied = [(1, 10, "a", 100), (1, 10, "b", 50), (1, 10, "b", 49)]
    outs = set()
    for seed in range(4):
        right = spark.createDataFrame(
            sorted(tied, key=lambda r: hash((seed, r))),
            "k int, t2 int, v string, w int",
        ).repartition(2 + seed)
        r = temporal.asof_join(
            left, right, ["k"], "t", "t2", ["v", "w"]
        ).collect()[0]
        outs.add((r["v"], r["w"]))
    # default: max over struct(v, w) -> ("b", 50)
    assert outs == {("b", 50)}

    outs_tb = set()
    for seed in range(4):
        right = spark.createDataFrame(
            sorted(tied, key=lambda r: hash((seed, r))),
            "k int, t2 int, v string, w int",
        ).repartition(2 + seed)
        r = temporal.asof_join(
            left, right, ["k"], "t", "t2", ["v"], tiebreak="w"
        ).collect()[0]
        outs_tb.add(r["v"])
    # keep-max by w=100 -> "a"
    assert outs_tb == {"a"}


def test_asof_join_null_holed_right_row_wins_as_a_row(spark):
    """Row-level semantics: the winning (latest) right row's values are
    emitted as a unit — a NULL field in the latest row must NOT be
    back-filled from an older row (the old per-column fill did that)."""
    left = spark.createDataFrame([(1, 30)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 10, "old", 7), (1, 20, None, 9)],
        "k int, t2 int, v string, w int",
    )
    r = temporal.asof_join(left, right, ["k"], "t", "t2", ["v", "w"]).collect()[0]
    assert (r["v"], r["w"]) == (None, 9)


def test_asof_join_null_keys_match_nothing(spark):
    """r11 review: join semantics, not window-group semantics — a
    NULL-key left row is kept (left-outer) but never annotated from
    NULL-key right rows, exactly like the SQL equi-join restatement."""
    left = spark.createDataFrame([(None, 20), (1, 20)], "k int, t int")
    right = spark.createDataFrame(
        [(None, 10, "null-key"), (1, 10, "real")], "k int, t2 int, v string"
    )
    got = {r["k"]: r["v"] for r in
           temporal.asof_join(left, right, ["k"], "t", "t2", ["v"]).collect()}
    assert got == {None: None, 1: "real"}
