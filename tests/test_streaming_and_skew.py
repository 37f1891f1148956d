"""Streaming windowed aggregation + skew utility tests."""

import pyspark.sql.functions as F
import pytest

from elephant_twin_spark.operators import skew
from elephant_twin_spark.streaming import windows


def test_streaming_windowed_counts(spark, workdir, events_multifile):
    sdf = windows.streaming_windowed_counts(
        spark,
        events_multifile,
        ts_col="ts",
        key_col="event_type",
        window_duration="1 hour",
        watermark="2 hours",
    )
    assert sdf.isStreaming
    windows.run_to_memory(sdf, "win_counts", output_mode="append")
    got = spark.table("win_counts")
    # append mode emits only watermark-finalized windows; every emitted
    # window must match the batch computation exactly
    batch = (
        spark.read.parquet(events_multifile)
        .groupBy(F.window("ts", "1 hour").alias("window"), F.col("event_type").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    g = {(r["window"]["start"], r["key"]): r["cnt"] for r in got.collect()}
    b = {(r["window"]["start"], r["key"]): r["cnt"] for r in batch.collect()}
    assert len(g) > 0
    for k, v in g.items():
        assert b[k] == v, k
    # all but the last (unfinalized) windows were emitted
    assert len(g) >= len(b) - 10 * 5  # watermark holds back ~2h x keys


def test_salted_aggregate_matches_plain(spark, events_multifile):
    df = spark.read.parquet(events_multifile)
    got = skew.salted_aggregate(
        df,
        ["event_type"],
        [F.count(F.lit(1)).alias("c"), F.collect_set("user_id").alias("us")],
        [
            F.sum("c").alias("cnt"),
            F.array_distinct(F.flatten(F.collect_list("us"))).alias("users"),
        ],
        num_salts=8,
    )
    plain = df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"), F.collect_set("user_id").alias("users")
    )
    g = {r["event_type"]: (r["cnt"], sorted(r["users"])) for r in got.collect()}
    p = {r["event_type"]: (r["cnt"], sorted(r["users"])) for r in plain.collect()}
    assert g == p


def test_salted_join_matches_plain(spark, events_multifile):
    df = spark.read.parquet(events_multifile)
    dim_rows = [(t, f"name_{t}") for t in ["click", "view", "purchase", "signup", "error"]]
    dim = spark.createDataFrame(dim_rows, "event_type string, label string")
    got = skew.salted_join(df, dim, "event_type", num_salts=4)
    plain = df.join(dim, "event_type")
    assert got.count() == plain.count()
    assert sorted(got.columns) == sorted(plain.columns)
    g = got.groupBy("label").count().collect()
    p = plain.groupBy("label").count().collect()
    assert {r["label"]: r["count"] for r in g} == {r["label"]: r["count"] for r in p}


def test_top_frequent_keys(spark, events_multifile):
    df = spark.read.parquet(events_multifile)
    top = skew.top_frequent_keys(df, "event_type", 3).collect()
    assert len(top) == 3
    assert top[0]["cnt"] >= top[1]["cnt"] >= top[2]["cnt"]
    assert 0 < top[0]["share"] < 1
