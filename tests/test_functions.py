"""Scalar-function parity tests (DateUtil/HexCodec/DigestUtil analogs,
SURVEY §2.6) — format round-trips and null guards."""

import datetime

import pyspark.sql.functions as F
import pytest

from elephant_twin_spark.functions import scalar


@pytest.fixture(scope="module")
def ts_df(spark):
    rows = [
        (1, datetime.datetime(2024, 3, 5, 14, 30, 45)),
        (2, datetime.datetime(2023, 12, 31, 23, 59, 59)),
        (3, datetime.datetime(2024, 1, 1, 0, 0, 0)),
    ]
    return spark.createDataFrame(rows, "id long, ts timestamp")


@pytest.mark.parametrize("fmt", sorted(scalar.FORMATS))
def test_format_parse_roundtrip(spark, ts_df, fmt):
    """format → parse round-trips to the format's precision."""
    if fmt == "apache":
        pytest.skip("offset-format round-trip tested separately")
    out = ts_df.select(
        "ts",
        scalar.parse_datetime(scalar.format_datetime(F.col("ts"), fmt), fmt).alias("rt"),
    ).collect()
    for r in out:
        assert r["rt"] is not None
        if fmt in ("compact", "mysql", "underscored"):
            assert r["rt"] == r["ts"].replace(microsecond=0)


def test_apache_format(spark, ts_df):
    got = ts_df.select(
        scalar.format_datetime(F.col("ts"), "apache").alias("s")
    ).first()["s"]
    assert "/Mar/" in got or "/Dec/" in got or "/Jan/" in got
    assert "+0000" in got  # UTC session tz


def test_null_guards(spark):
    """MySQL zero-date and Apache '-' parse to null (DateUtil.java:96-118)."""
    df = spark.createDataFrame(
        [("0000-00-00 00:00:00",), ("-",), (None,), ("2024-03-05 14:30:45",)],
        "s string",
    )
    out = df.select(scalar.parse_datetime(F.col("s"), "mysql").alias("t")).collect()
    assert out[0]["t"] is None
    assert out[1]["t"] is None
    assert out[2]["t"] is None
    assert out[3]["t"] == datetime.datetime(2024, 3, 5, 14, 30, 45)


def test_date_hour_ids(spark, ts_df):
    out = ts_df.select(
        scalar.date_id(F.col("ts")).alias("d"), scalar.hour_id(F.col("ts")).alias("h")
    ).orderBy("d").collect()
    assert out[0]["d"] == 20231231 and out[0]["h"] == 2023123123
    assert out[2]["d"] == 20240305 and out[2]["h"] == 2024030514


def test_round_up_to_next_hour(spark, ts_df):
    out = {
        r["id"]: r["n"]
        for r in ts_df.select(
            "id", scalar.round_up_to_next_hour(F.col("ts")).alias("n")
        ).collect()
    }
    assert out[1] == datetime.datetime(2024, 3, 5, 15, 0, 0)
    # exact hour stays put
    assert out[3] == datetime.datetime(2024, 1, 1, 0, 0, 0)


def test_epoch_and_arithmetic(spark, ts_df):
    out = ts_df.where(F.col("id") == 1).select(
        scalar.epoch_ms_to_yyyymmdd(F.lit(1709649045000)).alias("ymd"),
        scalar.add_days(F.col("ts"), 3).alias("plus3"),
        scalar.add_seconds(F.col("ts"), -45).alias("minus45"),
        scalar.interval_string(F.col("ts"), scalar.add_days(F.col("ts"), 1)).alias("iv"),
    ).first()
    assert out["ymd"] == "20240305"
    assert out["plus3"] == datetime.datetime(2024, 3, 8, 14, 30, 45)
    assert out["minus45"] == datetime.datetime(2024, 3, 5, 14, 30, 0)
    assert out["iv"] == "[2024-03-05 14:30:45 - 2024-03-06 14:30:45]"


def test_hex_and_md5(spark):
    df = spark.createDataFrame([("abc", 255)], "s string, n long")
    out = df.select(
        scalar.md5_hex(F.col("s")).alias("m"), scalar.hex_lower(F.col("n")).alias("h")
    ).first()
    assert out["m"] == "900150983cd24fb0d6963f7d28e17f72"
    assert out["h"] == "ff"


def test_sketches_accuracy_and_mergeability(spark):
    from elephant_twin_spark.functions import sketches
    from elephant_twin_spark.sources import tables
    from conftest import SF_DIR

    ev = tables.load_raw(spark, f"{SF_DIR}/events.parquet")
    exact = ev.select("user_id").distinct().count()

    approx = ev.agg(sketches.approx_distinct("user_id").alias("d")).first()["d"]
    assert abs(approx - exact) <= max(2, 0.15 * exact), (approx, exact)

    # mergeable path: per-event-type sketches union to the global estimate
    per_type = ev.groupBy("event_type").agg(sketches.hll_sketch("user_id").alias("sk"))
    merged = per_type.agg(
        sketches.hll_estimate(sketches.hll_merge("sk")).alias("d")
    ).first()["d"]
    assert abs(merged - exact) <= max(2, 0.15 * exact), (merged, exact)

    # approx quantiles bracket the exact median
    [q50] = sketches.approx_quantiles(ev, "value", [0.5], relative_error=0.01)
    exact_q50 = ev.selectExpr("percentile(value, 0.5) AS m").first()["m"]
    lo, hi = (
        ev.selectExpr("percentile(value, 0.45) AS m").first()["m"],
        ev.selectExpr("percentile(value, 0.55) AS m").first()["m"],
    )
    assert lo <= q50 <= hi, (lo, q50, hi, exact_q50)

    pa = ev.groupBy("event_type").agg(
        sketches.percentile_approx("value", 0.5).alias("p50")
    )
    assert pa.count() > 0 and pa.first()["p50"] is not None


def test_timeutil_epoch_helpers_both_timestamp_flavors(spark):
    """epoch_micros/epoch_seconds must agree between TIMESTAMP and
    TIMESTAMP_NTZ inputs (the NTZ path is timezone-free by construction),
    and ensure_event_time re-types NTZ to TIMESTAMP for watermarks."""
    from pyspark.sql import functions as F

    from elephant_twin_spark.functions import timeutil

    base = spark.sql(
        "SELECT TIMESTAMP'2024-01-05 10:00:00.123456' AS tz, "
        "TIMESTAMP_NTZ'2024-01-05 10:00:00.123456' AS ntz"
    )
    r = base.select(
        timeutil.epoch_micros(base, "tz").alias("us_tz"),
        timeutil.epoch_micros(base, "ntz").alias("us_ntz"),
        timeutil.epoch_seconds(base, "tz").alias("s_tz"),
        timeutil.epoch_seconds(base, "ntz").alias("s_ntz"),
    ).first()
    assert r["us_tz"] == r["us_ntz"] == 1704448800123456
    assert r["s_tz"] == r["s_ntz"] == 1704448800
    fixed = timeutil.ensure_event_time(base, "ntz")
    assert dict(fixed.dtypes)["ntz"] == "timestamp"
    assert dict(timeutil.ensure_event_time(base, "tz").dtypes)["tz"] == "timestamp"
