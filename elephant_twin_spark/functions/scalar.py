"""Scalar function parity surface — the DateUtil / HexCodec / DigestUtil
analog (SURVEY §2.6, C1-C6), as thin Column combinators over built-in
``pyspark.sql.functions`` so everything stays inside whole-stage codegen.

Reference formats (core/util/DateUtil.java:37-62):
    yyyyMMddHHmmss, yyyyMMdd (dateid), Apache log dd/MMM/yyyy:HH:mm:ss Z,
    MySQL yyyy-MM-dd HH:mm:ss[.S], yyyy-MM-dd, MM/dd/yyyy, yyyyMMddHHmm,
    HHmm, yyyy_MM_dd_HH_mm_ss
with null-returning guards for MySQL zero-dates and the Apache '-'
placeholder (DateUtil.java:88-190).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# name -> Spark datetime pattern (C1/C2 round-trip table)
FORMATS = {
    "compact": "yyyyMMddHHmmss",
    "dateid": "yyyyMMdd",
    "apache": "dd/MMM/yyyy:HH:mm:ss Z",
    "mysql": "yyyy-MM-dd HH:mm:ss",
    "date": "yyyy-MM-dd",
    "us_date": "MM/dd/yyyy",
    "compact_minute": "yyyyMMddHHmm",
    "hhmm": "HHmm",
    "underscored": "yyyy_MM_dd_HH_mm_ss",
}


def parse_datetime(col: Column, fmt_name: str) -> Column:
    """C1: formatted string → timestamp, with the reference's null guards
    (MySQL zero-date '0000-00-00...' and Apache '-' both yield null,
    DateUtil.java:96-118)."""
    pattern = FORMATS[fmt_name]
    guarded = F.when(
        col.isNull() | (col == "-") | col.startswith("0000-00-00"), F.lit(None)
    ).otherwise(col)
    return F.to_timestamp(guarded, pattern)


def format_datetime(col: Column, fmt_name: str) -> Column:
    """C2: timestamp → formatted string."""
    return F.date_format(col, FORMATS[fmt_name])


def epoch_ms_to_yyyymmdd(col: Column) -> Column:
    """C2: epochMsToYyyyMmDd (DateUtil.java:473-493)."""
    return F.date_format(F.timestamp_millis(col.cast("long")), "yyyyMMdd")


def date_id(col: Column) -> Column:
    """C3: calendarToDateId = yyyy*10000 + MM*100 + dd (DateUtil.java:415-430)."""
    return (F.year(col) * 10000 + F.month(col) * 100 + F.dayofmonth(col)).cast("int")


def hour_id(col: Column) -> Column:
    """C3: calendarToHourId = dateId*100 + HH (DateUtil.java:432-447)."""
    return (date_id(col).cast("bigint") * 100 + F.hour(col)).cast("bigint")


def truncate_to_day(col: Column) -> Column:
    return F.date_trunc("day", col)


def truncate_to_hour(col: Column) -> Column:
    return F.date_trunc("hour", col)


def round_up_to_next_hour(col: Column) -> Column:
    """C3: roundUpToNextHour (DateUtil.java:340-352) — already-exact hours
    stay put."""
    truncated = F.date_trunc("hour", col)
    return F.when(col == truncated, col).otherwise(truncated + F.expr("INTERVAL 1 HOUR"))


def add_days(col: Column, n: int) -> Column:
    return col + F.expr(f"INTERVAL {int(n)} DAY")


def add_seconds(col: Column, n: int) -> Column:
    return col + F.expr(f"INTERVAL {int(n)} SECOND")


def interval_string(start: Column, end: Column) -> Column:
    """C4: '[start - end]' MySQL-format interval render (DateUtil.java:468-471)."""
    return F.concat(
        F.lit("["),
        format_datetime(start, "mysql"),
        F.lit(" - "),
        format_datetime(end, "mysql"),
        F.lit("]"),
    )


def hex_lower(col: Column) -> Column:
    """C5: bytes/long → lowercase hex (core/util/HexCodec.java:17-32)."""
    return F.lower(F.hex(col))


def md5_hex(col: Column) -> Column:
    """C6: MD5 digest as lowercase hex (core/util/DigestUtil.java:22-75)."""
    return F.md5(col.cast("binary"))


def md5_bucket(key: Column, salt: int, modulus: int) -> Column:
    """THE shared deterministic-hash primitive: bucket of ``key`` under
    integer ``salt`` = md5('{salt}|' + key) 15-hex prefix, base-16 →
    long, mod ``modulus`` (int out). One definition serves the Bloom
    index positions (`operators/build.py`) and the count-min buckets
    (`functions/sketches.py`) so the cross-engine oracle restatements
    can never desynchronize from a one-sided tweak. ANSI-SQL twin:
    ``CAST(CAST(concat('0x', substring(md5(concat('{salt}|', key)), 1,
    15)) AS BIGINT) % modulus AS INT)``."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}|"), key)), 1, 15), 16, 10)
    return (h.cast("long") % modulus).cast("int")
