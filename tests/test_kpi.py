"""Units for the promoted KPI library surface (r5: VERDICT r4 #2) —
kpi.sliding_distinct / rolling_mean / time_decay_score / rate_anomaly,
sessionize.session_kpis, stats.winsorized_stats. Hand-computable
fixtures; the registry wrappers stay pinned by the driver oracle rows
(sliding_distinct_users, rolling_avg_value, error_rate_anomaly,
time_decay_score, session_duration_stats, winsorized_stats)."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from elephant_twin_spark.operators import kpi, sessionize
from elephant_twin_spark.operators.pipeline import stats


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1: two sessions (gap > 30 min between minute 10 and 50)
        (1, 1, _ts(0), "click", 1.0),
        (2, 1, _ts(10), "error", 2.0),
        (3, 1, _ts(50), "click", 4.0),
        # user 2: one single-event (bounce) session
        (4, 2, _ts(5), "click", 8.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_sliding_distinct_fans_each_event_to_two_windows(ev):
    out = kpi.sliding_distinct(ev, "ts", "user_id", "1 hour", "30 minutes")
    got = {r["win_start"].minute + 60 * r["win_start"].hour: r["n_distinct"]
           for r in out.collect()}
    # events at :00-:10 fall in windows starting 23:30(-30) and 00:00;
    # the :50 event in 00:30 and 00:00
    assert got[0] == 2          # 00:00-01:00 sees users 1 and 2
    assert got[30] == 1         # 00:30-01:30 sees only user 1 (the :50 event)


def test_rolling_mean_bounded_frame(ev):
    out = kpi.rolling_mean(ev, "value", ["user_id"], ["ts", "event_id"], preceding=2)
    got = {r["event_id"]: r["roll_mean"] for r in out.collect()}
    assert got[1] == 1.0
    assert got[2] == pytest.approx(1.5)      # (1+2)/2
    assert got[3] == pytest.approx(7.0 / 3)  # (1+2+4)/3
    assert got[4] == 8.0


def test_time_decay_score_math(ev):
    tau = 600.0  # 10 minutes
    out = kpi.time_decay_score(ev, "user_id", "ts", "value", tau_seconds=tau)
    got = {r["user_id"]: (r["decay_score"], r["n_events"]) for r in out.collect()}
    # ref = max ts = minute 50
    exp1 = 1.0 * math.exp(-3000 / tau) + 2.0 * math.exp(-2400 / tau) + 4.0
    exp2 = 8.0 * math.exp(-2700 / tau)
    assert got[1][0] == pytest.approx(exp1, rel=1e-9) and got[1][1] == 3
    assert got[2][0] == pytest.approx(exp2, rel=1e-9) and got[2][1] == 1


def test_time_decay_score_explicit_ref(ev):
    out = kpi.time_decay_score(
        ev, "user_id", "ts", "value", tau_seconds=600.0,
        ref_ts=F.lit("2024-01-01 00:50:00").cast("timestamp"),
    )
    base = kpi.time_decay_score(ev, "user_id", "ts", "value", tau_seconds=600.0)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in base.collect()}


def test_rate_anomaly_flags_on_rounded_z(spark):
    # 4 buckets: rates 0, 0, 0, 1 -> the hot bucket is the only |z|>2?
    # mu=0.25, sd=0.5 -> z = 1.5 for the hot one; use threshold 1.4
    rows = []
    for h, err in [(0, 0), (1, 0), (2, 0), (3, 1)]:
        rows.append((dt.datetime(2024, 1, 1, h, 5), err == 1))
    df = spark.createDataFrame(rows, "ts timestamp, is_err boolean")
    out = kpi.rate_anomaly(df, "ts", F.col("is_err"), z_threshold=1.4)
    got = {r["hour"].hour: (r["rate"], r["z"], r["is_anomaly"]) for r in out.collect()}
    assert got[3] == (1.0, 1.5, True)
    assert got[0] == (0.0, -0.5, False)
    assert out.count() == 4


def test_session_kpis(ev):
    out = sessionize.session_kpis(ev, "user_id", "ts", gap_seconds=1800)
    got = {r["user_id"]: r.asDict() for r in out.collect()}
    # user 1: sessions {0,10} (600 s) and {50} (0 s); user 2: one bounce
    assert got[1]["n_sessions"] == 2 and got[1]["n_bounce"] == 1
    assert got[1]["avg_duration_s"] == pytest.approx(300.0)
    assert got[1]["avg_events"] == pytest.approx(1.5)
    assert got[2]["n_sessions"] == 1 and got[2]["n_bounce"] == 1
    assert got[2]["avg_duration_s"] == 0.0


def test_winsorized_stats_clips_at_exact_fences(spark):
    vals = list(range(1, 11)) + [1000]  # one huge outlier in group 'a'
    rows = [("a", float(v)) for v in vals] + [("b", 5.0)]
    df = spark.createDataFrame(rows, "grp_in string, v double")
    out = stats.winsorized_stats(df, "v", "grp_in", lo=0.0, hi=0.9)
    got = {r["grp"]: r.asDict() for r in out.collect()}
    a = got["a"]
    # p90 of 1..10,1000 (exact interpolated percentile) = 10; outlier clipped
    assert a["n"] == 11 and a["n_clipped"] == 1
    assert a["mean_winsor"] == pytest.approx(sum(list(range(1, 11)) + [10]) / 11, abs=1e-6)
    assert a["mean_raw"] > a["mean_winsor"]
    b = got["b"]
    assert b["n_clipped"] == 0 and b["mean_raw"] == b["mean_winsor"] == 5.0
