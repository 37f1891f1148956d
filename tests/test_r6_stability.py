"""Round-6: decision-stability property tests for the regression/drift
family (degenerate inputs → exact stable outputs, the class that caused
the r5 ``heaps_vocab_growth`` driver hash failure), bit-exact float
canonicalization in the local oracle harness, checkpoint lifecycle, and
units for the promoted library surface (``stats.pmi_table``,
``kpi.period_over_period``, ``ks_statistic(grid=)``)."""

import math
import struct

import pytest
from pyspark.sql import functions as F

from elephant_twin_spark.operators import kpi, lifecycle
from elephant_twin_spark.operators.pipeline import stats, textstats


def _bits(x: float) -> bytes:
    return struct.pack(">d", x)


# ------------------------------------------------ slope stability

def test_heaps_closed_vocab_slope_is_exact_positive_zero(spark):
    # constant vocabulary: ln(cum_vocab) is constant, covariance is pure
    # float noise — the r5 failure class. The output must be EXACT +0.0
    # (sign bit included), not -0.0 or ±1e-6.
    closed = [(i, "alpha beta gamma") for i in range(200)]
    df = spark.createDataFrame(closed, "doc_id long, text string")
    row = textstats.heaps_slope(df, "text", "doc_id", n_buckets=20).collect()[0]
    assert row["total_vocab"] == 3
    assert _bits(row["slope"]) == _bits(0.0)


def test_heaps_single_point_slope_is_null(spark):
    # one bucket -> var_pop(x) = 0 -> degenerate regression -> NULL
    # (matching SQL regr_slope), never a division artifact
    df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    row = textstats.heaps_slope(df, "text", "doc_id", n_buckets=1).collect()[0]
    assert row["n_points"] == 1
    assert row["slope"] is None


def test_heaps_shingles_measure_growth_on_closed_unigram_corpus(spark):
    # the fixture class: tiny closed word vocabulary, but genuinely
    # growing k-shingle vocabulary (novel word ORDER per doc). Unigram
    # slope must be 0.0 (saturated); shingle slope must be a real
    # positive Heaps exponent.
    import random

    rng = random.Random(7)
    words = [f"w{j}" for j in range(12)]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(30))) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uni = textstats.heaps_slope(df, "text", "doc_id", n_buckets=20).collect()[0]
    shi = textstats.heaps_slope(
        df, "text", "doc_id", n_buckets=20, shingle_k=3
    ).collect()[0]
    assert uni["total_vocab"] == 12 and uni["slope"] == 0.0
    assert shi["total_vocab"] > 1000
    assert 0.3 < shi["slope"] <= 1.1


def test_zipf_all_equal_counts_slope_is_exact_zero(spark):
    # every term equally frequent: ln(cnt) constant -> slope snaps to
    # exact +0.0 via the shared _stable_slope guard
    rows = [(i, "a b c d e f g h") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("xx")
    )
    row = textstats.zipf_slope(df, "text", "lang", top_n=8).collect()[0]
    assert row["n_terms"] == 8
    assert _bits(row["slope"]) == _bits(0.0)


def test_zipf_single_term_slope_is_null(spark):
    df = spark.createDataFrame(
        [(1, "solo solo solo")], "doc_id long, text string"
    ).withColumn("lang", F.lit("xx"))
    row = textstats.zipf_slope(df, "text", "lang", top_n=10).collect()[0]
    assert row["n_terms"] == 1 and row["slope"] is None


# ------------------------------------------------ drift degenerates

def test_psi_identical_distributions_is_exact_zero(spark):
    df = spark.createDataFrame([(float(i % 17),) for i in range(500)], "x double")
    out = stats.psi_drift(df, df, "x", n_bins=10).collect()
    assert len(out) == 10
    for r in out:
        assert _bits(r["contrib"]) == _bits(0.0)


def test_psi_empty_side_is_finite(spark):
    base = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    cur = base.where(F.col("x") < -1)  # empty
    out = stats.psi_drift(base, cur, "x", n_bins=5).collect()
    assert len(out) == 5
    assert all(
        r["contrib"] is not None and math.isfinite(r["contrib"]) for r in out
    )


def test_ks_identical_is_zero_and_empty_side_is_null(spark):
    df = spark.createDataFrame([(float(i % 9),) for i in range(300)], "x double")
    row = stats.ks_statistic(df, df, "x").collect()[0]
    assert row["ks"] == 0.0
    empty = df.where(F.col("x") < -1)
    row2 = stats.ks_statistic(df, empty, "x").collect()[0]
    assert row2["n_cur"] == 0 and row2["ks"] is None


def test_ks_grid_equals_exact_on_already_gridded_values(spark):
    a = spark.createDataFrame([(float(i % 7),) for i in range(200)], "x double")
    b = spark.createDataFrame([(float(i % 5),) for i in range(200)], "x double")
    exact = stats.ks_statistic(a, b, "x").collect()[0]
    grid = stats.ks_statistic(a, b, "x", grid=1.0).collect()[0]
    assert _bits(exact["ks"]) == _bits(grid["ks"])


def test_ks_grid_bounds_distinct_support(spark):
    import numpy as np

    vals = np.random.RandomState(3).uniform(0, 10, 2000)
    a = spark.createDataFrame([(float(v),) for v in vals], "x double")
    b = a.select((F.col("x") + 0.5).alias("x"))
    row = stats.ks_statistic(a, b, "x", grid=0.5).collect()[0]
    # grid-exact KS of a +0.5 shift on a 0.5 grid is large and finite
    assert row["ks"] is not None and 0 < row["ks"] <= 1
    # the gridded support is bounded by range/grid, not by n
    snapped = a.select(
        (F.floor(F.col("x") / 0.5) * 0.5).alias("x")
    ).distinct().count()
    assert snapped <= 21


def test_transition_matrix_absorbing_state(spark):
    # absorbing state z: once entered, only self-loops; its row must be
    # p = 1.0 exactly
    rows = []
    for k in range(20):
        rows += [(k, 1, "a"), (k, 2, "z"), (k, 3, "z"), (k, 4, "z")]
    df = spark.createDataFrame(rows, "uid int, ts int, st string")
    out = {
        (r["from_state"], r["to_state"]): r["p"]
        for r in kpi.transition_matrix(df, "uid", "ts", "st").collect()
    }
    assert out[("a", "z")] == 1.0
    assert out[("z", "z")] == 1.0


# ------------------------------------------------ oracle-harness canon

def test_canon_flags_planted_negative_zero():
    import pandas as pd

    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from check_oracle import canon

    a = canon(pd.DataFrame({"v": [0.0]}))
    b = canon(pd.DataFrame({"v": [-0.0]}))
    assert not a.equals(b), "-0.0 must be distinguishable from +0.0"
    # NaN payloads collapse (never a real divergence)
    n1 = canon(pd.DataFrame({"v": [float("nan")]}))
    n2 = canon(pd.DataFrame({"v": [struct.unpack(">d", b"\x7f\xf8\x00\x00\x00\x00\x00\x01")[0]]}))
    assert n1.equals(n2)
    # sub-1e-9 divergence the old %.9g canon could not see
    c = canon(pd.DataFrame({"v": [1.0]}))
    d = canon(pd.DataFrame({"v": [1.0 + 2**-50]}))
    assert not c.equals(d)


# ------------------------------------------------ promoted surface

def test_pmi_table_matches_closed_form(spark):
    rows = [("a", "x")] * 30 + [("a", "y")] * 10 + [("b", "x")] * 10 + [("b", "y")] * 50
    df = spark.createDataFrame(rows, "u string, v string")
    out = {(r["u"], r["v"]): r for r in stats.pmi_table(df, "u", "v").collect()}
    n_ax, total = 30, 100
    expect = round(math.log(n_ax * total / (40 * 40)), 6)
    assert out[("a", "x")]["n"] == 30
    assert out[("a", "x")]["pmi"] == pytest.approx(expect, abs=1e-9)


def test_period_over_period_weekly_sum(spark):
    rows = [
        ("2024-01-01", 10.0), ("2024-01-03", 20.0),  # week of Jan 1
        ("2024-01-08", 60.0),                        # next week
    ]
    df = spark.createDataFrame(rows, "d string, amt double").select(
        F.col("d").cast("timestamp").alias("d"), "amt"
    )
    out = sorted(
        kpi.period_over_period(df, "d", "amt", period="week").collect(),
        key=lambda r: r["period"],
    )
    assert out[0]["value"] == 30.0 and out[0]["prev_value"] is None
    assert out[1]["value"] == 60.0 and out[1]["prev_value"] == 30.0
    assert out[1]["pct_change"] == 1.0
    with pytest.raises(ValueError):
        kpi.period_over_period(df, "d", "amt", agg="median")


# ------------------------------------------------ checkpoint lifecycle

def test_checkpoint_scope_releases_blocks(spark):
    df = spark.range(200_000).selectExpr("id", "id * 3 as y")
    base = lifecycle.storage_snapshot(spark)["n_rdds"]
    with lifecycle.checkpoint_scope():
        pinned = lifecycle.pin(df)
        assert pinned.count() == 200_000
        during = lifecycle.storage_snapshot(spark)["n_rdds"]
        assert during >= base + 1
    # blocks are freed at scope exit (unpersist is async; poll briefly)
    import time

    for _ in range(50):
        if lifecycle.storage_snapshot(spark)["n_rdds"] <= base:
            break
        time.sleep(0.1)
    assert lifecycle.storage_snapshot(spark)["n_rdds"] <= base


def test_pin_without_scope_behaves_like_local_checkpoint(spark):
    df = spark.range(1000).selectExpr("id", "id + 1 as y")
    pinned = lifecycle.pin(df)
    assert pinned.count() == 1000
    assert pinned.count() == 1000  # reusable — nothing released it
    lifecycle.release(pinned)


def test_scoped_operator_result_correct_and_repeatable(spark):
    from elephant_twin_spark.operators.pipeline import dedup

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "completely different text with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with lifecycle.checkpoint_scope():
        n1 = dedup.minhash_near_dup_pairs(
            df, "text", "doc_id", num_perm=8, num_bands=4, threshold=0.7
        ).count()
    with lifecycle.checkpoint_scope():
        n2 = dedup.minhash_near_dup_pairs(
            df, "text", "doc_id", num_perm=8, num_bands=4, threshold=0.7
        ).count()
    assert n1 == n2 == 1


def test_triangle_count_empty_edges_all_zero(spark):
    from elephant_twin_spark.operators.pipeline import graph

    empty = spark.createDataFrame([], "a long, b long")
    row = graph.triangle_count(empty, "a", "b").collect()[0]
    assert (row["n_vertices"], row["n_edges"], row["n_triangles"]) == (0, 0, 0)


# ------------------------------------------------ r6-new operators

def test_source_overlap_matrix_brute_force(spark):
    rows = [
        (1, "shared one", "a"), (2, "shared one", "b"), (3, "shared one", "c"),
        (4, "only a", "a"), (5, "shared two", "a"), (6, "shared two", "c"),
        (7, "only b", "b"), (8, "only b", "b"),  # same content, same source
    ]
    from elephant_twin_spark.operators.pipeline import dedup

    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in dedup.source_overlap_matrix(df, "text", "source").collect()
    }
    assert out[("a", "b")] == 1      # "shared one"
    assert out[("a", "c")] == 2      # "shared one" + "shared two"
    assert out[("b", "c")] == 1
    assert out[("a", "a")] == 3      # distinct contents in a
    assert out[("b", "b")] == 2      # "shared one" + "only b" (distinct)
    assert out[("c", "c")] == 2


def test_lsh_plan_closed_form(spark):
    from elephant_twin_spark.operators.pipeline import dedup

    out = {
        (r["num_perm"], r["num_bands"]): r
        for r in dedup.lsh_plan(spark, 0.8, num_perms=(16,)).collect()
    }
    # 16 perms, 4 bands of 4: s50 = (1/4)^(1/4), p = 1-(1-0.8^4)^4
    r = out[(16, 4)]
    assert r["rows_per_band"] == 4
    assert r["s50"] == pytest.approx((1 / 4) ** 0.25, abs=1e-6)
    assert r["p_at_target"] == pytest.approx(1 - (1 - 0.8**4) ** 4, abs=1e-6)
    # every divisor of 16 present
    assert sorted(b for (_, b) in out) == [1, 2, 4, 8, 16]
    with pytest.raises(ValueError):
        dedup.lsh_plan(spark, 1.5)


def _random_changelog(seed, n_users=30, n_events=400):
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n_events):
        rows.append(
            (rng.randrange(n_users), i, i, rng.choice(["a", "b", "c", None]))
        )
    return rows


@pytest.mark.parametrize("seed", [1, 7])
def test_scd2_merge_equals_full_recompute(spark, seed):
    from elephant_twin_spark.operators import temporal

    rows = _random_changelog(seed)
    df = spark.createDataFrame(rows, "uid int, ts int, eid int, st string")
    cut = 250  # global split: every batch event is newer than history
    full = temporal.scd2_intervals(
        df, ["uid"], "ts", ["st"], tiebreak=["eid"]
    )
    hist = temporal.scd2_intervals(
        df.where(F.col("ts") < cut), ["uid"], "ts", ["st"], tiebreak=["eid"]
    )
    merged = temporal.scd2_merge(
        hist, df.where(F.col("ts") >= cut), ["uid"], "ts", ["st"],
        tiebreak=["eid"],
    )
    key = lambda r: (r["uid"], r["effective_from"])
    a = sorted(map(tuple, full.collect()), key=lambda t: (t[0], t[2]))
    b = sorted(map(tuple, merged.select(*full.columns).collect()), key=lambda t: (t[0], t[2]))
    assert a == b


def test_scd2_merge_batch_only_keys_and_untouched_keys(spark):
    from elephant_twin_spark.operators import temporal

    hist_log = spark.createDataFrame(
        [(1, 10, 1, "a"), (1, 20, 2, "b"), (2, 15, 3, "x")],
        "uid int, ts int, eid int, st string",
    )
    hist = temporal.scd2_intervals(hist_log, ["uid"], "ts", ["st"], tiebreak=["eid"])
    # batch: new key 3, update to key 1 (key 2 untouched)
    batch = spark.createDataFrame(
        [(3, 30, 4, "z"), (1, 40, 5, "b")], "uid int, ts int, eid int, st string"
    )
    merged = temporal.scd2_merge(hist, batch, ["uid"], "ts", ["st"], tiebreak=["eid"])
    rows = {(r["uid"], r["st"], r["effective_from"]): r for r in merged.collect()}
    assert rows[(2, "x", 15)]["is_current"]          # untouched passthrough
    assert rows[(3, "z", 30)]["is_current"]          # batch-only key
    # re-emitted current state collapses into the open run: from stays 20
    assert rows[(1, "b", 20)]["is_current"] and rows[(1, "b", 20)]["n_rows"] == 2
    assert not rows[(1, "a", 10)]["is_current"]


# ------------------------------------------------ JSONL ingest surface

def test_jsonl_roundtrip_and_corrupt_audit(spark, workdir):
    import os

    from elephant_twin_spark.sources import ingest

    src = f"{workdir}/jsonl_src"
    os.makedirs(src, exist_ok=True)
    with open(f"{src}/part-0.jsonl", "w") as f:
        f.write('{"doc_id": 1, "text": "hello world"}\n')
        f.write('{"doc_id": 2, "text": "second"}\n')
        f.write('NOT JSON AT ALL\n')
        f.write('{"doc_id": "not-an-int", "text": 3}\n')
        f.write('{"doc_id": 4, "text": "fourth"}\n')
    good, bad = ingest.jsonl_audit(spark, src, "doc_id long, text string")
    assert good.count() == 3
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2, 4]
    bad_rows = [r["raw"] for r in bad.collect()]
    assert len(bad_rows) == 2 and any("NOT JSON" in r for r in bad_rows)
    # roundtrip: write good rows back out, read them again
    out = ingest.write_jsonl(good, f"{workdir}/jsonl_out", num_files=2)
    back, bad2 = ingest.jsonl_audit(spark, out, "doc_id long, text string")
    assert back.count() == 3 and bad2.count() == 0
