"""Grouped-stats operators: exact/approx percentiles, IQR outliers,
skew audit, run-length dedup, canonical per-group selection, packing
efficiency, TF-IDF ranking."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from elephant_twin_spark.operators.pipeline import dedup, pack, stats, textstats
from elephant_twin_spark.sources import tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return tables.load_raw(spark, f"{SF_DIR}/events.parquet").cache()


@pytest.fixture(scope="module")
def docs(spark):
    return tables.load_raw(spark, f"{SF_DIR}/documents.parquet").cache()


def test_approx_percentiles_within_tolerance(spark, events):
    """The rows-only at-scale twin: approx_percentile must land within a
    small rank tolerance of the exact interpolated percentile — this is
    the evidence behind declaring doc_len_quantiles_approx rows-only."""
    ev = events.where(F.col("value").isNotNull())
    exact = {
        r["grp"]: r
        for r in stats.exact_percentiles(ev, "value", "event_type").collect()
    }
    approx = {
        r["grp"]: r
        for r in stats.approx_percentiles(ev, "value", "event_type").collect()
    }
    assert set(exact) == set(approx)
    for g in exact:
        spread = exact[g]["p_75"] - exact[g]["p_25"] or 1.0
        for p in ("p_25", "p_50", "p_75"):
            # within 10% of the IQR of the exact value
            assert abs(exact[g][p] - approx[g][p]) <= 0.1 * spread, (g, p)


def test_iqr_outliers_matches_naive(spark, events):
    ev = events.where(F.col("value").isNotNull())
    got = {r["grp"]: r for r in stats.iqr_outliers(ev, "value", "event_type").collect()}
    rows = ev.select("event_type", "value").collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["event_type"], []).append(r["value"])

    def pctl(vals, p):
        vals = sorted(vals)
        idx = (len(vals) - 1) * p
        lo, hi = int(idx), min(int(idx) + 1, len(vals) - 1)
        return vals[lo] + (vals[hi] - vals[lo]) * (idx - lo)

    for g, vals in by_g.items():
        q1, q3 = pctl(vals, 0.25), pctl(vals, 0.75)
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        n_out = sum(1 for v in vals if v < lo or v > hi)
        assert got[g]["n"] == len(vals)
        assert got[g]["n_outlier"] == n_out, g


def test_bucket_skew_stats_partition_of_total(spark, events):
    ev = events.where(F.col("user_id").isNotNull())
    per = stats.bucket_skew_stats(ev, "user_id", n_buckets=16).collect()
    assert sum(r["n"] for r in per) == ev.count()
    # mean of skew over OCCUPIED buckets == n_buckets/occupied (here all occupied)
    assert 0 < len(per) <= 16
    for r in per:
        assert r["skew"] > 0


def test_drop_consecutive_dups_semantics(spark):
    rows = [
        # user 1: A A B B A  -> keep positions 1,3,5 (A,B,A)
        Row(k=1, o=1, v="A"), Row(k=1, o=2, v="A"), Row(k=1, o=3, v="B"),
        Row(k=1, o=4, v="B"), Row(k=1, o=5, v="A"),
        # user 2: leading NULL survives; NULL-after-NULL is a repeat
        Row(k=2, o=1, v=None), Row(k=2, o=2, v=None), Row(k=2, o=3, v="X"),
    ]
    df = spark.createDataFrame(rows, "k int, o int, v string")
    kept = dedup.drop_consecutive_dups(df, "k", ["o"], "v").collect()
    got = sorted((r["k"], r["o"]) for r in kept)
    assert got == [(1, 1), (1, 3), (1, 5), (2, 1), (2, 3)]


def test_canonical_per_group_deterministic(spark):
    rows = [
        Row(g="a", n=10, id=3), Row(g="a", n=10, id=1), Row(g="a", n=5, id=2),
        Row(g="b", n=7, id=9),
    ]
    df = spark.createDataFrame(rows, "g string, n int, id int")
    got = {r["g"]: r["id"] for r in dedup.canonical_per_group(df, "g", "n", "id").collect()}
    # ties on n break toward the SMALLEST id
    assert got == {"a": 1, "b": 9}


def test_pack_efficiency_consistent_with_manifest(spark, docs):
    eff = pack.pack_efficiency(docs, "text", "doc_id", budget=256).first()
    man = pack.pack_manifest(docs, "text", "doc_id", budget=256)
    agg = man.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("total_tokens").alias("total_tokens"),
        F.max("total_tokens").alias("max_pack_tokens"),
    ).first()
    assert eff["n_packs"] == agg["n_packs"]
    assert eff["n_docs"] == agg["n_docs"] == docs.count()
    assert eff["total_tokens"] == agg["total_tokens"]
    assert eff["max_pack_tokens"] == agg["max_pack_tokens"]
    assert 0 < eff["avg_fill_ratio"]


def test_tfidf_rewards_rare_terms(spark):
    rows = [Row(id=i, text="common filler words here") for i in range(20)]
    rows += [Row(id=100 + i, text="common rareword signal") for i in range(2)]
    df = spark.createDataFrame(rows, "id long, text string")
    top = textstats.tfidf_top_terms(df, "text", "id", top_n=3).collect()
    terms = [r["term"] for r in top]
    # 'rareword'/'signal' (df=2) outscore ubiquitous terms despite tiny tf
    assert terms[0] in {"rareword", "signal"}
    by_term = {r["term"]: r for r in top}
    for r in top:
        assert r["df"] <= r["tf"]


def test_length_histogram_buckets(spark, docs):
    h = stats.length_histogram(
        docs, textstats.token_count(F.col("text")), bucket_width=32
    ).collect()
    assert sum(r["n"] for r in h) == docs.count()
    for r in h:
        assert r["bucket_lo"] % 32 == 0


def test_drop_consecutive_dups_matches_python_reference(spark):
    """Seeded random streams: the window-based run-length dedup must
    keep exactly the rows a sequential Python scan keeps."""
    import random

    from pyspark.sql import Row

    rng = random.Random(13)
    rows = []
    for k in range(8):
        for o in range(rng.randint(0, 40)):
            v = rng.choice(["A", "B", "C", None])
            rows.append(Row(k=k, o=o, v=v))
    df = spark.createDataFrame(rows, "k int, o int, v string")
    kept = {
        (r["k"], r["o"])
        for r in dedup.drop_consecutive_dups(df, "k", ["o"], "v").collect()
    }
    want = set()
    by_k = {}
    for r in rows:
        by_k.setdefault(r.k, []).append(r)
    for k, rs in by_k.items():
        prev = object()  # sentinel != anything incl. None
        for r in sorted(rs, key=lambda x: x.o):
            if r.v != prev or (prev is None) != (r.v is None):
                want.add((k, r.o))
            prev = r.v
    assert kept == want
