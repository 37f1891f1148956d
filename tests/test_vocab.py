"""Vocabulary build / encode / OOV stats; weighted sampling."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from elephant_twin_spark.operators.pipeline import textstats, vocab


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c a b a"),
            Row(doc_id=2, text="b c d"),
            Row(doc_id=3, text="e e e e"),
        ]
    )


def test_build_vocab_deterministic_ids(spark, docs):
    v = {r["token"]: (r["cnt"], r["token_id"]) for r in vocab.build_vocab(docs, "text").collect()}
    # counts: a=3 b=3 c=2 e=4 d=1 → ids by (cnt desc, token asc): e=0 a=1 b=2 c=3 d=4
    assert v == {"e": (4, 0), "a": (3, 1), "b": (3, 2), "c": (2, 3), "d": (1, 4)}


def test_build_vocab_size_and_min_count(spark, docs):
    top2 = {r["token"] for r in vocab.build_vocab(docs, "text", vocab_size=2).collect()}
    assert top2 == {"e", "a"}
    mc = {r["token"] for r in vocab.build_vocab(docs, "text", min_count=2).collect()}
    assert mc == {"a", "b", "c", "e"}


def test_encode_docs_order_and_unk(spark, docs):
    v = vocab.build_vocab(docs, "text", vocab_size=3)  # e=0 a=1 b=2
    enc = {r["id"]: r["token_ids"] for r in vocab.encode_docs(docs, "text", "doc_id", v).collect()}
    assert enc[1] == [1, 2, -1, 1, 2, 1]  # a b c a b a ; c is OOV
    assert enc[2] == [2, -1, -1]
    assert enc[3] == [0, 0, 0, 0]


def test_oov_stats(spark, docs):
    v = vocab.build_vocab(docs, "text", vocab_size=3)
    st = {r["id"]: r for r in vocab.oov_stats(docs, "text", "doc_id", v).collect()}
    assert st[1]["n_tokens"] == 6 and st[1]["n_oov"] == 1
    assert st[2]["n_tokens"] == 3 and st[2]["n_oov"] == 2
    assert abs(st[2]["oov_rate"] - 2 / 3) < 1e-12
    assert st[3]["n_oov"] == 0


def test_weighted_take_matches_manual_keys(spark):
    import hashlib

    rows = [Row(id=i, w=float(1 + (i % 5))) for i in range(50)]
    df = spark.createDataFrame(rows)
    got = sorted(r["id"] for r in textstats.weighted_take(df, "w", 10, "id").collect())

    def key(i, w):
        h = hashlib.md5(f"{i}:42".encode()).hexdigest()
        u = (int(h[:15], 16) + 1) / (16**15 + 1)
        return -math.log(u) / w

    want = sorted(sorted(range(50), key=lambda i: (key(i, 1 + (i % 5)), i))[:10])
    assert got == want


def test_weighted_take_groups_and_weight_guard(spark):
    df = spark.createDataFrame(
        [Row(g="a", id=1, w=1.0), Row(g="a", id=2, w=0.0), Row(g="a", id=3, w=None),
         Row(g="b", id=4, w=2.0)]
    )
    out = textstats.weighted_take(df, "w", 5, "id", group_cols=["g"])
    assert sorted(r["id"] for r in out.collect()) == [1, 4]  # zero/null weights excluded


def test_weighted_take_heavy_weights_win_in_aggregate(spark):
    # prob check across many rows: weight-10 rows should dominate the sample
    rows = [Row(id=i, w=10.0 if i < 100 else 1.0) for i in range(200)]
    kept = textstats.weighted_take(spark.createDataFrame(rows), "w", 50, "id").collect()
    heavy = sum(1 for r in kept if r["id"] < 100)
    assert heavy > 35  # E[heavy] ≈ 45+, light tail keeps a few slots


def test_histogram_sketch_merge_and_quantile(spark):
    from elephant_twin_spark.functions import sketches

    df = spark.createDataFrame(
        [Row(g="a" if i < 500 else "b", v=float(i % 100)) for i in range(1000)]
    )
    # per-group sketches (partials)
    parts = df.groupBy("g").agg(
        sketches.histogram_sketch("v", 20, 0.0, 100.0).alias("hist")
    )
    rows = {r["g"]: r["hist"] for r in parts.collect()}
    assert sum(rows["a"]) == 500 and len(rows["a"]) == 22
    assert rows["a"][-2:] == [0, 0]  # no under/overflow

    # merge partials == histogram of the union (exact, vector add)
    merged = parts.agg(sketches.histogram_merge("hist", 20).alias("hist"))
    whole = df.agg(sketches.histogram_sketch("v", 20, 0.0, 100.0).alias("hist"))
    assert merged.first()["hist"] == whole.first()["hist"]

    # quantile estimate within one bin width of the exact percentile
    q = merged.select(
        sketches.histogram_quantile("hist", 0.5, 20, 0.0, 100.0).alias("p50")
    ).first()["p50"]
    exact = df.selectExpr("percentile(v, 0.5) AS p").first()["p"]
    assert abs(q - exact) <= 5.0  # bin width

    # out-of-domain mass lands in the tail slots
    oob = spark.createDataFrame([Row(v=-5.0), Row(v=500.0)]).agg(
        sketches.histogram_sketch("v", 4, 0.0, 100.0).alias("h")
    ).first()["h"]
    assert oob[4] == 1 and oob[5] == 1 and sum(oob[:4]) == 0


def test_histogram_sketch_top_edge_rounding(spark):
    """A value one ulp below `hi` must land in the TOP in-range bin, not
    the underflow slot: with an inexactly-representable bin width
    (num_bins=3, hi=0.1 -> w=0.0333...), floor((c-lo)/w) rounds to
    num_bins for c=nextafter(hi, 0) — which indexes the `< lo` slot.
    The clamp in histogram_sketch pins it to bin num_bins-1."""
    import math

    from elephant_twin_spark.functions import sketches

    c = math.nextafter(0.1, 0.0)
    assert c < 0.1  # the crafted knife-edge input
    h = spark.createDataFrame([Row(v=c)]).agg(
        sketches.histogram_sketch("v", 3, 0.0, 0.1).alias("h")
    ).first()["h"]
    assert h == [0, 0, 1, 0, 0], h  # top bin, not underflow
