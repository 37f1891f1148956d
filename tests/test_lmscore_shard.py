"""Tests for unigram LM scoring and deterministic sharding."""

import math

import pytest
from pyspark.sql import functions as F

from elephant_twin_spark.operators.pipeline import lmscore, shard


def test_unigram_logprob_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "id long, text string"
    )
    # counts: a=3, b=1, c=1; total=5, vocab=3; denom=8
    out = {r["id"]: r["logprob"] for r in
           lmscore.unigram_logprob(df, "text", "id").collect()}
    exp1 = (2 * math.log(4 / 8) + math.log(2 / 8)) / 3
    exp2 = (math.log(4 / 8) + math.log(2 / 8)) / 2
    assert out[1] == pytest.approx(exp1)
    assert out[2] == pytest.approx(exp2)


def test_unigram_logprob_reference_corpus_and_unseen(spark):
    ref = spark.createDataFrame([(1, "a a a b")], "id long, text string")
    freq, total, vocab = lmscore.unigram_model(ref, "text")
    assert (total, vocab) == (4, 2)
    target = spark.createDataFrame([(9, "z")], "id long, text string")
    out = lmscore.unigram_logprob(
        target, "text", "id", freq=freq, total=total, vocab=vocab
    ).first()
    # unseen token -> smoothed floor ln(1/(4+2))
    assert out["logprob"] == pytest.approx(math.log(1 / 6))


def test_unigram_logprob_empty_doc_is_null(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "")], "id long, text string")
    out = {r["id"]: r["logprob"] for r in
           lmscore.unigram_logprob(df, "text", "id").collect()}
    assert out[2] is None and out[1] is not None


def test_assign_shards_deterministic_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    a = shard.assign_shards(df, "id", 8, seed=3)
    b = shard.assign_shards(df, "id", 8, seed=3)
    ra = sorted((r["id"], r["shard_id"]) for r in a.collect())
    rb = sorted((r["id"], r["shard_id"]) for r in b.collect())
    assert ra == rb
    per = [r["count"] for r in a.groupBy("shard_id").count().collect()]
    assert len(per) == 8 and sum(per) == 500
    # roughly balanced (binomial slack around 62.5)
    assert min(per) > 30 and max(per) < 95
    # a different seed reshuffles
    c = shard.assign_shards(df, "id", 8, seed=4)
    assert sorted((r["id"], r["shard_id"]) for r in c.collect()) != ra


def test_write_shards_roundtrip(spark, workdir):
    df = spark.createDataFrame([(i, f"t{i}") for i in range(100)], "id long, text string")
    path = f"{workdir}/shards"
    shard.write_shards(df, path, "id", 4, seed=1)
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert back.select("shard_id").distinct().count() == 4
    # partition column round-trips the assignment
    re = shard.assign_shards(df, "id", 4, seed=1).select("id", "shard_id")
    assert sorted(map(tuple, back.select("id", "shard_id").collect())) == sorted(
        map(tuple, re.collect())
    )


def test_assign_shards_rejects_bad_count(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        shard.assign_shards(df, "id", 0)


def test_kfold_assign_uniform_and_stable(spark):
    from elephant_twin_spark.operators.pipeline import shard

    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    f1 = {r["doc_id"]: r["fold"] for r in shard.kfold_assign(df, "doc_id", k=5).collect()}
    # stable under reordering/repartition
    f2 = {
        r["doc_id"]: r["fold"]
        for r in shard.kfold_assign(df.repartition(17), "doc_id", k=5).collect()
    }
    assert f1 == f2
    from collections import Counter

    c = Counter(f1.values())
    assert set(c) == {0, 1, 2, 3, 4}
    assert max(c.values()) / min(c.values()) < 1.15  # roughly uniform

    import pytest

    with pytest.raises(ValueError):
        shard.kfold_assign(df, "doc_id", k=1)
