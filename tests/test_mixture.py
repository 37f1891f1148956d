"""Tests for mixture resampling (domain reweighting)."""

import pytest
from pyspark.sql import functions as F

from elephant_twin_spark.operators.pipeline import mixture


def _df(spark):
    rows = [(i, "a" if i < 80 else "b") for i in range(100)]
    return spark.createDataFrame(rows, "id long, grp string")


def test_keep_counts_downsample_only(spark):
    # a:80 b:20, target 50/50 -> alpha = min(80/.5, 20/.5) = 40 -> 20/20
    k = mixture.keep_counts(_df(spark), "grp", {"a": 0.5, "b": 0.5})
    assert k == {"a": 20, "b": 20}


def test_mixture_resample_exact_and_deterministic(spark):
    df = _df(spark)
    out1 = mixture.mixture_resample(df, "grp", {"a": 0.5, "b": 0.5}, "id")
    out2 = mixture.mixture_resample(df, "grp", {"a": 0.5, "b": 0.5}, "id")
    got1 = sorted((r["grp"], r["id"]) for r in out1.collect())
    got2 = sorted((r["grp"], r["id"]) for r in out2.collect())
    assert got1 == got2
    per = out1.groupBy("grp").count().collect()
    assert {r["grp"]: r["count"] for r in per} == {"a": 20, "b": 20}
    # schema passes through (plus group col still present)
    assert set(out1.columns) == {"id", "grp"}


def test_mixture_resample_drops_unweighted_groups(spark):
    out = mixture.mixture_resample(_df(spark), "grp", {"a": 1.0}, "id")
    assert out.where("grp = 'b'").count() == 0
    assert out.where("grp = 'a'").count() == 80  # alpha = 80/1.0


def test_keep_counts_rejects_unknown_group(spark):
    with pytest.raises(ValueError):
        mixture.keep_counts(_df(spark), "grp", {"a": 0.5, "zz": 0.5})


def test_hash_sample_rate_and_statelessness(spark):
    df = _df(spark)
    out = mixture.hash_sample(df, "grp", {"a": 0.5, "b": 0.5}, "id", seed=7)
    per = {r["grp"]: r["count"] for r in out.groupBy("grp").count().collect()}
    # expected 20 per group; allow generous binomial slack on 80/20 rows
    assert 8 <= per.get("a", 0) <= 32
    assert 12 <= per.get("b", 0) <= 20
    # per-row decision is stable across invocations
    out2 = mixture.hash_sample(df, "grp", {"a": 0.5, "b": 0.5}, "id", seed=7)
    assert sorted(r["id"] for r in out.collect()) == sorted(
        r["id"] for r in out2.collect()
    )


def test_hash_sample_stream_matches_batch(spark, workdir):
    """Precomputed-rate hash sampling is pure per-row, so a streamed
    drain keeps exactly the batch-kept rows."""
    from elephant_twin_spark.streaming import windows

    df = _df(spark)
    src = f"{workdir}/mixture_stream_src"
    df.coalesce(2).write.mode("overwrite").parquet(src)

    rates = mixture.sample_rates(df, "grp", {"a": 0.5, "b": 0.5})
    batch_ids = sorted(
        r["id"]
        for r in mixture.hash_sample(
            spark.read.parquet(src), "grp", None, "id", seed=7, rates=rates
        ).collect()
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sdf = mixture.hash_sample(stream, "grp", None, "id", seed=7, rates=rates)
    windows.run_to_memory(sdf, "mixture_out", output_mode="append", timeout_sec=180)
    got = sorted(r["id"] for r in spark.table("mixture_out").collect())
    assert got == batch_ids and len(got) > 0
