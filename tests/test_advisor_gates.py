"""Index advisor; temperature mixture weights; streaming-ready score
gate; text normalization."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from elephant_twin_spark.engine import Engine
from elephant_twin_spark.operators.pipeline import mixture, textstats


@pytest.fixture(scope="module")
def wide_table(spark, workdir):
    p = f"{workdir}/advisor_tbl"
    n = 2000
    spark.range(n).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("status"),       # low card
        F.md5(F.col("id").cast("string")).alias("request_id"),  # high card
        (F.col("id") * 10).alias("amount"),                     # range-used
        F.array(F.col("id")).alias("tags"),                     # unsupported
    ).repartition(4).write.mode("overwrite").parquet(p)
    return p


def test_advisor_recommends_by_cardinality_and_ops(spark, wide_table):
    eng = Engine(spark, f"{wide_table}_idx")
    recs = {
        r["column"]: r
        for r in eng.advise_indexes(
            wide_table,
            [
                "status = ' 1'",
                "status = '2' AND amount > 100",
                "request_id = 'abc'",
            ],
        )
    }
    assert recs["status"]["recommendation"] == "block"
    assert recs["status"]["n_refs"] == 2
    assert recs["amount"]["recommendation"] == "zone"
    assert recs["request_id"]["recommendation"] == "bloom"
    assert recs["request_id"]["distinct_ratio"] > 0.5


def test_advisor_unsupported_type(spark, wide_table):
    eng = Engine(spark, f"{wide_table}_idx")
    recs = {r["column"]: r for r in eng.advise_indexes(wide_table, ["tags = 'x'"])}
    assert recs["tags"]["recommendation"] is None


def test_temperature_weights_flatten(spark):
    df = spark.createDataFrame(
        [Row(g="big")] * 90 + [Row(g="small")] * 10
    )
    natural = mixture.temperature_weights(df, "g", alpha=1.0)
    flat = mixture.temperature_weights(df, "g", alpha=0.0)
    half = mixture.temperature_weights(df, "g", alpha=0.5)
    assert abs(natural["big"] - 0.9) < 1e-9
    assert abs(flat["big"] - 0.5) < 1e-9
    assert 0.5 < half["big"] < 0.9  # flattened but still ordered
    assert abs(sum(half.values()) - 1.0) < 1e-9
    with pytest.raises(ValueError):
        mixture.temperature_weights(df, "g", alpha=1.5)


def test_score_gate_stream_matches_batch(spark, workdir):
    rows = [Row(g="a", id=i, score=float(i)) for i in range(20)] + [
        Row(g="b", id=100 + i, score=float(i * 2)) for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    thr = textstats.quality_thresholds(df, "score", 0.25, group_cols=["g"])
    batch_kept = {r["id"] for r in textstats.apply_score_gate(df, "score", thr, ["g"]).collect()}

    src = f"{workdir}/gate_src"
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    gated = textstats.apply_score_gate(stream, "score", thr, ["g"])
    from elephant_twin_spark.streaming.windows import run_to_memory

    run_to_memory(gated, "gate_sink")
    stream_kept = {r["id"] for r in spark.table("gate_sink").collect()}
    assert stream_kept == batch_kept and batch_kept  # stream == batch

    # ungrouped path is a plain filter
    thr0 = textstats.quality_thresholds(df, "score", 0.5)
    kept0 = textstats.apply_score_gate(df, "score", thr0).count()
    assert 0 < kept0 <= len(rows)


def test_normalize_text(spark):
    df = spark.createDataFrame([Row(t="  Hello\tWorld\x01  this   IS\n it ")])
    out = df.select(textstats.normalize_text(F.col("t")).alias("n")).first()["n"]
    assert out == "hello world this is it"
    keep_case = df.select(
        textstats.normalize_text(F.col("t"), lowercase=False).alias("n")
    ).first()["n"]
    assert keep_case == "Hello World this IS it"
