"""Foreign-format ingestion → parquet → index → pruned query."""

import os

import pytest
from pyspark.sql import functions as F

from elephant_twin_spark.engine import Engine
from elephant_twin_spark.plans.expr import col


def test_csv_ingest_then_index_and_query(spark, workdir):
    src = f"{workdir}/ing_csv_src"
    os.makedirs(src, exist_ok=True)
    with open(f"{src}/part1.csv", "w") as fh:
        fh.write("id,kind,val\n1,click,10\n2,view,20\n3,click,30\n")
    with open(f"{src}/part2.csv", "w") as fh:
        fh.write("id,kind,val\n4,view,40\n5,click,50\n")
    eng = Engine(spark, f"{workdir}/ing_idx")
    tbl = eng.ingest(
        src, "csv", f"{workdir}/ing_csv_tbl",
        options={"header": "true"}, schema="id long, kind string, val long",
        num_files=4,
    )
    eng.build_index(tbl, "kind", num_buckets=2)
    got = sorted(r["id"] for r in eng.query(tbl, col("kind") == "click").collect())
    assert got == [1, 3, 5]
    full = spark.read.parquet(tbl)
    assert full.count() == 5 and set(full.columns) == {"id", "kind", "val"}


def test_json_ingest(spark, workdir):
    src = f"{workdir}/ing_json_src"
    os.makedirs(src, exist_ok=True)
    with open(f"{src}/a.jsonl", "w") as fh:
        fh.write('{"u": "x", "n": 1}\n{"u": "y", "n": 2}\n')
    eng = Engine(spark, f"{workdir}/ing_idx")
    tbl = eng.ingest(src, "json", f"{workdir}/ing_json_tbl", schema="u string, n long")
    rows = {r["u"]: r["n"] for r in spark.read.parquet(tbl).collect()}
    assert rows == {"x": 1, "y": 2}


def test_text_ingest_stable_line_ids(spark, workdir):
    src = f"{workdir}/ing_txt_src"
    os.makedirs(src, exist_ok=True)
    with open(f"{src}/log.txt", "w") as fh:
        fh.write("alpha beta\ngamma\nalpha beta\n")  # duplicate line
    eng = Engine(spark, f"{workdir}/ing_idx")
    tbl = eng.ingest(src, "text", f"{workdir}/ing_txt_tbl", line_id=True)
    df = spark.read.parquet(tbl)
    assert df.count() == 3
    assert df.select("line_id").distinct().count() == 3  # dup lines get distinct ids
    # re-ingest produces the same ids (stability under re-run)
    tbl2 = eng.ingest(src, "text", f"{workdir}/ing_txt_tbl2", line_id=True)
    ids1 = {r["line_id"] for r in df.collect()}
    ids2 = {r["line_id"] for r in spark.read.parquet(tbl2).collect()}
    assert ids1 == ids2


def test_unknown_format_rejected(spark, workdir):
    """Short names are allowed through to Spark (registered third-party
    datasources like delta use them — r9 review), so the loud failure
    for a genuinely unknown format is Spark's own DATA_SOURCE_NOT_FOUND,
    which names the format."""
    eng = Engine(spark, f"{workdir}/ing_idx")
    with pytest.raises(Exception, match="(?i)xlsx"):
        eng.ingest("/nope", "xlsx", f"{workdir}/ing_bad")


def test_avro_ingest_roundtrip_or_clear_error(spark, workdir):
    """Avro is the nearest public analog of the reference's pluggable
    InputFormat surface (S1). When spark-avro is deployed the round-trip
    must work; when it isn't, read_foreign must fail with the deploy
    hint rather than Spark's bare ClassNotFound."""
    from elephant_twin_spark.sources import ingest as ing

    if not ing.avro_available(spark):
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="spark-avro"):
            ing.read_foreign(spark, f"{workdir}/nope.avro", "avro")
        _pytest.skip("spark-avro not on classpath in this environment")
    src = f"{workdir}/avro_src"
    spark.range(10).selectExpr("id", "cast(id as string) AS s").write.format(
        "avro"
    ).mode("overwrite").save(src)
    dst = ing.ingest(spark, src, "avro", f"{workdir}/avro_ingested", num_files=2)
    got = spark.read.parquet(dst)
    assert got.count() == 10 and set(got.columns) == {"id", "s"}
