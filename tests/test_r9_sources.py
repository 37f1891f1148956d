"""Round-9 sources/engine review closure tests.

The r9 fresh-eyes review of sources/ + engine.py found: the predicate
tokenizer silently dropped unary minus (wrong results for negative
literals); descriptor writes were non-atomic and a torn descriptor
permanently broke the table's queries; load_raw leaked the nanos conf
and then mis-read Spark-written nanos tables as longs; the mini SQL
front door broke multi-argument projections and spaced ORDER BY items;
normalize_path mangled relative and bare-bucket URIs; materialize used
local-only marker IO.
"""

import os

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from elephant_twin_spark.engine import Engine, _split_top_level
from elephant_twin_spark.plans import expr as E
from elephant_twin_spark.sources import catalog, fsio, tables


# ------------------------------------------------ predicate tokenizer

def test_parse_predicate_negative_literals():
    d = E.to_json_dict(E.parse_predicate("value > -5"))
    assert d["cmp"] == ">" and d["value"] == -5
    d2 = E.to_json_dict(E.parse_predicate("value <= -2.5"))
    assert d2["value"] == -2.5
    # IN lists with commas still parse (commas are real tokens now)
    d3 = E.to_json_dict(E.parse_predicate("event_type IN ('a', 'b')"))
    assert d3["op"] == "or"


def test_parse_predicate_rejects_unparsable_characters():
    # pre-fix these characters were silently DROPPED, flipping the
    # predicate's meaning with no signal
    with pytest.raises(ValueError, match="unparsable"):
        E.parse_predicate("value > 5 % 2")
    with pytest.raises(ValueError, match="unparsable"):
        E.parse_predicate("a = 1; DROP TABLE t")


def test_engine_query_negative_literal_matches_fullscan(spark, workdir):
    src = f"{workdir}/r9_neg_src"
    spark.createDataFrame(
        [(i, float(i - 10)) for i in range(20)], "id long, value double"
    ).write.mode("overwrite").parquet(src)
    eng = Engine(spark, f"{workdir}/r9_neg_idx")
    got = eng.query(src, "value > -5").count()
    want = spark.read.parquet(src).where("value > -5").count()
    assert got == want and want == 14  # values -4..9


# ------------------------------------------------ descriptor durability

def test_torn_descriptor_degrades_to_fullscan_and_rebuild_heals(
    spark, workdir
):
    src = f"{workdir}/r9_torn_src"
    spark.createDataFrame(
        [(i, f"k{i % 3}") for i in range(60)], "id long, tag string"
    ).write.mode("overwrite").parquet(src)
    eng = Engine(spark, f"{workdir}/r9_torn_idx")
    eng.build_index(src, "tag", num_buckets=2)
    assert eng.query(src, "tag = 'k1'").count() == 20

    # simulate a crash mid-descriptor-write: torn JSON on disk
    idx_dir = catalog.index_dir(f"{workdir}/r9_torn_idx", src, "tag", kind="block")
    p = catalog.descriptor_path(idx_dir)
    local = p[len("file://"):] if p.startswith("file://") else p
    with open(local, "w") as fh:
        fh.write('{"version": 1, "colu')  # truncated
    crc = os.path.join(os.path.dirname(local), f".{os.path.basename(local)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    spark.catalog.clearCache()

    # pre-fix: JSONDecodeError on every query; now: warns, full-scans,
    # answers stay correct
    with pytest.warns(RuntimeWarning, match="unreadable index descriptor"):
        assert eng.query(src, "tag = 'k1'").count() == 20
    # a rebuild self-heals (build treats the unreadable descriptor as absent)
    eng.build_index(src, "tag", num_buckets=2)
    assert eng.query(src, "tag = 'k1'").count() == 20
    assert eng.list_indexes(src)


def test_write_text_is_staged_and_overwrites(spark, workdir):
    p = f"{workdir}/r9_wt/note.txt"
    fsio.write_text(spark, p, "one")
    assert fsio.read_text(spark, p) == "one"
    fsio.write_text(spark, p, "two")
    assert fsio.read_text(spark, p) == "two"
    assert not fsio.exists(spark, p + "._tmp")


# ------------------------------------------------ nanos conf consistency

def test_load_raw_converts_nanos_regardless_of_writer_metadata(spark, workdir):
    """With the session conf leaked to true (any earlier nanos read), a
    table whose footer carries Spark writer metadata still surfaces
    nanos columns as LONG — conversion must key on the READ type, not
    the writer (pre-fix those columns silently stayed epoch-nanos
    longs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pandas as pd

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    pdf = pd.DataFrame(
        {"id": [1, 2], "ts": pd.to_datetime(["2024-01-01 10:00:00", "2024-01-02 11:30:00"])}
    )
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    # simulate a Spark-written file: same nanos physical type + the
    # writer-metadata key the old code used as a skip signal
    table = table.replace_schema_metadata({b"org.apache.spark.version": b"4.1.2"})
    dst = f"{workdir}/r9_nanos_sparkmeta"
    os.makedirs(dst, exist_ok=True)
    pq.write_table(table, f"{dst}/part-0.parquet")

    df = tables.load_raw(spark, dst)
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {str(r["ts"]) for r in df.collect()}
    assert got == {"2024-01-01 10:00:00", "2024-01-02 11:30:00"}


# ------------------------------------------------ mini SQL front door

def test_sql_multiarg_projection_and_order_modifiers(spark, workdir):
    src = f"{workdir}/r9_sql_src"
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 5.0), (3, "c", None)],
        "id long, tag string, v double",
    ).write.mode("overwrite").parquet(src)
    eng = Engine(spark, f"{workdir}/r9_sql_idx")

    out = eng.sql(f"SELECT concat(tag, '-', id) AS k FROM '{src}' ORDER BY id")
    assert [r["k"] for r in out.collect()] == ["a-1", "b-2", "c-3"]

    # spaced ORDER BY expression + DESC actually orders by the expression
    out2 = eng.sql(f"SELECT id FROM '{src}' ORDER BY id * -1 DESC")
    assert [r["id"] for r in out2.collect()] == [1, 2, 3]

    # NULLS FIRST is honored rather than silently dropped
    out3 = eng.sql(f"SELECT id FROM '{src}' ORDER BY v ASC NULLS FIRST")
    assert [r["id"] for r in out3.collect()] == [3, 2, 1]


def test_split_top_level():
    assert _split_top_level("a, concat(b, c), d") == ["a", "concat(b, c)", "d"]
    assert _split_top_level("substr(x, 1, 2)") == ["substr(x, 1, 2)"]
    assert _split_top_level("a, 'x,y', b") == ["a", "'x,y'", "b"]


# ------------------------------------------------ path canonicalization

def test_normalize_path_relative_and_bare_bucket():
    rel = fsio.normalize_path("data/events")
    absolute = fsio.normalize_path(os.path.abspath("data/events"))
    assert rel == absolute  # same table, same id, indexes stay visible
    assert fsio.normalize_path("s3://bucket") == "s3://bucket"
    assert fsio.normalize_path("s3://bucket/x/../y") == "s3://bucket/y"


def test_materialize_marker_uses_fs_io(spark, workdir):
    src = f"{SF_DIR}/region.parquet"
    dst = f"file://{workdir}/r9_mat_region"  # URI spelling, not a local path
    out = tables.materialize(spark, src, dst, num_files=2)
    assert out == dst
    n = spark.read.parquet(dst).count()
    # second call is a cache hit (marker found through the Hadoop FS)
    mtimes = {
        f: os.path.getmtime(f"{workdir}/r9_mat_region/{f}")
        for f in os.listdir(f"{workdir}/r9_mat_region")
        if f.startswith("part-")
    }
    assert tables.materialize(spark, src, dst, num_files=2) == dst
    for f, t in mtimes.items():
        assert os.path.getmtime(f"{workdir}/r9_mat_region/{f}") == t
    assert spark.read.parquet(dst).count() == n
