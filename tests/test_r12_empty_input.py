"""r12 empty-input sweep: the full 199-query registry was run against
an empty-schema twin of the testdata (same parquet schemas, zero rows)
with the oracle comparison live — at 100 TB an empty input is routine
(a partition-pruned range with no files, a filter matching nothing, a
source that has not landed yet), so every operator needs DEFINED
behavior there: an empty result, the SQL-twin's aggregate row, or a
LOUD named error — never a 'NoneType' TypeError three frames deep or a
cryptic Catalyst DATATYPE_MISMATCH from a void-typed array literal.

Sweep outcome (see SCALE_EXPERIMENTS.md "r12: empty-input sweep"):
179/199 already well-defined; the rest classified and either FIXED
(pinned here) or documented by-design (fixture-contract asserts, loud
fit errors, Spark-native cube/rollup grouping-set semantics).
"""

import glob
import os

import pyspark.sql.functions as F
import pytest

from elephant_twin_spark.operators.pipeline import similarity

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def empty_sf_dir(spark, workdir):
    """Empty-schema twin of the testdata: every table, zero rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dst = f"{workdir}/sf_empty"
    os.makedirs(dst, exist_ok=True)
    for f in sorted(glob.glob(f"{SF_DIR}/*.parquet")):
        schema = pq.read_schema(f)
        empty = pa.table(
            {fld.name: pa.array([], type=fld.type) for fld in schema}
        )
        pq.write_table(empty, os.path.join(dst, os.path.basename(f)))
    return dst


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<double>")


# ---------------------------------------------------------- library guards


def test_with_cosine_empty_query_vec_raises(empty_emb):
    """F.lit([]) is a void-typed array — the guard names the contract
    violation instead of a zip_with AnalysisException."""
    with pytest.raises(ValueError, match="query_vec"):
        similarity.with_cosine(empty_emb, "embedding", [])
    with pytest.raises(ValueError, match="query_vec"):
        similarity.cosine_topk(empty_emb, "embedding", "vec_id", None, k=5)


def test_ivf_assign_empty_centroids_raises(empty_emb):
    with pytest.raises(ValueError, match="empty centroid list"):
        similarity.ivf_assign(empty_emb, "embedding", [])


def test_semantic_dedup_empty_centroids_raises(empty_emb):
    with pytest.raises(ValueError, match="empty centroid list"):
        similarity.semantic_dedup_pairs(
            empty_emb, "embedding", "vec_id", [], threshold=0.5
        )


def test_pq_empty_codebooks_raise(empty_emb):
    with pytest.raises(ValueError, match="empty codebooks"):
        similarity.pq_encode(empty_emb, "embedding", "vec_id", [])
    codes = similarity.pq_encode(
        empty_emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        ).limit(0),
        "embedding",
        "vec_id",
        [[[0.0, 0.0]], [[0.0, 0.0]]],
    )
    assert codes.count() == 0  # empty INPUT (not empty codebooks) is fine
    with pytest.raises(ValueError, match="empty codebooks"):
        similarity.pq_topk(codes, [0.0] * 4, [])


def test_lsh_cosine_topk_empty_query_vec_raises(empty_emb):
    with pytest.raises(ValueError, match="query_vec"):
        similarity.lsh_cosine_topk(empty_emb, "embedding", "vec_id", [], k=5)


# ------------------------------------------------- registry entry behavior


def test_query_vec_fixture_probe_is_loud(spark, empty_sf_dir):
    """The four qvec probe sites share _query_vec: absent fixture row →
    a NAMED assertion, not 'NoneType' object is not subscriptable."""
    import __spark_entry__ as em

    emb = spark.read.parquet(f"{empty_sf_dir}/embeddings.parquet")
    with pytest.raises(AssertionError, match="vec_id=0 absent"):
        em._query_vec(emb)


def test_zone_min_max_empty_is_null_row(spark, empty_sf_dir):
    """Index-only min/max over an empty table = the SQL twin's one-row
    NULL/NULL aggregate (was: float(None) TypeError)."""
    import __spark_entry__ as em

    rows = em.queries()["zone_min_max"](spark, empty_sf_dir).collect()
    assert len(rows) == 1
    assert rows[0]["mn"] is None and rows[0]["mx"] is None


def test_date_partition_range_empty_reads_empty(spark, empty_sf_dir):
    """A zero-row partitioned write creates no partition dirs; the
    explicit read schema keeps the scan defined (was:
    UNABLE_TO_INFER_SCHEMA)."""
    import __spark_entry__ as em

    out = em.queries()["date_partition_range"](spark, empty_sf_dir)
    assert out.count() == 0
    assert "event_type" in out.columns


def test_register_bucketed_empty_table_restart(spark, workdir):
    """A zero-row bucketed table write leaves no parquet footers, so a
    fresh-session re-register (the pay-once layout's whole point) threw
    UNABLE_TO_INFER_SCHEMA; the explicit schema= keeps the restart
    defined."""
    from elephant_twin_spark.operators import layout

    df = spark.createDataFrame([], "k long, v string").coalesce(1)
    path = f"{workdir}/bkt_empty"
    layout.bucket_table(spark, df, "ets_t_r12_bkt_empty", ["k"], 4, path=path)
    spark.sql("DROP TABLE ets_t_r12_bkt_empty")  # simulate a new session
    layout.register_bucketed_table(
        spark, "ets_t_r12_bkt_empty", path, ["k"], 4, schema=df.schema
    )
    assert spark.table("ets_t_r12_bkt_empty").count() == 0
    spark.sql("DROP TABLE ets_t_r12_bkt_empty")


def test_cube_rollup_empty_divergence_is_engine_native(spark):
    """DOCUMENTED divergence: ANSI GROUP BY CUBE/ROLLUP emits the
    grand-total grouping set (1 row) over empty input; Spark's
    expand+groupBy implementation emits 0 rows. Pinned so a future
    Spark version changing this is noticed (the oracle gate never runs
    on empty tables, so this cannot flip a driver row)."""
    df = spark.range(0).select(
        F.col("id").alias("a"), F.col("id").alias("b"), F.col("id").alias("v")
    )
    assert df.cube("a", "b").agg(F.sum("v")).count() == 0
    assert df.rollup("a", "b").agg(F.sum("v")).count() == 0
    assert df.agg(F.sum("v")).count() == 1  # global agg keeps the ANSI row
