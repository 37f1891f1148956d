"""Bloom (per-file bit array) index: safe pruning for high-cardinality
columns — false positives allowed, false negatives impossible."""

import pyspark.sql.functions as F
import pytest

from elephant_twin_spark import Engine, col
from elephant_twin_spark.operators import build as B
from elephant_twin_spark.operators import layout


def test_bloom_positions_sql_python_agree(spark):
    """The SQL hash (build side) and the Python hash (probe side) MUST
    produce identical bit positions or pruning silently false-negatives."""
    values = ["click", "purchase", "", "üñï", "user_12345", "a b c"]
    num_bits, k = 8192, 3
    df = spark.createDataFrame([(v,) for v in values], "v string")
    rows = df.select(
        "v", F.array(*[B._bloom_pos_sql(F.col("v"), i, num_bits) for i in range(k)]).alias("pos")
    ).collect()
    for r in rows:
        assert list(r["pos"]) == B.bloom_positions(r["v"], num_bits, k), r["v"]


@pytest.fixture(scope="module")
def clustered_events(spark, workdir, events_multifile):
    # cluster by user_id so a per-user bloom lookup can actually skip files
    return layout.cluster_table(
        spark, events_multifile, f"{workdir}/events_user_clustered", ["user_id"], num_files=10
    )


def test_bloom_query_exact_and_pruning(spark, workdir, clustered_events):
    eng = Engine(spark, f"{workdir}/bloom_root")
    eng.build_bloom_index(clustered_events, "user_id")

    full = spark.read.parquet(clustered_events)
    for uid in ["3", "77", "142"]:
        got = eng.query(clustered_events, col("user_id") == int(uid))
        want = full.where(F.col("user_id") == int(uid))
        assert got.count() == want.count(), uid
        m = eng.last_metrics
        assert "user_id" in (m.pushed or "")
        # clustered: each user lives in ~1 file; bloom must skip most files
        assert m.scanned_files < m.total_files, m.as_dict()

    # absent key: never a false negative; result exactly empty
    got = eng.query(clustered_events, col("user_id") == 10_000_000)
    assert got.count() == 0


def test_bloom_and_block_indexes_combine(spark, workdir, clustered_events):
    eng = Engine(spark, f"{workdir}/bloom_combo_root")
    eng.build_bloom_index(clustered_events, "user_id")
    eng.build_index(clustered_events, "event_type", num_buckets=4)

    pred = (col("event_type") == "purchase") & (col("user_id") == 9)
    got = eng.query(clustered_events, pred)
    want = spark.read.parquet(clustered_events).where(
        (F.col("event_type") == "purchase") & (F.col("user_id") == 9)
    )
    assert got.count() == want.count()
    info = eng.pushdown_info(clustered_events, pred)
    assert "event_type" in info["pushable"] and "user_id" in info["pushable"]


def test_block_index_preferred_over_bloom(spark, workdir, clustered_events):
    eng = Engine(spark, f"{workdir}/bloom_pref_root")
    eng.build_bloom_index(clustered_events, "event_type")
    eng.build_index(clustered_events, "event_type", num_buckets=4)
    # exact postings win: per-key counts from the block index must exist
    n = eng.postings(clustered_events, "event_type").count()
    assert n > 0
    got = eng.query(clustered_events, col("event_type") == "error").count()
    want = (
        spark.read.parquet(clustered_events).where(F.col("event_type") == "error").count()
    )
    assert got == want


def test_bloom_sign_bit_roundtrip(spark, workdir):
    """Value 'v41' hashes to bit position 7615 (word 118, bit 63 — the
    long sign bit): the build-side shiftleft(1L, 63) and the probe-side
    two's-complement mask must agree or sign-bit keys silently vanish."""
    src = f"{workdir}/bloom_signbit_tbl"
    rows = [(i, f"v{i}") for i in range(100)]
    spark.createDataFrame(rows, "id long, k string").write.mode("overwrite").parquet(src)

    eng = Engine(spark, f"{workdir}/bloom_signbit_root")
    eng.build_bloom_index(src, "k")
    assert eng.query(src, col("k") == "v41").count() == 1
    assert eng.query(src, col("k") == "v44").count() == 1


def test_indexes_on_empty_table(spark, workdir):
    src = f"{workdir}/empty_tbl"
    spark.createDataFrame([], "id long, k string, ts timestamp").write.mode(
        "overwrite"
    ).parquet(src)
    eng = Engine(spark, f"{workdir}/empty_root")
    eng.build_index(src, "k", num_buckets=2)
    eng.build_bloom_index(src, "k")
    eng.build_zone_index(src, "ts")
    assert eng.query(src, col("k") == "anything").count() == 0
    assert eng.query(src, col("ts") < "2030-01-01").count() == 0


def test_bloom_distributed_planner_matches(spark, workdir, clustered_events):
    """Bloom leaf evaluated cluster-side equals the driver path."""
    from elephant_twin_spark import col
    from elephant_twin_spark.operators import scan

    beng = Engine(spark, f"{workdir}/bloom_dist_root")
    beng.build_bloom_index(clustered_events, "user_id")
    md, mc = scan.ScanMetrics(), scan.ScanMetrics()
    drv = scan.query(spark, clustered_events, col("user_id") == 42,
                     beng.index_root, metrics=md, distributed_threshold=10**9)
    dist = scan.query(spark, clustered_events, col("user_id") == 42,
                      beng.index_root, metrics=mc, distributed_threshold=0)
    assert mc.planner == "distributed"
    assert sorted(r["event_id"] for r in dist.collect()) == sorted(
        r["event_id"] for r in drv.collect()
    )
    assert mc.scanned_files == md.scanned_files
