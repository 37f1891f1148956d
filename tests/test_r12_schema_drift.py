"""Schema-drift soundness (r12 review class): at 100 TB with evolving
producers, files land with EXTRA columns or MISSING the indexed column.
Contract (probed, then pinned here): the index never makes drift
WRONGER than the full scan —

* drifted files land after a build → not covered / stale → scanned in
  full, answers equal the full scan;
* a REBUILD over the mixed table reads the union-by-name semantics of
  the same parquet reader the full scan uses (missing column → NULL →
  the file carries no postings keys → pruned, and its rows can never
  match an equality predicate anyway — sound, selectivity-exact);
* the full row-level predicate ALWAYS re-checks on the same reader, so
  index and full-scan lanes cannot diverge on drifted rows.

A drifted file whose indexed column changed TYPE fails the parquet
read itself — loud on both lanes equally, not an index concern.
"""

import glob
import shutil

import pyspark.sql.functions as F

from elephant_twin_spark import Engine, col
from elephant_twin_spark.sources import tables

from conftest import SF_DIR


def _land(df, tmp_dir, dst):
    df.coalesce(1).write.mode("overwrite").parquet(tmp_dir)
    part = glob.glob(f"{tmp_dir}/part-*.parquet")[0]
    shutil.copy(part, dst)


def test_schema_drift_stays_full_scan_equal(spark, workdir):
    tbl = tables.materialize(
        spark, f"{SF_DIR}/events.parquet", f"{workdir}/drift_events"
    )
    eng = Engine(spark, f"{workdir}/drift_idx")
    eng.build_index(tbl, "event_type", num_buckets=4)

    base = spark.read.parquet(tbl)
    _land(
        base.limit(50).drop("event_type"),
        f"{workdir}/drift_tmp_a",
        f"{tbl}/drift_missing_col.parquet",
    )
    _land(
        base.limit(30).withColumn("extra_col", F.lit("x")),
        f"{workdir}/drift_tmp_b",
        f"{tbl}/drift_extra_col.parquet",
    )
    spark.catalog.refreshByPath(tbl)

    truth = (
        spark.read.parquet(tbl).where(F.col("event_type") == "click").count()
    )

    # pre-rebuild: drifted files are not covered by the descriptor →
    # scanned, never pruned on stale knowledge
    got = eng.query(tbl, col("event_type") == "click").count()
    assert got == truth
    assert eng.last_metrics.as_dict()["stale_files"] == 2

    # rebuild over the mixed table: missing-column file reads as NULL →
    # zero postings keys → correctly PRUNED (its rows cannot match an
    # equality), extra column invisible to the index — still full-scan
    # equal, now with pruning back
    eng.build_index(tbl, "event_type", num_buckets=4, overwrite=True)
    got2 = eng.query(tbl, col("event_type") == "click").count()
    m = eng.last_metrics.as_dict()
    assert got2 == truth
    assert m["stale_files"] == 0
    assert m["scanned_files"] < m["total_files"], (
        "the NULL-keyed drift file should be pruned after rebuild"
    )
