"""Solo-rep triage for the r9 bench watch list (VERDICT r9 item 1).

Runs the 5 suspect keys — q_idx_point, q_idx_count_only, q_text_count,
build_block_index_event_type, build_text_index_docs — 5 reps each in ONE
JVM with bench.py's exact warm-up, and prints per-rep timings. Builds get
a FRESH index_root per rep (each rep is a genuine cold build; rep1 still
shows first-touch effects vs reps 2-5 steady state).

Usage: python tools/solo_watchlist.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = (sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1").rstrip("/")
CPUS = 32


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ets-solo-watchlist")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from elephant_twin_spark import Engine, col
    from elephant_twin_spark.operators import lifecycle
    from elephant_twin_spark.sources import tables

    work = "/tmp/ets_solo_r10_work"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    events = tables.materialize(spark, f"{SF_DIR}/events.parquet", f"{work}/events", 32)
    docs_path = f"{SF_DIR}/documents.parquet"

    # bench.py's exact warm-up
    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    spark.read.parquet(events).limit(1000).count()
    (
        spark.range(1000)
        .repartitionByRange(2, "id")
        .write.mode("overwrite")
        .parquet(f"{work}/_warmup")
    )

    results: dict[str, list[float]] = {}

    def reps(name, fn, n=5):
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            with lifecycle.checkpoint_scope():
                fn(i)
            ts.append(round(time.perf_counter() - t0, 3))
        results[name] = ts
        print(f"{name}: {ts}", file=sys.stderr, flush=True)

    # builds: fresh engine root per rep = genuine cold build each time
    reps(
        "build_block_index_event_type",
        lambda i: Engine(spark, f"{work}/idxroot_b{i}").build_index(
            events, "event_type", num_buckets=8
        ),
    )
    reps(
        "build_text_index_docs",
        lambda i: Engine(spark, f"{work}/idxroot_t{i}").build_text_index(
            docs_path, "text", "doc_id"
        ),
    )

    # queries: one engine, indexes built untimed, then solo reps
    eng = Engine(spark, f"{work}/index_root")
    eng.build_index(events, "event_type", num_buckets=8)
    eng.build_text_index(docs_path, "text", "doc_id")
    ti = eng.text_index(docs_path, "text")

    reps("q_idx_point", lambda i: eng.query(events, col("event_type") == "click").count())
    reps("q_idx_count_only", lambda i: eng.count(events, col("event_type") == "click"))
    reps("q_text_count", lambda i: ti.count("spark"))

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
