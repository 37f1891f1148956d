"""A/B the round-5 long-session checkpoint leak: run the checkpoint-heavy
dedup keys repeatedly in ONE JVM, with and without a checkpoint scope,
recording per-iteration wall time and block-manager storage.

Mode A (bare)  — r5 behavior: every localCheckpoint's blocks stay in the
                 block manager for the life of the session.
Mode B (scoped) — r6 behavior: `lifecycle.checkpoint_scope()` releases a
                 key's pinned blocks once its terminal action finishes.
                 Since r7, operator RESULTS are backed by checkpoints
                 that ESCAPE the scope (they must outlive it), so this
                 mode still accumulates one result checkpoint per iter.
Mode C (released) — r8 behavior: scoped + `lifecycle.release(result)`
                 after consumption; release walks the derived plan to
                 the escaped checkpoint, so storage stays flat.

Usage: python tools/checkpoint_leak_ab.py [sf_dir] [n_iters]
Prints one JSON line per (mode, iter) with {sec, n_rdds, mem_mb}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from elephant_twin_spark.operators import lifecycle
    from elephant_twin_spark.operators.pipeline import dedup
    from elephant_twin_spark.sources import tables

    work = f"/tmp/ets_leak_ab/{os.path.basename(SF_DIR)}"
    docs_multi = tables.materialize(
        spark, f"{SF_DIR}/documents.parquet", f"{work}/documents", 32
    )
    docs = spark.read.parquet(docs_multi)
    docs.limit(100).count()  # warm

    def key(release=False):
        # the two checkpoint-heavy bench keys: pair dump + clustering
        dedup.minhash_near_dup_pairs(
            docs, "text", "doc_id", num_perm=16, num_bands=4, threshold=0.7
        ).count()
        clusters = dedup.near_dup_clusters(
            docs, "text", "doc_id", num_perm=16, num_bands=4, threshold=0.7,
            edge_mode="star",
        )
        clusters.where("NOT is_canonical").count()
        if release:
            # frees the escaped CC-labels checkpoint through the
            # derived clusters plan (r8)
            lifecycle.release(clusters)

    for mode in ("bare", "scoped", "released"):
        for i in range(N):
            t0 = time.perf_counter()
            if mode in ("scoped", "released"):
                with lifecycle.checkpoint_scope():
                    key(release=(mode == "released"))
            else:
                key()
            dt = time.perf_counter() - t0
            snap = lifecycle.storage_snapshot(spark)
            print(
                json.dumps(
                    {
                        "mode": mode,
                        "iter": i,
                        "sec": round(dt, 3),
                        "n_rdds": snap["n_rdds"],
                        "mem_mb": round(snap["mem_bytes"] / 1e6, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
