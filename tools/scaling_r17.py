"""r17 scaling-block evidence (r16 verdict item 7): low-core vs
high-core ratios measured at a scale where they reflect DATA
parallelism, not job-launch overhead.

The box's largest shipped SF is 0.1, where the r16 driver's 8-core
bench BEAT the 32-core one on total — every sub-second key is
scheduling-bound there. This script builds a ~32x replica of the two
big tables (documents, events; ids shifted per replica so key
cardinalities scale too) and times the DATA-BOUND operator subplans at
32 and 8 cores in fresh JVMs, noop sink, min over warm reps.

Usage:
  python tools/scaling_r17.py prepare           # build /tmp/ets_sfx8
  python tools/scaling_r17.py run <cpus>        # time the suite
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
FIX = "/tmp/ets_sfx32"
REPLICAS = 32


def session(cpus, name):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def prepare():
    from pyspark.sql import functions as F

    from elephant_twin_spark.sources import tables

    spark = session(32, "scaling-prepare")
    spark.sparkContext.setLogLevel("ERROR")
    docs = tables.load_raw(spark, f"{SRC}/documents.parquet")
    ev = tables.load_raw(spark, f"{SRC}/events.parquet")
    d_parts = []
    e_parts = []
    for k in range(REPLICAS):
        d_parts.append(
            docs.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                *[c for c in docs.columns if c != "doc_id"],
            )
        )
        e_parts.append(
            ev.select(
                (F.col("event_id") + k * 100_000_000).alias("event_id"),
                (F.col("user_id") + k * 1_000_000).alias("user_id"),
                *[c for c in ev.columns if c not in ("event_id", "user_id")],
            )
        )
    big_docs = d_parts[0]
    for p in d_parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_ev = e_parts[0]
    for p in e_parts[1:]:
        big_ev = big_ev.unionByName(p)
    big_docs.repartition(32).write.mode("overwrite").parquet(f"{FIX}/documents")
    big_ev.repartition(32).write.mode("overwrite").parquet(f"{FIX}/events")
    print(
        "prepared:",
        spark.read.parquet(f"{FIX}/documents").count(),
        "docs,",
        spark.read.parquet(f"{FIX}/events").count(),
        "events",
    )
    spark.stop()


def run(cpus):
    from pyspark.sql import functions as F

    from elephant_twin_spark.operators import build, lifecycle
    from elephant_twin_spark.operators import text as text_mod
    from elephant_twin_spark.operators.pipeline import dedup, textstats

    spark = session(cpus, f"scaling-run-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())

    def cpu_s():
        with open(f"/proc/{pid}/stat") as f:
            p = f.read().rsplit(")", 1)[1].split()
        return (int(p[11]) + int(p[12])) / os.sysconf("SC_CLK_TCK")

    docs = spark.read.parquet(f"{FIX}/documents")
    ev = spark.read.parquet(f"{FIX}/events")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # the data-bound suite: each item is (name, thunk) over the big fixture
    suite = [
        (
            "simhash",
            lambda: noop(dedup.simhash64(docs, "text", "doc_id")),
        ),
        (
            "text_postings",
            lambda: noop(text_mod.postings_for(docs, "text", "doc_id")),
        ),
        (
            "quality_features",
            lambda: noop(textstats.quality_features(docs, "text")),
        ),
        (
            "block_postings",
            lambda: noop(build.postings_for(ev, "event_type")),
        ),
        (
            "events_agg",
            lambda: noop(
                ev.groupBy("event_type").agg(
                    F.count(F.lit(1)), F.avg("value"), F.approx_count_distinct("user_id")
                )
            ),
        ),
        (
            "minhash_pairs",
            lambda: noop(
                dedup.minhash_signatures(
                    docs.where(F.col("doc_id") % 16 == 0), "text", "doc_id", num_perm=16
                )
            ),
        ),
    ]
    for name, fn in suite:
        walls, cpus_l = [], []
        for _ in range(5):
            c0 = cpu_s()
            t0 = time.perf_counter()
            with lifecycle.checkpoint_scope():
                fn()
            walls.append(round(time.perf_counter() - t0, 2))
            cpus_l.append(round(cpu_s() - c0, 2))
        print(
            f"SCALING cpus={cpus} {name:18s} wall_min {min(walls):6.2f} "
            f"walls {walls} cpu {cpus_l}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "prepare":
        prepare()
    else:
        run(int(sys.argv[2]))
