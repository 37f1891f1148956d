"""r16 optimization probe: q_minhash_lsh solo, N reps, wall + JVM CPU +
GC time per rep, at a configurable driver heap. Usage:
python tools/probe_minhash_r16.py [heap] [reps] [key ...]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAP = sys.argv[1] if len(sys.argv) > 1 else "16g"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
KEYS = sys.argv[3:] or ["q_minhash_lsh"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1").rstrip("/")
CPUS = 32


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ets-probe-minhash")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", HEAP)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from elephant_twin_spark.operators import lifecycle
    from elephant_twin_spark.operators.pipeline import dedup
    from elephant_twin_spark.sources import tables

    jvm_pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())
    clk = os.sysconf("SC_CLK_TCK")

    def cpu_s():
        with open(f"/proc/{jvm_pid}/stat") as f:
            p = f.read().rsplit(")", 1)[1].split()
        return (int(p[11]) + int(p[12])) / clk

    def gc_ms():
        beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))

    work = "/tmp/ets_probe_mh"
    docs_multi = tables.materialize(
        spark, f"{SF_DIR}/documents.parquet", f"{work}/documents", CPUS
    )
    docs = spark.read.parquet(docs_multi)
    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count().collect()

    def q_minhash_lsh():
        return dedup.minhash_near_dup_pairs(
            docs, "text", "doc_id", num_perm=16, num_bands=4, threshold=0.7
        ).count()

    def q_near_dup_clusters():
        out = dedup.near_dup_clusters(
            docs, "text", "doc_id", num_perm=16, num_bands=4, threshold=0.7,
            edge_mode="all_pairs",
        )
        n = out.where("NOT is_canonical").count()
        lifecycle.release(out)
        return n

    def q_simhash():
        return dedup.simhash64(docs, "text", "doc_id").count()

    fns = {f.__name__: f for f in (q_minhash_lsh, q_near_dup_clusters, q_simhash)}
    for key in KEYS:
        fn = fns[key]
        print(f"== {key} heap={HEAP}")
        for i in range(REPS):
            c0, g0, t0 = cpu_s(), gc_ms(), time.perf_counter()
            with lifecycle.checkpoint_scope():
                out = fn()
            t1, c1, g1 = time.perf_counter(), cpu_s(), gc_ms()
            print(
                f"rep{i}: wall={t1 - t0:7.2f}s cpu={c1 - c0:8.1f}s "
                f"gc={(g1 - g0) / 1000:7.2f}s result={out}"
            )


if __name__ == "__main__":
    main()
