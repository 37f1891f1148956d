"""Solo A/B: near_dup_clusters edge_mode star vs all_pairs (VERDICT r4 #1).

Run ONLY with nothing else on the box (bench noise discipline). Matches
bench.py config: local[$SPARK_GRAFT_CPUS], shuffle.partitions=CPUS,
multi-file docs copy, untimed warm-up; then N alternating reps of each
mode. Usage: python tools/ab_star.py [sf_dir] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS))
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

from elephant_twin_spark.operators.pipeline import dedup  # noqa: E402
from elephant_twin_spark.sources import tables  # noqa: E402

work = f"/tmp/ets_ab/{os.path.basename(SF_DIR)}"
os.makedirs(work, exist_ok=True)
docs_multi = tables.materialize(spark, f"{SF_DIR}/documents.parquet", f"{work}/documents", CPUS)
docs = spark.read.parquet(docs_multi)

# warm-up (same as bench.py)
spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
docs.limit(1000).count()

def run(mode):
    t0 = time.perf_counter()
    n = (
        dedup.near_dup_clusters(
            docs, "text", "doc_id", num_perm=16, num_bands=4, threshold=0.7,
            edge_mode=mode,
        )
        .where("NOT is_canonical")
        .count()
    )
    return round(time.perf_counter() - t0, 3), n

results = {"all_pairs": [], "star": []}
for rep in range(REPS):
    for mode in ("all_pairs", "star"):
        t, n = run(mode)
        results[mode].append(t)
        print(f"rep{rep} {mode:10s} {t:7.3f}s  non_canonical={n}", flush=True)

for mode, ts in results.items():
    print(f"{mode:10s} min={min(ts):.3f} med={sorted(ts)[len(ts)//2]:.3f} all={ts}")
