"""10x scale runs for the r5 operators (SCD2, transitions, item-item
CF, Heaps slope, sq8 audit): events/docs at sf0.1 and a 10x jittered
replica, 2 reps each (rep 1 = warm steady state).

Usage: python tools/scale_r5.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS))
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from elephant_twin_spark.operators import kpi, temporal  # noqa: E402
from elephant_twin_spark.operators.pipeline import similarity, textstats  # noqa: E402
from elephant_twin_spark.operators.pipeline import ngrams as ngrams_mod  # noqa: E402
from elephant_twin_spark.operators.pipeline import stats as stats_mod  # noqa: E402
from elephant_twin_spark.sources import tables  # noqa: E402

ev1 = tables.load_sf_table(spark, SF_DIR, "events")
docs1 = tables.load_sf_table(spark, SF_DIR, "documents")
emb1 = tables.load_sf_table(spark, SF_DIR, "embeddings")

def times10(df, id_col):
    """10 jittered replicas with disjoint id spaces (keys multiply, so
    per-key partition width stays constant — the scale-up shape)."""
    span = df.agg(F.max(id_col)).collect()[0][0] + 1
    parts = [
        df.withColumn(id_col, F.col(id_col) + F.lit(i * span)) for i in range(10)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

ev10 = times10(ev1, "user_id").localCheckpoint()
docs10 = times10(docs1, "doc_id").localCheckpoint()
emb10 = times10(emb1, "vec_id").localCheckpoint()
print(f"events 1x={ev1.count()} 10x={ev10.count()}  docs 1x={docs1.count()} 10x={docs10.count()}")

CASES = {
    "scd2": lambda df: temporal.scd2_intervals(
        df, ["user_id"], "ts", ["event_type"], tiebreak=["event_id"]
    ).count(),
    "transitions": lambda df: kpi.transition_matrix(
        df, "user_id", "ts", "event_type", tiebreak="event_id"
    ).count(),
    "item_cf": lambda df: similarity.cooccurrence_cosine(
        df, "user_id", "event_type"
    ).count(),
    "psi_drift": lambda df: stats_mod.psi_drift(
        df.where(F.col("event_type") == "view"),
        df.where(F.col("event_type") == "purchase"), "value"
    ).count(),
    "ks_stat": lambda df: stats_mod.ks_statistic(
        df.where(F.col("event_type") == "view"),
        df.where(F.col("event_type") == "purchase"), "value"
    ).count(),
}
DOC_CASES = {
    "heaps": lambda df: textstats.heaps_slope(df, "text", "doc_id").count(),
    "novelty": lambda df: ngrams_mod.novelty_score(
        df.where(F.col("doc_id") % 10 != 0),
        df.where(F.col("doc_id") % 10 == 0), "text", "doc_id"
    ).count(),
    "epoch_shuffle": lambda df: __import__(
        "elephant_twin_spark.operators.pipeline.shard", fromlist=["shard"]
    ).epoch_shuffle(df.select("doc_id"), "doc_id", epoch=0, num_shards=8).count(),
}
EMB_CASES = {
    "sq8_stats": lambda df: similarity.scalar_quantize_stats(df, "embedding").count(),
}

def run(name, fn, small, big):
    for label, df in (("1x", small), ("10x", big)):
        walls = []
        for rep in range(2):
            t0 = time.time()
            n = fn(df)
            walls.append(time.time() - t0)
        print(f"{name:12s} {label:3s} rows={n:>9} rep0={walls[0]:6.2f}s rep1={walls[1]:6.2f}s")

for name, fn in CASES.items():
    run(name, fn, ev1, ev10)
for name, fn in DOC_CASES.items():
    run(name, fn, docs1, docs10)
for name, fn in EMB_CASES.items():
    run(name, fn, emb1, emb10)

# triangle count on md5 random graphs at 2 densities (edges ~ n^2 * p):
# the wedge stage is the quadratic-ish step; orientation bounds it
from elephant_twin_spark.operators.pipeline import graph as graph_mod

for n in (300, 1200):
    ids = spark.range(n).selectExpr("id AS a")
    pairs = ids.crossJoin(spark.range(n).selectExpr("id AS b")).where("a < b")
    edges = pairs.where(
        F.expr("CAST(conv(substring(md5(concat(a, ':', b)), 1, 8), 16, 10) AS LONG) % 20 = 0")
    ).selectExpr("a AS src", "b AS dst").localCheckpoint()
    m = edges.count()
    walls = []
    for rep in range(2):
        t0 = time.time()
        row = graph_mod.triangle_count(edges).collect()[0]
        walls.append(time.time() - t0)
    print(f"triangles n={n} m={m} tri={row['n_triangles']} rep0={walls[0]:.2f}s rep1={walls[1]:.2f}s")
spark.stop()
