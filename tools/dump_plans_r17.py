"""Dump .explain("formatted") plans for the r17-touched paths.

Usage: python tools/dump_plans_r17.py <before|after> <out_dir>

Run once from the r16-HEAD worktree (`before`) and once from the r17
tree (`after`); sys.path[0] is the repo containing this script, so each
run explains the plans of ITS OWN tree. Plans dumped:

  q_lsh_gate            gate verify tree (r17: bounded candidate-id IN
                        pushdown into the corpus scan vs the r16
                        unconditional broadcast semi join)
  candidate_pairs_bloom candidate_pairs with a probe over
                        pushdown_limit (r17: Bloom row-prefilter on the
                        bucket scans vs the silent plain join)
  cc_round              one representative label-propagation round at
                        it >= hop_after (r17: + pointer-doubling hop
                        join over the previous checkpointed labels);
                        restated from the loop body because the loop
                        runs its rounds eagerly inside the operator
  scd2_merge_validated  validated merge (r17: probe + replay share one
                        pinned touched slice vs two history passes)
  build_postings / build_zones / build_bloom
                        index-build aggregations (r17: file-path
                        canonicalization per output group, after the
                        aggregate, vs per input row under it)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODE = sys.argv[1]
OUT = sys.argv[2]
os.makedirs(OUT, exist_ok=True)

SF_DIR = "/root/testdata/sf0.01"


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"dump-plans-r17-{MODE}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from elephant_twin_spark import Engine
    from elephant_twin_spark.operators import build, lifecycle, temporal
    from elephant_twin_spark.operators.pipeline import dedup
    from elephant_twin_spark.sources import tables

    work = f"/tmp/ets_plans_r17/{MODE}"
    docs_path = tables.materialize(
        spark, f"{SF_DIR}/documents.parquet", f"{work}/documents", 8
    )
    events_path = tables.materialize(
        spark, f"{SF_DIR}/events.parquet", f"{work}/events", 8
    )
    docs = spark.read.parquet(docs_path)
    events = spark.read.parquet(events_path)

    def dump(name, df):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"{OUT}/{name}_{MODE}.txt", "w") as f:
            f.write(plan)
        print("dumped", name, flush=True)

    # ---- LSH gate + candidate_pairs --------------------------------
    eng = Engine(spark, f"{work}/idx_root")
    eng.build_lsh_index(docs_path, "text", "doc_id", num_perm=16, num_bands=4)
    idx = eng.lsh_index(docs_path, "text")
    probes = docs.limit(200).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" probe")).alias("text"),
    )
    with lifecycle.checkpoint_scope():
        dump("q_lsh_gate", idx.gate(probes, "text", "doc_id", threshold=0.5))
        # above-pushdown-limit candidate path: before = silent plain
        # join, after = Bloom row-prefilter on the bucket scans
        dump(
            "candidate_pairs_bloom",
            idx.candidate_pairs(probes, "text", "doc_id", pushdown_limit=1),
        )

    # ---- one CC round (restated loop body) -------------------------
    pairs = spark.range(500).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    edges = (
        pairs.select(F.col("id_a").alias("s"), F.col("id_b").alias("d"))
        .where(F.col("s") != F.col("d"))
        .distinct()
    )
    edges = lifecycle.pin(
        edges.union(edges.select(F.col("d").alias("s"), F.col("s").alias("d")))
    )
    labels = lifecycle.pin(
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    nbr_min = edges.join(labels, edges.d == labels.node).select(
        F.col("s").alias("node"), "comp"
    )
    half = (
        labels.unionByName(nbr_min).groupBy("node").agg(F.min("comp").alias("comp"))
    )
    if MODE == "after":  # round it >= hop_after: + the doubling hop
        hop = labels.select(F.col("node").alias("_hn"), F.col("comp").alias("_hc"))
        half = half.join(hop, half.comp == hop._hn, "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce("_hc", "comp")).alias("comp"),
        )
    dump("cc_round", half)
    lifecycle.release(labels)
    lifecycle.release(edges)

    # ---- validated scd2_merge --------------------------------------
    ev = tables.load_raw(spark, f"{SF_DIR}/events.parquet")
    cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp")
    with lifecycle.checkpoint_scope():
        hist = temporal.scd2_intervals(
            ev.where(F.col("ts") < cutoff), ["user_id"], "ts", ["event_type"],
            tiebreak=["event_id"], carry_last_ts=True,
        )
        merged = temporal.scd2_merge(
            hist, ev.where(F.col("ts") >= cutoff), ["user_id"], "ts",
            ["event_type"], tiebreak=["event_id"], validate=True,
        )
        dump("scd2_merge_validated", merged)

    # ---- index-build aggregations ----------------------------------
    dump("build_postings", build.postings_for(events, "event_type"))
    dump("build_zones", build.zones_for(events, "ts"))
    dump("build_bloom", build.bloom_sketch_for(events, "user_id"))

    spark.stop()


if __name__ == "__main__":
    main()
