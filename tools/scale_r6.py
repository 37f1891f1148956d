"""r6 new-operator scale runs: scd2_merge with a FIXED batch against a
growing history (the probe-proportional claim), and source_overlap_matrix
at 10x corpus (the one-pass claim).

Usage: python tools/scale_r6.py
Prints one line per (operator, scale, rep).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

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

    from elephant_twin_spark.operators import lifecycle, temporal
    from elephant_twin_spark.operators.pipeline import dedup
    from elephant_twin_spark.sources import tables

    work = "/tmp/ets_scale_r6"
    ev_path = tables.materialize(
        spark, "/root/testdata/sf0.1/events.parquet", f"{work}/events", 32
    )
    ev = spark.read.parquet(ev_path)
    docs_path = tables.materialize(
        spark, "/root/testdata/sf0.1/documents.parquet", f"{work}/documents", 32
    )
    docs = spark.read.parquet(docs_path)
    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count().collect()

    # ---- scd2_merge: fixed batch (last day), history 1x vs 10x
    # (10x = jittered user-id replicas — 10x the KEYS, 10x the history
    # rows, same batch)
    batch = ev.where(F.col("ts") >= F.lit("2024-01-30").cast("timestamp"))
    prefix = ev.where(F.col("ts") < F.lit("2024-01-30").cast("timestamp"))
    for scale, mult in (("1x", 1), ("10x", 10)):
        if mult == 1:
            pre = prefix
        else:
            pre = prefix.crossJoin(
                spark.range(mult).select(F.col("id").alias("_rep"))
            ).select(
                (F.col("user_id") + F.col("_rep") * 1_000_000).alias("user_id"),
                "ts", "event_type", "event_id",
            )
        hist_path = f"{work}/hist_{scale}"
        if not os.path.exists(f"{hist_path}/_SUCCESS"):
            temporal.scd2_intervals(
                pre, ["user_id"], "ts", ["event_type"], tiebreak=["event_id"]
            ).write.mode("overwrite").parquet(hist_path)
        hist = spark.read.parquet(hist_path)
        n_hist = hist.count()
        for rep in range(2):
            t0 = time.perf_counter()
            with lifecycle.checkpoint_scope():
                n = temporal.scd2_merge(
                    hist, batch, ["user_id"], "ts", ["event_type"],
                    tiebreak=["event_id"],
                ).count()
            print(
                f"scd2_merge {scale}: history={n_hist} merged={n} "
                f"rep{rep}={time.perf_counter()-t0:.2f}s",
                flush=True,
            )

    # ---- source_overlap_matrix at 1x vs 10x corpus
    for scale, mult in (("1x", 1), ("10x", 10)):
        if mult == 1:
            d = docs
        else:
            d = docs.crossJoin(
                spark.range(mult).select(F.col("id").alias("_rep"))
            ).select(
                (F.col("doc_id") + F.col("_rep") * 10_000_000).alias("doc_id"),
                "text",
                F.concat(F.lit("src"), (F.col("_rep") * 20).cast("string")).alias("source"),
            )
        heads = d.select(F.substring("text", 1, 40).alias("h"), "source")
        for rep in range(2):
            t0 = time.perf_counter()
            n = dedup.source_overlap_matrix(heads, "h", "source").count()
            print(
                f"source_overlap {scale}: cells={n} "
                f"rep{rep}={time.perf_counter()-t0:.2f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
