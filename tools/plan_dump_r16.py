"""Dump `.explain("formatted")` plans for the r16-optimization bench keys
into plans/r16/<key>_<tag>.txt (tag = before/after).

Usage: python tools/plan_dump_r16.py <tag> [key ...]
Runs at sf0.01 by default (plan SHAPE is SF-independent; the bench's
multi-file materialized copies are reproduced so fan-out guards and
metadata columns resolve exactly as they do in bench.py).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = set(sys.argv[2:])
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01").rstrip("/")
OUT_DIR = os.path.join(REPO, "plans", "r16")


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from elephant_twin_spark import Engine, col
    from elephant_twin_spark.operators import temporal as temporal_mod
    from elephant_twin_spark.operators import text as text_mod
    from elephant_twin_spark.operators.pipeline import (
        clean as clean_mod,
        decontaminate,
        dedup,
        mixture,
        textstats,
    )
    from elephant_twin_spark.sources import tables

    work = f"/tmp/ets_plans_r16_{TAG}"
    events = tables.materialize(spark, f"{SF_DIR}/events.parquet", f"{work}/events", 32)
    docs_path = f"{SF_DIR}/documents.parquet"
    docs_multi = tables.materialize(spark, docs_path, f"{work}/documents", 32)
    docs = spark.read.parquet(docs_multi)
    orders = tables.load_sf_table(spark, SF_DIR, "orders")
    eng = Engine(spark, f"{work}/index_root")

    plans: dict[str, object] = {}

    # --- dedup family (bench keys q_minhash_lsh / q_near_dup_clusters*)
    plans["q_minhash_lsh"] = lambda: dedup.minhash_near_dup_pairs(
        docs, "text", "doc_id", num_perm=16, num_bands=4, threshold=0.7
    )
    plans["q_near_dup_clusters"] = lambda: dedup.near_dup_clusters(
        docs, "text", "doc_id", num_perm=16, num_bands=4, threshold=0.7,
        edge_mode="all_pairs",
    )
    plans["q_simhash"] = lambda: dedup.simhash64(docs, "text", "doc_id")
    plans["q_dedup_exact"] = lambda: dedup.exact_dup_groups(docs, "text", "doc_id")
    plans["q_source_overlap"] = lambda: dedup.source_overlap_matrix(
        docs.select(F.substring("text", 1, 40).alias("head"), "source"), "head", "source"
    )

    # --- clean corpus audit aggregate (bench key q_clean_corpus)
    def _clean():
        from elephant_twin_spark.operators import lifecycle

        out = clean_mod.clean_corpus(docs, "text", "doc_id", near_dup=False)[1]
        df = out.groupBy("reason").count()
        return df

    plans["q_clean_corpus"] = _clean

    # --- text index build: the postings aggregate that feeds the
    # range-partitioned write (the expensive subplan of the build key)
    plans["build_text_index_docs_postings"] = lambda: text_mod.postings_for(
        spark.read.parquet(docs_path), "text", "doc_id"
    )

    # --- lsh gate (bench key q_lsh_gate)
    def _gate():
        eng.build_lsh_index(docs_multi, "text", "doc_id", num_perm=16, num_bands=4)
        lsh_idx = eng.lsh_index(docs_multi, "text")
        probe_docs = docs.limit(50).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" probe")).alias("text"),
        )
        return lsh_idx.gate(probe_docs, "text", "doc_id", threshold=0.6).where(
            "is_near_dup"
        )

    plans["q_lsh_gate"] = _gate

    # --- decontaminate (bench key q_decontaminate)
    plans["q_decontaminate"] = lambda: decontaminate.contamination_report(
        docs.where(F.col("doc_id") % 29 != 0),
        docs.where(F.col("doc_id") % 29 == 0),
        "text", "doc_id", n=5, parallelism=8,
    ).where("contaminated")

    # --- quality stats (bench key q_quality_stats)
    plans["q_quality_stats"] = lambda: textstats.quality_score(docs, "text").agg(
        F.avg("quality_score")
    )

    # --- scd2 merge (bench key q_scd2_merge)
    def _scd2_merge():
        ev_all = spark.read.parquet(events)
        _cut = F.lit("2024-01-30").cast("timestamp")
        hist = temporal_mod.scd2_intervals(
            ev_all.where(F.col("ts") < _cut), ["user_id"], "ts", ["event_type"],
            tiebreak=["event_id"],
        )
        return temporal_mod.scd2_merge(
            hist, ev_all.where(F.col("ts") >= _cut),
            ["user_id"], "ts", ["event_type"], tiebreak=["event_id"],
        )

    plans["q_scd2_merge"] = _scd2_merge

    # --- tpch large orders (bench key q_tpch_large_orders)
    def _tpch():
        lineitem = tables.load_sf_table(spark, SF_DIR, "lineitem")
        return (
            orders.join(
                lineitem.groupBy("l_orderkey")
                .agg(F.sum("l_quantity").alias("sum_qty"))
                .where(F.col("sum_qty") > 150),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(100)
        )

    plans["q_tpch_large_orders"] = _tpch

    # --- mixture resample (bench key q_mixture_resample)
    _mix_w = {"en": 0.5, "de": 0.15, "es": 0.15, "fr": 0.1, "zh": 0.1}
    plans["q_mixture_resample"] = lambda: mixture.mixture_resample(
        docs, "lang", _mix_w, "doc_id"
    )

    for name, mk in plans.items():
        if ONLY and name not in ONLY:
            continue
        try:
            df = mk()
            txt = formatted(df)
        except Exception as e:  # record the failure, keep dumping the rest
            txt = f"PLAN DUMP FAILED: {type(e).__name__}: {e}"
        path = os.path.join(OUT_DIR, f"{name}_{TAG}.txt")
        with open(path, "w") as f:
            f.write(txt + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
