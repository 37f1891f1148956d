"""Generate PLANS.md — formatted physical plans for the headline
operators, the `.explain("formatted")` discipline as a reviewable
artifact. Run: python tools/plan_report.py [sf_dir]"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = (sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001").rstrip("/")


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from elephant_twin_spark import Engine, col
    from elephant_twin_spark.operators import temporal
    from elephant_twin_spark.operators.pipeline import dedup, similarity
    from elephant_twin_spark.sources import tables

    work = "/tmp/ets_plans"
    events = tables.materialize(spark, f"{SF_DIR}/events.parquet", f"{work}/events")
    eng = Engine(spark, f"{work}/idx")
    eng.build_index(events, "event_type", num_buckets=4)

    ev = tables.load_raw(spark, f"{SF_DIR}/events.parquet")
    emb = tables.load_raw(spark, f"{SF_DIR}/embeddings.parquet")
    docs = tables.load_raw(spark, f"{SF_DIR}/documents.parquet")

    sections = []

    sections.append(
        (
            "Index-pruned scan + residual filter",
            "`eng.query(events, event_type == 'click' AND value > 5)` — file list "
            "pre-pruned by postings; EqualTo AND GreaterThan both pushed to parquet; "
            "full predicate re-checked per row.",
            eng.query(events, (col("event_type") == "click") & (col("value") > 5)),
        )
    )

    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    sections.append(
        (
            "As-of join (single shuffle, no Join operator)",
            "union + last(ignorenulls) window — ONE Exchange total.",
            temporal.asof_join(purchases, clicks, ["user_id"], "ts", "click_ts", ["click_ts"]),
        )
    )

    q = [0.1] * emb.select(F.size("embedding").alias("d")).first()["d"]
    sections.append(
        (
            "Brute-force cosine top-k (no shuffle)",
            "TakeOrderedAndProject over a narrow map — scales linearly, no Exchange.",
            similarity.cosine_topk(emb, "embedding", "vec_id", q, k=10),
        )
    )

    sections.append(
        (
            "Exact dedup groups (map-side combined)",
            "partial aggregation before the single hash Exchange.",
            dedup.exact_dup_groups(docs, "text", "doc_id"),
        )
    )

    books = similarity.pq_fit(emb, "embedding", "vec_id", m=4, k=8, max_iter=1)
    codes = similarity.pq_encode(emb, "embedding", "vec_id", books)
    sections.append(
        (
            "PQ ADC top-k (lookup tables, no shuffle)",
            "per-row distance = m array lookups against driver-precomputed "
            "query tables; TakeOrderedAndProject over the compressed codes.",
            similarity.pq_topk(codes, q, books, k=10),
        )
    )

    li = tables.load_raw(spark, f"{SF_DIR}/lineitem.parquet")
    part = tables.load_raw(spark, f"{SF_DIR}/part.parquet")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & F.col("l_quantity").between(10, 20))
    )
    sections.append(
        (
            "Disjunctive join predicate stays an equi-join (TPC-H Q19 shape)",
            "Catalyst extracts the common partkey conjunct from the OR-of-ANDs; "
            "the disjunction rides as a post-join filter, never a nested loop.",
            j.where(cond).agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))),
        )
    )

    eng.build_text_index(f"{SF_DIR}/documents.parquet", "text", "doc_id")
    ti = eng.text_index(f"{SF_DIR}/documents.parquet", "text")
    sections.append(
        (
            "MoreLikeThis (pruned postings + precomputed norms)",
            "one In-filtered postings read (term bucket pruning), map-literal "
            "query weights, join to the tiny doclens norms table, top-k.",
            ti.more_like_this(7, k=10),
        )
    )

    lsh_src = f"{SF_DIR}/documents.parquet"
    eng.build_lsh_index(lsh_src, "text", "doc_id", num_perm=8, num_bands=4, shingle_k=2)
    lsh = eng.lsh_index(lsh_src, "text")
    probe = docs.limit(50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    sections.append(
        (
            "LSH near-dup gate (bucket join, probe-sized join work)",
            "probe bands equi-join the persisted bucket table on "
            "(band, band_hash); exact Jaccard runs only on collisions, against "
            "a semi-join-bounded slice of the corpus. The bands/corpus scans "
            "themselves are full-table reads (row-bounded by the joins, not "
            "I/O-bounded) — only the join/verify work is probe-sized.",
            lsh.gate(probe, "text", "doc_id", threshold=0.5),
        )
    )

    from elephant_twin_spark.functions import sketches
    from elephant_twin_spark.operators.pipeline import curriculum, stats

    toks = docs.select(F.explode(F.split(F.col("text"), r"\s+")).alias("term"))
    sections.append(
        (
            "Deterministic count-min sketch build (bounded output, map-side combined)",
            "depth× fan-out of the key column only, then ONE partial-aggregated "
            "hash Exchange; output ≤ depth×width rows however large the corpus.",
            sketches.cms_table(toks, "term", depth=3, width=1024),
        )
    )

    sections.append(
        (
            "Curriculum interleave (per-group window + broadcast group dim, no global sort)",
            "rank window partitioned by group; global position is ARITHMETIC "
            "(rank·n_groups + broadcast-joined group index) — the corpus-wide "
            "ordering costs one window Exchange, not a single-reducer sort.",
            curriculum.curriculum_interleave(docs, "doc_id", "n_chars", "lang"),
        )
    )

    sections.append(
        (
            "Paragraph dedup (span winner election, shuffles carry hashes not docs)",
            "posexplode → groupBy(span md5) winner election → left-semi join back "
            "→ per-doc reassembly; the wide shuffles carry (hash, id, pos) "
            "triples and surviving spans only.",
            dedup.paragraph_dedup(docs, "text", "doc_id"),
        )
    )

    sections.append(
        (
            "Quantile normalize (one window Exchange keyed by group)",
            "percent_rank over (group, value, id) — a single hash Exchange on "
            "the group key; deterministic ties via the id tiebreak.",
            stats.quantile_normalize(docs, "n_chars", "doc_id", "lang"),
        )
    )

    # bucketed co-located join: both sides bucketed on the key -> the
    # sort-merge join has NO Exchange below it
    from elephant_twin_spark.operators import layout

    orders = tables.load_sf_table(spark, SF_DIR, "orders")
    customer = tables.load_sf_table(spark, SF_DIR, "customer")
    layout.bucket_table(spark, orders, "ets_plans_o", ["o_custkey"], 8,
                        sort_cols=["o_custkey"], path=f"{work}/bkt_o")
    layout.bucket_table(spark, customer, "ets_plans_c", ["c_custkey"], 8,
                        sort_cols=["c_custkey"], path=f"{work}/bkt_c")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    o, c = spark.table("ets_plans_o"), spark.table("ets_plans_c")
    bkt_join = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    # render NOW, while broadcast is disabled (the shared formatting loop
    # below runs after the conf reset)
    sections.append(
        (
            "Bucketed co-located join (zero Exchange on the join)",
            "orders and customer both written `bucketBy(8, custkey)` + sorted "
            "within buckets — the SortMergeJoin consumes the bucket layout with "
            "no Exchange on either side (broadcast disabled to show the fact-fact "
            "path; per-bucket Sorts remain — Spark elides them only for "
            "single-file buckets — and the only Exchange is the final small "
            "groupBy).",
            formatted(bkt_join),
        )
    )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    sections.append(
        (
            "SCD2 changelog history (key-partitioned windows, one shuffle)",
            "change-flag lag window, running-sum run id, (key, run) aggregate "
            "and the lead window all hash on user_id — Catalyst reuses the one "
            "Exchange/Sort for every step.",
            temporal.scd2_intervals(ev, ["user_id"], "ts", ["event_type"],
                                    tiebreak=["event_id"]),
        )
    )

    out = ["# PLANS — formatted physical plans of headline operators",
           "",
           f"Generated by `tools/plan_report.py` at sf dir `{SF_DIR}`. These are the",
           "plan shapes `tests/test_plans.py` pins in CI.",
           ""]
    for title, blurb, df in sections:
        plan = df if isinstance(df, str) else formatted(df)
        out += [f"## {title}", "", blurb, "", "```", plan, "```", ""]

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
