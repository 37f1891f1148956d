"""Interleaved single-JVM A/B harness for the r17 optimization candidates.

Usage: python tools/ab_r17.py <experiment> [reps]

Experiments:
  postings            old groupBy vs current row-local vs cheapened row-local
                      postings_for subplan, sf docs corpus (noop sink)
  postings_longdocs   same three shapes on a synthetic long-doc fixture
  cc                  connected_components plain vs pointer-doubling on the
                      bench-like near-dup star graph
  cc_chain            same two on a long-chain (large-diameter) fixture
  entropy             char_entropy old O(len*distinct) vs run-length restatement

Methodology (OPTIMIZATION_r16.md "Measurement setup"): interleaved variants
within ONE JVM, >=3 reps, min wall + per-rep JVM CPU-seconds; bench-like
session (local[$SPARK_GRAFT_CPUS], ReservedCodeCacheSize=512m, AQE on).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1").rstrip("/")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _jvm_cpu_s(pid):
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return None


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    exp = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"ab-r17-{exp}")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pid = int(spark._jvm.java.lang.ProcessHandle.current().pid())

    from elephant_twin_spark.functions.binding import let
    from elephant_twin_spark.operators import lifecycle
    from elephant_twin_spark.operators import text as text_mod
    from elephant_twin_spark.sources import fsio, tables

    work = f"/tmp/ets_ab_r17/{os.path.basename(SF_DIR)}"
    os.makedirs(work, exist_ok=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn, n=reps):
        walls, cpus = [], []
        for _ in range(n):
            c0 = _jvm_cpu_s(pid)
            t0 = time.perf_counter()
            with lifecycle.checkpoint_scope():
                fn()
            walls.append(time.perf_counter() - t0)
            c1 = _jvm_cpu_s(pid)
            cpus.append(round(c1 - c0, 2) if c0 is not None else None)
        print(
            f"{name:28s} wall min {min(walls):6.2f}s  walls "
            f"{[round(w, 2) for w in walls]}  cpu_s {cpus}",
            flush=True,
        )
        return min(walls)

    # ---------------- postings shapes ----------------
    def old_postings(df):
        from elephant_twin_spark.operators import layout

        src = df.select(
            F.col("doc_id"),
            F.col("text").alias("_text"),
            fsio.file_path_col(F.col("_metadata.file_path")).alias("file"),
        )
        src = layout.fan_out(src)
        toks = src.select(
            "doc_id", "file",
            F.posexplode(text_mod.whitespace_tokenizer(F.col("_text"))).alias(
                "pos", "term"
            ),
        )
        return toks.groupBy("term", "doc_id").agg(
            F.count(F.lit(1)).cast("int").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
            F.first("file").alias("file"),
        ).select("term", "doc_id", "tf", "positions", "file")

    def _cheap_groups(toks):
        """Cheapened row-local groups: terms/positions pre-projected once,
        positions by slice (no per-element element_at lambda)."""

        def with_sp(sp):
            n = F.size(sp)

            def with_terms(terms):
                def with_ps(ps):
                    def with_starts(starts):
                        ends = F.concat(
                            F.slice(starts, 2, F.size(starts) - 1), F.array(n + 1)
                        )
                        return F.zip_with(
                            starts,
                            ends,
                            lambda s, e: F.struct(
                                F.element_at(terms, s).alias("term"),
                                (e - s).cast("int").alias("tf"),
                                F.slice(ps, s, (e - s).cast("int")).alias("positions"),
                            ),
                        )

                    starts_expr = F.filter(
                        F.sequence(F.lit(1), n),
                        lambda i: (i == F.lit(1))
                        | (F.element_at(terms, i) != F.element_at(terms, i - 1)),
                    )
                    return let(starts_expr, with_starts)

                return let(F.transform(sp, lambda p: p["pos"]), with_ps)

            return let(F.transform(sp, lambda p: p["term"]), with_terms)

        pairs = F.zip_with(
            toks,
            F.sequence(F.lit(0), F.size(toks) - 1),
            lambda t, i: F.struct(t.alias("term"), i.alias("pos")),
        )
        return F.when(F.size(toks) > 0, let(F.array_sort(pairs), with_sp))

    def cheap_postings(df):
        from elephant_twin_spark.operators import layout

        src = df.select(
            F.col("doc_id"),
            F.col("text").alias("_text"),
            fsio.file_path_col(F.col("_metadata.file_path")).alias("file"),
        )
        src = layout.fan_out(src)
        g = src.select(
            "doc_id", "file",
            F.explode(
                _cheap_groups(text_mod.whitespace_tokenizer(F.col("_text")))
            ).alias("g"),
        )
        return g.select(
            F.col("g.term").alias("term"), "doc_id",
            F.col("g.tf").alias("tf"), F.col("g.positions").alias("positions"),
            "file",
        )

    if exp in ("postings", "postings_longdocs"):
        if exp == "postings":
            docs_multi = tables.materialize(
                spark, f"{SF_DIR}/documents.parquet", f"{work}/documents", CPUS
            )
            df = spark.read.parquet(docs_multi)
        else:
            longp = f"{work}/longdocs"
            if not os.path.exists(f"{longp}/_SUCCESS"):
                (
                    spark.range(4000)
                    .select(
                        F.col("id").alias("doc_id"),
                        F.concat_ws(
                            " ",
                            F.transform(
                                F.sequence(F.lit(1), F.lit(600)),
                                lambda i: F.concat(
                                    F.lit("w"),
                                    ((F.col("id") * 7 + i * 13) % 900).cast("string"),
                                ),
                            ),
                        ).alias("text"),
                    )
                    .repartition(CPUS)
                    .write.mode("overwrite")
                    .parquet(longp)
                )
            df = spark.read.parquet(longp)
        # warm-up
        noop(old_postings(df))
        noop(text_mod.postings_for(df, "text", "doc_id"))
        noop(cheap_postings(df))
        for r in range(reps):
            timed("old_groupby", lambda: noop(old_postings(df)), n=1)
            timed("cur_rowlocal", lambda: noop(text_mod.postings_for(df, "text", "doc_id")), n=1)
            timed("cheap_rowlocal", lambda: noop(cheap_postings(df)), n=1)
        # equivalence spot check
        a = old_postings(df)
        b = cheap_postings(df)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        print("cheap_rowlocal rows == old_groupby rows: OK")
        return

    # ---------------- LSH gate restatement ----------------
    if exp == "gate":
        from elephant_twin_spark import Engine
        from elephant_twin_spark.operators.pipeline import dedup

        docs_multi = tables.materialize(
            spark, f"{SF_DIR}/documents.parquet", f"{work}/documents", CPUS
        )
        docs = spark.read.parquet(docs_multi)
        eng = Engine(spark, f"{work}/index_root")
        eng.build_lsh_index(docs_multi, "text", "doc_id", num_perm=16, num_bands=4)
        idx = eng.lsh_index(docs_multi, "text")
        probe_docs = docs.limit(500).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" probe")).alias("text"),
        )

        def old_gate():
            return (
                idx.gate(probe_docs, "text", "doc_id", threshold=0.6)
                .where("is_near_dup")
                .count()
            )

        def new_gate():
            probe = idx._probe_bands(probe_docs, "text", "doc_id").withColumnsRenamed(
                {"id": "probe_id"}
            )
            probe = lifecycle.pin(probe, eager=False)
            hashes = [
                r["band_hash"]
                for r in probe.select("band_hash").distinct().take(4097)
            ]
            corpus_b = idx.bands().select(
                F.col("id").alias("corpus_id"), "band", "band_hash"
            )
            if len(hashes) <= 4096:
                corpus_b = corpus_b.where(F.col("band_hash").isin(hashes))
            cands = (
                probe.join(corpus_b, ["band", "band_hash"])
                .where(F.col("probe_id") != F.col("corpus_id"))
                .select("probe_id", "corpus_id")
                .distinct()
            )
            cands = lifecycle.pin(cands, eager=False)
            ids = [r[0] for r in cands.select("corpus_id").distinct().take(4097)]
            corpus = spark.read.parquet(docs_multi).select(
                F.col("doc_id").alias("corpus_id"), F.col("text").alias("_ctext")
            )
            if len(ids) <= 4096:
                corpus = corpus.where(F.col("corpus_id").isin(ids))
            else:
                corpus = corpus.join(
                    cands.select("corpus_id").distinct(), "corpus_id", "leftsemi"
                )
            probe_sh = probe_docs.select(
                F.col("doc_id").alias("probe_id"),
                dedup.word_shingles(F.col("text"), idx.shingle_k).alias("sh_a"),
            )
            corpus_sh = corpus.select(
                "corpus_id",
                dedup.word_shingles(F.col("_ctext"), idx.shingle_k).alias("sh_b"),
            )
            verified = (
                cands.join(probe_sh, "probe_id")
                .join(corpus_sh, "corpus_id")
                .withColumn(
                    "jaccard",
                    F.size(F.array_intersect("sh_a", "sh_b"))
                    / F.size(F.array_union("sh_a", "sh_b")),
                )
                .where(F.col("jaccard") >= 0.6)
                .groupBy("probe_id")
                .agg(F.min("corpus_id").alias("dup_of"))
            )
            out = probe_docs.join(
                verified.withColumnsRenamed({"probe_id": "doc_id"}), "doc_id", "left"
            ).withColumn("is_near_dup", F.col("dup_of").isNotNull())
            return out.where("is_near_dup").count()

        sc = spark.sparkContext
        a = old_gate()
        b = new_gate()
        assert a == b, (a, b)
        tracker = sc.statusTracker()
        for tag, fn in (("old_gate_jobs", old_gate), ("new_gate_jobs", new_gate)):
            sc.setJobGroup(tag, tag)
            with lifecycle.checkpoint_scope():
                fn()
            sc.setJobGroup("idle", "idle")
            print(f"{tag}: {len(tracker.getJobIdsForGroup(tag))} jobs", flush=True)
        for r in range(reps):
            timed("old_gate", old_gate, n=1)
            timed("new_gate", new_gate, n=1)
        return

    # ---------------- LSH gate: collected-probe restatement ----------------
    if exp == "gate2":
        from elephant_twin_spark import Engine
        from elephant_twin_spark.operators.pipeline import dedup

        docs_multi = tables.materialize(
            spark, f"{SF_DIR}/documents.parquet", f"{work}/documents", CPUS
        )
        docs = spark.read.parquet(docs_multi)
        eng = Engine(spark, f"{work}/index_root")
        eng.build_lsh_index(docs_multi, "text", "doc_id", num_perm=16, num_bands=4)
        idx = eng.lsh_index(docs_multi, "text")
        probe_docs = docs.limit(500).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" probe")).alias("text"),
        )

        def old_gate():
            return (
                idx.gate(probe_docs, "text", "doc_id", threshold=0.6)
                .where("is_near_dup")
                .count()
            )

        def collected_gate(lazy_cands=False):
            # ONE action collects the probe band table (bounded:
            # |probe| x num_bands); hash IN-list derived locally and the
            # probe side becomes a local-relation broadcast join
            probe_df = idx._probe_bands(probe_docs, "text", "doc_id")
            rows = probe_df.take(4097)
            assert len(rows) <= 4096
            local_probe = spark.createDataFrame(rows, probe_df.schema).withColumnsRenamed(
                {"id": "probe_id"}
            )
            hashes = sorted({r["band_hash"] for r in rows})
            corpus_b = idx.bands().select(
                F.col("id").alias("corpus_id"), "band", "band_hash"
            ).where(F.col("band_hash").isin(hashes))
            cands = (
                local_probe.join(corpus_b, ["band", "band_hash"])
                .where(F.col("probe_id") != F.col("corpus_id"))
                .select("probe_id", "corpus_id")
                .distinct()
            )
            cands = lifecycle.pin(cands, eager=not lazy_cands)
            corpus = spark.read.parquet(docs_multi).select(
                F.col("doc_id").alias("corpus_id"), F.col("text").alias("_ctext")
            )
            probe_sh = probe_docs.select(
                F.col("doc_id").alias("probe_id"),
                dedup.word_shingles(F.col("text"), idx.shingle_k).alias("sh_a"),
            )
            corpus_sh = corpus.join(
                F.broadcast(cands.select("corpus_id").distinct()), "corpus_id", "leftsemi"
            ).select(
                "corpus_id",
                dedup.word_shingles(F.col("_ctext"), idx.shingle_k).alias("sh_b"),
            )
            verified = (
                cands.join(probe_sh, "probe_id")
                .join(corpus_sh, "corpus_id")
                .withColumn(
                    "jaccard",
                    F.size(F.array_intersect("sh_a", "sh_b"))
                    / F.size(F.array_union("sh_a", "sh_b")),
                )
                .where(F.col("jaccard") >= 0.6)
                .groupBy("probe_id")
                .agg(F.min("corpus_id").alias("dup_of"))
            )
            out = probe_docs.join(
                verified.withColumnsRenamed({"probe_id": "doc_id"}), "doc_id", "left"
            ).withColumn("is_near_dup", F.col("dup_of").isNotNull())
            return out.where("is_near_dup").count()

        sc = spark.sparkContext
        a = old_gate()
        b = collected_gate()
        c = collected_gate(lazy_cands=True)
        assert a == b == c, (a, b, c)
        tracker = sc.statusTracker()
        for tag, fn in (
            ("old_gate_jobs", old_gate),
            ("collected_jobs", collected_gate),
            ("collected_lazy_jobs", lambda: collected_gate(lazy_cands=True)),
        ):
            sc.setJobGroup(tag, tag)
            with lifecycle.checkpoint_scope():
                fn()
            sc.setJobGroup("idle", "idle")
            print(f"{tag}: {len(tracker.getJobIdsForGroup(tag))} jobs", flush=True)
        for r in range(reps):
            timed("old_gate", old_gate, n=1)
            timed("collected", collected_gate, n=1)
            timed("collected_lazy", lambda: collected_gate(lazy_cands=True), n=1)
        return

    # ---------------- connected components ----------------
    def cc_plain(pairs):
        from elephant_twin_spark.operators.pipeline import dedup

        out = dedup.connected_components(pairs)
        n = out.count()
        lifecycle.release(out)
        return n

    def cc_doubling(pairs):
        out = _cc_doubling_impl(pairs, F, lifecycle)
        n = out.count()
        lifecycle.release(out)
        return n

    if exp in ("cc", "cc_chain"):
        from elephant_twin_spark.operators.pipeline import dedup

        if exp == "cc":
            docs_multi = tables.materialize(
                spark, f"{SF_DIR}/documents.parquet", f"{work}/documents", CPUS
            )
            docs = spark.read.parquet(docs_multi)
            pairs = lifecycle.pin(
                dedup.minhash_near_dup_pairs(
                    docs, "text", "doc_id", num_perm=16, num_bands=4,
                    threshold=0.7, edge_mode="star",
                ),
                escape=True,
            )
        else:
            pairs = lifecycle.pin(
                spark.range(3000)
                .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
                .repartition(CPUS),
                escape=True,
            )
        a = cc_plain(pairs)
        b = cc_doubling(pairs)
        assert a == b, (a, b)
        for r in range(reps):
            timed("cc_plain", lambda: cc_plain(pairs), n=1)
            timed("cc_doubling", lambda: cc_doubling(pairs), n=1)
        # result equality (full rows)
        ra = dedup.connected_components(pairs)
        rb = _cc_doubling_impl(pairs, F, lifecycle)
        assert ra.exceptAll(rb).count() == 0 and rb.exceptAll(ra).count() == 0
        print("cc rows identical: OK")
        return

    # ---------------- char entropy ----------------
    if exp == "entropy":
        from elephant_twin_spark.operators.pipeline import textstats

        docs_multi = tables.materialize(
            spark, f"{SF_DIR}/documents.parquet", f"{work}/documents", CPUS
        )
        df = spark.read.parquet(docs_multi)

        def new_entropy(d):
            def body(ch):
                n = F.size(ch)

                def with_sorted(sc):
                    def with_starts(starts):
                        ends = F.concat(
                            F.slice(starts, 2, F.size(starts) - 1), F.array(n + 1)
                        )
                        counts = F.zip_with(starts, ends, lambda s, e: e - s)
                        return F.aggregate(
                            counts,
                            F.lit(0.0),
                            lambda acc, k: acc + (k / n) * F.log(k / n),
                        )

                    starts_expr = F.filter(
                        F.sequence(F.lit(1), n),
                        lambda i: (i == F.lit(1))
                        | (F.element_at(sc, i) != F.element_at(sc, i - 1)),
                    )
                    return let(starts_expr, with_starts)

                return let(F.array_sort(ch), with_sorted)

            ch = F.split(F.col("text"), "")
            return d.withColumn(
                "char_entropy",
                F.when(F.size(ch) == 0, F.lit(0.0)).otherwise(-let(ch, body)),
            )

        noop(textstats.char_entropy(df, "text"))
        noop(new_entropy(df))
        for r in range(reps):
            timed("entropy_old", lambda: noop(textstats.char_entropy(df, "text")), n=1)
            timed("entropy_new", lambda: noop(new_entropy(df)), n=1)
        # rounded-6 equality (the declared query's projection)
        old6 = textstats.char_entropy(df, "text").select(
            "doc_id", F.round("char_entropy", 6).alias("e")
        )
        new6 = new_entropy(df).select("doc_id", F.round("char_entropy", 6).alias("e"))
        bad = (
            old6.alias("a").join(new6.alias("b"), "doc_id")
            .where(~F.expr("a.e <=> b.e")).count()
        )
        print(f"round-6 mismatches old vs new: {bad}")
        return

    raise SystemExit(f"unknown experiment {exp!r}")


def _cc_doubling_impl(pairs, F, lifecycle):
    """Min-label propagation + pointer doubling (label <- min(label,
    label[label]) each round): O(log d) rounds instead of O(d)."""
    edges = (
        pairs.select(F.col("id_a").alias("s"), F.col("id_b").alias("d"))
        .where(F.col("s") != F.col("d"))
        .distinct()
    )
    edges = lifecycle.pin(
        edges.union(edges.select(F.col("d").alias("s"), F.col("s").alias("d")))
    )
    labels = lifecycle.pin(
        edges.select(F.col("s").alias("node")).distinct().withColumn("comp", F.col("node"))
    )

    def label_sum(l):
        return l.agg(F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")).first()["s"]

    prev_sum = label_sum(labels)
    for _ in range(60):
        nbr_min = edges.join(labels, edges.d == labels.node).select(
            F.col("s").alias("node"), "comp"
        )
        half = labels.unionByName(nbr_min).groupBy("node").agg(
            F.min("comp").alias("comp")
        )
        # pointer doubling: comp <- min(comp, prev_labels[comp]) — the hop
        # reads the PREVIOUS round's checkpointed labels so the expensive
        # groupBy above is not evaluated once per join side; any label a
        # hop returns is a node reachable from comp, so labels stay
        # monotone and the fixpoint is unchanged
        hop = labels.select(F.col("node").alias("_n2"), F.col("comp").alias("_c2"))
        new = lifecycle.pin(
            half.join(hop, half.comp == hop._n2, "left")
            .select("node", F.least("comp", F.coalesce("_c2", "comp")).alias("comp")),
            eager=False,
            escape=True,
        )
        new_sum = label_sum(new)
        converged = new_sum == prev_sum
        prev_sum = new_sum
        lifecycle.release(labels)
        labels = new
        if converged:
            break
    lifecycle.release(edges)
    return labels.select("node", F.col("comp").alias("component"))


if __name__ == "__main__":
    main()
