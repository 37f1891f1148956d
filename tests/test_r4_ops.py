"""Round-4 operators: deterministic count-min sketch, Zipf slope,
sentence stats, quantile normalization, MAD outliers, token
truncation, label centroids, curriculum interleave."""

import math

import pytest
from pyspark.sql import functions as F

from elephant_twin_spark.functions import sketches
from elephant_twin_spark.operators.pipeline import (
    chunk,
    curriculum,
    dedup,
    similarity,
    stats,
    textstats,
)
from elephant_twin_spark.sources import tables


@pytest.fixture(scope="module")
def docs(spark, docs_path):
    return tables.load_raw(spark, docs_path).cache()


# ------------------------------------------------- deterministic CMS

def test_cms_estimate_overcounts_never_undercounts(spark):
    rows = [("a",)] * 50 + [("b",)] * 20 + [("c",)] * 5 + [("d",)] * 1
    df = spark.createDataFrame(rows, "k string")
    sk = sketches.cms_table(df, "k", depth=3, width=64)
    # sketch is bounded by depth x width regardless of input size
    assert sk.count() <= 3 * 64
    keys = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("zz",)], "k string")
    est = {r["k"]: r["est_cnt"] for r in sketches.cms_estimate(keys, sk, "k", 3, 64).collect()}
    truth = {"a": 50, "b": 20, "c": 5, "d": 1, "zz": 0}
    for k, t in truth.items():
        assert est[k] >= t, (k, est[k], t)  # CMS never undercounts
    # with 4 keys in 64 buckets, collisions are unlikely: estimates exact
    assert est["a"] == 50 and est["b"] == 20


def test_cms_ignores_null_keys(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), (None,)], "k string")
    sk = sketches.cms_table(df, "k", depth=2, width=32)
    keys = spark.createDataFrame([("a",), (None,)], "k string")
    est = {r["k"]: r["est_cnt"] for r in sketches.cms_estimate(keys, sk, "k", 2, 32).collect()}
    assert est["a"] == 2  # NULLs never entered the sketch
    assert est[None] == 0


def test_cms_merge_is_sum(spark):
    a = spark.createDataFrame([("x",)] * 10, "k string")
    b = spark.createDataFrame([("x",)] * 7, "k string")
    sa, sb = sketches.cms_table(a, "k", 2, 32), sketches.cms_table(b, "k", 2, 32)
    merged = (
        sa.unionByName(sb)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    keys = spark.createDataFrame([("x",)], "k string")
    est = sketches.cms_estimate(keys, merged, "k", 2, 32).first()["est_cnt"]
    assert est == 17


# --------------------------------------------------------- KMV sketch

def test_kmv_estimate_accuracy_and_saturation(spark):
    # 1000 distinct values: k=64 estimate within ~25% (1/sqrt(k) ≈ 12.5%)
    df = spark.createDataFrame([("g", i) for i in range(1000)], "key string, v long")
    syn = sketches.kmv_synopsis(df, "key", "v", k=64)
    est = sketches.kmv_estimate(syn, k=64).first()["distinct_est"]
    assert 750 <= est <= 1250, est
    # below-k keys are EXACT
    small = spark.createDataFrame([("s", i % 10) for i in range(100)], "key string, v long")
    s_est = sketches.kmv_estimate(sketches.kmv_synopsis(small, "key", "v", k=64), k=64)
    assert s_est.first()["distinct_est"] == 10.0


def test_kmv_merge_equals_direct_synopsis(spark):
    a = spark.createDataFrame([("g", i) for i in range(500)], "key string, v long")
    b = spark.createDataFrame([("g", i) for i in range(300, 900)], "key string, v long")
    both = a.unionByName(b)
    merged = sketches.kmv_merge(
        sketches.kmv_synopsis(a, "key", "v", k=32),
        sketches.kmv_synopsis(b, "key", "v", k=32),
        k=32,
    ).first()["hashes"]
    direct = sketches.kmv_synopsis(both, "key", "v", k=32).first()["hashes"]
    assert merged == direct  # exact mergeability


# -------------------------------------------------------- Zipf slope

def test_zipf_slope_on_synthetic_zipf(spark):
    # construct frequencies cnt(rank) = round(1000 / rank): slope ~ -1
    rows = []
    doc = []
    for rank in range(1, 51):
        doc.extend([f"w{rank:03d}"] * max(1, round(1000 / rank)))
    rows.append((1, "g", " ".join(doc)))
    df = spark.createDataFrame(rows, "id long, lang string, text string")
    out = textstats.zipf_slope(df, "text", "lang", top_n=50).first()
    assert out["n_terms"] == 50
    assert -1.1 < out["slope"] < -0.9, out["slope"]


def test_zipf_slope_uniform_is_flat(spark):
    text = " ".join([f"t{i}" for i in range(40)] * 5)  # every term freq 5
    df = spark.createDataFrame([(1, "g", text)], "id long, lang string, text string")
    out = textstats.zipf_slope(df, "text", "lang", top_n=40).first()
    assert abs(out["slope"]) < 1e-9


# ---------------------------------------------------- sentence stats

def test_sentence_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "One two three. Four five! Six?"),
            (2, "No terminator here"),
            (3, "!!!"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.sentence_stats(df, "text", "doc_id").collect()}
    assert out[1]["n_sentences"] == 3
    assert abs(out[1]["avg_sentence_words"] - 2.0) < 1e-9
    assert out[2]["n_sentences"] == 1 and abs(out[2]["avg_sentence_words"] - 3.0) < 1e-9
    assert out[3]["n_sentences"] == 0 and out[3]["avg_sentence_words"] is None
    assert out[4]["n_sentences"] == 0
    # NULL text is total
    df2 = spark.createDataFrame([(9, None)], "doc_id long, text string")
    r9 = textstats.sentence_stats(df2, "text", "doc_id").first()
    assert r9["n_sentences"] == 0 and r9["avg_sentence_words"] is None


# ----------------------------------------------- quantile_normalize

def test_quantile_normalize_bounds_and_fraction(spark, docs):
    out = stats.quantile_normalize(docs, "n_chars", "doc_id", "lang").cache()
    mm = out.agg(F.min("pct_rank"), F.max("pct_rank")).first()
    assert mm[0] == 0.0 and mm[1] == 1.0
    # same keep fraction per group under a percentile threshold
    kept = (
        out.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("pct_rank") >= 0.7).cast("long")).alias("k"),
        )
        .collect()
    )
    for r in kept:
        frac = r["k"] / r["n"]
        assert abs(frac - 0.3) < 0.05, (r["grp"], frac)
    out.unpersist()


# ----------------------------------------------------- MAD outliers

def test_mad_outliers_robust_to_one_extreme(spark):
    vals = [(i, "g", float(v)) for i, v in enumerate([10, 11, 12, 10, 11, 12, 10, 11, 1000])]
    df = spark.createDataFrame(vals, "id long, grp string, v double")
    r = stats.mad_outliers(df, "v", "grp", k=3.0).first()
    assert r["med"] == 11.0
    assert r["mad"] == 1.0
    assert r["n_outlier"] == 1  # only the 1000 — mean/stddev fences would drag


def test_mad_outliers_zero_mad(spark):
    df = spark.createDataFrame(
        [(i, "g", 5.0) for i in range(6)] + [(9, "g", 6.0)], "id long, grp string, v double"
    )
    r = stats.mad_outliers(df, "v", "grp", k=3.0).first()
    assert r["mad"] == 0.0 and r["n_outlier"] == 1


# -------------------------------------------------- truncate_tokens

def test_truncate_tokens(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in chunk.truncate_tokens(df, "text", "doc_id", 3).collect()}
    assert out[1]["text"] == "a b c" and out[1]["n_tokens"] == 3 and out[1]["truncated"]
    assert out[2]["text"] == "x y" and out[2]["n_tokens"] == 2 and not out[2]["truncated"]
    assert out[3]["n_tokens"] == 0 and not out[3]["truncated"]
    # NULL text is total: empty doc out, no NULL flags
    assert out[4]["n_tokens"] == 0 and not out[4]["truncated"] and out[4]["text"] == ""


# -------------------------------------------------- label centroids

def test_label_centroids_match_python(spark):
    rows = [
        (1, 0, [1.0, 2.0]),
        (2, 0, [3.0, 4.0]),
        (3, 1, [10.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    out = {(r["label"], r["pos"]): r["mean_val"] for r in similarity.label_centroids(df, "embedding", "label").collect()}
    assert out[(0, 0)] == 2.0 and out[(0, 1)] == 3.0
    assert out[(1, 0)] == 10.0 and out[(1, 1)] == 0.0


# -------------------------------------------- curriculum interleave

def test_curriculum_interleave_round_robin(spark):
    rows = []
    for g, n in (("en", 4), ("de", 3), ("fr", 2)):
        for i in range(n):
            rows.append((f"{g}{i}", g, float(n - i)))  # score desc by i
    df = spark.createDataFrame(rows, "id string, src string, score double")
    out = curriculum.curriculum_interleave(df, "id", "score", "src").collect()
    assert len({r["global_pos"] for r in out}) == len(rows)  # unique positions
    by_pos = sorted(out, key=lambda r: r["global_pos"])
    # first wave = rank-1 of every group, ordered by group index
    assert [r["grp"] for r in by_pos[:3]] == ["de", "en", "fr"]
    assert all(r["rank_in_group"] == 1 for r in by_pos[:3])
    # within a group, positions increase with rank (best first)
    for g in ("en", "de", "fr"):
        sub = sorted((r for r in out if r["grp"] == g), key=lambda r: r["rank_in_group"])
        poss = [r["global_pos"] for r in sub]
        assert poss == sorted(poss)
    # best-scored doc of each group is rank 1
    best = {r["id"]: r["rank_in_group"] for r in out}
    assert best["en0"] == 1 and best["de0"] == 1 and best["fr0"] == 1


def _ref_paragraph_dedup(rows, sep="\n\n"):
    """Sequential reference: global first-occurrence (min (id, pos))
    wins each distinct span; docs reassembled in original span order."""
    winner = {}
    for doc_id, text in sorted(rows):
        for pos, span in enumerate(text.split(sep)):
            if span not in winner:
                winner[span] = (doc_id, pos)
    out = {}
    for doc_id, text in rows:
        kept = [
            s for p, s in enumerate(text.split(sep)) if winner[s] == (doc_id, p)
        ]
        out[doc_id] = sep.join(kept)
    return out


def test_paragraph_dedup_matches_sequential_reference(spark):
    """Seeded random corpora with heavy cross-doc span duplication —
    the Spark winner-election plan must reproduce the sequential
    first-occurrence semantics exactly, including within-doc repeats
    and all-duplicate (emptied) docs."""
    import random

    rng = random.Random(1234)
    paras = [f"para {i} " + "x" * rng.randint(0, 5) for i in range(12)]
    for trial in range(3):
        rows = []
        for doc_id in range(30):
            n = rng.randint(1, 5)
            rows.append(
                (doc_id, "\n\n".join(rng.choice(paras) for _ in range(n)))
            )
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["text"]
            for r in dedup.paragraph_dedup(df, "text", "doc_id").collect()
        }
        assert got == _ref_paragraph_dedup(rows), f"trial {trial}"


def test_rrf_fuse_ranks_and_scores(spark):
    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "id long, rank int")
    b = spark.createDataFrame([(20, 1), (40, 2)], "id long, rank int")
    out = {r["id"]: r for r in similarity.rrf_fuse([a, b], k=60).collect()}
    # doc 20: in both lists (ranks 2 and 1)
    assert out[20]["n_lists"] == 2
    assert abs(out[20]["rrf_score"] - round(1 / 62 + 1 / 61, 6)) < 1e-9
    assert out[10]["n_lists"] == 1
    assert abs(out[10]["rrf_score"] - round(1 / 61, 6)) < 1e-9
    # consensus doc outranks every single-list doc here
    best = max(out.values(), key=lambda r: r["rrf_score"])
    assert best["id"] == 20
    # top limiting
    top1 = similarity.rrf_fuse([a, b], k=60, top=1).collect()
    assert len(top1) == 1 and top1[0]["id"] == 20


def test_curriculum_interleave_null_group_kept(spark):
    """A NULL group is a real group: its docs rank, join, and get
    positions (silently dropping unlabeled docs would be data loss)."""
    rows = [("a1", "en", 2.0), ("a2", "en", 1.0), ("b1", None, 5.0), ("b2", None, 4.0)]
    df = spark.createDataFrame(rows, "id string, src string, score double")
    out = {r["id"]: r for r in curriculum.curriculum_interleave(df, "id", "score", "src").collect()}
    assert set(out) == {"a1", "a2", "b1", "b2"}  # nothing dropped
    assert out["b1"]["rank_in_group"] == 1 and out["b2"]["rank_in_group"] == 2
    assert len({r["global_pos"] for r in out.values()}) == 4  # unique positions


def test_write_curriculum_layout(spark, workdir, docs):
    path = f"{workdir}/curriculum"
    curriculum.write_curriculum(
        docs.limit(100), path, "doc_id", "n_chars", "lang", num_files=4
    )
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert "global_pos" in back.columns


def test_kmv_bounded_build_bitwise_equals_window_build(spark):
    """r5 rebuild (per-partition bounded top-k + re-min merge) must
    produce the IDENTICAL synopsis to the r4 window formulation —
    the sketch contract is exact k-smallest distinct hashes."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from elephant_twin_spark.functions import sketches

    df = (
        spark.range(20_000)
        .select(
            (F.col("id") % 7).cast("string").alias("key"),
            (F.col("id") % 3001).alias("v"),
        )
        .repartition(16)  # several partitions so the partial stage matters
    )
    got = {
        r["key"]: r["hashes"]
        for r in sketches.kmv_synopsis(df, "key", "v", k=64).collect()
    }
    # reference: the old one-window-per-key formulation
    pairs = (
        df.where(F.col("v").isNotNull())
        .select(F.col("key"), sketches.kmv_hash(F.col("v")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("key").orderBy("h")
    ref = {
        r["key"]: r["hashes"]
        for r in pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 64)
        .groupBy("key")
        .agg(F.sort_array(F.collect_list("h")).alias("hashes"))
        .collect()
    }
    assert set(got) == set(ref)
    for key in ref:
        assert got[key] == ref[key], key  # bit-for-bit, order included
