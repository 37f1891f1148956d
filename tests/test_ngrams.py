"""Round-3 pipeline operators: n-gram dedup signals, content-defined
chunking, Gopher quality flags, perplexity buckets, range search,
dedup observability."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from elephant_twin_spark.operators.pipeline import (
    dedup,
    lmscore,
    ngrams,
    similarity,
    textstats,
)
from elephant_twin_spark.sources import tables

from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return tables.load_raw(spark, f"{SF_DIR}/documents.parquet").cache()


def test_top_ngrams_deterministic_and_counted(spark):
    df = spark.createDataFrame(
        [Row(text="a b a b c"), Row(text="a b x")]
    )
    top = ngrams.top_ngrams(df, "text", n=2, k=3).collect()
    # grams doc1: "a b","b a","a b","b c"; doc2: "a b","b x"
    assert top[0]["ngram"] == "a b" and top[0]["cnt"] == 3
    assert [r["ngram"] for r in top[1:]] == ["b a", "b c"]  # cnt ties → lexical


def test_exact_substring_dups_needs_two_docs(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, text="q w e r t y u i o p"),
            Row(id=2, text="zz q w e r t y u i o p"),  # shares the 10-gram
            Row(id=3, text="totally different content here with many words indeed"),
        ]
    )
    out = ngrams.exact_substring_dups(df, "text", "id", gram_len=10).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and {out[0]["min_doc"], out[0]["max_doc"]} == {1, 2}

    # a doc repeating its own gram does NOT create a dup row
    solo = spark.createDataFrame([Row(id=1, text="a b a b a b a b")])
    assert ngrams.exact_substring_dups(solo, "text", "id", gram_len=2).count() == 0


def test_repeated_ngram_coverage_bounds(spark):
    df = spark.createDataFrame(
        [Row(id=1, text="x y x y x y"), Row(id=2, text="a b c d e f")]
    )
    rows = {r["id"]: r["dup_ngram_frac"] for r in
            ngrams.repeated_ngram_coverage(df, "text", "id", n=2).collect()}
    # doc1 bigrams: 5 total, 2 distinct → 0.6 repeated
    assert rows[1] == pytest.approx(0.6)
    assert rows[2] == 0.0


def test_cdc_chunks_partition_token_count(spark, docs):
    chunks = ngrams.cdc_chunks(docs, "text", "doc_id")
    per_doc = chunks.groupBy("id").agg(F.sum("n_tokens").alias("s"))
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n"),
    )
    assert per_doc.join(toks, "id").where(F.col("s") != F.col("n")).count() == 0
    # chunk indexes dense from 0
    bad = (
        chunks.groupBy("id")
        .agg(F.min("chunk_idx").alias("mn"), F.max("chunk_idx").alias("mx"),
             F.count(F.lit(1)).alias("c"))
        .where((F.col("mn") != 0) | (F.col("mx") != F.col("c") - 1))
    )
    assert bad.count() == 0


def test_cdc_chunks_content_defined(spark):
    """Same suffix content after a prefix edit → identical chunk hashes
    for the suffix (the CDC property)."""
    a = "p q r s t u v w x y z aa bb cc dd ee ff gg hh ii jj kk"
    df = spark.createDataFrame(
        [Row(id=1, text=a), Row(id=2, text="PREFIX NEW " + a)]
    )
    ch = ngrams.cdc_chunks(df, "text", "id").collect()
    h1 = {r["chunk_md5"] for r in ch if r["id"] == 1}
    h2 = {r["chunk_md5"] for r in ch if r["id"] == 2}
    # all but the first (edited) chunk of doc2 should reappear in doc1
    assert len(h1 & h2) >= len(h1) - 1


def test_gopher_quality_flags(spark):
    good = "the quick brown fox jumps over the lazy dog again and again ok"
    short = "tiny doc"
    repeated = "a b " * 30 + "the of and to in is it that"
    df = spark.createDataFrame(
        [Row(id=1, text=good), Row(id=2, text=short), Row(id=3, text=repeated)]
    )
    rows = {r["id"]: r for r in
            textstats.gopher_quality_flags(df, "text", "id").collect()}
    assert rows[1]["keep"] is True
    assert rows[2]["ok_n_words"] is False and rows[2]["keep"] is False
    assert rows[3]["ok_repetition"] is False and rows[3]["keep"] is False


def test_perplexity_buckets_equal_counts(spark, docs):
    out = lmscore.perplexity_buckets(docs, "text", "doc_id", group_col="lang")
    sizes = out.groupBy("grp", "bucket").count().collect()
    per_grp = {}
    for r in sizes:
        per_grp.setdefault(r["grp"], []).append(r["count"])
    for grp, counts in per_grp.items():
        assert len(counts) <= 3
        assert max(counts) - min(counts) <= 1  # ntile balance
    # fluent docs (head) score >= tail within every group
    stats = (
        out.groupBy("grp", "bucket").agg(F.min("logprob").alias("mn"),
                                         F.max("logprob").alias("mx"))
    ).collect()
    by = {(r["grp"], r["bucket"]): r for r in stats}
    for (grp, bucket), r in by.items():
        if bucket == "head" and (grp, "tail") in by:
            assert r["mn"] >= by[(grp, "tail")]["mx"]


def test_range_search_threshold(spark):
    emb = tables.load_raw(spark, f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0).first()["embedding"]
    out = similarity.range_search(emb, "embedding", "vec_id", q, 0.3)
    rows = out.collect()
    assert all(r["cosine"] >= 0.3 for r in rows)
    assert {r["id"] for r in rows} >= {0}  # query matches itself (cos=1)
    # consistency with brute-force top-k: every top-k hit above τ is in range
    top = similarity.cosine_topk(emb, "embedding", "vec_id", q, k=10).collect()
    expect = {r["id"] for r in top if r["cosine"] >= 0.3}
    assert expect <= {r["id"] for r in rows}


def test_lsh_bucket_stats_accounting(spark, docs):
    stats = dedup.lsh_bucket_stats(docs, "text", "doc_id",
                                   num_perm=4, num_bands=2, shingle_k=1).collect()
    n_docs = docs.where(F.col("text").isNotNull()).count()
    for band in (0, 1):
        rows = [r for r in stats if r["band"] == band]
        assert sum(r["bucket_size"] * r["n_buckets"] for r in rows) == n_docs


def test_dup_rate_by_group(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, g="a", text="same same"),
            Row(id=2, g="a", text="same same"),
            Row(id=3, g="b", text="same same"),   # cross-group dup counts here too
            Row(id=4, g="b", text="unique text"),
        ]
    )
    rows = {r["grp"]: r for r in
            dedup.dup_rate_by_group(df, "text", "g").collect()}
    assert rows["a"]["n_dup_docs"] == 2 and rows["a"]["dup_rate"] == pytest.approx(1.0)
    assert rows["b"]["n_dup_docs"] == 1 and rows["b"]["dup_rate"] == pytest.approx(0.5)


def test_cdc_chunks_tolerates_empty_docs(spark):
    """Docs with zero tokens (empty/whitespace text) contribute no
    chunks and must not abort the job (regression: sequence(1,0)
    indexed past the empty token array)."""
    from pyspark.sql import Row

    from elephant_twin_spark.operators.pipeline import ngrams

    df = spark.createDataFrame(
        [Row(id=1, text="some real tokens in here"),
         Row(id=2, text=""),
         Row(id=3, text="   ")],
        "id long, text string",
    )
    rows = ngrams.cdc_chunks(df, "text", "id").collect()
    assert {r["id"] for r in rows} == {1}
    assert sum(r["n_tokens"] for r in rows) == 5
