"""Tests for document chunking."""

import pytest

from elephant_twin_spark.operators.pipeline import chunk


def _get(spark, text, chunk_tokens, overlap=0):
    df = spark.createDataFrame([(1, text)], "id long, text string")
    out = chunk.chunk_documents(df, "text", "id", chunk_tokens, overlap)
    return [(r["chunk_id"], r["chunk_text"], r["n_tokens"])
            for r in out.orderBy("chunk_id").collect()]


def test_chunk_no_overlap_exact_cover(spark):
    got = _get(spark, "a b c d e f", 2)
    assert got == [(0, "a b", 2), (1, "c d", 2), (2, "e f", 2)]


def test_chunk_short_tail(spark):
    got = _get(spark, "a b c d e", 2)
    assert got == [(0, "a b", 2), (1, "c d", 2), (2, "e", 1)]


def test_chunk_with_overlap(spark):
    got = _get(spark, " ".join("t%d" % i for i in range(10)), 8, 4)
    # stride 4; starts 0 and 4 only (start 8 would add nothing new)
    assert [g[0] for g in got] == [0, 1]
    assert got[0][1].split() == ["t%d" % i for i in range(8)]
    assert got[1][1].split() == ["t%d" % i for i in range(4, 10)]


def test_chunk_doc_shorter_than_window(spark):
    assert _get(spark, "a b", 8, 4) == [(0, "a b", 2)]


def test_chunk_empty_doc_no_rows(spark):
    assert _get(spark, "", 4) == []


def test_chunk_coverage_property(spark):
    # every token of every doc appears in at least one chunk
    texts = [" ".join("w%d" % i for i in range(n)) for n in (1, 7, 16, 33)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    out = chunk.chunk_documents(df, "text", "id", 8, 3).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["id"], set()).update(r["chunk_text"].split())
    for i, t in enumerate(texts):
        assert per_doc[i] == set(t.split())


def test_chunk_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a")], "id long, text string")
    with pytest.raises(ValueError):
        chunk.chunk_documents(df, "text", "id", 0)
    with pytest.raises(ValueError):
        chunk.chunk_documents(df, "text", "id", 4, 4)
