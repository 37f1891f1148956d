"""r12 probe-audit fixes: driver-side `.first()` probes that assumed a
non-NULL first row or a non-empty input. The advisor's
embedding_near_dup finding generalized to a class; these pin the other
repaired sites (every remaining `.first()` site was audited and found
NULL/empty-safe — see the round notes in SCALE_EXPERIMENTS.md)."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Row

from elephant_twin_spark.operators.pipeline import lmscore, release, similarity


@pytest.fixture()
def null_first_emb(spark):
    return spark.createDataFrame(
        [
            Row(vec_id=0, embedding=None),  # NULL first — the probe trap
            Row(vec_id=1, embedding=[1.0, 0.0, 0.0, 0.0]),
            Row(vec_id=2, embedding=[0.0, 1.0, 0.0, 0.0]),
            Row(vec_id=3, embedding=[0.0, 0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    ).coalesce(1)


def test_ivf_fit_skips_null_vectors(null_first_emb):
    """A NULL vector sampled into the init set TypeError'd the centroid
    unpack; NULL rows carry no training signal and are dropped."""
    cents = similarity.ivf_fit(null_first_emb, "embedding", "vec_id", k_clusters=2, max_iter=1)
    assert len(cents) == 2 and all(len(c) == 4 for c in cents)


def test_ivf_fit_all_null_raises(null_first_emb):
    all_null = null_first_emb.where(F.col("vec_id") == 0)
    with pytest.raises(ValueError, match="non-null"):
        similarity.ivf_fit(all_null, "embedding", "vec_id", k_clusters=2)


def test_pq_fit_null_first_vector(null_first_emb):
    """The dimension probe read size(NULL) = -1/None from the first row;
    it now probes non-null rows (and -1 % m would otherwise have built
    degenerate subspaces silently)."""
    books = similarity.pq_fit(null_first_emb, "embedding", "vec_id", m=2, k=2, max_iter=1)
    assert len(books) == 2 and all(len(cb[0]) == 2 for cb in books)
    all_null = null_first_emb.where(F.col("vec_id") == 0)
    with pytest.raises(ValueError, match="non-null"):
        similarity.pq_fit(all_null, "embedding", "vec_id", m=2, k=2)


def test_unigram_model_empty_corpus(spark):
    """sum() over an empty frequency table is NULL; the totals are now
    0 instead of int(None) raising TypeError."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    freq, total, vocab = lmscore.unigram_model(empty, "text")
    assert total == 0 and vocab == 0 and freq.count() == 0


def test_release_content_hash_empty_release(spark, workdir):
    """An empty snapshot gets content_hash '0', not the string 'None' —
    two empty releases compare equal by value."""
    root = f"{workdir}/rel_empty"
    empty = spark.createDataFrame([], "id long, v string")
    m1 = release.publish_release(spark, empty, root, 1, content_hash=True)
    m2 = release.publish_release(spark, empty, root, 2, content_hash=True)
    assert m1["content_hash"] == m2["content_hash"] == "0"
