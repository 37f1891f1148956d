"""Corpus-level unigram language-model scoring — the classic
perplexity-style quality filter, with the LM trained on the corpus
itself (or a supplied reference frequency table).

North-star addition (no reference analog; generalizes the token
statistics the text index already maintains into a per-document score).

Scale design: token frequencies are one hash aggregation; the score is
one join from exploded tokens to the frequency table plus one per-doc
aggregation. The frequency table is keyed by unique token, so the join
side is compact even at corpus scale (vocab ≪ corpus); hot stopword
keys on the probe side are plain AQE-skew territory, no salting needed
because the build side is unique-per-key.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elephant_twin_spark.operators.text import whitespace_tokenizer


def unigram_model(df: DataFrame, text_col: str) -> Tuple[DataFrame, int, int]:
    """Token frequency table plus corpus totals.

    Returns ``(freq_df(tok, cnt), total_tokens, vocab_size)``. The two
    scalars are a driver-side collect of one aggregate row (bounded).
    """
    toks = df.select(
        F.explode(whitespace_tokenizer(F.col(text_col))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    row = freq.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("v")
    ).first()
    # empty corpus: sum() is NULL — return (empty freq, 0, 0) instead of
    # TypeError'ing on int(None) (the r12 empty-input probe class)
    return freq, int(row["total"] or 0), int(row["v"] or 0)


def unigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    freq: DataFrame | None = None,
    total: int | None = None,
    vocab: int | None = None,
) -> DataFrame:
    """Per-document mean token log-probability under an add-one-smoothed
    unigram model: ``avg(ln((cnt + 1) / (total + vocab)))``.

    Train-on-self by default; pass (`freq`, `total`, `vocab`) from
    `unigram_model` on a reference corpus to score against it (unseen
    tokens get the smoothed floor). Returns ``(id_col, logprob)``;
    documents with no tokens score null.
    """
    if freq is None:
        freq, total, vocab = unigram_model(df, text_col)
    denom = float(total + vocab)
    tk = df.select(
        F.col(id_col),
        F.explode_outer(whitespace_tokenizer(F.col(text_col))).alias("tok"),
    )
    joined = tk.join(freq, "tok", "left")
    logp = F.when(
        F.col("tok").isNotNull(),
        F.ln((F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1.0)) / F.lit(denom)),
    )
    return joined.groupBy(id_col).agg(F.avg(logp).alias("logprob"))


def perplexity_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str | None = None,
    n_buckets: int = 3,
    labels: tuple = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document with the unigram log-probability proxy, then split
    each ``group_col`` partition (language, usually) into ``n_buckets``
    equal-count buckets by score — head = most fluent. Returns
    ``(id, group, logprob, bucket)``.

    One score pass (explode + groupBy) + one window ntile per group —
    two shuffles total; the window partitions by group so no global
    sort. Ranking runs on the 6-dp ROUNDED score (ties broken by id):
    raw-double ordering is last-ulp-sensitive to summation order, so
    rounding first makes the bucket assignment reproducible across
    engines and partitionings.
    """
    if len(labels) != n_buckets:
        raise ValueError(f"{n_buckets} buckets need {n_buckets} labels, got {labels}")
    from pyspark.sql.window import Window

    scored = unigram_logprob(df, text_col, id_col)
    keyed = df.select(
        F.col(id_col),
        (F.col(group_col) if group_col else F.lit("all")).alias("grp"),
    ).join(scored, id_col).withColumn("logprob", F.round("logprob", 6))
    w = Window.partitionBy("grp").orderBy(
        F.col("logprob").desc(), F.col(id_col).asc()
    )
    lab = F.lit(list(labels))  # element types preserved (no str() cast)
    return keyed.withColumn("_nt", F.ntile(n_buckets).over(w)).select(
        F.col(id_col).alias("id"),
        F.col("grp"),
        "logprob",
        F.element_at(lab, F.col("_nt")).alias("bucket"),
    )


def bigram_model(df: DataFrame, text_col: str) -> Tuple[DataFrame, DataFrame]:
    """Bigram + unigram count tables for a corpus-trained bigram LM.

    Returns ``(bigram_df(w1, w2, cnt2), unigram_df(w1, cnt1))``. Both
    are single hash aggregations over exploded adjacent token pairs —
    model size is vocab²-bounded but in practice ≪ corpus (only
    observed pairs materialize).
    """
    toks = df.select(whitespace_tokenizer(F.col(text_col)).alias("t"))
    pairs = toks.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - 2),
                    lambda i: F.struct(
                        F.element_at("t", i + 1).alias("w1"),
                        F.element_at("t", i + 2).alias("w2"),
                    ),
                ),
            ).otherwise(F.array()),
        ).alias("p")
    ).select("p.w1", "p.w2")
    bigrams = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt2"))
    unigrams = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("cnt1"))
    return bigrams, unigrams


def bigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bigrams: DataFrame | None = None,
    unigrams: DataFrame | None = None,
    vocab: int | None = None,
) -> DataFrame:
    """Per-document mean bigram log-probability with add-one smoothing:
    ``avg(ln((cnt2 + 1) / (cnt1 + V)))`` over the doc's adjacent pairs —
    the bigram upgrade of :func:`unigram_logprob` (context-sensitive, so
    shuffled-word gibberish scores LOWER than fluent text even when the
    unigram model cannot tell them apart).

    Train-on-self by default. Docs with <2 tokens score null. The two
    model joins are keyed by (w1, w2) / w1 — build sides unique per
    key, AQE handles hot stopword prefixes. Returns ``(id_col,
    bigram_logprob)``.
    """
    if bigrams is None or unigrams is None:
        if (bigrams is None) != (unigrams is None):
            raise ValueError("pass both bigrams and unigrams, or neither")
        bigrams, unigrams = bigram_model(df, text_col)
    if vocab is None:
        vocab = unigrams.count()
    dv = float(vocab)
    tk = df.select(F.col(id_col), whitespace_tokenizer(F.col(text_col)).alias("t"))
    doc_pairs = tk.select(
        id_col,
        F.explode_outer(
            F.when(
                F.size("t") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - 2),
                    lambda i: F.struct(
                        F.element_at("t", i + 1).alias("w1"),
                        F.element_at("t", i + 2).alias("w2"),
                    ),
                ),
            ),
        ).alias("p"),
    ).select(id_col, "p.w1", "p.w2")
    joined = doc_pairs.join(bigrams, ["w1", "w2"], "left").join(
        unigrams, "w1", "left"
    )
    logp = F.when(
        F.col("w1").isNotNull(),
        F.ln(
            (F.coalesce(F.col("cnt2"), F.lit(0)) + F.lit(1.0))
            / (F.coalesce(F.col("cnt1"), F.lit(0)) + F.lit(dv))
        ),
    )
    return joined.groupBy(id_col).agg(F.avg(logp).alias("bigram_logprob"))
