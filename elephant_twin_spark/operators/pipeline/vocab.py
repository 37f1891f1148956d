"""Vocabulary construction and token-id encoding — the step between a
cleaned corpus and a training run: build the top-V token vocabulary,
encode documents to id sequences, and measure OOV exposure.

Scale shape: the count table is one explode + hash-aggregate shuffle
(map-side partial counts, so the shuffle carries distinct tokens per
partition, not token occurrences). The top-V cut is ``orderBy.limit``
(TakeOrdered — per-partition heaps, no global sort); only the V
surviving rows pass through the single-partition id-assignment window,
and V is a model hyperparameter (30k-200k), never corpus-sized.
Encoding joins the exploded corpus against the *broadcast* vocabulary —
no shuffle of the corpus side beyond the per-doc regroup.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from elephant_twin_spark.operators.pipeline.dedup import _fan_out
from elephant_twin_spark.operators.pipeline.textstats import tokens


# Unbounded-vocabulary guard (r14 verdict item 5): with
# ``vocab_size=None`` the id-assignment window row_numbers the WHOLE
# filtered vocabulary through one partition. That is fine for the
# opt-in "give me everything" analysis path on bounded corpora, but at
# 100 TB a silent single-partition sort of billions of distinct tokens
# is a job-killer — so the path counts first and fails LOUDLY above
# this threshold instead of degrading quietly.
MAX_UNBOUNDED_VOCAB_ROWS = 5_000_000


def build_vocab(
    df: DataFrame,
    text_col: str,
    vocab_size: Optional[int] = None,
    min_count: int = 1,
    max_unbounded_rows: Optional[int] = MAX_UNBOUNDED_VOCAB_ROWS,
) -> DataFrame:
    """``(token, cnt, token_id)`` — the ``vocab_size`` most frequent
    tokens with ``cnt >= min_count``; ids are dense 0..V-1 assigned by
    (cnt desc, token asc), so the mapping is fully deterministic and
    reproducible across engines.

    With ``vocab_size`` set (the training path), only the V surviving
    TakeOrdered rows pass through the single-partition id window — V is
    a hyperparameter, never corpus-sized. With ``vocab_size=None`` the
    whole filtered vocabulary would: the guard counts it first (one
    extra aggregate pass, on this opt-in path only) and raises above
    ``max_unbounded_rows`` with the remedy in the message; pass
    ``max_unbounded_rows=None`` to explicitly accept the bottleneck."""
    counts = (
        _fan_out(df)
        .select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )
    if vocab_size is not None:
        counts = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(
            vocab_size
        )
    elif max_unbounded_rows is not None:
        n = counts.count()
        if n > max_unbounded_rows:
            raise ValueError(
                f"build_vocab(vocab_size=None) would row_number "
                f"{n:,} distinct tokens through ONE partition "
                f"(> max_unbounded_rows={max_unbounded_rows:,}). Pass "
                "vocab_size (the training path), raise min_count, or pass "
                "max_unbounded_rows=None to accept the single-partition "
                "sort knowingly."
            )
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return counts.withColumn("token_id", F.row_number().over(w) - F.lit(1))


def encode_docs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab: DataFrame,
    unk_id: int = -1,
) -> DataFrame:
    """``(id, token_ids array<int>)`` — documents as id sequences in
    original token order; tokens outside the vocabulary become
    ``unk_id``. posexplode carries the position through the broadcast
    vocab join so the regroup can restore order exactly."""
    toks = _fan_out(df).select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    )
    joined = toks.join(F.broadcast(vocab.select("token", "token_id")), "token", "left")
    return (
        joined.groupBy("id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "pos", F.coalesce("token_id", F.lit(unk_id)).alias("tid")
                        )
                    )
                ),
                lambda s: s["tid"],
            ).alias("token_ids")
        )
    )


def oov_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab: DataFrame,
) -> DataFrame:
    """Per-document OOV exposure: ``(id, n_tokens, n_oov, oov_rate)``.
    The standard pre-training sanity check — a corpus slice with high
    OOV against the chosen vocabulary is mis-tokenized or off-domain."""
    toks = _fan_out(df).select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    joined = toks.join(F.broadcast(vocab.select("token", "token_id")), "token", "left")
    return joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("token_id").isNull(), 1).otherwise(0)).alias("n_oov"),
        (
            F.sum(F.when(F.col("token_id").isNull(), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("oov_rate"),
    )
