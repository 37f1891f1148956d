"""Benchmark decontamination: flag/remove corpus documents that share
n-grams with a held-out evaluation set.

North-star addition (no reference analog; the closest reference shape is
the postings-overlap machinery, `core/retrieval/BlockIndexedFileInputFormat.java:577-640`,
generalized from byte-range overlap to n-gram overlap between two corpora).

Scale design: the eval set is small relative to the corpus (benchmarks
are thousands of docs; the corpus is 100 TB), so its distinct n-gram set
is collected into a broadcast hash join — the corpus side is a single
map-side pass (explode → broadcast-semi-join → partial count agg). No
corpus-side shuffle except the final per-doc aggregation, which Spark
partial-aggregates map-side first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from elephant_twin_spark.operators.text import whitespace_tokenizer


def ngram_set(text: Column, n: int) -> Column:
    """Distinct contiguous n-word grams (space-joined) as array<string>.

    Documents shorter than n tokens contribute no grams (they cannot
    contain a full n-gram) — matching the standard decontamination
    convention rather than falling back to the whole document. Total:
    NULL text also yields the EMPTY array (not NULL), so both the exact
    and the Bloom report agree that such docs have n_grams=0,
    contaminated=false instead of dropping out of one path.
    """
    from elephant_twin_spark.functions.binding import let

    def body(toks: Column) -> Column:
        # let-bound (r16): toks inside the lambda would re-tokenize per
        # gram — O(tokens²) per row (see functions/binding.py)
        cnt = F.size(toks)
        return F.when(cnt < n, F.array().cast("array<string>")).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), cnt - n),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
                )
            )
        )

    return F.coalesce(
        let(whitespace_tokenizer(text), body), F.array().cast("array<string>")
    )


def eval_ngrams(eval_df: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct n-grams of the evaluation set: one `gram` column."""
    return (
        eval_df.select(F.explode(ngram_set(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def contamination_report(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    min_overlap: int = 1,
    parallelism: int | None = None,
) -> DataFrame:
    """Per-corpus-doc contamination stats against the eval set.

    Returns ``(id_col, n_grams, n_contaminated, contaminated)`` where
    `n_grams` is the doc's distinct n-gram count, `n_contaminated` how
    many of those appear anywhere in the eval set, and `contaminated`
    whether that count reaches `min_overlap`.

    The eval n-gram set is broadcast (small side); corpus docs with
    zero overlap are kept with `n_contaminated = 0` via a left join.

    `parallelism` repartitions the corpus before the gram explode —
    for sources whose file count is below the core count (local
    single-file fixtures). Leave None at cluster scale: the scan's own
    task parallelism is already right, and the extra shuffle is waste.
    """
    grams = eval_ngrams(eval_df, text_col, n)
    if parallelism is not None:
        corpus = corpus.repartition(parallelism)
    doc_grams = corpus.select(
        F.col(id_col),
        ngram_set(F.col(text_col), n).alias("_grams"),
    )
    exploded = doc_grams.select(id_col, F.explode_outer("_grams").alias("gram"))
    hit = (
        exploded.join(F.broadcast(grams.withColumn("_hit", F.lit(1))), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_contaminated"),
        )
    )
    return hit.withColumn(
        "contaminated", F.col("n_contaminated") >= F.lit(min_overlap)
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Drop corpus documents contaminated by the eval set (same schema
    out as in). The standard pre-training hygiene step."""
    report = contamination_report(corpus, eval_df, text_col, id_col, n, min_overlap)
    clean_ids = report.where(~F.col("contaminated")).select(id_col)
    return corpus.join(clean_ids, id_col, "left_semi")


def bloom_contamination_report(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    parallelism: int | None = None,
) -> DataFrame:
    """Bloom-gated contamination screen: like
    :func:`contamination_report`, but the eval side is compressed into a
    FIXED-SIZE Bloom bit array instead of a broadcast gram set — the
    configuration for eval suites too large to broadcast as strings
    (the bit array is ``num_bits/8`` bytes regardless of gram count;
    2^20 bits = 128 KiB where a 10M-gram string set is gigabytes).

    False-positive-only: a flagged doc may be clean (rate set by
    bits/hashes vs gram count), a clean verdict is exact — so use it as
    the cheap first pass and re-check flagged docs with
    :func:`contamination_report` on the flagged subset only. Returns
    ``(id_col, n_grams, n_flagged, contaminated)``.

    Build: eval grams → md5 positions → (word, bit) → ``bit_or`` per
    word — one aggregation whose output is bounded by ``num_bits/64``
    rows; collected and re-broadcast as ONE array literal. Probe: pure
    JVM expression per corpus gram (no join at all on the corpus side).
    """
    from elephant_twin_spark.operators.build import _bloom_pos_sql

    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64
    pos = eval_ngrams(eval_df, text_col, n).select(
        F.explode(
            F.array(*[_bloom_pos_sql(F.col("gram"), i, num_bits) for i in range(num_hashes)])
        ).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("word"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("val"))
        .collect()
    )
    by_word = {r["word"]: r["val"] for r in words}
    bits = [by_word.get(w, 0) for w in range(n_words)]  # bounded: num_bits/64 longs
    bits_col = F.lit(bits)
    # variable-amount shifts need an int literal in the DSL; a 64-entry
    # power table lookup does the same (bit 63 in two's complement)
    powers = F.lit([(1 << k) - (1 << 64 if k == 63 else 0) for k in range(64)])

    if parallelism is not None:
        corpus = corpus.repartition(parallelism)

    def gram_hit(g):
        cond = F.lit(True)
        for i in range(num_hashes):
            p = _bloom_pos_sql(g, i, num_bits)
            word = (p / 64).cast("int")
            mask = F.element_at(powers, (p % 64).cast("int") + 1)
            # element_at(bits, word+1) & (1 << (p % 64)) != 0
            cond = cond & (
                F.element_at(bits_col, word + 1).bitwiseAND(mask) != 0
            )
        return cond

    doc = corpus.select(
        F.col(id_col), ngram_set(F.col(text_col), n).alias("_grams")
    )
    flagged = F.size(F.filter("_grams", lambda g: gram_hit(g)))
    return doc.select(
        id_col,
        F.size("_grams").alias("n_grams"),
        flagged.alias("n_flagged"),
    ).withColumn("contaminated", F.col("n_flagged") > 0)
