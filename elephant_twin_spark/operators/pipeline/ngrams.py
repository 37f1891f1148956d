"""N-gram corpus operators — repeated-substring analysis and
content-defined chunking for training-data pipelines.

Public sources for the semantics: Lee et al., "Deduplicating Training
Data Makes Language Models Better" (exact substring duplication via
shared n-token grams); Rae et al., "Scaling Language Models" (Gopher
repetition rules); content-defined chunking as in LBFS/rsync (rolling
boundary on a hash mask). Reference analog: none (north-star
extension beyond the reference's operator set).

Scale shapes
------------
* ``top_ngrams`` / ``exact_substring_dups``: explode grams → ONE
  hash-shuffle groupBy on the gram (map-side combine applies); never a
  cross product. At 100 TB gram cardinality dominates — the md5 digest
  keys the shuffle with fixed-width values instead of long strings.
* ``repeated_ngram_coverage``: per-row higher-order functions only —
  zero shuffle, whole-stage codegen.
* ``cdc_chunks``: per-row boundary scan (no shuffle); chunk boundaries
  depend only on local token hashes, so the same content always chunks
  identically regardless of partitioning — the property that makes CDC
  dedup-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from elephant_twin_spark.operators.text import whitespace_tokenizer


def ngram_array(text: Column, n: int) -> Column:
    """All (overlapping) n-token grams of ``text`` as array<string>;
    docs shorter than ``n`` tokens yield a single whole-doc gram."""
    from elephant_twin_spark.functions.binding import let

    def body(toks: Column) -> Column:
        # let-bound (r16): toks inside the lambda would re-tokenize per
        # gram — O(tokens²) per row (see functions/binding.py)
        sz = F.size(toks)
        return F.when(sz < n, F.array(F.concat_ws(" ", toks))).otherwise(
            F.transform(
                F.sequence(F.lit(0), sz - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )

    return let(whitespace_tokenizer(text), body)


def top_ngrams(df: DataFrame, text_col: str, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-wide top-``k`` n-grams: ``(ngram, cnt)``, count desc then
    gram asc (deterministic). One explode + one groupBy shuffle; the
    global top-k is a TakeOrdered over partial per-partition top-ks —
    no full sort materializes."""
    return (
        df.select(F.explode(ngram_array(F.col(text_col), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("ngram").asc())
        .limit(k)
    )


def exact_substring_dups(
    df: DataFrame, text_col: str, id_col: str, gram_len: int = 20
) -> DataFrame:
    """Grams of ``gram_len`` tokens appearing in MORE THAN ONE document
    — the exact-substring duplication signal of Lee et al. 2022 (docs
    sharing a 50-token span are near-certain training dups; the gram
    length tunes precision). Returns ``(gram_md5, n_docs, n_occ,
    min_doc, max_doc)`` per duplicated gram.

    Per-doc gram dedup (``array_distinct``) happens BEFORE the explode
    so a doc repeating its own gram doesn't fake cross-doc duplication;
    ``n_occ`` counts distinct (doc, gram) pairs."""
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(ngram_array(F.col(text_col), gram_len))
        ).alias("gram"),
    ).select("id", F.md5(F.col("gram").cast("binary")).alias("gram_md5"))
    return (
        grams.groupBy("gram_md5")
        .agg(
            F.countDistinct("id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
            F.min("id").alias("min_doc"),
            F.max("id").alias("max_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )


def repeated_ngram_coverage(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, out_col: str = "dup_ngram_frac"
) -> DataFrame:
    """Per-doc fraction of n-gram slots occupied by a repeated gram:
    ``1 - distinct_grams / total_grams`` (Gopher-style repetition
    filter; 0 = no internal repetition). Zero-shuffle per-row math."""
    grams = ngram_array(F.col(text_col), n)
    return df.select(
        F.col(id_col).alias("id"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams), 6
        ).alias(out_col),
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    mask: int = 7,
) -> DataFrame:
    """Content-defined chunking at token granularity: a chunk boundary
    opens AFTER any token whose md5-derived hash satisfies
    ``hash % (mask+1) == 0`` (expected chunk length = mask+1 tokens).
    Returns ``(id, chunk_idx, n_tokens, chunk_md5)`` — one row per
    chunk. Boundaries depend only on token content, so shifting a
    prefix does not re-chunk the suffix (the CDC property rsync/LBFS
    rely on); identical chunks hash identically across docs, making the
    output directly joinable for chunk-level dedup.

    The md5-based token hash keeps the boundary decision reproducible
    in any engine (the oracle twin replays it in SQL).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        whitespace_tokenizer(F.col(text_col)).alias("_toks"),
    )
    # 1-based positions of tokens that CLOSE a chunk. The expression
    # must be TOTAL — Catalyst infers a size(_segs) > 0 predicate from
    # the generate and may evaluate it BEFORE any row-pruning filter, so
    # guarding with .where() upstream does not help. Two totality fixes:
    # the sequence upper bound is clamped to ≥1 (sequence(1, 0) would
    # descend THROUGH index 0, which even try_element_at rejects), and
    # try_element_at returns NULL past the end — the NULL hash fails the
    # boundary test, a token-less doc gets zero segments, and posexplode
    # drops it: empty/whitespace docs contribute no chunks instead of
    # aborting the job.
    bpos = F.filter(
        F.sequence(F.lit(1), F.greatest(F.size("_toks"), F.lit(1))),
        lambda i: F.conv(
            F.substring(
                F.md5(F.try_element_at("_toks", i).cast("binary")), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % (mask + 1)
        == 0,
    )
    # segment k spans starts[k]..ends[k]; a boundary on the LAST token
    # leaves a trailing empty segment (start > end) that filters away
    segs = base.select(
        "id",
        "_toks",
        F.filter(
            F.zip_with(
                F.concat(F.array(F.lit(1)), F.transform(bpos, lambda p: p + 1)),
                F.concat(bpos, F.array(F.size("_toks"))),
                lambda s, e: F.struct(s.alias("s"), e.alias("e")),
            ),
            lambda x: x.getField("s") <= x.getField("e"),
        ).alias("_segs"),
    )
    return segs.select(
        "id",
        "_toks",
        F.posexplode("_segs").alias("chunk_idx", "_seg"),
    ).select(
        "id",
        "chunk_idx",
        (F.col("_seg.e") - F.col("_seg.s") + 1).alias("n_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.slice(
                    "_toks", F.col("_seg.s"), F.col("_seg.e") - F.col("_seg.s") + 1
                ),
            ).cast("binary")
        ).alias("chunk_md5"),
    )


def novelty_score(
    docs: DataFrame,
    reference: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-document novelty against a reference corpus: the fraction of
    the document's distinct ``n``-grams that never appear in
    ``reference`` — ``(id, n_grams, n_novel, novelty)``.

    The synthetic-data / crawl-freshness gate: near-0 novelty means the
    document is recombined reference content (memorized or templated);
    near-1 means genuinely new text. The complement of decontamination
    (which HUNTS overlap, this SCORES its absence); gram totality
    matches ``ngram_array`` (short docs carry one whole-doc gram; docs
    with NULL text report 0 grams and NULL novelty).

    Shape: both sides explode to distinct grams (map-side combined);
    membership is ONE left-anti-style aggregate join keyed on the md5
    gram digest (fixed-width shuffle keys); the per-doc rollup is a
    second map-side-combined aggregate. For reference sets too large to
    shuffle-join comfortably, screen with
    :func:`.decontaminate.bloom_contamination_report`'s fixed bit array
    first and reserve this exact join for the flagged subset.
    """
    doc_grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(ngram_array(F.col(text_col), n)).alias("gram"),
    ).distinct()
    ref_grams = (
        reference.select(F.explode(ngram_array(F.col(text_col), n)).alias("gram"))
        .distinct()
        .withColumn("_ref", F.lit(1))
    )
    joined = doc_grams.join(ref_grams, "gram", "left")
    per_doc = joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.when(F.col("_ref").isNull(), 1).otherwise(0)).alias("n_novel"),
    )
    # gram-less docs (shorter than n tokens): 0 grams, NULL novelty
    all_ids = docs.select(F.col(id_col).alias("id")).distinct()
    return (
        all_ids.join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_novel", F.lit(0))
                    / F.coalesce("n_grams", F.lit(0)).cast("double"),
                    6,
                ),
            ).alias("novelty"),
        )
    )
