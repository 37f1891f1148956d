"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. North-star additions (no reference analog);
every expression is a built-in Column function (codegen, no UDFs), and
every formula is simple enough to restate in ANSI SQL for the oracle gate.
"""

from __future__ import annotations

import math

from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from elephant_twin_spark.operators.text import whitespace_tokenizer

# tiny per-language stopword sets for the n-gram/stopword-hit heuristic
STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es", "se", "no"],
    "de": ["der", "die", "das", "und", "zu", "den", "ist", "von", "mit", "nicht"],
    "fr": ["le", "la", "de", "et", "un", "il", "est", "que", "pour", "dans"],
}


def tokens(text: Column) -> Column:
    return whitespace_tokenizer(text)


def token_count(text: Column) -> Column:
    """Whitespace token count (the baseline token counter)."""
    return F.size(tokens(text))


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish regex token count: letter runs, single digits, single
    punctuation — a deterministic proxy for subword tokenizer cost."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Append deterministic quality features:
    n_tokens, n_chars, avg_token_len, punct_ratio, stopword_ratio,
    uniq_token_ratio — the standard cheap quality filters.

    Token array let-bound into ONE struct (r16): the six feature
    expressions each re-evaluated the tokenizer (6× per row — linear,
    not quadratic, but tokenization is the dominant per-row cost of the
    quality path; see functions/binding.py)."""
    from elephant_twin_spark.functions.binding import let

    def _feats(t: Column) -> Column:
        n_tok = F.size(t)
        n_chars = F.length(F.col(text_col))
        punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^\w\s]"), 0))
        stop_arr = F.lit(list(STOPWORDS["en"]))
        n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, F.lower(x))))
        return F.struct(
            n_tok.alias("n_tokens"),
            n_chars.alias("n_chars_calc"),
            F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok)
            .otherwise(F.lit(0.0))
            .alias("avg_token_len"),
            F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0)).alias(
                "punct_ratio"
            ),
            F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0)).alias(
                "stopword_ratio"
            ),
            F.when(n_tok > 0, F.size(F.array_distinct(t)) / n_tok)
            .otherwise(F.lit(0.0))
            .alias("uniq_token_ratio"),
        )

    qf = let(tokens(F.col(text_col)), _feats)
    out = df.withColumn("_qf", qf)
    for c in (
        "n_tokens", "n_chars_calc", "avg_token_len",
        "punct_ratio", "stopword_ratio", "uniq_token_ratio",
    ):
        out = out.withColumn(c, F.col(f"_qf.{c}"))
    return out.drop("_qf")


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Single scalar quality score in [0,1]: penalize extreme length,
    high punctuation, low vocabulary diversity. Deterministic formula:

        score = clamp(n_tokens/100, 0, 1) * (1 - punct_ratio) * uniq_token_ratio
    """
    feats = quality_features(df, text_col)
    return feats.withColumn(
        "quality_score",
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
        * (F.lit(1.0) - F.col("punct_ratio"))
        * F.col("uniq_token_ratio"),
    )


def lang_id(df: DataFrame, text_col: str, out_col: str = "lang_pred") -> DataFrame:
    """Stopword-hit language ID: argmax over per-language stopword hit
    counts, ties broken by language code order, 'und' when no hits.

    Lowercased token array let-bound (r16): each of the four language
    score expressions re-evaluated tokenize+lower per row (see
    functions/binding.py); ``best`` is let-bound too — its ``hits`` and
    ``lang`` fields would otherwise re-sort the score array twice."""
    from elephant_twin_spark.functions.binding import let

    def _verdict(t: Column) -> Column:
        scores = []
        for lang in sorted(STOPWORDS):
            arr = F.lit(list(STOPWORDS[lang]))
            scores.append(
                F.struct(
                    F.size(F.filter(t, lambda x: F.array_contains(arr, x))).alias(
                        "hits"
                    ),
                    F.lit(lang).alias("lang"),
                )
            )
        # max_by (hits, then lexicographically-smallest lang): sort desc
        # by hits, asc by lang → take first
        best_expr = F.sort_array(F.array(*scores), asc=False)[0]
        return let(
            best_expr,
            lambda best: F.when(best["hits"] > 0, best["lang"]).otherwise(
                F.lit("und")
            ),
        )

    return df.withColumn(
        out_col,
        let(F.transform(tokens(F.col(text_col)), lambda x: F.lower(x)), _verdict),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Content fingerprint: md5 over the sorted distinct token set —
    stable under token order and duplication (the cheap canonical-content
    key; rolling-hash winnowing is the text-index variant)."""
    t = tokens(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(t))).cast("binary")).alias(
            "fingerprint"
        ),
    )


def winnowing_fingerprints(
    df: DataFrame, text_col: str, id_col: str, k: int = 5, window: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints: hash all k-grams of tokens,
    keep the min hash of each sliding window, distinct per doc —
    the standard local fingerprinting scheme for plagiarism/near-dup
    detection, entirely in JVM higher-order functions.
    Returns (id, fp) exploded, one row per selected fingerprint.
    ``hash_fn="md5"`` (first 15 hex chars as a bigint) is cross-engine
    reproducible for external oracles; xxhash64 is the fast default."""
    from elephant_twin_spark.functions.binding import let

    if hash_fn == "xxhash64":
        gram_hash = lambda g: F.xxhash64(g)  # noqa: E731
    elif hash_fn == "md5":
        gram_hash = lambda g: F.conv(  # noqa: E731
            F.substring(F.md5(g), 1, 15), 16, 10
        ).cast("long")
    else:
        raise ValueError(hash_fn)

    # nested let-bindings (r16): toks captured in the gram lambda
    # re-tokenized per gram, and grams captured in the window lambda
    # re-built the whole gram array per window — O(tokens³) per row
    # in the worst case (see functions/binding.py)
    def _mins(toks: Column) -> Column:
        grams_expr = F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
            lambda i: gram_hash(F.concat_ws(" ", F.slice(toks, i + 1, k))),
        )

        def _win(grams: Column) -> Column:
            return F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size(grams) - window, F.lit(0))),
                    lambda i: F.array_min(F.slice(grams, i + 1, window)),
                )
            )

        return let(grams_expr, _win)

    mins = let(tokens(F.col(text_col)), _mins)
    return df.select(F.col(id_col).alias("id"), F.explode(mins).alias("fp"))


def char_entropy(df: DataFrame, text_col: str, out_col: str = "char_entropy") -> DataFrame:
    """Shannon entropy of the character distribution (nats) — the classic
    cheap gibberish/boilerplate signal: natural prose sits in a narrow
    band, while repeated padding (low entropy) and random noise (high
    entropy) fall outside it. Evaluated per row with JVM higher-order
    functions (distinct-char counts via nested lambdas) — no shuffle, no
    Python."""
    return (
        df.withColumn("_ch", F.split(F.col(text_col), ""))
        .withColumn(
            out_col,
            F.when(F.size("_ch") == 0, F.lit(0.0)).otherwise(
                -F.expr(
                    "aggregate("
                    "  transform(array_distinct(_ch),"
                    "            c -> size(filter(_ch, x -> x = c))),"
                    "  0D,"
                    "  (acc, cnt) -> acc + (cnt / size(_ch)) * ln(cnt / size(_ch))"
                    ")"
                )
            ),
        )
        .drop("_ch")
    )


def repetition_ratio(
    df: DataFrame, text_col: str, n: int = 3, out_col: str = "dup_ngram_ratio"
) -> DataFrame:
    """Fraction of within-doc n-gram OCCURRENCES that are repeats of an
    earlier n-gram in the same doc (Gopher-style repetition filter):
    0 = no internal repetition, →1 = the doc loops on itself. Per-row
    JVM expression: 1 - distinct/total n-grams. Token array let-bound
    (r16): t inside the lambda re-tokenized per gram — O(tokens²) per
    row (see functions/binding.py)."""
    from elephant_twin_spark.functions.binding import let

    def _grams(t: Column) -> Column:
        return F.when(F.size(t) < n, F.array(F.concat_ws(" ", t))).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
            )
        )

    grams = let(tokens(F.col(text_col)), _grams)
    return (
        df.withColumn("_g", grams)
        .withColumn(
            out_col,
            F.when(F.size("_g") <= 0, F.lit(0.0)).otherwise(
                F.lit(1.0) - F.size(F.array_distinct("_g")) / F.size("_g")
            ),
        )
        .drop("_g")
    )


def stratified_take(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n_per_group: int,
    out_rank_col: str = "strat_rank",
) -> DataFrame:
    """Deterministic balanced subset: the first ``n_per_group`` rows of
    every group ordered by ``md5(id)`` — a seedless, engine-independent
    shuffle (md5 is uniform), so the same subset reproduces anywhere
    (unlike fraction-based sampleBy, whose RNG is engine-specific).
    The training-data use: class-balancing a skewed corpus."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn(out_rank_col, F.row_number().over(w))
        .where(F.col(out_rank_col) <= n_per_group)
    )


def normalize_text(text: Column, lowercase: bool = True) -> Column:
    """Canonical text cleanup before hashing/dedup/tokenizing: control
    characters → space, whitespace runs collapsed to one space, trimmed,
    optionally lowercased. Pure JVM regexp chain (codegen, restatable in
    ANSI SQL), so normalized-content signatures are engine-independent."""
    t = F.regexp_replace(text, "[\\x00-\\x1F\\x7F]", " ")
    t = F.trim(F.regexp_replace(t, "\\s+", " "))
    return F.lower(t) if lowercase else t


def quality_thresholds(
    df: DataFrame,
    score_col: str,
    fraction: float,
    group_cols: Optional[List[str]] = None,
    accuracy: int = 10000,
) -> Dict:
    """Per-group score cutoffs for keeping the top ``fraction`` —
    computed ONCE on a static snapshot (``percentile_approx``, #groups
    rows collected), then applied statelessly by
    :func:`apply_score_gate`. The same split as
    ``mixture.sample_rates``/``hash_sample``: aggregate on a reference
    snapshot, filter anywhere — including a streaming DataFrame, where
    the per-row decision needs no aggregation state and the kept set is
    identical batch or stream. Keys are group values (tuples for
    multi-column groups, the value itself for one column, None for
    ungrouped)."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0,1], got {fraction}")
    groups = list(group_cols or [])
    agg = (df.groupBy(*groups) if groups else df.groupBy()).agg(
        F.percentile_approx(F.col(score_col), 1.0 - fraction, accuracy).alias("_thr")
    )
    rows = agg.collect()
    if not groups:
        return {None: rows[0]["_thr"]}
    if len(groups) == 1:
        return {r[groups[0]]: r["_thr"] for r in rows}
    return {tuple(r[g] for g in groups): r["_thr"] for r in rows}


def apply_score_gate(
    df: DataFrame,
    score_col: str,
    thresholds: Dict,
    group_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Stateless application of :func:`quality_thresholds` cutoffs:
    keep rows with ``score >= threshold(group)``. Pure per-row decision
    (broadcast join against the tiny threshold table; plain filter when
    ungrouped) — safe on batch and streaming frames alike. Groups
    without a threshold are dropped (no cutoff → not accepted).

    The threshold join is NULL-SAFE (r10 review fix):
    :func:`quality_thresholds` groups with groupBy, which emits a
    cutoff row for a NULL group, but a plain equality join could never
    match it back — the untagged population was silently dropped
    despite having a declared threshold."""
    groups = list(group_cols or [])
    if not groups:
        return df.where(F.col(score_col) >= F.lit(thresholds[None]))
    spark = df.sparkSession
    rows = [
        (k if isinstance(k, tuple) else (k,)) + (float(v),)
        for k, v in thresholds.items()
    ]
    schema = df.select(*groups).schema
    tdf = spark.createDataFrame(
        rows, schema.add("_thr", "double", False)
    )
    tdf = tdf.select(
        *[F.col(g).alias(f"_thr_{g}") for g in groups], "_thr"
    )
    cond = None
    for g in groups:
        c = df[g].eqNullSafe(tdf[f"_thr_{g}"])
        cond = c if cond is None else (cond & c)
    return (
        df.join(F.broadcast(tdf), cond)
        .where(F.col(score_col) >= F.col("_thr"))
        .drop("_thr", *[f"_thr_{g}" for g in groups])
    )


def weighted_take(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str,
    group_cols: Optional[List[str]] = None,
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): keep the ``n`` rows per group with the
    smallest exponential draw ``-ln(u)/w``, where ``u`` is a
    seeded-md5 uniform per row — inclusion probability proportional to
    ``weight_col``, reproducible anywhere (the draw depends only on
    (id, seed), never on partitioning or an engine RNG).

    The training-data use: importance-sample a corpus by quality score
    or domain weight while keeping the selection auditable. Rows with
    null/non-positive weight are excluded. One window shuffle; for the
    ungrouped case the sort is a top-n heap per partition via the
    rank filter, still bounded by n.
    """
    from pyspark.sql.window import Window

    groups = list(group_cols or [])
    # u in (0,1]: (int(md5[:15]) + 1) / (16^15 + 1) — never 0, so ln is safe
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    u = (F.conv(F.substring(h, 1, 15), 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        float(16**15) + 1.0
    )
    key = -F.log(u) / F.col(weight_col)
    part = Window.partitionBy(*groups) if groups else Window.partitionBy(F.lit(1))
    w = part.orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_wrn", F.row_number().over(w))
        .where(F.col("_wrn") <= n)
        .drop("_wrn")
    )


def top_fraction(
    df: DataFrame,
    score_col: str,
    fraction: float,
    group_cols: Optional[List[str]] = None,
    id_col: Optional[str] = None,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Percent-rank quality gate: keep the top ``fraction`` of rows by
    ``score_col`` within each group (whole table if ``group_cols`` is None).

    The training-data use: "keep the best 30% of each source by model
    score" — the standard quality-pruning step after scoring a corpus.

    Two physical strategies for the same contract:

    - **exact** (default): ``row_number`` over (group, score desc, id) vs
      the group count — deterministic, keeps exactly
      ``ceil(fraction * n_g)`` rows per group (ties broken by id, so the
      result is reproducible and SQL-oracle-expressible). Cost: one
      shuffle + per-group sort — fine when groups fit a sort budget.
    - **approx** (``approx=True``, the 100 TB path): a tiny per-group
      ``percentile_approx`` threshold aggregate (map-side combined,
      result is #groups rows), broadcast back, then a STATELESS filter
      ``score >= threshold``. No per-group sort of the big table at all;
      row count per group is approximate to the sketch's rank error.

    ``id_col`` is the exact path's deterministic tiebreaker (required
    there); ignored for approx.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0,1], got {fraction}")
    from pyspark.sql.window import Window

    groups = list(group_cols or [])
    if approx:
        agg = (df.groupBy(*groups) if groups else df.groupBy()).agg(
            F.percentile_approx(F.col(score_col), 1.0 - fraction, accuracy).alias(
                "_thr"
            )
        )
        if groups:
            # null-safe: groupBy emits a threshold row for a NULL group,
            # but a USING equality join could never match it back — the
            # untagged population silently vanished from the approx path
            # while the exact path's window kept it (r11 review; the
            # same class as the r10 apply_score_gate/iqr/mad fix)
            agg = agg.select(
                *[F.col(g).alias(f"_thr_{g}") for g in groups], "_thr"
            )
            cond = None
            for g in groups:
                c = df[g].eqNullSafe(agg[f"_thr_{g}"])
                cond = c if cond is None else (cond & c)
            joined = df.join(F.broadcast(agg), cond).drop(
                *[f"_thr_{g}" for g in groups]
            )
        else:
            joined = df.crossJoin(F.broadcast(agg))
        return joined.where(F.col(score_col) >= F.col("_thr")).drop("_thr")
    if id_col is None:
        raise ValueError("exact top_fraction needs id_col as a deterministic tiebreaker")
    part = Window.partitionBy(*groups) if groups else Window.partitionBy(F.lit(1))
    w = part.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(part))
        .where(F.col("_rn") <= F.ceil(F.col("_n") * F.lit(fraction)))
        .drop("_rn", "_n")
    )


def gopher_quality_flags(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_dup_3gram_frac: float = 0.5,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style rule flags per document (Rae et al. 2021, table A1
    — word-count bounds, mean-word-length band, repetition cap,
    stopword-presence), each as its own boolean column plus the AND of
    all of them:

        (id, n_words, mean_word_len, dup_3gram_frac, n_stop_hits,
         ok_n_words, ok_word_len, ok_repetition, ok_stopwords, keep)

    Exposing the individual flags (not just ``keep``) is what makes the
    filter auditable — a corpus report can show WHICH rule rejects how
    many documents. All per-row JVM expressions, zero shuffle.
    """
    from elephant_twin_spark.functions.binding import let

    # nested let-bindings (r16): t inside the gram lambda re-tokenized
    # per gram (O(tokens²)); t/g referenced several times across the
    # stat columns re-evaluated per reference (see functions/binding.py)
    def _feats(t: Column) -> Column:
        n_tok = F.size(t)
        n_chars = F.length(F.col(text_col))
        mean_wl = F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(
            F.lit(0.0)
        )
        # duplicate-3-gram fraction, inline (repeated_ngram_coverage twin)
        g_expr = F.when(n_tok < 3, F.array(F.col(text_col))).otherwise(
            F.transform(
                F.sequence(F.lit(0), n_tok - 3),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, 3)),
            )
        )
        dup_frac = lambda g: F.lit(1.0) - F.size(F.array_distinct(g)) / F.size(g)
        stop_arr = F.lit(list(STOPWORDS["en"]))
        n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, F.lower(x))))
        return F.struct(
            n_tok.alias("n_words"),
            F.round(mean_wl, 4).alias("mean_word_len"),
            F.round(let(g_expr, dup_frac), 4).alias("dup_3gram_frac"),
            n_stop.alias("n_stop_hits"),
        )

    out = df.select(
        F.col(id_col).alias("id"), let(tokens(F.col(text_col)), _feats).alias("_f")
    ).select(
        "id",
        F.col("_f.n_words").alias("n_words"),
        F.col("_f.mean_word_len").alias("mean_word_len"),
        F.col("_f.dup_3gram_frac").alias("dup_3gram_frac"),
        F.col("_f.n_stop_hits").alias("n_stop_hits"),
    )
    out = (
        out.withColumn(
            "ok_n_words",
            (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words),
        )
        .withColumn(
            "ok_word_len",
            (F.col("mean_word_len") >= min_mean_word_len)
            & (F.col("mean_word_len") <= max_mean_word_len),
        )
        .withColumn("ok_repetition", F.col("dup_3gram_frac") <= max_dup_3gram_frac)
        .withColumn("ok_stopwords", F.col("n_stop_hits") >= min_stopword_hits)
    )
    return out.withColumn(
        "keep",
        F.col("ok_n_words")
        & F.col("ok_word_len")
        & F.col("ok_repetition")
        & F.col("ok_stopwords"),
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, top_n: int = 20, min_df: int = 2
) -> DataFrame:
    """Corpus-level TF-IDF term ranking: ``(term, tf, df, score)`` for
    the ``top_n`` terms by ``tf * ln((N+1)/(df+1))``, deterministic
    tiebreak on term. The corpus-keyword/topic-drift diagnostic.

    One explode + one groupBy on the term key (tf and df come out of
    the same map-side-combinable aggregate). Terms below ``min_df``
    docs are dropped (hapax noise)."""
    n_docs = df.count()  # one scalar job; the N in the idf term
    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    stats = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("_doc").alias("df"),
    )
    scored = stats.where(F.col("df") >= min_df).withColumn(
        "score",
        F.round(
            F.col("tf")
            * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + F.lit(1.0))),
            6,
        ),
    )
    return scored.orderBy(F.col("score").desc(), F.col("term").asc()).limit(top_n)


def js_divergence_by_group(
    df: DataFrame, text_col: str, group_col: str
) -> DataFrame:
    """Per-group Jensen-Shannon divergence between the group's unigram
    distribution and the whole corpus's — the source-outlier detector
    (a crawl source whose term distribution drifts from the corpus is
    boilerplate, spam, or another language). ``(grp, n_tokens, js)``
    with js in [0, ln 2].

    Shape: one explode + a (term, grp) aggregate + a term-level join of
    the group distribution against the corpus distribution — all keyed
    by term, vocab-bounded, map-side combinable. JS (not KL) so a term
    absent from either side stays finite without smoothing."""
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    per_grp = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("c_g"))
    grp_tot = per_grp.groupBy("grp").agg(F.sum("c_g").alias("n_g"))
    corpus = per_grp.groupBy("term").agg(F.sum("c_g").alias("c_all"))
    corpus_tot = float(
        toks.count()
    )  # one scalar; the corpus token total
    j = (
        per_grp.join(F.broadcast(grp_tot), "grp")
        .join(corpus, "term")
        .select(
            "grp",
            "n_g",
            (F.col("c_g") / F.col("n_g")).alias("p"),
            (F.col("c_all") / F.lit(corpus_tot)).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2.0
    # terms with p=0 contribute only through q's side; q>0 always here
    # (corpus includes the group). Sum over the group's OBSERVED terms
    # plus the q-mass of unobserved terms handled via the 1 - sum(q) tail.
    contrib = 0.5 * F.col("p") * F.ln(F.col("p") / m) + 0.5 * F.col("q") * F.ln(
        F.col("q") / m
    )
    agg = j.groupBy("grp").agg(
        F.max("n_g").alias("n_tokens"),
        F.sum(contrib).alias("_js_obs"),
        F.sum("q").alias("_q_obs"),
    )
    # unobserved-term tail: for terms the group never emits, p=0 and the
    # integrand reduces to 0.5*q*ln(2); their total q mass is 1 - q_obs
    tail = 0.5 * (F.lit(1.0) - F.col("_q_obs")) * F.lit(math.log(2.0))
    return agg.select(
        "grp",
        "n_tokens",
        F.round(F.col("_js_obs") + tail, 6).alias("js"),
    )


def tokenizer_fertility(
    df: DataFrame, text_col: str, group_col: str
) -> DataFrame:
    """Per-group tokenizer fertility: BPE-ish subword tokens per
    whitespace word (and chars per subword) — the pre-training check
    that a tokenizer isn't pathologically expensive on some language or
    source. One narrow map + one groupBy."""
    n_words = token_count(F.col(text_col))
    n_sub = bpe_ish_token_count(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    per = df.select(
        F.col(group_col).alias("grp"),
        n_words.alias("_w"),
        n_sub.alias("_s"),
        n_chars.alias("_c"),
    ).where(F.col("_w") > 0)
    return per.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("_s") / F.sum("_w"), 6).alias("fertility"),
        F.round(F.sum("_c") / F.sum("_s"), 6).alias("chars_per_subword"),
    )


def code_score(df: DataFrame, text_col: str, out_col: str = "code_score") -> DataFrame:
    """Code-likeness heuristic in [0,1]: density of code-ish symbol
    characters (exactly the class ``{ } [ ] ( ) < > ; = #``) plus
    camelCase/snake_case identifier hits (underscores count via the
    identifier regex, not the symbol class), normalized by length — the
    cheap "is this prose or source code" router a mixed crawl needs
    before choosing a quality filter. Pure per-row JVM regex."""
    n_chars = F.greatest(F.length(F.col(text_col)), F.lit(1))
    sym = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[{}\[\]()<>;=#]"), 0))
    idents = F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"\b[a-z]+(?:_[a-z0-9]+|[A-Z][a-z0-9]+)\w*\b"), 0
        )
    )
    n_toks = F.greatest(token_count(F.col(text_col)), F.lit(1))
    score = F.least(
        F.lit(1.0),
        (sym / n_chars) * 8.0 + (idents / n_toks) * 0.5,
    )
    return df.withColumn(out_col, F.round(score, 6))


def _stable_slope(x: str, y: str) -> Column:
    """Decision-stable least-squares slope aggregate of ``y ~ x``:
    ``covar_pop/var_pop`` with three guards that make the emitted value
    hash-identical across engines, thread counts and plans —

    * degenerate regression (``var_pop(x)=0``: fewer than two distinct
      x points) → NULL, matching SQL ``regr_slope``;
    * near-zero slope (``|slope| < 1e-9``, i.e. a constant-``y`` input
      where the unrounded covariance is pure float summation noise
      whose sign depends on partial-sum order) → snapped to exact 0.0;
    * otherwise ``round(slope, 6) + 0.0`` — the ``+0.0`` collapses IEEE
      ``-0.0`` to ``+0.0`` so the sign bit can never differ.

    Added after the round-5 driver hash failure on a closed-vocabulary
    corpus (slope ≈ ±1e-17 rounding to engine-dependent signed zero)."""
    slope = F.covar_pop(x, y) / F.var_pop(x)
    return F.when(
        F.var_pop(x) > 0,
        F.when(F.abs(slope) < F.lit(1e-9), F.lit(0.0)).otherwise(
            F.round(slope, 6) + F.lit(0.0)
        ),
    )


# the SQL-side mirror of _stable_slope, for oracle restatements
STABLE_SLOPE_SQL = (
    "CASE WHEN var_pop({x}) > 0 THEN "
    "CASE WHEN abs(regr_slope({y}, {x})) < 1e-9 THEN 0.0 "
    "ELSE round(regr_slope({y}, {x}), 6) + 0.0 END END"
)


def zipf_slope(
    df: DataFrame, text_col: str, group_col: str, top_n: int = 100
) -> DataFrame:
    """Zipf-law slope per group: least-squares slope of ``ln(freq) ~
    ln(rank)`` over the group's ``top_n`` most frequent terms —
    natural-language corpora sit near −1; spam/boilerplate/markup
    drift far from it, making this a cheap whole-source health check.

    Shape: one (grp, term) count aggregate, a per-group rank window
    bounded to ``top_n`` rows per group, then a closed-form regression
    aggregate (covar_pop/var_pop) — no iteration, all JVM. Rank ties
    break by term so the rank assignment (and thus the slope) is
    deterministic cross-engine. Returns ``(grp, n_terms, slope)``."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(group_col).alias("grp"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    freq = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("grp").orderBy(F.col("cnt").desc(), F.col("term").asc())
    ranked = (
        freq.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select(
            "grp", F.ln("rank").alias("x"), F.ln("cnt").alias("y")
        )
    )
    return ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_terms"),
        _stable_slope("x", "y").alias("slope"),
    )


def sentence_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document sentence statistics: ``(id, n_sentences,
    avg_sentence_words)`` with sentences split on ``[.!?]+`` runs
    (trimmed, empties dropped) — the quality filter that catches
    wall-of-text and fragment-spam documents. Pure per-row expressions,
    no shuffle."""
    from elephant_twin_spark.functions.binding import let

    # total: NULL text reports 0 sentences (not NULL counts).
    # let-bound (r16): the sentence array was re-split per reference
    # (n_sentences + the word fold); the per-sentence word count uses
    # the tokenizer's cached-pattern regexp_extract_all form instead of
    # a per-call-compiled split (see functions/binding.py)
    sents_expr = F.coalesce(
        F.filter(
            F.transform(
                F.split(F.col(text_col), r"[.!?]+"), lambda s: F.trim(s)
            ),
            lambda s: s != F.lit(""),
        ),
        F.array().cast("array<string>"),
    )

    def _stats(sents: Column) -> Column:
        n_sent = F.size(sents)
        words = F.aggregate(
            sents,
            F.lit(0),
            lambda acc, s: acc
            + F.size(F.regexp_extract_all(s, F.lit(r"\S+"), 0)),
        )
        return F.struct(
            n_sent.alias("n_sentences"),
            F.when(n_sent > 0, F.round(words.cast("double") / n_sent, 6)).alias(
                "avg_sentence_words"
            ),
        )

    return df.select(
        F.col(id_col), let(sents_expr, _stats).alias("_s")
    ).select(
        id_col,
        F.col("_s.n_sentences").alias("n_sentences"),
        F.col("_s.avg_sentence_words").alias("avg_sentence_words"),
    )


def heaps_slope(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 50,
    shingle_k: int = 1,
) -> DataFrame:
    """Heaps'-law vocabulary-growth exponent: least-squares slope of
    ``ln(vocab) ~ ln(tokens)`` over cumulative (tokens-seen,
    distinct-terms-seen) checkpoints, reading the corpus in ``id_col``
    order. Natural text sits near 0.4-0.6; near-1 means unbounded
    novel-token churn (serial numbers, hashes — tokenizer poison), near-0
    means a closed vocabulary (template spam). The corpus-level
    companion to per-group ``zipf_slope``.

    ``shingle_k > 1`` measures vocabulary over overlapping k-token
    shingles (:func:`ngrams.ngram_array` semantics: docs shorter than k
    tokens contribute one whole-doc gram) instead of unigrams — the
    right unit for template-heavy corpora whose unigram vocabulary is
    closed (there the unigram curve saturates immediately and the slope
    degenerates to 0, evidencing nothing about growth).

    The slope is emitted through :func:`_stable_slope` (NULL when
    degenerate, exact 0.0 when the input is constant-vocabulary,
    sign-normalized otherwise) so the value is decision-stable across
    engines and partitionings.

    Shape: the curve is NEVER built doc-by-doc — each term contributes
    only its FIRST occurrence (a ``min(id)`` aggregate), docs contribute
    token counts (one aggregate), and both land in ``n_buckets``
    id-range buckets (bounds from a 1-row min/max scalar broadcast).
    The cumulative sums and the closed-form regression then run over
    ``n_buckets`` rows — a deliberately tiny single-partition window,
    bounded by the parameter, not the data. Returns one row:
    ``(n_points, total_tokens, total_vocab, slope)``.
    """
    from pyspark.sql.window import Window

    if shingle_k > 1:
        from elephant_twin_spark.operators.pipeline.ngrams import ngram_array

        unit = ngram_array(F.col(text_col), shingle_k)
    else:
        unit = tokens(F.col(text_col))
    toks = df.select(F.col(id_col).alias("id"), F.explode(unit).alias("term"))
    bounds = df.agg(
        F.min(F.col(id_col)).alias("lo"), F.max(F.col(id_col)).alias("hi")
    )
    span = (F.col("hi") - F.col("lo") + 1).cast("double")
    bkt = lambda c: F.least(
        F.lit(int(n_buckets) - 1),
        F.floor((c - F.col("lo")).cast("double") * int(n_buckets) / span).cast("int"),
    )
    # both contributions land in ONE bucket aggregate: term rows carry
    # (new_terms=1, toks=0), raw token rows carry (0, 1) — no per-doc
    # intermediate, no bucket-table join
    first_occ = (
        toks.groupBy("term").agg(F.min("id").alias("fid")).crossJoin(F.broadcast(bounds))
        .select(bkt(F.col("fid")).alias("bucket"), F.lit(1).alias("nt"), F.lit(0).alias("tk"))
    )
    tok_rows = toks.crossJoin(F.broadcast(bounds)).select(
        bkt(F.col("id")).alias("bucket"), F.lit(0).alias("nt"), F.lit(1).alias("tk")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    pts = (
        first_occ.unionByName(tok_rows)
        .groupBy("bucket")
        .agg(F.sum("nt").alias("new_terms"), F.sum("tk").alias("toks"))
        .withColumn("cum_vocab", F.sum("new_terms").over(w))
        .withColumn("cum_toks", F.sum("toks").over(w))
        .where((F.col("cum_vocab") > 0) & (F.col("cum_toks") > 0))
        .select(
            F.ln("cum_toks").alias("x"),
            F.ln("cum_vocab").alias("y"),
            "cum_vocab",
            "cum_toks",
        )
    )
    return pts.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.max("cum_toks").alias("total_tokens"),
        F.max("cum_vocab").alias("total_vocab"),
        _stable_slope("x", "y").alias("slope"),
    )
