"""Tests for decontamination, PII redaction, and sequence packing."""

import pytest
from pyspark.sql import functions as F

from elephant_twin_spark.operators.pipeline import decontaminate, pack, pii


# ------------------------------------------------------------- decontaminate


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "an entirely different document about spark plans"),
            (3, "quick brown fox jumps over the lazy cat instead"),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )


def _eval_set(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )


def test_contamination_report_flags_overlap(spark):
    rep = decontaminate.contamination_report(
        _corpus(spark), _eval_set(spark), "text", "doc_id", n=5
    ).orderBy("doc_id")
    rows = {r["doc_id"]: r for r in rep.collect()}
    assert rows[1]["contaminated"]  # shares 5-grams verbatim
    assert rows[3]["contaminated"]  # "quick brown fox jumps over" etc.
    assert not rows[2]["contaminated"]
    # < n tokens: no grams, never contaminated, but still present
    assert rows[4]["n_grams"] == 0 and not rows[4]["contaminated"]


def test_decontaminate_drops_only_contaminated(spark):
    clean = decontaminate.decontaminate(
        _corpus(spark), _eval_set(spark), "text", "doc_id", n=5
    )
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 4]
    assert clean.columns == ["doc_id", "text"]


def test_min_overlap_threshold(spark):
    # doc 3 shares fewer 5-grams than doc 1; a high threshold keeps it
    rep = decontaminate.contamination_report(
        _corpus(spark), _eval_set(spark), "text", "doc_id", n=5, min_overlap=4
    )
    rows = {r["doc_id"]: r["contaminated"] for r in rep.collect()}
    assert rows[1] and not rows[3]


# --------------------------------------------------------------------- pii


def test_pii_counts_and_redact(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com or jane.doe+x@sub.org today"),
            (2, "ssn 123-45-6789 phone 555-867-5309 ip 10.0.0.1"),
            (3, "card 4111111111111111 and nothing else"),
            (4, "clean text with numbers 42 and 2024"),
        ],
        "id long, text string",
    )
    counted = {r["id"]: r for r in pii.pii_counts(df, "text").collect()}
    assert counted[1]["n_email"] == 2 and counted[1]["n_pii"] == 2
    assert counted[2]["n_ssn"] == 1
    assert counted[2]["n_phone"] == 1
    assert counted[2]["n_ipv4"] == 1
    assert counted[3]["n_card"] == 1
    assert counted[4]["n_pii"] == 0

    red = {r["id"]: r["text"] for r in pii.pii_redact(df, "text").collect()}
    assert red[1] == "mail <EMAIL> or <EMAIL> today"
    assert red[2] == "ssn <SSN> phone <PHONE> ip <IP>"
    assert red[3] == "card <CARD> and nothing else"
    assert red[4] == "clean text with numbers 42 and 2024"


def test_pii_structured_formats_win_over_card(spark):
    # an SSN must not be half-eaten by the bare-digit card pattern
    df = spark.createDataFrame([(1, "123-45-6789")], "id long, text string")
    assert pii.pii_redact(df, "text").first()["text"] == "<SSN>"


# --------------------------------------------------------------------- pack


def test_pack_sequences_offsets_and_ids(spark):
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate([4, 4, 4, 4, 10, 2])],
        "doc_id long, text string",
    )
    packed = pack.pack_sequences(df, "text", "doc_id", budget=10).orderBy("doc_id")
    rows = packed.collect()
    assert [r["offset"] for r in rows] == [0, 4, 8, 12, 16, 26]
    # doc 2 starts at offset 8 (< 10): belongs to pack 0 (straddles)
    assert [r["pack_id"] for r in rows] == [0, 0, 0, 1, 1, 2]


def test_pack_manifest_totals(spark):
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * 5)) for i in range(6)], "doc_id long, text string"
    )
    man = pack.pack_manifest(df, "text", "doc_id", budget=10).orderBy("pack_id")
    rows = man.collect()
    assert [r["doc_ids"] for r in rows] == [[0, 1], [2, 3], [4, 5]]
    assert all(r["total_tokens"] == 10 for r in rows)


def test_pack_partitioned_independent(spark):
    df = spark.createDataFrame(
        [(i, "a b c", "s%d" % (i % 2)) for i in range(4)],
        "doc_id long, text string, src string",
    )
    packed = pack.pack_sequences(df, "text", "doc_id", budget=4, partition_col="src")
    rows = {r["doc_id"]: r for r in packed.collect()}
    # per-partition offsets restart at 0
    assert rows[0]["offset"] == 0 and rows[1]["offset"] == 0
    assert rows[2]["offset"] == 3 and rows[3]["offset"] == 3


def test_pack_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack.pack_sequences(df, "text", "doc_id", budget=0)


def test_js_divergence_detects_outlier_source(spark):
    """A source whose vocabulary diverges from the corpus must score a
    materially higher JS than in-distribution sources; values bounded
    by [0, ln 2]."""
    import math

    from pyspark.sql import Row

    from elephant_twin_spark.operators.pipeline import textstats

    rows = [
        Row(id=i, src=f"s{i % 3}", text="the quick brown fox jumps over lazy dog")
        for i in range(30)
    ] + [Row(id=100 + i, src="weird", text="zzz qqq xxx vvv kkk jjj www") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, src string, text string")
    got = {r["grp"]: r["js"] for r in textstats.js_divergence_by_group(df, "text", "src").collect()}
    assert all(0.0 <= v <= math.log(2) + 1e-9 for v in got.values())
    normal = max(v for k, v in got.items() if k != "weird")
    assert got["weird"] > 3 * max(normal, 1e-6), got


def test_tokenizer_fertility_orders_sources(spark):
    """Punctuation-heavy text fragments into more BPE-ish subwords per
    word -> higher fertility."""
    from pyspark.sql import Row

    from elephant_twin_spark.operators.pipeline import textstats

    rows = [Row(id=i, src="plain", text="simple words only here") for i in range(5)]
    rows += [Row(id=10 + i, src="punct", text="a-b.c,d!e f@g#h i;j:k l(m)n") for i in range(5)]
    df = spark.createDataFrame(rows, "id long, src string, text string")
    got = {r["grp"]: r for r in textstats.tokenizer_fertility(df, "text", "src").collect()}
    assert got["punct"]["fertility"] > got["plain"]["fertility"]
    assert got["plain"]["fertility"] >= 1.0


def test_bigram_lm_prefers_fluent_order(spark):
    """Context sensitivity: the same tokens in training order score
    higher under the bigram LM than in shuffled order — the distinction
    a unigram model cannot make."""
    from pyspark.sql import Row

    from elephant_twin_spark.operators.pipeline import lmscore

    fluent = "the cat sat on the mat"
    train = [Row(id=i, text=fluent) for i in range(20)]
    probe = [
        Row(id=1000, text=fluent),
        Row(id=1001, text="mat the on sat cat the"),  # same unigrams, shuffled
    ]
    df = spark.createDataFrame(train + probe, "id long, text string")
    bi, uni = lmscore.bigram_model(df, "text")
    scored = {
        r["id"]: r["bigram_logprob"]
        for r in lmscore.bigram_logprob(df, "text", "id", bi, uni).collect()
        if r["id"] >= 1000
    }
    assert scored[1000] > scored[1001]

    # unigram model CANNOT distinguish them (same token multiset)
    from elephant_twin_spark.operators.pipeline import lmscore as lm

    u = {r["id"]: r["logprob"] for r in lm.unigram_logprob(df, "text", "id").collect() if r["id"] >= 1000}
    assert abs(u[1000] - u[1001]) < 1e-9


def test_bloom_contamination_no_false_negatives(spark):
    """The Bloom screen must flag EVERY doc the exact report flags
    (false-positive-only contract) and stay close on the clean side."""
    from elephant_twin_spark.operators.pipeline import decontaminate
    from elephant_twin_spark.sources import tables

    import tests.conftest as c

    docs = tables.load_raw(spark, f"{c.SF_DIR}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    eval_df = docs.where(F.col("doc_id") % 7 == 0)
    exact = decontaminate.contamination_report(corpus, eval_df, "text", "doc_id", n=5)
    bloom = decontaminate.bloom_contamination_report(
        corpus, eval_df, "text", "doc_id", n=5, num_bits=1 << 18
    )
    e = {r["doc_id"]: r["contaminated"] for r in exact.collect()}
    b = {r["doc_id"]: r["contaminated"] for r in bloom.collect()}
    assert set(e) == set(b)
    # no false negatives
    missed = [d for d in e if e[d] and not b[d]]
    assert missed == []
    # false positives bounded (64k bits for this gram count is roomy)
    fp = sum(1 for d in e if b[d] and not e[d])
    assert fp <= max(3, int(0.02 * len(e))), fp


def test_code_score_separates_code_from_prose(spark):
    from pyspark.sql import Row

    from elephant_twin_spark.operators.pipeline import textstats

    df = spark.createDataFrame(
        [
            Row(id=1, text="def foo(bar_baz): return {x: y[i] for i in range(10)};"),
            Row(id=2, text="the quiet afternoon settled over the harbor town"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["code_score"] for r in textstats.code_score(df, "text").collect()}
    assert got[1] > 0.4
    assert got[2] < 0.1
    assert all(0.0 <= v <= 1.0 for v in got.values())


def test_pack_sequences_matches_python_reference(spark):
    """Seeded random corpora: offsets/pack ids must equal the sequential
    Python reference (cumulative tokens in id order, pack = offset //
    budget), with and without a partition column."""
    import random

    from pyspark.sql import Row

    rng = random.Random(29)
    rows = [
        Row(
            doc_id=i,
            text=" ".join(["w"] * rng.randint(1, 30)),
            src=f"s{rng.randint(0, 2)}",
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    for part_col in (None, "src"):
        got = {
            r["doc_id"]: (r["offset"], r["pack_id"])
            for r in pack.pack_sequences(df, "text", "doc_id", 64, part_col).collect()
        }
        groups = {}
        for r in rows:
            groups.setdefault(r.src if part_col else "_", []).append(r)
        want = {}
        for g in groups.values():
            off = 0
            for r in sorted(g, key=lambda x: x.doc_id):
                want[r.doc_id] = (off, off // 64)
                off += len(r.text.split())
        assert got == want, f"partition_col={part_col}"
