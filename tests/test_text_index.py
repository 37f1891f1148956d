"""Text index tests — count/top-N/sample/boolean vs the naive oracle
(FIXTURES.md §4.6): WHERE array_contains(split(text,'\\s+'), term)."""

import pyspark.sql.functions as F
import pytest

from elephant_twin_spark import Engine
from elephant_twin_spark.operators.text import parse_query, _Term, _Bool


@pytest.fixture(scope="module")
def eng(spark, workdir, docs_path):
    e = Engine(spark, f"{workdir}/text_index_root")
    e.build_text_index(docs_path, "text", "doc_id")
    return e


@pytest.fixture(scope="module")
def docs(spark, docs_path):
    from elephant_twin_spark.sources import tables

    return tables.load_raw(spark, docs_path).cache()


def naive_match(docs, term):
    return docs.where(
        F.array_contains(F.filter(F.split("text", r"\s+"), lambda t: t != F.lit("")), term)
    )


def test_count_matches_naive(eng, docs, docs_path):
    ti = eng.text_index(docs_path, "text")
    for term in ["spark", "join", "the", "zzz_absent"]:
        assert ti.count(term) == naive_match(docs, term).count()


def test_boolean_and_or(eng, docs, docs_path):
    ti = eng.text_index(docs_path, "text")
    got_and = ti.count("spark AND join")
    want_and = naive_match(naive_match(docs, "spark"), "join").count()
    assert got_and == want_and

    got_or = ti.count("spark OR zzz_absent")
    assert got_or == ti.count("spark")

    # parenthesized mixed query
    got = {r["doc_id"] for r in ti.matches("(spark OR join) AND window").collect()}
    want = {
        r["doc_id"]
        for r in docs.where(
            (
                F.array_contains(F.split("text", r"\s+"), "spark")
                | F.array_contains(F.split("text", r"\s+"), "join")
            )
            & F.array_contains(F.split("text", r"\s+"), "window")
        ).collect()
    }
    assert got == want


def test_topn_deterministic_and_scored(eng, docs, docs_path):
    ti = eng.text_index(docs_path, "text")
    top = ti.top_n("spark", 5).collect()
    assert len(top) == 5
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)
    # score of a single-term query == tf == occurrences in the doc
    doc0 = docs.where(F.col("doc_id") == top[0]["doc_id"]).first()
    tf = len([t for t in doc0["text"].split() if t == "spark"])
    assert top[0]["score"] == tf
    # deterministic across invocations
    again = ti.top_n("spark", 5).collect()
    assert [tuple(r) for r in top] == [tuple(r) for r in again]


def test_sample_without_replacement(eng, docs_path):
    ti = eng.text_index(docs_path, "text")
    s = ti.sample("spark", 7, seed=1).collect()
    assert len(s) == 7
    assert len({r["doc_id"] for r in s}) == 7
    # seeded → reproducible
    s2 = ti.sample("spark", 7, seed=1).collect()
    assert {r["doc_id"] for r in s} == {r["doc_id"] for r in s2}


def test_retrieve_fields(eng, docs_path):
    ti = eng.text_index(docs_path, "text")
    got = ti.retrieve("spark", ["lang", "source"], 3)
    assert got.columns == ["doc_id", "score", "lang", "source"]
    assert got.count() == 3


def test_parser():
    t = parse_query("a AND b OR c")
    assert isinstance(t, _Bool) and t.op == "OR"
    t2 = parse_query("a b")  # implicit OR (Lucene default operator)
    assert isinstance(t2, _Bool) and t2.op == "OR"
    t3 = parse_query("(a OR b) AND c")
    assert isinstance(t3, _Bool) and t3.op == "AND"
    assert isinstance(parse_query("solo"), _Term)
    with pytest.raises(ValueError):
        parse_query("   ")


def test_phrase_query(spark, workdir, docs_path):
    from elephant_twin_spark.operators import text as T

    eng_root = f"{workdir}/text_phrase_root"
    T.build_text_index(spark, docs_path, "text", "doc_id", eng_root, num_buckets=4)
    ti = T.TextIndex(spark, docs_path, "text", eng_root)

    import re
    docs = spark.read.parquet(docs_path).select("doc_id", "text").collect()

    def brute(phrase):
        pat = re.compile(r"(^|\s)" + r"\s+".join(map(re.escape, phrase.split())) + r"(\s|$)")
        return {r["doc_id"] for r in docs if pat.search(r["text"])}

    for phrase in ["sort merge", "table table", "no such phrase here"]:
        got = {r["doc_id"] for r in ti.matches(f'"{phrase}"').collect()}
        assert got == brute(phrase), phrase

    # phrases compose with boolean operators
    both = {r["doc_id"] for r in ti.matches('"sort merge" AND spark').collect()}
    spark_docs = {r["doc_id"] for r in ti.matches("spark").collect()}
    assert both == brute("sort merge") & spark_docs
    either = {r["doc_id"] for r in ti.matches('"sort merge" OR "table table"').collect()}
    assert either == brute("sort merge") | brute("table table")

    # single-term "phrase" degrades to a term query
    assert {r["doc_id"] for r in ti.matches('"spark"').collect()} == spark_docs


def test_proximity_phrase(spark, workdir):
    from elephant_twin_spark.operators import text as T

    src = f"{workdir}/prox_docs"
    rows = [
        (0, "alpha beta gamma"),          # adjacent
        (1, "alpha filler beta gamma"),   # one gap before beta
        (2, "alpha x y z beta"),          # far apart
        (3, "beta alpha"),                # reversed
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(src)
    root = f"{workdir}/prox_root"
    T.build_text_index(spark, src, "text", "doc_id", root, num_buckets=2)
    ti = T.TextIndex(spark, src, "text", root)

    def ids(q):
        return {r["doc_id"] for r in ti.matches(q).collect()}

    assert ids('"alpha beta"') == {0}
    # window [p+1-slop, p+1+slop]: slop 1 admits one inserted word
    assert ids('"alpha beta"~1') == {0, 1}
    # slop 2 reaches the reversed-adjacent case (beta one LEFT of alpha)
    assert ids('"alpha beta"~2') == {0, 1, 3}
    assert ids('"alpha beta"~4') == {0, 1, 2, 3}
    # gamma sits 2 right of alpha in doc1 ("alpha filler beta gamma" has
    # it at +3) — slop 1 covers doc0 only, slop 2 adds doc1
    assert ids('"alpha gamma"~1') == {0}
    assert ids('"alpha gamma"~2') == {0, 1}


def test_bm25_scoring(spark, workdir):
    from elephant_twin_spark.operators import text as T

    src = f"{workdir}/bm25_docs"
    rows = [
        (0, "rare common common common"),     # has the rare term, short
        (1, "common common common common common common common common"),
        (2, "rare " + "filler " * 50 + "common"),  # rare term, long doc
        (3, "common common"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(src)
    root = f"{workdir}/bm25_root"
    T.build_text_index(spark, src, "text", "doc_id", root, num_buckets=2)
    ti = T.TextIndex(spark, src, "text", root)

    scores = {r["doc_id"]: r["score"] for r in ti.matches("rare OR common", "bm25").collect()}
    assert set(scores) == {0, 1, 2, 3}
    # rare-term docs outrank the common-only doc stuffed with repetitions
    assert scores[0] > scores[1], scores
    # shorter rare-doc beats longer rare-doc (length normalization)
    assert scores[0] > scores[2], scores

    # TF scoring still available and different in shape
    tf_scores = {r["doc_id"]: r["score"] for r in ti.matches("rare OR common", "tf").collect()}
    assert tf_scores[1] == 8  # pure term-frequency sum

    top = ti.top_n("rare", 2, scoring="bm25").collect()
    assert {r["doc_id"] for r in top} == {0, 2}


# ---------------------------------------------------- multi-term query kinds

def _toks():
    return F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))


def test_prefix_query(eng, docs, docs_path):
    ti = eng.text_index(docs_path, "text")
    got = {r["doc_id"] for r in ti.matches("sc*").collect()}
    want = {
        r["doc_id"]
        for r in docs.where(
            F.exists(_toks(), lambda t: t.startswith("sc"))
        ).collect()
    }
    assert got == want and got  # non-empty

    # prefix expansion unions with plain terms through booleans
    assert ti.count("sc* OR join") >= ti.count("sc*")
    assert ti.count("sc* AND join") <= ti.count("join")


def test_wildcard_query(eng, docs, docs_path):
    ti = eng.text_index(docs_path, "text")
    got = {r["doc_id"] for r in ti.matches("s?a*").collect()}
    want = {
        r["doc_id"]
        for r in docs.where(F.exists(_toks(), lambda t: t.rlike("^s.a.*$"))).collect()
    }
    assert got == want and got
    # '?' is exactly one char: 'scan' matches s?an, 'san' would not
    assert ti.count("s?an") == ti.count("scan")


def test_fuzzy_query(eng, docs, docs_path):
    ti = eng.text_index(docs_path, "text")
    got = {r["doc_id"] for r in ti.matches("spork~1").collect()}
    want = {
        r["doc_id"]
        for r in docs.where(
            F.exists(_toks(), lambda t: F.levenshtein(t, F.lit("spork")) <= 1)
        ).collect()
    }
    assert got == want and got
    # ~0 degenerates to exact match
    assert ti.count("spark~0") == ti.count("spark")
    # default edit distance is 2 (Lucene default)
    assert ti.count("spork~") == ti.count("spork~2")


def test_not_query(eng, docs, docs_path):
    ti = eng.text_index(docs_path, "text")
    got = {r["doc_id"] for r in ti.matches("spark AND NOT join").collect()}
    want = {
        r["doc_id"]
        for r in docs.where(
            F.array_contains(_toks(), "spark") & ~F.array_contains(_toks(), "join")
        ).collect()
    }
    assert got == want and got
    # complement partitions the positive set
    assert ti.count("spark AND NOT join") + ti.count("spark AND join") == ti.count(
        "spark"
    )


def test_pure_negative_rejected(eng, docs_path):
    ti = eng.text_index(docs_path, "text")
    with pytest.raises(ValueError, match="pure-negative"):
        ti.matches("NOT spark")
    with pytest.raises(ValueError, match="pure-negative"):
        ti.matches("spark OR NOT join")  # OR needs all-positive branches
    # but NOT under AND inside an OR branch is fine
    assert ti.count("(spark AND NOT join) OR merge") >= 0


def test_multiterm_parser():
    from elephant_twin_spark.operators.text import (
        _Fuzzy,
        _Not,
        _Prefix,
        _Wildcard,
        parse_query,
    )

    assert parse_query("pre*") == _Prefix("pre")
    assert parse_query("w?ld*") == _Wildcard("w?ld*")
    assert parse_query("term~1") == _Fuzzy("term", 1)
    assert parse_query("term~") == _Fuzzy("term", 2)
    node = parse_query("a AND NOT b")
    assert isinstance(node.parts[1], _Not)


def test_more_like_this_matches_naive(eng, docs, docs_path):
    """lnc.ltc cosine against a pure-Python oracle over all docs."""
    import math
    from collections import Counter

    ti = eng.text_index(docs_path, "text")
    qid = 7
    got = [(r["doc_id"], r["score"]) for r in ti.more_like_this(qid, k=10).collect()]

    rows = {r["doc_id"]: r["text"].split() for r in docs.collect()}
    n_docs = len(rows)
    tfs = {d: Counter(toks) for d, toks in rows.items()}
    dfc = Counter()
    for d, tf in tfs.items():
        dfc.update(tf.keys())
    qtf = tfs[qid]
    wq = {
        t: (1 + math.log(c)) * math.log(n_docs / dfc[t]) for t, c in qtf.items()
    }
    qn = math.sqrt(sum(w * w for w in wq.values()))
    want = []
    for d, tf in tfs.items():
        if d == qid:
            continue
        dot = sum(w * (1 + math.log(tf[t])) for t, w in wq.items() if t in tf)
        if dot == 0:
            continue
        dn = math.sqrt(sum((1 + math.log(c)) ** 2 for c in tf.values()))
        want.append((d, round(dot / (qn * dn), 6)))
    want.sort(key=lambda x: (-x[1], x[0]))
    assert [d for d, _ in got] == [d for d, _ in want[:10]]
    for (gd, gs), (wd, ws) in zip(got, want[:10]):
        assert abs(gs - ws) < 1e-5, (gd, gs, ws)


def test_more_like_this_missing_doc(eng, docs_path):
    ti = eng.text_index(docs_path, "text")
    assert ti.more_like_this(10**9, k=5).count() == 0


def test_keywords_tfidf(eng, docs, docs_path):
    import math
    from collections import Counter

    ti = eng.text_index(docs_path, "text")
    got = ti.keywords(k=3).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["score"]))
    assert all(len(v) == 3 for v in by_doc.values())

    rows = {r["doc_id"]: r["text"].split() for r in docs.collect()}
    n = len(rows)
    dfc = Counter()
    for toks in rows.values():
        dfc.update(set(toks))
    qid = min(by_doc)
    tf = Counter(rows[qid])
    want = sorted(
        ((t, (1 + math.log(c)) * math.log(n / dfc[t])) for t, c in tf.items()),
        key=lambda x: (-x[1], x[0]),
    )[:3]
    got_q = sorted(by_doc[qid])
    for (rank, term, score), (wt, ws) in zip(got_q, want):
        assert term == wt and abs(score - ws) < 1e-9


def test_english_stem_tokenizer_end_to_end(spark, workdir):
    """T1 pluggable-analyzer parity: build with the stemming analyzer by
    NAME, query with inflected forms — the query-side mirror must apply
    the same normalization."""
    from pyspark.sql import Row

    from elephant_twin_spark.engine import Engine

    path = f"{workdir}/stem_corpus"
    spark.createDataFrame(
        [
            Row(doc_id=1, text="The Foxes were jumping over sleeping dogs"),
            Row(doc_id=2, text="A fox jumps over the dog"),
            Row(doc_id=3, text="Parquet row groups carry column statistics"),
        ]
    ).write.mode("overwrite").parquet(path)
    eng = Engine(spark, f"{workdir}/stem_idx")
    eng.build_text_index(path, "text", "doc_id", tokenizer_name="english_stem")
    ti = eng.text_index(path, "text")
    # 'Foxes'/'fox' → 'fox'; 'jumping'/'jumps' → 'jump' on both sides
    assert ti.count("fox") == 2
    assert ti.count("jumping") == 2
    assert ti.count("Jumps AND Fox") == 2
    assert ti.count("statistic") == 1          # 'statistics' stemmed
    assert ti.count("parquet") == 1            # case folded


def test_word_analyzer_multi_token_query_term(spark, workdir):
    """A query term that the analyzer splits (hyphenated/underscored)
    must match as a phrase over the split tokens, not as a fused string
    no document contains."""
    from pyspark.sql import Row

    from elephant_twin_spark.engine import Engine

    path = f"{workdir}/word_multi_corpus"
    spark.createDataFrame(
        [
            Row(doc_id=1, text="the state-of-the-art engine uses foo_bar naming"),
            Row(doc_id=2, text="state machines of an art gallery"),
        ]
    ).write.mode("overwrite").parquet(path)
    eng = Engine(spark, f"{workdir}/word_multi_idx")
    eng.build_text_index(path, "text", "doc_id", tokenizer_name="word")
    ti = eng.text_index(path, "text")
    # doc 1 has the consecutive token run; doc 2 has the tokens scattered
    assert ti.count("state-of-the-art") == 1
    assert ti.count("foo_bar") == 1
    assert ti.count("State-Of-The-Art") == 1


def test_word_analyzer_unicode_combining_marks(spark, workdir):
    """Build/query tokenization must agree on NFD-decomposed text: the
    JVM build side splits on combining marks (category M, outside
    \\p{L}\\p{N}), so the Python query mirror must too — an NFD 'café'
    query term analyzes to 'cafe' on both sides and matches."""
    import unicodedata

    from pyspark.sql import Row

    from elephant_twin_spark.engine import Engine

    nfd_cafe = unicodedata.normalize("NFD", "café")
    assert len(nfd_cafe) == 5  # really decomposed
    path = f"{workdir}/nfd_corpus"
    spark.createDataFrame(
        [
            Row(doc_id=1, text=f"the {nfd_cafe} opens early"),
            Row(doc_id=2, text="unrelated document"),
        ]
    ).write.mode("overwrite").parquet(path)
    eng = Engine(spark, f"{workdir}/nfd_idx")
    eng.build_text_index(path, "text", "doc_id", tokenizer_name="word")
    ti = eng.text_index(path, "text")
    assert ti.count(nfd_cafe) == 1          # NFD query term
    assert ti.count("cafe") == 1            # the stripped form both sides store


def test_refresh_preserves_stemming_analyzer(spark, workdir):
    """Incremental refresh must tokenize delta files with the analyzer
    recorded in the descriptor, not the whitespace default."""
    from pyspark.sql import Row

    from elephant_twin_spark.engine import Engine
    from elephant_twin_spark.streaming import refresh as refresh_mod

    path = f"{workdir}/stem_refresh_corpus"
    spark.createDataFrame(
        [Row(doc_id=1, text="A fox jumps over the dog")]
    ).write.mode("overwrite").parquet(path)
    eng = Engine(spark, f"{workdir}/stem_refresh_idx")
    eng.build_text_index(path, "text", "doc_id", tokenizer_name="english_stem")
    # append a new data file with inflected forms only
    spark.createDataFrame(
        [Row(doc_id=2, text="The Foxes were jumping over sleeping dogs")]
    ).write.mode("append").parquet(path)
    refresh_mod.refresh_text_index(spark, path, "text", eng.index_root)
    ti = eng.text_index(path, "text")
    assert ti.count("fox") == 2      # stems from BOTH files
    assert ti.count("jumping") == 2
