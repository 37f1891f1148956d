"""Property-based pins for pipeline primitives that previously had only
example-based coverage (r12). Hypothesis generates the corpora; each
property compares the Spark expression against a plain-Python reference
executed on the same rows, so the pin is semantic, not a snapshot.
"""

import re

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elephant_twin_spark.operators.pipeline import decontaminate, quota

# printable-ascii words (the regex-dialect contract pins non-ASCII
# separately in test_r12_regex_parity.py)
_word = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=6
)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


def _py_ngrams(text: str, n: int) -> set:
    toks = [t for t in re.split(r"\s+", text) if t != ""]
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_doc, min_size=1, max_size=8), n=st.integers(1, 4))
def test_ngram_set_matches_python_reference(spark, docs, n):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "id int, text string")
    got = {
        r["id"]: set(r["g"])
        for r in df.select("id", decontaminate.ngram_set(F.col("text"), n).alias("g")).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == _py_ngrams(d, n), (d, n)


def test_ngram_set_null_text_is_empty_array(spark):
    df = spark.createDataFrame([(1, None)], "id int, text string")
    row = df.select(decontaminate.ngram_set(F.col("text"), 2).alias("g")).first()
    assert row["g"] == []


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),       # group
            st.integers(0, 5),                       # quality (ties likely)
            st.integers(0, 10_000),                  # id
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[2],
    ),
    cap=st.integers(1, 4),
)
def test_per_group_cap_is_deterministic_and_bounded(spark, rows, cap):
    df = spark.createDataFrame(rows, "grp string, q int, id int")
    ref = {}
    for g, q, i in rows:
        ref.setdefault(g, []).append((-q, i))
    expected = {
        g: {i for _, i in sorted(v)[:cap]} for g, v in ref.items()
    }
    for shuffle in (2, 7):  # determinism across physical layouts
        got = {}
        out = quota.per_group_cap(
            df.repartition(shuffle), "grp", cap, order_col="q", id_col="id"
        ).collect()
        for r in out:
            got.setdefault(r["grp"], set()).add(r["id"])
        assert got == expected, (rows, cap, shuffle)
        assert all(len(v) <= cap for v in got.values())


def test_per_group_cap_requires_an_order():
    with pytest.raises(ValueError, match="deterministic"):
        quota.per_group_cap(None, "grp", 3)


def test_pii_redact_is_idempotent(spark):
    """Redaction tokens must not themselves match any PII pattern —
    redact(redact(x)) == redact(x), so a pipeline re-running the scrub
    over already-scrubbed text is a no-op, not a corruption."""
    from elephant_twin_spark.operators.pipeline import pii

    samples = [
        "mail me at a.b+c@d-e.org or call 555-123-4567",
        "ssn 123-45-6789 ip 10.0.0.255 card 4111111111111111",
        "no pii here",
        "",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "id int, text string")
    once = {r["id"]: r["text"] for r in pii.pii_redact(df, "text").collect()}
    df2 = spark.createDataFrame([(i, s) for i, s in once.items()], "id int, text string")
    twice = {r["id"]: r["text"] for r in pii.pii_redact(df2, "text").collect()}
    assert once == twice
    assert "<EMAIL>" in once[0] and "<PHONE>" in once[0]
    assert "<SSN>" in once[1] and "<IP>" in once[1] and "<CARD>" in once[1]
