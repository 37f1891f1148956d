"""r12 regex/Unicode parity audit: the oracle gate compares the
engine's tokenization (Java regex via ``F.split(text, r"\\s+")``)
against DuckDB's (RE2 via ``regexp_split_to_array(text, '\\s+')``)
token for token, so any divergence between the two regex dialects on
characters the corpus contains is a FALSE-RED gate row waiting to
happen — and, for users, a silent contract question: which engine's
notion of "whitespace" does the pipeline mean?

Audit outcome: on the generated testdata (verified pure ASCII at all
three SFs) the dialects agree everywhere. Exactly two latent
divergences exist, pinned here so a Spark/DuckDB upgrade or a testdata
change that makes them LIVE is caught by name:

1. VERTICAL TAB (\\x0B): Java ``\\s`` = ``[ \\t\\n\\x0B\\f\\r]``
   includes it, RE2 ``\\s`` = ``[ \\t\\n\\f\\r]`` does not — Spark
   splits ``a\\x0Bb`` into two tokens, DuckDB keeps one.
2. ``lower('İ')`` (U+0130, Turkish dotted capital I): Java maps it to
   ``i`` + COMBINING DOT ABOVE (two codepoints), utf8proc (DuckDB)
   maps it to plain ``i``.

The ENGINE contract is the Java-regex / JVM-locale-insensitive
behavior (it is what executes at 100 TB); the oracle is a validation
twin whose parity is guaranteed on ASCII-whitespace corpora. All other
probed classes — NBSP, thin/ideographic/zero-width spaces, line/para
separators, form feed, CRLF, full-width letters, ß, emoji, combining
marks — tokenize and lowercase identically in both dialects.
"""

import duckdb
import pyspark.sql.functions as F
import pytest

from elephant_twin_spark.operators.text import whitespace_tokenizer

# name -> input string; every case a multilingual corpus plausibly contains
CASES = {
    "vtab": "a\x0bb",
    "file_sep": "a\x1cb",
    "nbsp": "a b",
    "thin_space": "a b",
    "ideographic_space": "a　b",
    "zero_width_space": "a​b",
    "line_sep": "a b",
    "form_feed": "a\x0cb",
    "crlf": "a\r\nb",
    "tab": "a\tb",
    "runs": "a  \t b",
    "leading_trailing": "  a b ",
    "turkish_I": "İI",
    "sharp_s": "ßS",
    "fullwidth": "ＡＢ c",
    "emoji": "👍 a",
    "combining": "é x",
}
# the ONLY cases where the two regex dialects are allowed to disagree
KNOWN_TOKEN_DIVERGENCE = {"vtab"}
KNOWN_LOWER_DIVERGENCE = {"turkish_I"}


@pytest.fixture(scope="module")
def both_engines(spark):
    sdf = spark.createDataFrame(list(CASES.items()), "k string, text string")
    spark_side = {
        r["k"]: (list(r["toks"]), r["low"])
        for r in sdf.select(
            "k",
            whitespace_tokenizer(F.col("text")).alias("toks"),
            F.lower("text").alias("low"),
        ).collect()
    }
    con = duckdb.connect()
    duck_side = {}
    for k, v in CASES.items():
        toks = [
            t
            for t in con.execute(
                "select regexp_split_to_array(?, '\\s+')", [v]
            ).fetchone()[0]
            if t != ""
        ]
        low = con.execute("select lower(?)", [v]).fetchone()[0]
        duck_side[k] = (toks, low)
    return spark_side, duck_side


def test_tokenizer_parity_everywhere_but_vtab(both_engines):
    spark_side, duck_side = both_engines
    diverged = {
        k for k in CASES if spark_side[k][0] != duck_side[k][0]
    }
    assert diverged == KNOWN_TOKEN_DIVERGENCE, (
        f"tokenizer dialect divergence changed: {sorted(diverged)} "
        f"(expected exactly {sorted(KNOWN_TOKEN_DIVERGENCE)})"
    )
    # pin the engine contract for the divergent case: Java \s splits it
    assert spark_side["vtab"][0] == ["a", "b"]
    assert duck_side["vtab"][0] == ["a\x0bb"]


def test_lower_parity_everywhere_but_turkish_I(both_engines):
    spark_side, duck_side = both_engines
    diverged = {k for k in CASES if spark_side[k][1] != duck_side[k][1]}
    assert diverged == KNOWN_LOWER_DIVERGENCE, (
        f"lower() dialect divergence changed: {sorted(diverged)} "
        f"(expected exactly {sorted(KNOWN_LOWER_DIVERGENCE)})"
    )
    assert spark_side["turkish_I"][1] == "i̇i"  # JVM: i + combining dot
    assert duck_side["turkish_I"][1] == "ii"


def test_testdata_is_divergence_free():
    """The latent divergences stay latent: no testdata document contains
    a character outside ASCII, so the oracle gate cannot hit them. If
    the driver ever regenerates multilingual testdata, this fails first
    and points at the pinned contract above."""
    import glob

    con = duckdb.connect()
    paths = sorted(glob.glob("/root/testdata/sf*/documents.parquet"))
    assert paths, "no testdata found"
    for p in paths:
        n = con.execute(
            f"select count(*) from read_parquet('{p}') "
            "where regexp_matches(text, '[^\\x00-\\x7F]')"
            " or text like '%' || chr(11) || '%'"
        ).fetchone()[0]
        assert n == 0, f"{p}: {n} documents contain divergence-prone chars"
