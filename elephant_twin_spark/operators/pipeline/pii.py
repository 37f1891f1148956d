"""PII detection and redaction over text columns.

North-star addition (no reference analog). Pure built-in regexp
expressions (JVM codegen, no UDFs), so the scan stays whole-stage and
the same patterns can be restated in DuckDB's RE2 dialect for the
oracle gate — every pattern below avoids constructs that differ
between Java regex and RE2 (no backrefs, no lookaround).
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pattern table: name -> (regex, replacement token). Order matters:
# broader digit patterns run after the structured ones so e.g. an SSN
# is tagged <SSN>, not swallowed by the card-number pattern.
PII_PATTERNS: Dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    "phone": (r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    "card": (r"\b[0-9]{13,16}\b", "<CARD>"),
}


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII kind in `text`."""
    pattern, _ = PII_PATTERNS[kind]
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def pii_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Append one `n_<kind>` column per PII kind plus `n_pii` total."""
    out = df
    total = F.lit(0)
    for kind in PII_PATTERNS:
        c = pii_count(F.col(text_col), kind)
        out = out.withColumn(f"n_{kind}", c)
        total = total + F.col(f"n_{kind}")
    return out.withColumn("n_pii", total)


def redact(text: Column) -> Column:
    """Replace every PII occurrence with its type token, in the fixed
    PII_PATTERNS order (structured formats before bare digit runs)."""
    out = text
    for pattern, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_redact(df: DataFrame, text_col: str, out_col: str | None = None) -> DataFrame:
    """Redacted copy of `text_col` (in place unless `out_col` given)."""
    return df.withColumn(out_col or text_col, redact(F.col(text_col)))
