"""Document chunking: split texts into fixed-size token windows with
overlap (training-sequence / retrieval-passage construction).

North-star addition (no reference analog; the byte-range splitting the
reference applies to files — `core/retrieval/BlockIndexedFileInputFormat.java:189-241`
— applied to token streams).

Pure higher-order-function implementation: per row, build the list of
window start offsets with `sequence`, slice the token array per start,
and `posexplode`. No UDFs, no shuffle — chunking is embarrassingly
parallel and stays inside whole-stage codegen, so it runs at scan
speed on any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elephant_twin_spark.operators.text import whitespace_tokenizer


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """One row per (document, window): ``(id_col, chunk_id, chunk_text,
    n_tokens)``.

    Windows start every `chunk_tokens - overlap` tokens; the final
    window may be short (no padding), and a window is only emitted if
    it contributes at least one token beyond the previous window's
    overlap region (no fully-redundant tail chunk). Empty documents
    produce no chunks. `overlap` must be smaller than `chunk_tokens`.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"overlap must be in [0, chunk_tokens), got {overlap}")
    stride = chunk_tokens - overlap

    # token array let-bound (r16): toks inside the chunk lambda
    # re-tokenized the document once per chunk (see functions/binding.py)
    from elephant_twin_spark.functions.binding import let

    def _chunks(toks):
        n = F.size(toks)
        # last start: largest multiple of stride with start + overlap < n
        # (clamped to 0 so short docs still yield their single chunk)
        last = F.greatest(
            F.lit(0),
            (F.floor((n - overlap - 1) / stride) * stride).cast("int"),
        )
        starts = F.when(n <= 0, F.array().cast("array<int>")).otherwise(
            F.sequence(F.lit(0), last, F.lit(stride))
        )
        return F.transform(
            starts, lambda s: F.concat_ws(" ", F.slice(toks, s + 1, chunk_tokens))
        )

    chunks = let(whitespace_tokenizer(F.col(text_col)), _chunks)
    out = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text")
    )
    return out.withColumn(
        "n_tokens", F.size(whitespace_tokenizer(F.col("chunk_text")))
    )


def truncate_tokens(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_tokens: int,
) -> DataFrame:
    """Head-truncate every document to its first ``max_tokens``
    whitespace tokens: ``(id_col, text, n_tokens, truncated)`` — the
    context-window guard applied corpus-wide before packing (a single
    10M-token document would otherwise own a whole pack). Same
    no-shuffle higher-order-function discipline as chunking; the
    truncated flag keeps the cut auditable."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    from elephant_twin_spark.functions.binding import let

    # total: NULL text behaves as the empty doc ("", 0 tokens, untruncated).
    # let-bound (r16): three references re-tokenized 3× per row
    toks_expr = F.coalesce(
        whitespace_tokenizer(F.col(text_col)), F.array().cast("array<string>")
    )

    def _row(toks):
        n = F.size(toks)
        return F.struct(
            F.concat_ws(" ", F.slice(toks, 1, max_tokens)).alias("text"),
            F.least(n, F.lit(max_tokens)).alias("n_tokens"),
            (n > max_tokens).alias("truncated"),
        )

    return df.select(F.col(id_col), let(toks_expr, _row).alias("_t")).select(
        id_col,
        F.col("_t.text").alias("text"),
        F.col("_t.n_tokens").alias("n_tokens"),
        F.col("_t.truncated").alias("truncated"),
    )
