"""Streaming near-duplicate ingest gate.

The production shape for continuous corpus ingest: a persisted LSH
bucket index (:mod:`operators.lsh`) holds everything accepted so far;
each arriving micro-batch is (1) gated against the index, (2) deduped
against itself, (3) appended — survivors to the corpus sink, their
bands to the index — so batch N+1 automatically dedups against batch
N's survivors. MinHash banding needs aggregation, which streaming
DataFrames can't express stateless-ly, so the gate runs inside
``foreachBatch`` where each micro-batch is an ordinary batch frame;
Structured Streaming's sequential batch commit gives the
read-then-append cycle exactly-once semantics per batch.

State cost: the index grows with *accepted* documents only (num_bands
rows each); no Spark state store is involved, so restart recovery is
just the checkpoint's batch id — a batch is either fully appended or
re-run.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elephant_twin_spark.operators import lifecycle
from elephant_twin_spark.operators.lsh import LshIndex
from elephant_twin_spark.operators.pipeline import dedup


def gate_batch(
    index: LshIndex,
    batch_df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    extra_corpus: Optional[DataFrame] = None,
) -> DataFrame:
    """One batch through the full gate: vs-corpus then vs-self.
    Returns the batch annotated with ``is_near_dup`` / ``dup_of``
    (corpus id or lower batch id). Exposed separately so the batch and
    streaming paths share one implementation (stream == batch)."""
    vs_corpus = index.gate(
        batch_df, text_col, id_col, threshold=threshold, extra_corpus=extra_corpus
    )
    # intra-batch: first occurrence (lowest id) wins, same verify measure
    pairs = dedup.minhash_near_dup_pairs(
        batch_df,
        text_col,
        id_col,
        num_perm=index.num_perm,
        num_bands=index.num_bands,
        shingle_k=index.shingle_k,
        threshold=threshold,
    )
    intra = pairs.groupBy(F.col("id_b").alias(id_col)).agg(
        F.min("id_a").alias("_intra_dup_of")
    )
    return (
        vs_corpus.join(intra, id_col, "left")
        .withColumn("dup_of", F.coalesce("dup_of", "_intra_dup_of"))
        .withColumn("is_near_dup", F.col("dup_of").isNotNull())
        .drop("_intra_dup_of")
    )


def stream_near_dup_gate(
    stream_docs: DataFrame,
    index: LshIndex,
    text_col: str,
    id_col: str,
    accepted_path: str,
    checkpoint_path: str,
    threshold: float = 0.8,
    grow: bool = True,
    rejected_path: Optional[str] = None,
    timeout_sec: int = 120,
):
    """Run the gate over a stream of documents. Survivors append to
    ``accepted_path``; flagged near-dups (with their ``dup_of``
    attribution) to ``rejected_path`` if given; with ``grow`` the
    survivors' bands append to the index so later batches gate against
    them."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        # previously-accepted docs are corpus too: their bands were grown
        # into the index, their text lives in the accepted sink
        try:
            extra = index.spark.read.parquet(accepted_path)
        except Exception:
            extra = None
        # one evaluation, two destinations — cut lineage so the gate's
        # joins don't recompute per sink; the scope frees the batch's
        # checkpoint blocks once both sinks (and the index append) are
        # done, so an unbounded stream holds ONE batch of blocks, not
        # one per micro-batch ever processed
        with lifecycle.checkpoint_scope():
            annotated = lifecycle.pin(
                gate_batch(
                    index, batch_df, text_col, id_col, threshold, extra_corpus=extra
                )
            )
            survivors = annotated.where(~F.col("is_near_dup")).drop(
                "is_near_dup", "dup_of"
            )
            survivors.write.mode("append").parquet(accepted_path)
            if rejected_path is not None:
                annotated.where(F.col("is_near_dup")).drop("is_near_dup").write.mode(
                    "append"
                ).parquet(rejected_path)
            if grow:
                index.append_docs(survivors, text_col, id_col)

    q = (
        stream_docs.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
