"""Deterministic corpus sharding: seeded global shuffle + fixed shard
assignment for training-data layout.

North-star addition (no reference analog; the reference's hash
partitioning of index keys, `core/io/TextLongPairWritable.java:134-142`,
is the same discipline applied to output layout instead of index
buckets).

The assignment is a pure column expression (md5 of id + seed), so it is
stable across runs, engines, and partitionings — the property training
pipelines need so a re-run resumes into identical shards. The writer is
one `repartition` on the shard column (one shuffle) with an in-shard
hash sort, producing `shard_id=N/` Hive directories.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_hash(id_col: Column, seed: int = 0) -> Column:
    """60-bit deterministic hash of id:seed (hex md5 prefix → long)."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(f":{seed}")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def assign_shards(
    df: DataFrame, id_col: str, num_shards: int, seed: int = 0
) -> DataFrame:
    """Append `shard_id` (0..num_shards-1) and `shard_hash` columns."""
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")
    h = shard_hash(F.col(id_col), seed)
    return df.withColumn("shard_hash", h).withColumn(
        "shard_id", F.pmod(h, F.lit(num_shards)).cast("int")
    )


def write_shards(
    df: DataFrame, path: str, id_col: str, num_shards: int, seed: int = 0
) -> None:
    """Write the corpus as `shard_id=N/` parquet directories, rows
    hash-ordered within each shard (the seeded global shuffle)."""
    out = assign_shards(df, id_col, num_shards, seed)
    (
        out.repartition(num_shards, "shard_id")
        .sortWithinPartitions("shard_hash")
        .drop("shard_hash")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )


def kfold_assign(
    df: DataFrame, id_col: str, k: int = 5, seed: int = 42, out_col: str = "fold"
) -> DataFrame:
    """Deterministic k-fold assignment: ``fold = md5(id:seed) % k`` —
    engine-independent (the md5 algebra restates in ANSI SQL), stable
    under repartition/reordering, and uniform. The eval-split primitive:
    train on folds != i, validate on fold i, reproducible anywhere
    without storing an assignment table."""
    if k < 2:
        raise ValueError("k must be >= 2")
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    fold = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % k).cast("int")
    return df.withColumn(out_col, fold)


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    num_shards: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-epoch training shuffle: every epoch gets a
    DIFFERENT but fully reproducible permutation of the corpus, with no
    global sort and no stored shuffle table.

    Each row gets ``key = md5(id:epoch:seed)`` — a fresh pseudo-random
    draw per epoch — then ``shard = int(key[:8]) % num_shards`` and
    ``pos`` = the row's rank inside its shard in key order. Readers
    stream shards in (shard, pos) order; re-running any epoch anywhere
    reproduces the identical order, and distinct epochs decorrelate
    (the property epoch shuffling exists for: no batch sees the same
    neighborhood twice).

    Shape: the only shuffle is the shard-partitioned rank window —
    hash on ``shard``, each task sorting corpus/num_shards keys; at
    100 TB ``num_shards`` scales with the cluster so per-task state
    stays bounded. Compare ``write_shards`` (epoch-independent layout)
    and ``kfold_assign`` (membership, not order).
    """
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    from pyspark.sql.window import Window

    key = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{int(epoch)}:{int(seed)}"))
    )
    shard = (F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % num_shards).cast("int")
    out = df.withColumn("shuffle_key", key).withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(F.col("shuffle_key").asc(), F.col(id_col).asc())
    return out.withColumn("pos", F.row_number().over(w))
