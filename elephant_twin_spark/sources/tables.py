r"""Table loading helpers, including the TIMESTAMP(NANOS) parquet shim.

The driver's synthetic tables (`/root/testdata/sf*/*.parquet`, written by
pandas/pyarrow) carry INT64 TIMESTAMP(NANOS) columns, which Spark's
vectorized parquet reader rejects by default. We read them with
``spark.sql.legacy.parquet.nanosAsLong`` and convert back to proper
TimestampType (micros) — the same truncation DuckDB applies, so oracle
comparisons stay exact.
"""

from __future__ import annotations

import os
from typing import List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _nanos_timestamp_cols(path: str) -> List[str]:
    """Column names stored as parquet TIMESTAMP(NANOS), from the footer."""
    import pyarrow.parquet as pq

    p = path
    if p.startswith("file:"):
        p = p[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
    if os.path.isdir(p):
        parts = [f for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
        if not parts:
            return []
        p = os.path.join(p, parts[0])
    schema = pq.read_schema(p)
    # Spark-written files (Spark 4 emits TIMESTAMP(NANOS) natively) carry
    # writer metadata and round-trip through spark.read without help; the
    # shim is only for pandas/pyarrow-written fixtures whose nanos columns
    # Spark surfaces as LONG under nanosAsLong
    if schema.metadata and b"org.apache.spark.version" in schema.metadata:
        return []
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return out


def load_raw(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table, transparently handling nanos timestamps."""
    ns_cols = _nanos_timestamp_cols(path)
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set(_NANOS_CONF, "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # integer division: `/` would go through double and lose precision
        # at epoch-nanos magnitude (2^60), shifting some values by 1us
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_sf_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_raw(spark, f"{sf_dir.rstrip('/')}/{name}.parquet")


LAYOUT_VERSION = "2"  # bump to invalidate previously-materialized copies


def materialize(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    num_files: int = 8,
    force: bool = False,
) -> str:
    """Normalized multi-file copy of a table (proper micros timestamps,
    ``num_files`` parquet parts) — used to make file-level index pruning
    observable on the driver's single-file fixtures, and as the engine's
    canonical on-disk layout for tests/bench."""
    marker = os.path.join(_local(dst_path), "_ETS_DONE")
    if not force and os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == LAYOUT_VERSION:
                return dst_path
    df = load_raw(spark, src_path)
    df.repartition(num_files).write.mode("overwrite").parquet(dst_path)
    with open(marker, "w") as fh:
        fh.write(LAYOUT_VERSION)
    return dst_path


def _local(p: str) -> str:
    if p.startswith("file:"):
        p = p[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
    return p
