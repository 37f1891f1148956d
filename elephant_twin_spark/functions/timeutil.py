"""Type-agnostic event-time helpers (TIMESTAMP vs TIMESTAMP_NTZ).

The driver's pandas/pyarrow-written fixtures surface naive timestamp
columns as ``TIMESTAMP_NTZ`` under Spark 4, which rejects direct
``cast(ts AS BIGINT)`` / ``unix_micros(ts)`` / ``withWatermark`` on NTZ
inputs. These helpers give every operator ONE place that handles both
flavors:

- for epoch arithmetic, NTZ columns use ``timestampdiff`` against an NTZ
  epoch literal — fully timezone-free, so results match DuckDB's
  ``epoch_us``/``date_diff`` regardless of the session timezone;
- for event-time streaming (watermarks require ``TIMESTAMP``), NTZ
  columns are cast once at the source wrap; with the session timezone at
  its UTC default this is a pure re-tag of the same wall-clock instant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _is_ntz(df: DataFrame, col: str) -> bool:
    return dict(df.dtypes).get(col) == "timestamp_ntz"


def epoch_micros(df: DataFrame, col: str) -> Column:
    """Microseconds since epoch for a TIMESTAMP or TIMESTAMP_NTZ column.

    NTZ path is timezone-free (``timestampdiff`` between NTZ values), so
    it agrees with DuckDB ``epoch_us(ts)`` byte-for-byte under any
    session timezone.
    """
    if _is_ntz(df, col):
        return F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, `{col}`)")
    return F.unix_micros(F.col(col))


def epoch_seconds(df: DataFrame, col: str) -> Column:
    """Whole seconds since epoch (truncating sub-second), both flavors."""
    if _is_ntz(df, col):
        return F.expr(f"timestampdiff(SECOND, {_NTZ_EPOCH}, `{col}`)")
    return F.col(col).cast("long")


def ensure_event_time(df: DataFrame, col: str) -> DataFrame:
    """Re-type an NTZ column as TIMESTAMP so watermarks/windows accept it.

    ``withWatermark`` requires TIMESTAMP; the cast interprets the wall
    time in the session timezone (UTC in tests/driver), preserving the
    instant. No-op when the column is already TIMESTAMP.
    """
    if _is_ntz(df, col):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df
