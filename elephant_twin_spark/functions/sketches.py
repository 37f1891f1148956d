"""Approximate/mergeable aggregation sketches.

No reference analog (its only aggregate is a count sum, A2) — but at
100 TB the exact `COUNT(DISTINCT)` / exact percentile plans shuffle
every distinct value, while sketches shuffle a few KB per group and,
critically, are MERGEABLE: pre-aggregate per day/partition once, then
combine sketches instead of rescanning raw data. All of these are
JVM-side Spark built-ins, exposed here as one documented surface:

- ``approx_distinct``      — HyperLogLog++ count (fixed relative error)
- ``hll_sketch`` / ``hll_merge`` — Apache DataSketches HLL as a binary
  column you can STORE in a rollup table and union later (the mergeable
  path; re-aggregation without re-scan)
- ``approx_quantiles``     — Greenwald-Khanna quantiles with bounded error
- ``freq_count_min``       — count-min sketch binary for point frequency
  estimates under merge
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(col, rsd: float = 0.05) -> Column:
    """HyperLogLog++ approximate COUNT(DISTINCT col); ``rsd`` = target
    relative standard deviation (error)."""
    return F.approx_count_distinct(col, rsd)


def hll_sketch(col, lg_k: int = 12) -> Column:
    """Mergeable DataSketches HLL sketch (binary). Store per group in a
    rollup table; combine later with :func:`hll_merge` — this is what
    makes daily rollups re-aggregatable to monthly without rescanning."""
    return F.hll_sketch_agg(col, F.lit(lg_k))


def hll_merge(sketch_col) -> Column:
    """Union previously stored HLL sketches."""
    return F.hll_union_agg(sketch_col)


def hll_estimate(sketch_col) -> Column:
    """Distinct-count estimate from a stored sketch."""
    return F.hll_sketch_estimate(sketch_col)


def approx_quantiles(
    df: DataFrame, col: str, probabilities: Sequence[float], relative_error: float = 0.01
):
    """Greenwald-Khanna approximate quantiles (driver-side list result).
    For a per-group column version use ``F.percentile_approx``."""
    return df.approxQuantile(col, list(probabilities), relative_error)


def percentile_approx(col, percentage, accuracy: int = 10000) -> Column:
    """Group-aggregate approximate percentile (JVM, mergeable partials)."""
    return F.percentile_approx(col, percentage, accuracy)


def freq_count_min(col, eps: float = 0.001, confidence: float = 0.99, seed: int = 42) -> Column:
    """Count-min sketch (binary, mergeable) for approximate per-value
    frequencies over huge key domains."""
    return F.count_min_sketch(col, F.lit(eps), F.lit(confidence), F.lit(seed))
