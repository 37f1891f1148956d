"""Mixture resampling: reweight a corpus toward target group shares
(domain/language balancing for training-data assembly).

North-star addition (no reference analog; the nearest reference shape is
the Bernoulli sampling mapper, `core/indexing/AbstractSamplingIndexingMapper.java:27-48`,
extended from one global rate to per-group rates solved from a target
mixture).

Two sampling disciplines:

- `mixture_resample` — exact and deterministic: keep the first `c_g`
  rows of each group in md5-hash order, where `c_g = floor(alpha * w_g)`
  and `alpha = min_g(n_g / w_g)` (downsample-only: the scarcest group
  relative to its target is kept whole). One shuffle (the per-group
  window); group counts are a tiny driver-side collect (bounded by the
  number of domains, not rows).
- `hash_sample` — stateless expected-rate variant: keep a row iff its
  md5 bucket falls under the group's rate. No shuffle, no window — the
  100 TB/streaming path, at the cost of exact counts.
"""

from __future__ import annotations

from typing import Dict, Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_frac(id_col: Column, seed: int) -> Column:
    """Deterministic uniform [0,1) per row: leading 15 hex digits of
    md5(id:seed) — identical algebra is expressible in ANSI SQL."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(f":{seed}")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("double") / F.lit(
        float(16**15)
    )


def _group_counts(df: DataFrame, group_col: str) -> Dict[str, int]:
    """One tiny aggregate: rows per group (#groups rows collected)."""
    return {
        r["g"]: r["n"]
        for r in df.groupBy(F.col(group_col).alias("g")).agg(F.count("*").alias("n"))
        .collect()
    }


def _keep_counts_from(
    counts: Mapping[str, int], weights: Mapping[str, float]
) -> Dict[str, int]:
    """keep_counts from an already-computed group-count dict."""
    missing = set(weights) - set(counts)
    if missing:
        raise ValueError(f"weights name groups absent from data: {sorted(missing)}")
    alpha = min(counts[g] / w for g, w in weights.items() if w > 0)
    return {g: int(alpha * w) for g, w in weights.items()}


def keep_counts(
    df: DataFrame, group_col: str, weights: Mapping[str, float]
) -> Dict[str, int]:
    """Per-group keep counts for the target mixture (downsample-only).

    alpha = min_g(n_g / w_g); c_g = floor(alpha * w_g). Groups absent
    from `weights` are dropped entirely (weight 0).
    """
    return _keep_counts_from(_group_counts(df, group_col), weights)


def temperature_weights(
    df: DataFrame, group_col: str, alpha: float = 0.5
) -> Dict[str, float]:
    """Temperature-scaled mixture weights ``w_g ∝ n_g^alpha`` (the
    multilingual-LM up/down-sampling rule: alpha=1 keeps the natural
    distribution, alpha=0 equalizes groups, 0<alpha<1 flattens the head
    without starving the tail). Normalized to sum 1; computed from one
    tiny count aggregate (#groups rows collected)."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0,1], got {alpha}")
    counts = _group_counts(df, group_col)
    raw = {g: float(n) ** alpha for g, n in counts.items()}
    total = sum(raw.values()) or 1.0
    return {g: w / total for g, w in raw.items()}


def mixture_resample(
    df: DataFrame,
    group_col: str,
    weights: Mapping[str, float],
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exact deterministic resample to the target mixture: within each
    group keep the `c_g` rows with the smallest md5(id:seed) hash.

    Scale caveat: the per-group ``row_number`` window sorts each group
    inside ONE task — with a handful of language/domain groups over a
    100-TB corpus that is a few tasks sorting everything (a straggler by
    construction). At that scale use :func:`hash_sample` (stateless
    per-row keep decision, no window, no shuffle) and accept expected
    rather than exact counts; `bench.py` times both so the trade is
    measured, not guessed."""
    targets = keep_counts(df, group_col, weights)
    spark = df.sparkSession
    tdf = spark.createDataFrame(
        [(g, c) for g, c in targets.items()], f"{group_col} string, _keep long"
    )
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    ranked = df.join(F.broadcast(tdf), group_col).withColumn(
        "_rn", F.row_number().over(w)
    )
    return ranked.where(F.col("_rn") <= F.col("_keep")).drop("_rn", "_keep")


def sample_rates(
    df: DataFrame, group_col: str, weights: Mapping[str, float]
) -> Dict[str, float]:
    """Per-group keep rates `c_g / n_g` for the target mixture,
    computed on a static reference snapshot of the distribution.
    One group-count aggregate total (shared with the target solve)."""
    counts = _group_counts(df, group_col)
    targets = _keep_counts_from(counts, weights)
    return {g: targets[g] / counts[g] for g in targets}


def hash_sample(
    df: DataFrame,
    group_col: str,
    weights: Mapping[str, float] | None,
    id_col: str,
    seed: int = 42,
    rates: Mapping[str, float] | None = None,
) -> DataFrame:
    """Stateless expected-rate resample (no shuffle): keep each row with
    probability `rate_g = c_g / n_g`, decided by its own hash only.

    Pass precomputed `rates` (from `sample_rates` on a static snapshot)
    to skip the distribution aggregation — required for streaming input
    (the decision is pure per-row, so the same rates apply batch or
    stream and the kept set is identical either way).
    """
    if rates is None:
        if weights is None:
            raise ValueError("either weights or rates is required")
        rates = sample_rates(df, group_col, weights)
    spark = df.sparkSession
    rdf = spark.createDataFrame(
        list(rates.items()), f"{group_col} string, _rate double"
    )
    keep = _hash_frac(F.col(id_col), seed) < F.col("_rate")
    return df.join(F.broadcast(rdf), group_col).where(keep).drop("_rate")
