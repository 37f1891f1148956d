"""Grouped statistical profiling: exact percentiles, IQR outlier
gating, correlation matrices, length histograms, and partition-skew
audits.

North-star additions (no reference analog; the nearest reference shape
is the per-key count rollup, `core/retrieval/CountTimestampWritable.java:29-38`,
generalized from counts to order statistics). All operators are single
wide aggregates over built-in JVM expressions — one shuffle each, no
Python in the hot path.

Scale notes:
- ``exact_percentiles`` uses Spark's exact ``percentile`` — a
  sort-based aggregate whose per-group state is the full value
  multiset. Right for bounded group counts (event types, table
  columns); for unbounded cardinality or 100-TB single groups, use
  ``approx_percentiles`` (t-digest-style sketch, constant memory),
  declared as the rows-only at-scale twin.
- ``bucket_skew_stats`` is THE pre-flight check before keying a shuffle
  on a column: it reports rows per md5-derived hash bucket and the
  max/mean skew factor — the number that predicts straggler tasks. The
  md5 bucketing is engine-independent, so the oracle can reproduce it.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _p_labels(probs: Sequence[float]) -> list:
    """Column labels for percentile probs: ``p_NN`` for integral
    percents (0.25 → p_25), full-precision digits otherwise (0.125 →
    p_12_5) — and a hard error on duplicates, so 0.124 vs 0.125 can
    never silently collide into one column."""
    out = []
    for p in probs:
        v = p * 100
        if abs(v - round(v)) < 1e-9:
            out.append(f"p_{round(v):02d}")
        else:
            out.append("p_" + f"{v:g}".replace(".", "_").replace("-", "m"))
    dups = {l for l in out if out.count(l) > 1}
    if dups:
        raise ValueError(f"percentile probs produce duplicate labels: {sorted(dups)}")
    return out


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    ndigits: int = 6,
) -> DataFrame:
    """``(group, p_NN...)`` — exact linear-interpolated percentiles per
    group (the continuous-quantile definition DuckDB's ``quantile_cont``
    shares, so results are cross-engine bit-comparable after rounding)."""
    labels = _p_labels(probs)
    aggs = [
        F.round(F.expr(f"percentile({value_col}, {p!r})"), ndigits).alias(lab)
        for p, lab in zip(probs, labels)
    ]
    return df.groupBy(F.col(group_col).alias("grp")).agg(*aggs)


def approx_percentiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch-based twin of :func:`exact_percentiles` —
    ``approx_percentile`` keeps constant memory per group, the right
    default when a single group holds billions of rows. Estimates land
    within ``1/accuracy`` rank error of exact (pytest pins the
    tolerance); not oracle-hashable, declared rows-only."""
    labels = _p_labels(probs)
    aggs = [
        F.expr(f"approx_percentile({value_col}, {p!r}, {accuracy})").alias(lab)
        for p, lab in zip(probs, labels)
    ]
    return df.groupBy(F.col(group_col).alias("grp")).agg(*aggs)


def iqr_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 1.5,
) -> DataFrame:
    """Tukey-fence outlier counts per group: ``(grp, n, n_outlier,
    lo, hi)`` with fences ``[q1 - k*iqr, q3 + k*iqr]``. Two passes
    (percentile agg, then a broadcast-joined fence filter) — the fences
    table is one row per group, so the second pass is a broadcast join
    however large the fact side is."""
    fences = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.expr(f"percentile({value_col}, 0.25)").alias("_q1"),
        F.expr(f"percentile({value_col}, 0.75)").alias("_q3"),
    )
    fences = fences.select(
        "grp",
        (F.col("_q1") - (F.col("_q3") - F.col("_q1")) * k).alias("lo"),
        (F.col("_q3") + (F.col("_q3") - F.col("_q1")) * k).alias("hi"),
    )
    # null-safe: a NULL group (untagged language/source) is a real
    # population in a data-quality audit — a plain equality join
    # silently dropped it (r10 review finding; winsorized_stats already
    # kept it, the three audits now agree)
    joined = df.join(
        F.broadcast(fences), df[group_col].eqNullSafe(fences["grp"]), "inner"
    )
    out_flag = (F.col(value_col) < F.col("lo")) | (F.col(value_col) > F.col("hi"))
    return (
        joined.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(out_flag.cast("long")).alias("n_outlier"),
            F.round(F.first("lo"), 6).alias("lo"),
            F.round(F.first("hi"), 6).alias("hi"),
        )
    )


def grouped_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group bivariate stats: sample correlation, sample covariance
    and both standard deviations — one single-shuffle aggregate (all
    four moments come out of one partial-aggregation pass)."""
    return df.groupBy(F.col(group_col).alias("grp")).agg(
        F.round(F.corr(x_col, y_col), 6).alias("corr_xy"),
        F.round(F.covar_samp(x_col, y_col), 4).alias("covar_xy"),
        F.round(F.stddev_samp(x_col), 6).alias("sd_x"),
        F.round(F.stddev_samp(y_col), 6).alias("sd_y"),
    )


def length_histogram(
    df: DataFrame,
    length_expr,
    bucket_width: int = 32,
) -> DataFrame:
    """``(bucket_lo, n)`` — histogram of an integer length expression in
    fixed-width buckets (``bucket_lo = floor(len/w)*w``). The packing /
    sequence-length-distribution diagnostic: one narrow map + one small
    groupBy (distinct buckets, not rows)."""
    lo = (F.floor(length_expr / bucket_width) * bucket_width).cast("long")
    return df.groupBy(lo.alias("bucket_lo")).agg(F.count(F.lit(1)).alias("n"))


def bucket_skew_stats(
    df: DataFrame,
    key_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Shuffle-skew audit for a prospective partitioning key: rows per
    md5-derived hash bucket, plus each bucket's share of a perfectly
    uniform load (``skew = n / (total / n_buckets)``). A max skew ≫ 1
    predicts straggler tasks on any ``groupBy``/``join`` keyed by this
    column — the signal that keys need salting
    (:mod:`elephant_twin_spark.operators.skew`). md5 (not Spark's
    ``hash``) so the exact bucketing reproduces in any engine."""
    b = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % n_buckets
    )
    per = df.groupBy(b.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))
    # bucket table is n_buckets rows — the global-total window is trivial
    total = F.sum("n").over(Window.partitionBy())
    return per.select(
        "bucket",
        "n",
        F.round(F.col("n") / (total / F.lit(n_buckets)), 6).alias("skew"),
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_col: str,
    out_col: str = "pct_rank",
) -> DataFrame:
    """Within-group percentile rank of ``value_col`` (0 = min, 1 = max)
    — the scale-free score normalization that makes quality scores
    comparable ACROSS languages/sources before a global keep-fraction
    cut (a raw threshold keeps different fractions of each group; the
    percentile rank keeps the same fraction everywhere).

    One window shuffle partitioned by group. Ties broken by id so the
    rank — and anything thresholded on it — is deterministic
    cross-engine. At 100 TB the partition key is the group: fine for
    language-sized groups (each sorts in parallel chunks via
    range-partitioned sort), but for a SINGLE giant group use
    ``approx_percentiles`` fences instead of exact ranks."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    return df.select(
        F.col(id_col),
        F.col(group_col).alias("grp"),
        F.col(value_col),
        F.round(F.percent_rank().over(w), 6).alias(out_col),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust (median/MAD) outlier audit per group: ``(grp, n, med,
    mad, n_outlier)`` where an outlier is ``|x - med| > k * mad`` —
    the heavy-tail-safe twin of :func:`iqr_outliers` (a single extreme
    value moves the mean and stddev but not the median/MAD, so
    MAD fences hold on corrupt length/score columns where moment-based
    fences blow up). Three aggregates: group median, median absolute
    deviation, then a broadcast-fence count. MAD=0 groups (over half
    the values identical) flag only exact deviants (|x - med| > 0).

    Scale note: exact ``percentile`` buffers each group's values on
    one executor — fine at language/source-group grain, unbounded for
    a single giant group. For billion-row groups swap both medians for
    ``approx_percentile`` (see :func:`approx_percentiles`); the fences
    move by at most the sketch error."""
    base = df.select(
        F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
    )
    # null-safe joins throughout: groupBy keeps a NULL group but a
    # USING/equality join drops its rows on the way back — the audit
    # silently lost the untagged population (r10 review finding)
    med = base.groupBy("_g").agg(F.expr("percentile(_v, 0.5)").alias("med"))
    j = base.join(
        F.broadcast(med.withColumnRenamed("_g", "_gm")),
        F.col("_g").eqNullSafe(F.col("_gm")),
    ).drop("_gm").withColumn("_adev", F.abs(F.col("_v") - F.col("med")))
    madt = j.groupBy("_g").agg(F.expr("percentile(_adev, 0.5)").alias("mad"))
    # final count reuses j's _adev (two fact-table passes total, not three)
    out = j.join(
        F.broadcast(madt.withColumnRenamed("_g", "_gm")),
        F.col("_g").eqNullSafe(F.col("_gm")),
    ).drop("_gm")
    return out.groupBy(F.col("_g").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.first("med"), 6).alias("med"),
        F.round(F.first("mad"), 6).alias("mad"),
        F.sum((F.col("_adev") > F.lit(k) * F.col("mad")).cast("long")).alias(
            "n_outlier"
        ),
    )


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Winsorized robust means per group: clip ``value_col`` at the
    group's exact ``[lo, hi]`` percentile fences and report ``(grp, n,
    mean_raw, mean_winsor, n_clipped)`` — the outlier-tolerant summary
    that pairs with :func:`mad_outliers`. Fences are a #groups-row
    broadcast; clipping is a per-row least/greatest, so the fact table
    is scanned twice and shuffled once. Means rounded to 6 digits for
    cross-engine determinism.

    Scale note: exact ``percentile`` buffers each group's values on one
    executor (same caveat as :func:`mad_outliers`); swap the fence
    aggregate for ``approx_percentile`` for billion-row groups."""
    fences = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.expr(f"percentile({value_col}, {lo})").alias("_lo"),
        F.expr(f"percentile({value_col}, {hi})").alias("_hi"),
    )
    # null-safe match: a NULL group is a real group (mad_outliers keeps
    # it; a plain equality join would silently drop those rows)
    j = df.join(F.broadcast(fences), df[group_col].eqNullSafe(fences["grp"]))
    clipped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.col("_lo")), F.col("_hi")
    )
    return j.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(value_col), 6).alias("mean_raw"),
        F.round(F.avg(clipped), 6).alias("mean_winsor"),
        F.sum(
            (
                (F.col(value_col) < F.col("_lo")) | (F.col(value_col) > F.col("_hi"))
            ).cast("long")
        ).alias("n_clipped"),
    )


def ntile_segments(
    df: DataFrame,
    id_col: str,
    metrics: "dict[str, bool]",
    n: int = 4,
) -> DataFrame:
    """Multi-metric ntile segmentation (the RFM-segmentation shape):
    for each ``metric_col -> higher_is_better`` entry, append
    ``{col}_q`` = the row's ntile bucket (1 = best) ranked by that
    metric with an ``id_col`` tiebreak, plus a concatenated
    ``segment`` label ("1-2-4"). Deterministic cross-engine: every
    ordering is total.

    Scale note: each ntile is a GLOBAL window (one sort partition).
    Right for entity tables (customers, sources — the usual
    segmentation grain); for billion-row entity tables switch to
    fence-based bucketing via :func:`approx_percentiles` cut points
    (broadcast join), which trades exact equal-count buckets for
    constant memory."""
    out = df
    qcols = []
    for col, desc in metrics.items():
        order = [F.col(col).desc() if desc else F.col(col).asc(), F.col(id_col).asc()]
        w = Window.partitionBy(F.lit(1)).orderBy(*order)
        qc = f"{col}_q"
        out = out.withColumn(qc, F.ntile(n).over(w))
        qcols.append(qc)
    return out.withColumn(
        "segment", F.concat_ws("-", *[F.col(c).cast("string") for c in qcols])
    )


def psi_drift(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two samples of ``value_col``:
    per-bin ``(bin, lo, hi, p_base, p_cur, contrib)`` plus the
    convention that PSI = sum(contrib); < 0.1 is stable, > 0.25 is a
    real shift. THE production drift monitor for a feature/score column
    between snapshots, sources, or train/serve.

    Bin edges are ``n_bins`` equal-width cuts of the POOLED min/max (a
    1-row scalar broadcast), so both sides bin identically; each side
    then needs ONE map-side-combined aggregate — fixed-bin output
    regardless of data size, the same scale contract as the histogram
    sketch. ``eps`` floors empty-bin proportions so the log stays
    finite (standard PSI practice). NULL values are excluded on both
    sides.
    """
    b = base.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("x")
    )
    c = current.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("x")
    )
    pooled = b.unionAll(c)
    bounds = pooled.agg(
        F.min("x").alias("lo"), F.max("x").alias("hi"),
    )
    span = F.col("hi") - F.col("lo")
    bin_of = F.when(span > 0, F.least(
        F.lit(int(n_bins) - 1),
        F.floor((F.col("x") - F.col("lo")) * int(n_bins) / span).cast("int"),
    )).otherwise(F.lit(0))

    def side_counts(df, name):
        return (
            df.crossJoin(F.broadcast(bounds))
            .groupBy(bin_of.alias("bin"))
            .agg(F.count(F.lit(1)).alias(name))
        )

    bc = side_counts(b, "n_base")
    cc = side_counts(c, "n_cur")
    bins = (
        bc.join(cc, "bin", "full")
        .select(
            "bin",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        .crossJoin(F.broadcast(bounds.select("lo", "hi")))
    )
    w_all = Window.partitionBy()
    # an EMPTY side must fall to the eps floor, not divide by its zero
    # total (ANSI mode raises DIVIDE_BY_ZERO — r6 degenerate-input fix)
    tot_b = F.sum("n_base").over(w_all)
    tot_c = F.sum("n_cur").over(w_all)
    p_b = F.greatest(
        F.when(tot_b > 0, F.col("n_base") / tot_b).otherwise(F.lit(0.0)),
        F.lit(float(eps)),
    )
    p_c = F.greatest(
        F.when(tot_c > 0, F.col("n_cur") / tot_c).otherwise(F.lit(0.0)),
        F.lit(float(eps)),
    )
    step = (F.col("hi") - F.col("lo")) / int(n_bins)
    return bins.select(
        "bin",
        F.round(F.col("lo") + F.col("bin") * step, 6).alias("bin_lo"),
        F.round(F.col("lo") + (F.col("bin") + 1) * step, 6).alias("bin_hi"),
        F.round(p_b, 6).alias("p_base"),
        F.round(p_c, 6).alias("p_cur"),
        F.round((p_c - p_b) * F.ln(p_c / p_b), 6).alias("contrib"),
    )


def ks_statistic(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    grid: Optional[float] = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic: one row
    ``(n_base, n_cur, ks)`` with ``ks = max |F_base(x) - F_cur(x)|``
    over the pooled support. The sharper (binning-free) companion to
    :func:`psi_drift` for continuous columns.

    Shape: per-side counts per DISTINCT value (map-side combined), a
    full outer merge, then running sums over the distinct-value
    sequence. That last window is GLOBALLY ordered — a single sort
    partition bounded by the number of DISTINCT values, not rows; fine
    for scores/quantized features (bounded support), UNBOUNDED for raw
    continuous columns at 100 TB. That is what ``grid`` is for: pass a
    bucket width and every value is snapped to ``floor(x/grid)*grid``
    BEFORE the distinct-count merge, bounding the window state at
    (value range / grid) rows regardless of data size and making the
    result a grid-exact KS — the documented 100-TB path as a
    one-argument choice (both ``floor`` and the IEEE mul/div are
    exactly specified, so gridding is cross-engine deterministic).
    NULLs excluded.
    """
    b = base.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("x")
    )
    c = current.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("x")
    )
    if grid is not None:
        snap = lambda d: d.select(
            (F.floor(F.col("x") / F.lit(float(grid))) * F.lit(float(grid))).alias("x")
        )
        b, c = snap(b), snap(c)
    bc = b.groupBy("x").agg(F.count(F.lit(1)).alias("nb"))
    cc = c.groupBy("x").agg(F.count(F.lit(1)).alias("nc"))
    merged = bc.join(cc, "x", "full").select(
        "x",
        F.coalesce("nb", F.lit(0)).alias("nb"),
        F.coalesce("nc", F.lit(0)).alias("nc"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    # guard the zero totals of an EMPTY side (ANSI mode raises
    # DIVIDE_BY_ZERO): an empty side has no CDF, so ks is NULL
    tot_b, tot_c = F.sum("nb").over(w_all), F.sum("nc").over(w_all)
    cdf_b = F.when(tot_b > 0, F.sum("nb").over(w) / tot_b)
    cdf_c = F.when(tot_c > 0, F.sum("nc").over(w) / tot_c)
    return (
        merged.select(
            F.sum("nb").over(w_all).alias("n_base"),
            F.sum("nc").over(w_all).alias("n_cur"),
            F.abs(cdf_b - cdf_c).alias("d"),
        )
        .groupBy("n_base", "n_cur")
        .agg(F.round(F.max("d"), 6).alias("ks"))
    )


def pmi_table(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pointwise mutual information between two categorical columns:
    ``(col_a, col_b, n, pmi)`` with ``pmi = ln(n * total / (n_a * n_b))``
    on exact integer counts — the feature-relevance / co-occurrence /
    seasonality audit (e.g. event_type x hour-of-day).

    Shape: ONE joint count aggregate over the raw rows (map-side
    combined); the margins are windows over the |A| x |B| joint table,
    not a second pass over the data — so the only data-sized cost is the
    single groupBy shuffle, and the window state is bounded by the
    categorical cross size. Promoted from the round-5 registry query
    body (r5 verdict: library surface, queries become wrappers)."""
    joint = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("n"))
    w_a = Window.partitionBy(col_a)
    w_b = Window.partitionBy(col_b)
    w_all = Window.partitionBy()
    return joint.select(
        col_a,
        col_b,
        "n",
        F.round(
            F.ln(
                (F.col("n") * F.sum("n").over(w_all))
                / (F.sum("n").over(w_a) * F.sum("n").over(w_b))
            ),
            6,
        ).alias("pmi"),
    )
