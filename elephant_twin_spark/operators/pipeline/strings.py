"""String-similarity join — edit-distance pairs at scale.

Classic q-gram filtered similarity join (the compressed-index
string-join literature's baseline shape): two strings within edit
distance k must (a) differ in length by at most k and (b) share at
least ``max(len)-q+1-k*q`` q-grams — so when that bound is >= 1,
candidate pairs come from an equi-join on shared q-grams instead of the
cross product; strings too short for the bound fall back to a
length-banded join. Exact ``levenshtein`` verifies candidates. All
JVM-side (explode + equi-join + levenshtein), no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grams(col, q: int):
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(col) - q + 1, F.lit(1))),
        lambda i: col.substr(i, F.lit(q)),
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_edits: int = 2,
    q: int = 2,
) -> DataFrame:
    """``(left, right, dist)`` for all cross-table string pairs with
    ``levenshtein <= max_edits``. Pass the same DataFrame twice for a
    self-join (emit both directions filtered by ``<`` downstream if
    unordered pairs are wanted)."""
    l = left.select(F.col(left_col).alias("_l")).where(F.col("_l").isNotNull()).distinct()
    r = right.select(F.col(right_col).alias("_r")).where(F.col("_r").isNotNull()).distinct()

    # q-gram bound usable only when it demands >= 1 shared gram:
    # max(len) - q + 1 - k*q >= 1  <=>  len >= q*(k+1)
    min_len = q * (max_edits + 1)
    l_long = l.where(F.length("_l") >= min_len)
    r_long = r.where(F.length("_r") >= min_len)
    lg = l_long.select("_l", F.explode(F.array_distinct(_grams(F.col("_l"), q))).alias("_g"))
    rg = r_long.select("_r", F.explode(F.array_distinct(_grams(F.col("_r"), q))).alias("_g"))
    cand_long = (
        lg.join(rg, "_g")
        .where(
            (F.length("_l") - F.length("_r") <= max_edits)
            & (F.length("_r") - F.length("_l") <= max_edits)
        )
        .select("_l", "_r")
        .distinct()
    )
    # short strings: the gram bound is vacuous — length-banded join over
    # the (tiny) short-string sets
    l_short = l.where(F.length("_l") < min_len)
    r_short = r.where(F.length("_r") < min_len + max_edits)
    cand_short = l_short.join(
        r_short,
        (F.length("_l") - F.length("_r") <= max_edits)
        & (F.length("_r") - F.length("_l") <= max_edits),
    ).select("_l", "_r")
    # a short-left/long-right pair within the band appears in cand_short;
    # the symmetric long-left/short-right case needs the mirror
    l_band = l.where(
        (F.length("_l") >= min_len) & (F.length("_l") < min_len + max_edits)
    )
    r_short2 = r.where(F.length("_r") < min_len)
    cand_mixed = l_band.join(
        r_short2,
        (F.length("_l") - F.length("_r") <= max_edits)
        & (F.length("_r") - F.length("_l") <= max_edits),
    ).select("_l", "_r")

    cands = cand_long.unionByName(cand_short).unionByName(cand_mixed).distinct()
    return (
        cands.withColumn("dist", F.levenshtein("_l", "_r"))
        .where(F.col("dist") <= max_edits)
        .select(
            F.col("_l").alias(left_col if left_col != right_col else f"{left_col}_a"),
            F.col("_r").alias(right_col if left_col != right_col else f"{right_col}_b"),
            "dist",
        )
    )
