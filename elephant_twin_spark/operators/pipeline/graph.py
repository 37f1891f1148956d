"""Graph analytics over edge DataFrames — triangle counting and degree
profiles, the graph-shaped companions to the connected-components
min-label propagation in :mod:`.dedup` (no reference analog; the
reference's only graph-adjacent structure is postings interval algebra,
core/retrieval/BlockIndexedFileInputFormat.java:448-640).

Why a pipeline needs this: near-dup candidate pairs, co-interaction
graphs and citation/link structures all arrive as edge lists; triangle
density separates tight duplicate cliques from chains of borderline
matches, and co-occurrence triangles are the standard cohesion signal
in interaction analysis.

Scale shape: the classic degree-ordered orientation. Orienting every
edge from its lower-(degree, id) endpoint to the higher one turns the
wedge join — the only quadratic step — into one bounded by the max
OUT-degree, which orientation caps at O(sqrt(m)) for any graph with m
edges: a celebrity vertex with millions of neighbors contributes no
wedges because all its edges point INTO it. Every join is an equi
join; every aggregate is map-side combined.
"""

from __future__ import annotations

from elephant_twin_spark.operators import lifecycle
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected edge canonicalization: ``(u, v)`` with ``u < v``,
    self-loops dropped, duplicates (either orientation) collapsed."""
    return (
        edges.where(F.col(src) != F.col(dst))
        .select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .distinct()
    )


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex degree over the canonical undirected graph:
    ``(vertex, degree)`` — one union + one map-side-combined count."""
    e = canonical_edges(edges, src, dst)
    return (
        e.select(F.col("u").alias("vertex"))
        .unionAll(e.select(F.col("v").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact global triangle count over an undirected edge list: ONE row
    ``(n_vertices, n_edges, n_triangles)``.

    Degree-ordered orientation: each canonical edge points from its
    lower-(degree, id) endpoint to the higher one; a wedge
    ``a <- hub -> b`` is two out-edges of one vertex, and the triangle
    closes iff ``(a, b)`` is itself an edge. Orientation counts every
    triangle exactly once (each triangle has exactly one vertex from
    which both its other corners are out-neighbors) and bounds
    per-vertex wedge fan-out by the max out-degree, O(sqrt(m)).

    Joins: orientation = two degree equi joins (|V| rows, no broadcast
    hint — the vertex set is unbounded);
    wedges = self equi-join of the oriented list on the hub; closure =
    equi-join of wedge candidates against the canonical edge set. All
    shuffles hash on vertex / edge keys. The canonical edge list, the
    degree table and the oriented list each feed MULTIPLE downstream
    branches, so they are localCheckpoint-materialized once (the same
    shared-subplan discipline as the LSH band table in
    :func:`.dedup.lsh_candidate_pairs`) — without it every branch
    re-derives the whole upstream edge construction.
    """
    e = lifecycle.pin(canonical_edges(edges, src, dst))
    # degrees directly from the already-canonical list (calling
    # degree_stats here would redundantly re-canonicalize e)
    deg = lifecycle.pin(
        e.select(F.col("u").alias("vertex"))
        .unionAll(e.select(F.col("v").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    du = deg.select(F.col("vertex").alias("u"), F.col("degree").alias("_du"))
    dv = deg.select(F.col("vertex").alias("v"), F.col("degree").alias("_dv"))
    # plain equi joins: |V| is unbounded (no broadcast hint — AQE still
    # broadcasts when the degree table happens to be small)
    ranked = e.join(du, "u").join(dv, "v")
    # orient low (degree, id) -> high (degree, id)
    u_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    oriented = lifecycle.pin(ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("o_src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("o_dst"),
    ))
    a = oriented.select(F.col("o_src").alias("hub"), F.col("o_dst").alias("a"))
    b = oriented.select(F.col("o_src").alias("hub"), F.col("o_dst").alias("b"))
    wedges = a.join(b, "hub").where(F.col("a") < F.col("b"))
    closed = wedges.join(
        e, (F.col("a") == F.col("u")) & (F.col("b") == F.col("v")), "inner"
    )
    n_tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    # |V| and |E| from the degree table alone: sum(degree) double-counts
    # every edge once per endpoint
    sizes = deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        # coalesce: sum over an EMPTY edge set is NULL, and n_edges=0
        # must match n_vertices=0 / n_triangles=0 (r5 advice)
        F.coalesce((F.sum("degree") / 2).cast("long"), F.lit(0)).alias("n_edges"),
    )
    # 1-row scalar combine (broadcast nested loop by construction, benign)
    return sizes.crossJoin(F.broadcast(n_tri))
