"""Unit pin for the scale linter's exchange counter (r12 verdict #3).

The old counter subtracted ``BroadcastExchange`` occurrences from a
``\\bExchange\\b`` count that never matched them in the first place
(``tE`` has no word boundary), so any plan containing broadcasts
under-counted — SCALE_AUDIT.md carried ``-1``/``-3`` shuffle rows, and
a shuffle-heavy query that also broadcasts could dodge the
``exchanges>4`` 100 TB flag. The linter is the repo's own scale
feedback loop; its numbers must be right.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from scale_audit import count_shuffle_exchanges  # noqa: E402


PLAN_MIXED = """
AdaptiveSparkPlan isFinalPlan=true
+- SortMergeJoin [k], [k], Inner
   :- Sort [k ASC]
   :  +- Exchange hashpartitioning(k, 32), ENSURE_REQUIREMENTS
   :     +- FileScan parquet [k,v]
   +- Sort [k ASC]
      +- Exchange hashpartitioning(k, 32), ENSURE_REQUIREMENTS
         +- BroadcastHashJoin [d], [d], Inner, BuildRight
            :- FileScan parquet [d,k]
            +- BroadcastExchange HashedRelationBroadcastMode
               +- FileScan parquet [d]
"""

PLAN_BROADCAST_ONLY = """
BroadcastHashJoin [d], [d], Inner, BuildRight
:- FileScan parquet [d,k]
+- BroadcastExchange HashedRelationBroadcastMode
   +- BroadcastNestedLoopJoin BuildRight
      +- BroadcastExchange IdentityBroadcastMode
"""

PLAN_REUSE = """
Exchange rangepartitioning(k ASC, 8), ENSURE_REQUIREMENTS
+- ReusedExchange [k,v], Exchange hashpartitioning(k, 8)
"""


def test_counts_shuffles_not_broadcasts():
    assert count_shuffle_exchanges(PLAN_MIXED) == 2


def test_broadcast_only_plan_counts_zero_never_negative():
    assert count_shuffle_exchanges(PLAN_BROADCAST_ONLY) == 0


def test_whitelists_name_real_registry_queries():
    """A typo'd (or since-renamed) name in ITERATIVE / COMPOSITE /
    SCALAR_BNLJ silently stops suppressing nothing — or keeps a
    hand-written rationale attached to a query that no longer exists.
    Every whitelisted name must be a declared registry query."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    import scale_audit

    declared = set(entrymod.queries())
    for setname in ("ITERATIVE", "COMPOSITE", "SCALAR_BNLJ"):
        stale = set(getattr(scale_audit, setname)) - declared
        assert not stale, f"scale_audit.{setname} names unknown queries: {sorted(stale)}"


def test_reused_exchange_counts_the_mention_sites():
    # ReusedExchange has no boundary before Exchange either; the line's
    # trailing "Exchange hashpartitioning" reference DOES match — the
    # counter counts standalone Exchange tokens, which is what the
    # ``>4`` heuristic was calibrated against
    assert count_shuffle_exchanges(PLAN_REUSE) == 2
