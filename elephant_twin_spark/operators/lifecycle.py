"""Checkpoint lifecycle: scoped release of ``localCheckpoint``'ed
intermediates.

Several operators pin an intermediate with ``localCheckpoint`` so a
shared subplan is materialized exactly once (minhash candidate tables,
triangle-count edge sets, connected-components iterations, ANN audit
inputs). The blocks behind a local checkpoint live in the block manager
until the JVM garbage-collects the RDD object — which, in a long-lived
session with a large heap, is effectively never. Across a 48-key bench
run (or a real multi-query production session) those blocks accumulate,
pressure the unified memory pool, and turn into execution-memory spills
in UNRELATED later queries: a genuine long-session leak at 100 TB, not
just bench hygiene (round-5 verdict finding on ``q_minhash_lsh``).

This module makes the lifecycle explicit and caller-owned:

* operators call :func:`pin` instead of ``df.localCheckpoint()`` — same
  semantics, plus registration with the innermost active scope (if any;
  with no scope the behavior is byte-identical to before);
* callers that know when consumption ends wrap the work in
  :func:`checkpoint_scope` — on exit every checkpoint pinned inside is
  released;
* iterative algorithms call :func:`release` directly on a superseded
  iteration the moment its successor is materialized (connected
  components keeps exactly TWO iterations live instead of all of them).

IMPORTANT: a local checkpoint truncates lineage, so after
:func:`release` the DataFrame CANNOT be recomputed — any further action
on it raises ``CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND``. Release strictly
after the last consumption; scopes make that ordering structural.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator, List

from pyspark.sql import DataFrame

# scope stack is thread-local: concurrent query threads (a real pattern
# on a shared driver) must not release each other's checkpoints
_local = threading.local()


def _scopes() -> List[List[DataFrame]]:
    if not hasattr(_local, "scopes"):
        _local.scopes = []
    return _local.scopes


def pin(df: DataFrame, eager: bool = True, escape: bool = False) -> DataFrame:
    """``df.localCheckpoint(eager)`` + register the pinned result with
    the innermost active :func:`checkpoint_scope` (no-op registration
    when no scope is active).

    ``escape=True`` checkpoints WITHOUT registering: the checkpoint that
    backs an operator's RETURNED DataFrame must survive the operator's
    (or a caller's) enclosing scope, or consuming the result after the
    scope exits hard-fails with ``CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND``
    instead of recomputing (round-6 advisor finding — lineage is
    truncated, so release is unrecoverable). Escaped checkpoints are
    caller-owned: free them with :func:`release` when done — release
    works on the checkpointed DataFrame itself AND on any result
    derived from it, so operators need not hand the raw handle back."""
    out = df.localCheckpoint(eager)
    if not escape:
        scopes = _scopes()
        if scopes:
            scopes[-1].append(out)
    return out


def release(df: DataFrame, caches: bool = False) -> bool:
    """Free the block-manager blocks behind EVERY ``localCheckpoint``
    leaf in ``df``'s plan NOW (non-blocking unpersist). Returns True
    iff at least one leaf actually holding blocks was freed.

    Works on the checkpointed DataFrame itself AND on any DataFrame
    DERIVED from one: operators that escape a checkpoint behind their
    returned result (``clean_corpus``'s gate relation, the final
    ``connected_components`` labels) hand back plans layered over the
    checkpoint, so the caller's only handle IS the derived plan —
    release walks the plan's leaves and unpersists each RDD-backed one
    (round-7 verdict: the previous root-only implementation made those
    escaped checkpoints permanently unreleasable).

    ``caches=True`` additionally drops the materialized buffers of any
    ``df.cache()`` leaf (``InMemoryRelation``) under the plan; the
    cache entry stays registered, so later use recomputes (and
    re-caches) instead of failing. It is OFF by default on ownership
    grounds: checkpoints under our operator results are created BY the
    operators (caller-release is the contract), but a cache under a
    derived plan is usually the CALLER's input cache (``docs.cache()``
    reused across queries) — clearing it here would silently force
    re-materialization on every later query over that input. Pass
    ``caches=True`` only for caches the released result owns (e.g.
    ``jsonl_audit``'s parsed relation).

    Releases every checkpoint under the plan, including one the CALLER
    pinned and joined in — release only when all consumers of every
    underlying checkpoint are done. Leaf-kind probing catches only the
    py4j "method does not exist" signal; real JVM failures propagate
    instead of being silently swallowed as a skipped leaf."""
    from py4j.protocol import Py4JError, Py4JJavaError

    released = False
    try:
        # withCachedData, not analyzed: cache substitution happens there,
        # so df.cache() leaves surface as InMemoryRelation; checkpoint
        # LogicalRDD leaves pass through unchanged
        leaves = df._jdf.queryExecution().withCachedData().collectLeaves()
    except Py4JJavaError:
        raise
    except Py4JError:
        return False

    def _probe(obj, method):
        # a missing method is the is-not-that-leaf-kind signal, a JVM
        # exception is a real failure and must surface
        try:
            return getattr(obj, method)()
        except Py4JJavaError:
            raise
        except Py4JError:
            return None

    work = [leaves.apply(i) for i in range(leaves.size())]
    while work:
        leaf = work.pop()
        # checkpoint / createDataFrame-from-RDD leaves expose .rdd()
        # (logical LogicalRDD and physical RDDScanExec alike)
        rdd = _probe(leaf, "rdd")
        if rdd is not None:
            if rdd.getStorageLevel().isValid():
                rdd.unpersist(False)
                released = True
            continue
        # cache leaves: logical InMemoryRelation exposes cacheBuilder()
        # directly, physical InMemoryTableScanExec via relation(). A
        # cache SUBSTITUTION swallows the subtree it matched, so a
        # checkpoint under a caller's df.cache() would be invisible to
        # the top-level walk — recurse into the cached physical plan's
        # leaves to find it (r8 review finding: without this, caching a
        # returned result re-created the unreleasable-checkpoint leak
        # this function exists to close)
        cb = _probe(leaf, "cacheBuilder")
        if cb is None:
            rel = _probe(leaf, "relation")
            cb = _probe(rel, "cacheBuilder") if rel is not None else None
        if cb is not None and not cb.isCachedColumnBuffersLoaded() and not caches:
            # a REGISTERED but never-materialized cache is a consumer
            # that hasn't run yet: its first action must still read the
            # checkpoint underneath (lineage is truncated — there is
            # nothing else to materialize from), so do NOT recurse into
            # it. If the caller abandons the cache unconsumed the
            # checkpoint stays pinned — release again after
            # materializing or unpersisting the cache, or pass
            # ``caches=True``: that is the explicit I-own-these-caches
            # teardown signal, so the walk proceeds and frees the
            # checkpoint even under a pending cache (which then cannot
            # materialize later — teardown means no further reads).
            continue
        if cb is None:
            # AQE wraps the real plan in LEAF nodes: AdaptiveSparkPlanExec
            # (exposes inputPlan/executedPlan) and QueryStageExec
            # (exposes plan). Recurse through every wrapper accessor the
            # node answers — inputPlan reaches the pre-AQE tree whose
            # leaves are the actual scans, executedPlan/plan cover
            # already-materialized stages; visiting the same RDD twice
            # is harmless (unpersist is idempotent).
            for m in ("inputPlan", "executedPlan", "plan"):
                inner = _probe(leaf, m)
                if inner is not None:
                    il = inner.collectLeaves()
                    work.extend(il.apply(i) for i in range(il.size()))
            continue
        inner = _probe(cb, "cachedPlan")
        if inner is not None:
            cached_leaves = inner.collectLeaves()
            work.extend(
                cached_leaves.apply(i) for i in range(cached_leaves.size())
            )
        # only count/clear buffers that were actually materialized — a
        # pending cache reached via the caches=True teardown path above
        # holds nothing to free
        if caches and cb.isCachedColumnBuffersLoaded():
            cb.clearCache(False)
            released = True
    return released


@contextmanager
def checkpoint_scope() -> Iterator[List[DataFrame]]:
    """Scope within which every :func:`pin` is tracked; on exit all
    tracked checkpoints are released. Wrap one query's build-execute-
    consume span::

        with lifecycle.checkpoint_scope():
            n = dedup.minhash_near_dup_pairs(docs, "text", "doc_id").count()
        # candidate/shingle checkpoint blocks are freed here

    Scopes nest; each releases only its own pins."""
    pinned: List[DataFrame] = []
    _scopes().append(pinned)
    try:
        yield pinned
    finally:
        _scopes().pop()
        for df in pinned:
            release(df)


def storage_snapshot(spark) -> dict:
    """Block-manager storage totals ``{n_rdds, n_blocks, mem_bytes,
    disk_bytes}`` — the instrumentation used to demonstrate the leak and
    its fix (SCALE_EXPERIMENTS.md)."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {
        "n_rdds": len(infos),
        "n_blocks": sum(i.numCachedPartitions() for i in infos),
        "mem_bytes": sum(i.memSize() for i in infos),
        "disk_bytes": sum(i.diskSize() for i in infos),
    }
