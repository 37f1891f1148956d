"""Randomized (seeded, deterministic) lifecycle invariant runs.

A model-based sequence of {pin-escaped, derive+cache, materialize,
unpersist, release-attempt} operations against a Python-side ownership
model, checking after every step that:

* ``release()`` frees a checkpoint IFF it is still alive and no
  REGISTERED cache depends on it (the r9 global barrier — sibling
  caches included);
* a protected or already-freed checkpoint release returns False and
  leaves live readers working;
* after full teardown (all caches unpersisted, all checkpoints
  released) block-manager storage returns to the session baseline.

The example-based tests in test_r8_lifecycle.py / test_r9_advice.py pin
individual shapes; this sweeps compositions of them.
"""

import random
import time

import pytest
from pyspark.sql import functions as F

from elephant_twin_spark.operators import lifecycle


def _wait_storage(spark, pred, timeout_s=8.0):
    for _ in range(int(timeout_s * 10)):
        snap = lifecycle.storage_snapshot(spark)
        if pred(snap):
            return snap
        time.sleep(0.1)
    return lifecycle.storage_snapshot(spark)


class _Model:
    """Python-side ground truth for what release() must do."""

    def __init__(self, spark):
        self.spark = spark
        self.n = 0
        self.checkpoints = {}   # idx -> DataFrame (escaped pin)
        self.alive = set()      # checkpoint idxs whose blocks are live
        self.caches = {}        # cache idx -> (df, set(checkpoint idxs), materialized)
        self.n_caches = 0

    def pin(self):
        idx = self.n
        self.n += 1
        df = lifecycle.pin(
            self.spark.range(1_000 + idx).selectExpr(
                "id", f"id * {idx + 2} as v"
            ),
            escape=True,
        )
        self.checkpoints[idx] = df
        self.alive.add(idx)
        return idx

    def derive_cache(self, rng):
        if not self.alive:
            return
        dep = rng.choice(sorted(self.alive))
        df = self.checkpoints[dep].selectExpr("id", f"v + {self.n_caches} as w")
        cached = df.cache()
        materialized = rng.random() < 0.7
        if materialized:
            assert cached.count() == 1_000 + dep
        self.caches[self.n_caches] = (cached, {dep}, materialized)
        self.n_caches += 1

    def unpersist_cache(self, rng):
        if not self.caches:
            return
        cidx = rng.choice(sorted(self.caches))
        cached, _, _ = self.caches.pop(cidx)
        cached.unpersist(True)

    def protected(self, ck_idx):
        return any(ck_idx in deps for _, deps, _ in self.caches.values())

    def release_attempt(self, rng):
        if not self.checkpoints:
            return
        idx = rng.choice(sorted(self.checkpoints))
        ck = self.checkpoints[idx]
        # release through a derived plan, as operators' callers do
        derived = ck.where("v >= 0")
        expected = idx in self.alive and not self.protected(idx)
        got = lifecycle.release(derived)
        assert got is expected, (
            f"release(ck{idx}) -> {got}, expected {expected} "
            f"(alive={idx in self.alive}, protected={self.protected(idx)})"
        )
        if expected:
            self.alive.discard(idx)
            del self.checkpoints[idx]

    def check_reads(self):
        # every live checkpoint must still answer queries
        for idx in sorted(self.alive):
            assert self.checkpoints[idx].count() == 1_000 + idx
        # every materialized cache must still serve
        for cidx, (cached, deps, materialized) in sorted(self.caches.items()):
            if materialized:
                assert cached.count() == 1_000 + next(iter(deps))

    def teardown(self):
        for cached, _, _ in self.caches.values():
            cached.unpersist(True)
        self.caches.clear()
        for idx in sorted(self.checkpoints):
            got = lifecycle.release(self.checkpoints[idx])
            assert got is (idx in self.alive)
        self.checkpoints.clear()
        self.alive.clear()


@pytest.mark.parametrize("seed", [1, 17, 42])
def test_lifecycle_random_sequences_hold_invariants(spark, seed):
    base = lifecycle.storage_snapshot(spark)["n_rdds"]
    rng = random.Random(seed)
    m = _Model(spark)
    ops = [m.pin]  # always start with one checkpoint
    for _ in range(14):
        ops.append(
            rng.choice(
                [m.pin, m.derive_cache, m.derive_cache, m.unpersist_cache,
                 m.release_attempt, m.release_attempt]
            )
        )
    for op in ops:
        if op == m.pin:  # bound-method equality (is would compare fresh wrappers)
            op()
        else:
            op(rng)
        m.check_reads()
    m.teardown()
    snap = _wait_storage(spark, lambda s: s["n_rdds"] <= base)
    assert snap["n_rdds"] <= base, snap
