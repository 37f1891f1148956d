"""Randomized (seeded, deterministic) lifecycle invariant runs.

A model-based sequence of {pin-escaped, derive+cache, materialize,
unpersist, release-attempt, re-release-freed} operations against a
Python-side ownership model, checking after every step that:

* ``release()`` frees a checkpoint IFF no REGISTERED cache depends on
  it (the r9 global barrier — sibling caches included);
* a protected release returns False and leaves live readers working;
* releasing an ALREADY-FREED checkpoint (through a derived plan, as a
  double-release bug would) returns False and never raises;
* after full teardown (all caches unpersisted, all checkpoints
  released) block-manager storage returns to the session baseline.

The example-based tests in test_r8_lifecycle.py / test_r9_advice.py pin
individual shapes; this sweeps compositions of them.
"""

import random

import pytest

from conftest import settled_rdd_count, wait_storage
from elephant_twin_spark.operators import lifecycle


class _Model:
    """Python-side ground truth for what release() must do."""

    def __init__(self, spark):
        self.spark = spark
        self.n = 0
        self.checkpoints = {}   # idx -> DataFrame (escaped pin, alive)
        self.freed = {}         # idx -> DataFrame (released, unusable)
        self.caches = {}        # cache idx -> (df, checkpoint idx, materialized)
        self.n_caches = 0

    def pin(self, rng):
        idx = self.n
        self.n += 1
        df = lifecycle.pin(
            self.spark.range(1_000 + idx).selectExpr(
                "id", f"id * {idx + 2} as v"
            ),
            escape=True,
        )
        self.checkpoints[idx] = df

    def derive_cache(self, rng):
        if not self.checkpoints:
            return
        dep = rng.choice(sorted(self.checkpoints))
        df = self.checkpoints[dep].selectExpr("id", f"v + {self.n_caches} as w")
        cached = df.cache()
        materialized = rng.random() < 0.7
        if materialized:
            assert cached.count() == 1_000 + dep
        self.caches[self.n_caches] = (cached, dep, materialized)
        self.n_caches += 1

    def unpersist_cache(self, rng):
        if not self.caches:
            return
        cidx = rng.choice(sorted(self.caches))
        cached, _, _ = self.caches.pop(cidx)
        cached.unpersist(True)

    def protected(self, ck_idx):
        return any(dep == ck_idx for _, dep, _ in self.caches.values())

    def release_attempt(self, rng):
        if not self.checkpoints:
            return
        idx = rng.choice(sorted(self.checkpoints))
        # release through a derived plan, as operators' callers do
        derived = self.checkpoints[idx].where("v >= 0")
        expected = not self.protected(idx)
        got = lifecycle.release(derived)
        assert got is expected, (
            f"release(ck{idx}) -> {got}, expected {expected} "
            f"(protected={self.protected(idx)})"
        )
        if expected:
            self.freed[idx] = self.checkpoints.pop(idx)

    def release_freed(self, rng):
        """Double-release: must be a calm no-op, never True, never raise."""
        if not self.freed:
            return
        idx = rng.choice(sorted(self.freed))
        assert lifecycle.release(self.freed[idx].where("v >= 0")) is False

    def check_reads(self):
        # every live checkpoint must still answer queries
        for idx in sorted(self.checkpoints):
            assert self.checkpoints[idx].count() == 1_000 + idx
        # every materialized cache must still serve
        for cidx, (cached, dep, materialized) in sorted(self.caches.items()):
            if materialized:
                assert cached.count() == 1_000 + dep

    def teardown(self):
        for cached, _, _ in self.caches.values():
            cached.unpersist(True)
        self.caches.clear()
        for idx in sorted(self.checkpoints):
            assert lifecycle.release(self.checkpoints[idx]) is True
        for idx in sorted(self.freed):
            assert lifecycle.release(self.freed[idx]) is False
        self.checkpoints.clear()
        self.freed.clear()


@pytest.mark.parametrize("seed", [1, 17, 42])
def test_lifecycle_random_sequences_hold_invariants(spark, seed):
    base = settled_rdd_count(spark)
    rng = random.Random(seed)
    m = _Model(spark)
    ops = [m.pin]  # always start with one checkpoint
    for _ in range(15):
        ops.append(
            rng.choice(
                [m.pin, m.derive_cache, m.derive_cache, m.unpersist_cache,
                 m.release_attempt, m.release_attempt, m.release_freed]
            )
        )
    for op in ops:
        op(rng)
        m.check_reads()
    m.teardown()
    snap = wait_storage(spark, lambda s: s["n_rdds"] <= base, timeout_s=8.0)
    assert snap["n_rdds"] <= base, snap
