"""Randomized equivalence properties for the r10 bounded-state rewrites.

Each rewritten operator (funnel n-pass chain, time_rollup rank-bounded
samples, simhash struct-fold lanes) is compared against a brute-force
Python reference on seeded random inputs — the strongest evidence that
a state-shape rewrite preserved semantics exactly (the oracle gate
checks two fixed datasets; these runs explore tie-heavy, null-heavy and
degenerate shapes the fixtures don't contain).
"""

import datetime as dt
import random

from pyspark.sql import Row
from pyspark.sql import functions as F


def _ts(minute):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=int(minute))


def _funnel_reference(events, stages):
    """Greedy earliest-chain: t1 = min ts of stage1, ti = min ts of
    stage_i strictly after t(i-1)."""
    by_user = {}
    for u, ts, y in events:
        by_user.setdefault(u, []).append((ts, y))
    out = {}
    for u, evs in by_user.items():
        if u is None:
            # oracle spine parity: the non-null-safe LEFT JOIN chain
            # never matches a NULL user, so it reports 0 regardless of
            # the NULL group's stage evidence (r10 advisor finding)
            out[u] = 0
            continue
        prev = None
        stage = 0
        for s in stages:
            cand = [t for t, y in evs if y == s and (prev is None or t > prev)]
            if not cand:
                break
            prev = min(cand)
            stage += 1
        out[u] = stage
    return out


def test_funnel_matches_reference_on_random_inputs(spark):
    from elephant_twin_spark.operators import sessionize

    stages = ["a", "b", "c"]
    types = ["a", "b", "c", "x"]
    rng = random.Random(1234)
    for trial in range(6):
        n_users = rng.randint(1, 8)
        events = []
        for u in range(n_users):
            for _ in range(rng.randint(1, 12)):
                # tight minute range => many exact timestamp ties, the
                # order-sensitivity hazard the n-pass chain must shrug off
                events.append((u, _ts(rng.randint(0, 6)), rng.choice(types)))
        # NULL user with full stage-1..n evidence: must report 0, the
        # oracle's non-null-safe spine semantics (r11 alignment)
        for s in stages:
            events.append((None, _ts(rng.randint(0, 6)), s))
        df = spark.createDataFrame(
            [Row(user_id=u, ts=t, event_type=y) for u, t, y in events],
            "user_id long, ts timestamp, event_type string",
        )
        got = {
            r["user"]: r["stage_reached"]
            for r in sessionize.funnel(
                df, "user_id", "ts", "event_type", stages
            ).collect()
        }
        want = _funnel_reference(events, stages)
        assert got == want, (trial, got, want)


def test_time_rollup_matches_reference_on_random_inputs(spark):
    from elephant_twin_spark.operators import rollup

    rng = random.Random(99)
    for trial in range(4):
        rows = []
        for _ in range(rng.randint(5, 60)):
            rows.append(
                Row(
                    ts=_ts(rng.randint(0, 200)),
                    k=rng.choice(["a", "b"]),
                    # duplicates AND nulls: duplicated ids must occupy
                    # multiple sample slots, nulls must occupy none
                    i=rng.choice([None, 1, 1, 2, 3, 5, 8, 13, 21]),
                )
            )
        df = spark.createDataFrame(rows, "ts timestamp, k string, i int")
        k_samples = rng.choice([1, 3, 5])
        got = {
            (r["bucket"], r["key"]): (r["cnt"], r["last_ts"], r["samples"])
            for r in rollup.time_rollup(
                df, "ts", "k", "i", unit="hour", k_samples=k_samples
            ).collect()
        }
        want = {}
        for r in rows:
            b = r.ts.replace(minute=0, second=0, microsecond=0)
            want.setdefault((b, r.k), []).append(r)
        for key, grp in want.items():
            ids = sorted(x.i for x in grp if x.i is not None)[:k_samples]
            exp = (len(grp), max(x.ts for x in grp), ids)
            assert got[key] == exp, (trial, key, got[key], exp)


def _simhash_reference(text, nbits, hasher):
    toks = text.split()
    tf = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    sums = [0] * nbits
    for t, n in tf.items():
        h = hasher(t)
        for b in range(nbits):
            sums[b] += n if (h >> b) & 1 else -n
    out = 0
    for b in range(nbits):
        if sums[b] > 0:
            out |= 1 << b
    return out


def test_simhash_md5_matches_reference_on_random_inputs(spark):
    """The struct-fold lane aggregation must equal a per-doc Python
    simhash bit-for-bit (integer lane sums are order-free, so any
    divergence is a real lane/shift bug, not float noise)."""
    import hashlib

    from elephant_twin_spark.operators.pipeline import dedup

    def md5_60(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "x", "yy"]
    rows = [
        Row(doc_id=i, text=" ".join(rng.choices(vocab, k=rng.randint(1, 30))))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["id"]: r["simhash"]
        for r in dedup.simhash60_md5(df, "text", "doc_id").collect()
    }
    for r in rows:
        assert got[r.doc_id] == _simhash_reference(r.text, 60, md5_60), r


def _asof_reference(left_rows, right_rows, strict=False):
    """Brute force: per left row, among NON-NULL-key right rows of the
    same key with t2 <= t (or < when strict), pick max t2; among ties
    pick max (v, w) tuple (the keep-max struct tiebreak)."""
    out = []
    for k, t in left_rows:
        cands = [
            (t2, v, w)
            for (k2, t2, v, w) in right_rows
            if k2 is not None and k2 == k and (t2 < t if strict else t2 <= t)
        ]
        if not cands:
            out.append((k, t, None, None))
            continue
        mt = max(c[0] for c in cands)
        tied = [(v, w) for (t2, v, w) in cands if t2 == mt]
        # keep-max over the right_values tuple, NULLs first (lose ties)
        best = max(tied, key=lambda x: ((x[0] is not None, x[0] or ""),
                                        (x[1] is not None, x[1] or 0)))
        out.append((k, t, best[0], best[1]))
    return sorted(out, key=lambda r: (r[0] or -1, r[1]))


def test_asof_join_matches_reference_on_random_inputs(spark):
    """Randomized equivalence for the r11 asof rewrite: tie-heavy
    timestamps, NULL keys (must match nothing), NULL value fields
    (row-level fill — never mixed across rows), both strictness modes,
    varying partitioning."""
    from elephant_twin_spark.operators import temporal

    rng = random.Random(31337)
    for trial in range(5):
        keys = [None, 1, 2, 3]
        left_rows = [
            (rng.choice(keys[1:] + [None]), rng.randint(0, 8))
            for _ in range(rng.randint(1, 10))
        ]
        right_rows = [
            (
                rng.choice(keys),
                rng.randint(0, 8),
                rng.choice([None, "a", "b", "c"]),
                rng.choice([None, 1, 2, 9]),
            )
            for _ in range(rng.randint(1, 14))
        ]
        strict = trial % 2 == 1
        left = spark.createDataFrame(left_rows, "k int, t int").repartition(
            2 + trial
        )
        right = spark.createDataFrame(
            right_rows, "k int, t2 int, v string, w int"
        ).repartition(3 + trial)
        got = sorted(
            (
                (r["k"], r["t"], r["v"], r["w"])
                for r in temporal.asof_join(
                    left, right, ["k"], "t", "t2", ["v", "w"], strict=strict
                ).collect()
            ),
            key=lambda r: (r[0] if r[0] is not None else -1, r[1], r[2] or "", r[3] or 0),
        )
        want = sorted(
            _asof_reference(left_rows, right_rows, strict),
            key=lambda r: (r[0] if r[0] is not None else -1, r[1], r[2] or "", r[3] or 0),
        )
        assert got == want, (trial, got, want)
