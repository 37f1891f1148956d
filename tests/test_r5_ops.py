"""Round-5 operators: SCD2 changelog history, Markov transition
matrices, item-item CF cosine, int8 scalar quantization, Heaps-law
vocabulary growth, external-path bucketed tables."""

import math

import pytest
from pyspark.sql import functions as F

from elephant_twin_spark.operators import kpi, layout, temporal
from elephant_twin_spark.operators.pipeline import similarity, textstats


# ------------------------------------------------------------- scd2

def _changelog(spark):
    rows = [
        # user 1: a -> a (re-emit) -> b -> a ; ties broken by seq
        (1, 10, 1, "a"),
        (1, 20, 2, "a"),
        (1, 30, 3, "b"),
        (1, 40, 4, "a"),
        # user 2: single row -> single open interval
        (2, 15, 5, "x"),
        # user 3: NULL state is a real state and collapses with itself
        (3, 10, 6, None),
        (3, 20, 7, None),
        (3, 30, 8, "y"),
    ]
    return spark.createDataFrame(rows, "uid int, ts int, seq int, state string")


def test_scd2_collapses_consecutive_and_chains_intervals(spark):
    out = temporal.scd2_intervals(
        _changelog(spark), ["uid"], "ts", ["state"], tiebreak=["seq"]
    )
    got = {
        (r["uid"], r["effective_from"]): r.asDict() for r in out.collect()
    }
    # user 1: runs (a,10..30) (b,30..40) (a,40..open)
    assert got[(1, 10)]["state"] == "a" and got[(1, 10)]["n_rows"] == 2
    assert got[(1, 10)]["effective_to"] == 30
    assert got[(1, 30)]["state"] == "b" and got[(1, 30)]["effective_to"] == 40
    assert got[(1, 40)]["state"] == "a" and got[(1, 40)]["is_current"]
    assert got[(1, 40)]["effective_to"] is None
    # user 2: one open interval
    assert got[(2, 15)]["is_current"] and got[(2, 15)]["n_rows"] == 1
    # user 3: NULL run collapsed (eqNullSafe), then y
    assert got[(3, 10)]["state"] is None and got[(3, 10)]["n_rows"] == 2
    assert got[(3, 10)]["effective_to"] == 30
    assert got[(3, 30)]["state"] == "y" and got[(3, 30)]["is_current"]
    # exactly one current interval per key
    cur = [k for k, v in got.items() if v["is_current"]]
    assert sorted(u for u, _ in cur) == [1, 2, 3]


def test_scd2_no_collapse_opens_interval_per_row(spark):
    out = temporal.scd2_intervals(
        _changelog(spark), ["uid"], "ts", ["state"],
        tiebreak=["seq"], collapse_consecutive=False,
    )
    assert out.count() == 8
    u1 = (
        out.where(F.col("uid") == 1)
        .orderBy("effective_from")
        .select("effective_from", "effective_to")
        .collect()
    )
    # intervals chain with no gaps: each effective_to = next effective_from
    for prev, nxt in zip(u1, u1[1:]):
        assert prev["effective_to"] == nxt["effective_from"]
    assert u1[-1]["effective_to"] is None


# ------------------------------------------------- transition matrix

def test_transition_matrix_counts_and_rows_normalize(spark):
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
        (2, 1, "a"), (2, 2, "b"),
        (3, 5, "b"),  # lone event: no transition unless terminal
    ]
    df = spark.createDataFrame(rows, "uid int, ts int, state string")
    out = kpi.transition_matrix(df, "uid", "ts", "state")
    got = {(r["from_state"], r["to_state"]): (r["n"], r["p"]) for r in out.collect()}
    assert got[("a", "b")][0] == 2
    assert got[("b", "a")][0] == 1
    assert got[("a", "b")][1] == 1.0  # a only ever goes to b
    assert len(got) == 2

    term = kpi.transition_matrix(df, "uid", "ts", "state", include_terminal=True)
    by_from = {}
    for r in term.collect():
        by_from.setdefault(r["from_state"], []).append(r)
    # with terminals, p sums to 1 per from_state and NULL targets appear
    for rows_ in by_from.values():
        assert sum(r["p"] for r in rows_) == pytest.approx(1.0, abs=1e-5)
    assert any(r["to_state"] is None for r in by_from["b"])


# -------------------------------------------------- item-item cosine

def test_cooccurrence_cosine_matches_hand_computation(spark):
    # u1: A,A,B   u2: A,B   u3: B,C
    rows = [(1, "A"), (1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "B"), (3, "C")]
    df = spark.createDataFrame(rows, "u int, item string")
    out = similarity.cooccurrence_cosine(df, "u", "item")
    got = {(r["item_a"], r["item_b"]): r.asDict() for r in out.collect()}
    # vectors: A=(2,1,0) B=(1,1,1) C=(0,0,1)
    ab = got[("A", "B")]
    assert ab["n_users"] == 2 and ab["dot"] == 3
    assert ab["cosine"] == pytest.approx(3 / (math.sqrt(5) * math.sqrt(3)), abs=1e-6)
    bc = got[("B", "C")]
    assert bc["dot"] == 1
    assert ("A", "C") not in got  # never co-interacted


def test_cooccurrence_cosine_power_user_cap_drops_user(spark):
    rows = [(1, "A"), (1, "B"), (1, "C"), (2, "A"), (2, "B")]
    df = spark.createDataFrame(rows, "u int, item string")
    capped = similarity.cooccurrence_cosine(df, "u", "item", max_items_per_user=2)
    got = {(r["item_a"], r["item_b"]): r["n_users"] for r in capped.collect()}
    # user 1 (3 items) dropped: only u2's A-B pair remains
    assert got == {("A", "B"): 1}


# ------------------------------------------------ scalar quantization

def test_scalar_quantize_roundtrip_and_bounds(spark):
    rows = [(0, [0.0, -1.0, 5.0]), (1, [1.0, 1.0, 5.0]), (2, [0.5, 0.0, 5.0])]
    df = spark.createDataFrame(rows, "id int, v array<float>")
    vmin, vmax = similarity.scalar_quantize_fit(df, "v")
    assert vmin == [0.0, -1.0, 5.0] and vmax == [1.0, 1.0, 5.0]
    codes = {
        r["id"]: r["codes"]
        for r in similarity.scalar_quantize(df, "v", vmin, vmax).collect()
    }
    # endpoints hit 0 and 255; midpoint rounds to nearest level
    assert codes[0] == [0, 0, 0]       # mins (degenerate dim 2 -> 0)
    assert codes[1] == [255, 255, 0]
    assert codes[2][0] in (127, 128)
    # reconstruction error bounded by scale/2 on every dim
    stats = {r["dim"]: r.asDict() for r in
             similarity.scalar_quantize_stats(df, "v").collect()}
    for d in (0, 1):
        scale = (vmax[d] - vmin[d]) / 255.0
        # max_abs_err is rounded to 9 digits, so allow that grain
        assert stats[d]["max_abs_err"] <= scale / 2 + 1e-9
    assert stats[2]["max_abs_err"] == 0.0  # degenerate dim decodes exactly


def test_scalar_quantize_stats_sum_codes_is_exact(spark):
    from conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = similarity.scalar_quantize_stats(emb, "embedding")
    rows = out.collect()
    n = emb.count()
    assert all(r["n"] == n for r in rows)
    # codes live in [0, 255] so the exact integer sum is bounded
    assert all(0 <= r["sum_codes"] <= 255 * n for r in rows)
    assert all(r["max_abs_err"] >= 0 for r in rows)


# ------------------------------------------------------- Heaps' law

def test_heaps_slope_detects_growth_vs_saturation(spark):
    # growing vocabulary: doc i introduces i novel tokens
    grow = [(i, " ".join(f"tok{i}_{j}" for j in range(i + 1))) for i in range(100)]
    g = textstats.heaps_slope(
        spark.createDataFrame(grow, "doc_id long, text string"), "text", "doc_id",
        n_buckets=10,
    ).collect()[0]
    assert g["n_points"] == 10
    assert g["total_vocab"] == sum(range(1, 101))
    assert 0.5 < g["slope"] <= 1.2  # vocab grows ~linearly with tokens

    # closed vocabulary: always the same 3 tokens -> slope 0
    closed = [(i, "a b c") for i in range(100)]
    c = textstats.heaps_slope(
        spark.createDataFrame(closed, "doc_id long, text string"), "text", "doc_id",
        n_buckets=10,
    ).collect()[0]
    assert c["total_vocab"] == 3 and c["slope"] == 0.0


# ------------------------------------------- external-path bucketing

def test_bucket_table_external_path(spark, workdir):
    import os

    from conftest import SF_DIR

    from elephant_twin_spark.sources import tables

    ev = tables.load_raw(spark, f"{SF_DIR}/events.parquet")
    spark.sql("DROP TABLE IF EXISTS ets_bkt_ext")
    dst = f"{workdir}/bkt_ext"
    layout.bucket_table(
        spark, ev.select("event_id", "user_id", "value"), "ets_bkt_ext",
        ["user_id"], 4, sort_cols=["user_id"], path=dst,
    )
    try:
        assert os.path.exists(dst)  # data at the external path, not the warehouse
        assert spark.table("ets_bkt_ext").count() == ev.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS ets_bkt_ext")


# ------------------------------------------------------ epoch shuffle

def test_epoch_shuffle_deterministic_and_decorrelated(spark):
    from elephant_twin_spark.operators.pipeline import shard as shard_mod

    df = spark.createDataFrame([(i,) for i in range(200)], "id long")
    a = shard_mod.epoch_shuffle(df, "id", epoch=0, num_shards=4)
    b = shard_mod.epoch_shuffle(df, "id", epoch=0, num_shards=4)
    rows_a = {(r["id"], r["shard"], r["pos"]) for r in a.collect()}
    rows_b = {(r["id"], r["shard"], r["pos"]) for r in b.collect()}
    assert rows_a == rows_b  # same epoch -> identical permutation

    c = shard_mod.epoch_shuffle(df, "id", epoch=1, num_shards=4)
    rows_c = {(r["id"], r["shard"], r["pos"]) for r in c.collect()}
    assert rows_a != rows_c  # different epoch -> different permutation

    # shards partition the corpus; pos is a dense 1..n_shard rank
    by_shard = {}
    for (i, s, p) in rows_a:
        by_shard.setdefault(s, []).append(p)
    assert sum(len(v) for v in by_shard.values()) == 200
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_epoch_shuffle_order_is_key_order_within_shard(spark):
    from elephant_twin_spark.operators.pipeline import shard as shard_mod

    df = spark.createDataFrame([(i,) for i in range(50)], "id long")
    out = shard_mod.epoch_shuffle(df, "id", epoch=3, num_shards=2).collect()
    for s in (0, 1):
        rows = sorted((r for r in out if r["shard"] == s), key=lambda r: r["pos"])
        keys = [r["shuffle_key"] for r in rows]
        assert keys == sorted(keys)  # pos follows md5-key order


# ---------------------------------------------------- triangle count

def test_triangle_count_known_graphs(spark):
    from elephant_twin_spark.operators.pipeline import graph

    # K4: 4 triangles; edges given in mixed orientation with a dup + loop
    k4 = [(1, 2), (1, 3), (1, 4), (3, 2), (2, 4), (3, 4), (2, 1), (2, 2)]
    out = graph.triangle_count(
        spark.createDataFrame(k4, "src int, dst int")
    ).collect()[0]
    assert (out["n_vertices"], out["n_edges"], out["n_triangles"]) == (4, 6, 4)

    # C5 cycle: no triangles
    c5 = [(i, (i + 1) % 5) for i in range(5)]
    out = graph.triangle_count(
        spark.createDataFrame(c5, "src int, dst int")
    ).collect()[0]
    assert (out["n_vertices"], out["n_edges"], out["n_triangles"]) == (5, 5, 0)


def test_triangle_count_matches_bruteforce_on_random_graph(spark):
    import hashlib as _h
    from itertools import combinations

    from elephant_twin_spark.operators.pipeline import graph

    # deterministic md5 random graph over 40 vertices (~p=0.15)
    edges = [
        (a, b)
        for a, b in combinations(range(40), 2)
        if int(_h.md5(f"{a}:{b}".encode()).hexdigest()[:8], 16) % 7 == 0
    ]
    adj = {v: set() for v in range(40)}
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    expected = sum(
        1 for x, y, z in combinations(range(40), 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )
    out = graph.triangle_count(
        spark.createDataFrame(edges, "src int, dst int")
    ).collect()[0]
    assert out["n_triangles"] == expected and out["n_edges"] == len(edges)


def test_scd2_matches_python_reference_on_random_changelog(spark):
    import random

    rng = random.Random(7)
    rows = []
    seq = 0
    for uid in range(12):
        for _ in range(rng.randint(0, 15)):
            seq += 1
            rows.append((uid, rng.randint(0, 30), seq, rng.choice(["a", "b", "c", None])))
    df = spark.createDataFrame(rows, "uid int, ts int, seq int, state string")
    key = lambda t: (t[0], t[1], t[2] or "")
    got = sorted(
        (
            (r["uid"], r["effective_from"], r["state"], r["n_rows"],
             r["effective_to"], r["is_current"])
            for r in temporal.scd2_intervals(
                df, ["uid"], "ts", ["state"], tiebreak=["seq"]
            ).collect()
        ),
        key=key,
    )

    # python reference: sort per key by (ts, seq), collapse runs, chain
    expected = []
    by_uid = {}
    for uid, ts, seq_, state in rows:
        by_uid.setdefault(uid, []).append((ts, seq_, state))
    for uid, evs in by_uid.items():
        evs.sort()
        runs = []
        for ts, _, state in evs:
            if runs and runs[-1][0] == state:
                runs[-1][2] += 1
            else:
                runs.append([state, ts, 1])
        for i, (state, ts, n) in enumerate(runs):
            nxt = runs[i + 1][1] if i + 1 < len(runs) else None
            expected.append((uid, ts, state, n, nxt, nxt is None))
    assert got == sorted(expected, key=key)


# ----------------------------------------------------- novelty score

def test_novelty_score_fractions(spark):
    from elephant_twin_spark.operators.pipeline import ngrams

    ref = spark.createDataFrame([(100, "a b c d")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # all 2 grams seen -> novelty 0
            (2, "x y z w"),        # nothing seen -> novelty 1
            (3, "a b c z"),        # 'a b c' seen, 'b c z' new -> 0.5
            (4, "hi"),             # short doc: one whole-doc gram, unseen
            (5, None),             # NULL text: 0 grams, NULL novelty
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r.asDict() for r in
           ngrams.novelty_score(docs, ref, "text", "doc_id", n=3).collect()}
    assert out[1]["novelty"] == 0.0 and out[1]["n_grams"] == 2
    assert out[2]["novelty"] == 1.0
    assert out[3]["novelty"] == 0.5
    assert out[4] == {"id": 4, "n_grams": 1, "n_novel": 1, "novelty": 1.0}
    assert out[5]["n_grams"] == 0 and out[5]["novelty"] is None


# ------------------------------------------- review-pass regressions

def test_kmv_synopsis_keeps_nan_null_and_big_int_keys_distinct(spark):
    from pyspark.sql import Row

    from elephant_twin_spark.functions import sketches

    # double keys: NaN and NULL are DIFFERENT keys; both must survive
    rows = [
        Row(key=float("nan"), v=i) for i in range(5)
    ] + [Row(key=None, v=i) for i in range(3)] + [Row(key=1.5, v=i) for i in range(4)]
    df = spark.createDataFrame(rows, "key double, v int")
    syn = sketches.kmv_synopsis(df, "key", "v", k=8).collect()
    by_size = sorted(len(r["hashes"]) for r in syn)
    assert len(syn) == 3 and by_size == [3, 4, 5]
    import math
    kinds = {("nan" if r["key"] is not None and math.isnan(r["key"])
              else ("null" if r["key"] is None else "num")) for r in syn}
    assert kinds == {"nan", "null", "num"}

    # nullable int64 keys >= 2^53: the float64 pandas round-trip would
    # corrupt them; the string-keyed build must not
    big = (1 << 60) + 1
    rows2 = [Row(key=big, v=1), Row(key=big, v=2), Row(key=None, v=3)]
    df2 = spark.createDataFrame(rows2, "key long, v int")
    syn2 = {r["key"]: len(r["hashes"]) for r in
            sketches.kmv_synopsis(df2, "key", "v", k=8).collect()}
    assert syn2 == {big: 2, None: 1}


def test_register_bucketed_table_reattaches_without_rewrite(spark, workdir):
    import os

    from conftest import SF_DIR

    from elephant_twin_spark.sources import tables

    ev = tables.load_raw(spark, f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    for t in ("ets_reg_a",):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    dst = f"{workdir}/reg_bkt"
    layout.bucket_table(spark, ev, "ets_reg_a", ["user_id"], 4,
                        sort_cols=["user_id"], path=dst)
    n = spark.table("ets_reg_a").count()
    mtimes = {f: os.path.getmtime(f"{dst}/{f}") for f in os.listdir(dst)}
    spark.sql("DROP TABLE ets_reg_a")  # catalog gone, files stay
    assert os.path.exists(f"{dst}/_SUCCESS")
    layout.register_bucketed_table(spark, "ets_reg_a", dst, ["user_id"], 4,
                                   sort_cols=["user_id"])
    try:
        assert spark.table("ets_reg_a").count() == n
        # no rewrite happened
        assert mtimes == {f: os.path.getmtime(f"{dst}/{f}") for f in os.listdir(dst)}
        # bucket spec survived: self-join on the bucket key has no Exchange
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            a = spark.table("ets_reg_a")
            b = spark.table("ets_reg_a").groupBy("user_id").count()
            j = a.join(spark.table("ets_reg_a").selectExpr(
                "user_id", "value AS v2"), "user_id")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan.split("SortMergeJoin")[-1]
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS ets_reg_a")


def test_winsorized_stats_keeps_null_group(spark):
    from elephant_twin_spark.operators.pipeline import stats

    rows = [("a", 1.0), ("a", 2.0), (None, 5.0), (None, 7.0)]
    df = spark.createDataFrame(rows, "grp_in string, v double")
    out = {r["grp"]: r.asDict() for r in
           stats.winsorized_stats(df, "v", "grp_in").collect()}
    assert None in out and out[None]["n"] == 2
    assert out[None]["mean_raw"] == 6.0


def test_ann_recall_audit_raises_on_empty_query_set(spark):
    import pytest as _pytest

    from conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = [[0.0] * 64 for _ in range(8)]
    books = [[[0.0] * 16 for _ in range(8)] for _ in range(4)]
    with _pytest.raises(ValueError, match="no query vectors"):
        similarity.ann_recall_audit(
            emb, "embedding", "vec_id", [10**9], base, books, k=5
        )


# ------------------------------------------------------ drift metrics

def test_psi_drift_zero_for_identical_and_positive_for_shifted(spark):
    from elephant_twin_spark.operators.pipeline import stats

    a = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "v double")
    same = stats.psi_drift(a, a, "v").agg(F.sum("contrib")).first()[0]
    assert same == 0.0  # identical distributions -> every contrib 0

    shifted = spark.createDataFrame(
        [(float(i % 100) + 50,) for i in range(1000)], "v double"
    )
    psi = stats.psi_drift(a, shifted, "v").agg(F.sum("contrib")).first()[0]
    assert psi > 0.25  # half the mass moved out of shared bins

    out = stats.psi_drift(a, shifted, "v").collect()
    assert len(out) == 10
    assert all(r["contrib"] >= 0 for r in out)  # PSI terms are nonnegative


def test_ks_statistic_matches_scipy_style_reference(spark):
    from elephant_twin_spark.operators.pipeline import stats

    xs = [1.0, 2.0, 3.0, 4.0]
    ys = [3.0, 4.0, 5.0, 6.0]
    a = spark.createDataFrame([(v,) for v in xs], "v double")
    b = spark.createDataFrame([(v,) for v in ys], "v double")
    got = stats.ks_statistic(a, b, "v").collect()[0]
    # manual: at x=2, F_a=0.5 F_b=0 -> D=0.5 (the max)
    assert got["ks"] == 0.5 and got["n_base"] == 4 and got["n_cur"] == 4

    same = stats.ks_statistic(a, a, "v").collect()[0]
    assert same["ks"] == 0.0


# ------------------------------------------------------- forward fill

def test_forward_fill_carries_last_non_null_per_key(spark):
    rows = [
        (1, 1, 1, None), (1, 2, 2, 10.0), (1, 3, 3, None), (1, 4, 4, None),
        (1, 5, 5, 20.0),
        (2, 1, 6, None),  # key with only NULLs stays NULL
    ]
    df = spark.createDataFrame(rows, "uid int, ts int, seq int, v double")
    out = {(r["uid"], r["ts"]): r["v"] for r in temporal.forward_fill(
        df, ["uid"], "ts", ["v"], tiebreak=["seq"]
    ).collect()}
    assert out[(1, 1)] is None          # leading NULL stays
    assert out[(1, 3)] == 10.0 and out[(1, 4)] == 10.0
    assert out[(1, 5)] == 20.0
    assert out[(2, 1)] is None


def test_transition_matrix_matches_python_reference_on_random_events(spark):
    import random
    from collections import Counter, defaultdict

    rng = random.Random(13)
    rows = []
    seq = 0
    for uid in range(15):
        for _ in range(rng.randint(0, 20)):
            seq += 1
            rows.append((uid, rng.randint(0, 10), seq, rng.choice("abcd")))
    df = spark.createDataFrame(rows, "uid int, ts int, seq int, state string")
    got = {(r["from_state"], r["to_state"]): r["n"] for r in kpi.transition_matrix(
        df, "uid", "ts", "state", tiebreak="seq", include_terminal=True
    ).collect()}

    expected = Counter()
    by_uid = defaultdict(list)
    for uid, ts, s, st in rows:
        by_uid[uid].append((ts, s, st))
    for evs in by_uid.values():
        evs.sort()
        states = [st for _, _, st in evs]
        for a, b in zip(states, states[1:]):
            expected[(a, b)] += 1
        expected[(states[-1], None)] += 1
    assert got == dict(expected)


def test_cooccurrence_cosine_matches_numpy_reference_on_random_matrix(spark):
    import math
    import random
    from collections import Counter

    rng = random.Random(99)
    inter = [(rng.randint(0, 20), rng.choice("ABCDEF")) for _ in range(400)]
    df = spark.createDataFrame(inter, "u int, item string")
    got = {(r["item_a"], r["item_b"]): (r["n_users"], r["dot"], r["cosine"])
           for r in similarity.cooccurrence_cosine(df, "u", "item").collect()}

    cnt = Counter(inter)
    items = sorted({i for _, i in inter})
    users = sorted({u for u, _ in inter})
    vec = {i: [cnt[(u, i)] for u in users] for i in items}
    for ia in items:
        for ib in items:
            if ia >= ib:
                continue
            dot = sum(a * b for a, b in zip(vec[ia], vec[ib]))
            n_users = sum(1 for a, b in zip(vec[ia], vec[ib]) if a and b)
            if n_users == 0:
                assert (ia, ib) not in got
                continue
            na = math.sqrt(sum(a * a for a in vec[ia]))
            nb = math.sqrt(sum(b * b for b in vec[ib]))
            g = got[(ia, ib)]
            assert g[0] == n_users and g[1] == dot
            assert g[2] == round(dot / (na * nb), 6) or abs(g[2] - dot/(na*nb)) < 2e-6
