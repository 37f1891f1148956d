"""r15 advisor + r14 verdict hardening pins.

1. ``refresh_text_index`` resolves the tokenizer from the UNDER-LEASE
   descriptor snapshot: a full rebuild with a different analyzer that
   completes between the pre-lease read and the lease acquire must not
   leave the delta tokenized with the superseded analyzer while the
   published descriptor claims the new one (the last stale-parameter
   hole — block/zone/ann/lsh re-derive their options under the lease
   since r14; text's tokenizer binding was missed).
2. Lease heartbeat (r14 verdict item 3 / r15 advisor item 2): a healthy
   staged write longer than the ttl used to go stale mid-write and
   deterministically abort at its own pre-publish fence — all the work
   wasted, with the default 30-minute ttl unreachable from the builder
   signatures. ``fsio.build_lease`` now heartbeats at ttl/3; a renewing
   writer survives any write duration, a silent one is still fenced.
3. Guarded stale-takeover delete + post-create confirmation (r15
   advisor item 3): two contenders that both judged one marker stale
   could delete-then-create over EACH OTHER (T2's delete removing T1's
   fresh lease — a double grant). The delete now only fires if the
   marker is unchanged since the staleness read, and every successful
   create re-reads to confirm its own owner token survived.
"""

import json
import time

import pyspark.sql.functions as F
import pytest

from elephant_twin_spark.operators import build as build_mod
from elephant_twin_spark.operators import text as text_mod
from elephant_twin_spark.sources import catalog, fsio, tables

from conftest import SF_DIR


# ------------------------------------------------- tokenizer under lease

def test_refresh_text_rebinds_tokenizer_under_lease(spark, workdir, monkeypatch):
    """A rebuild switching whitespace→lowercase lands between the
    refresh's pre-lease snapshot and its acquire; the refresh's delta
    must be tokenized with the REBUILD's analyzer."""
    from elephant_twin_spark.streaming import refresh as refresh_mod

    tbl = tables.materialize(
        spark, f"{SF_DIR}/documents.parquet", f"{workdir}/tok_reval_docs"
    )
    idx_root = f"{workdir}/tok_reval_idx"
    text_mod.build_text_index(
        spark, tbl, "text", "doc_id", idx_root, num_buckets=4,
        tokenizer_name="whitespace",
    )
    idx_dir = catalog.index_dir(idx_root, tbl, "text", kind="text")

    def _append(doc_id: int, text: str) -> None:
        spark.createDataFrame(
            [(doc_id, text, "en", "synthetic", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("append").parquet(tbl)

    # dirty so the refresh passes its lock-free fast path
    _append(999_998, "MIXEDCASE MixedCase token")

    state = {"fired": False}
    real_acquire = fsio.acquire_build_lease

    def rebuild_then_acquire(spark_, scope, *a, **kw):
        if not state["fired"] and scope == idx_dir:
            state["fired"] = True
            # full rebuild with a DIFFERENT analyzer completes first
            text_mod.build_text_index(
                spark, tbl, "text", "doc_id", idx_root, num_buckets=4,
                tokenizer_name="lowercase",
            )
            # dirty again so the refresh still has a delta to process;
            # the marker token only exists in this post-rebuild file
            _append(999_999, "QUIRKYZEBRA QuirkyZebra sentinel")
        return real_acquire(spark_, scope, *a, **kw)

    monkeypatch.setattr(fsio, "acquire_build_lease", rebuild_then_acquire)
    out = refresh_mod.refresh_text_index(spark, tbl, "text", idx_root)
    monkeypatch.undo()
    assert state["fired"] and out["mode"] == "incremental"

    # descriptor carries the rebuild's analyzer...
    desc = catalog.read_descriptor(spark, idx_dir)
    assert desc.options["tokenizer"] == "lowercase"
    # ...and the DELTA's postings were produced by it: the sentinel doc's
    # terms are lowercased (the stale whitespace binding would have kept
    # 'QUIRKYZEBRA' / 'QuirkyZebra' as distinct case-preserved terms)
    terms = {
        r["term"]
        for r in spark.read.parquet(f"{idx_dir}/postings")
        .where(F.col("doc_id") == 999_999)
        .select("term")
        .collect()
    }
    assert "quirkyzebra" in terms, terms
    assert not {t for t in terms if t != t.lower()}, terms


# ------------------------------------------------------- lease heartbeat

def test_renewing_writer_survives_ttl(spark, workdir):
    """A staged write longer than the ttl publishes fine: the heartbeat
    (ttl/3 cadence) keeps the lease fresh, so the pre-publish fence
    passes. Before r15 this deterministically aborted at the fence."""
    d = f"{workdir}/hb_survives"
    # ttl chosen with slack: the beat cadence is ttl/3, so a beat must
    # slip by >2/3 ttl (≈0.8s) for the lease to go momentarily stale —
    # loose enough to stay deterministic on a loaded host
    lease = fsio.build_lease(spark, d, ttl_ms=1_200)
    with lease as owner:
        time.sleep(4.0)  # > 3× ttl — dead without the heartbeat
        fsio.renew_build_lease(spark, d, owner)  # the fence: must pass
    assert not any(
        isinstance(e, fsio.BuildLeaseHeld) for e in lease.heartbeat_errors
    ), lease.heartbeat_errors


def test_silent_slow_writer_still_fenced(spark, workdir):
    """heartbeat=False restores the old semantics: a writer that
    exceeds its ttl without renewing is refused at the fence (the
    takeover-safety half is unchanged)."""
    d = f"{workdir}/hb_silent"
    with pytest.raises(fsio.BuildLeaseHeld, match="STALE"):
        with fsio.build_lease(spark, d, ttl_ms=400, heartbeat=False) as owner:
            time.sleep(1.2)
            fsio.renew_build_lease(spark, d, owner)


def test_slow_build_with_heartbeat_publishes_end_to_end(spark, workdir, monkeypatch):
    """End-to-end: build_block_index whose staged write outlives the
    ttl still publishes, because the builder's lease scope heartbeats."""
    tbl = tables.materialize(
        spark, f"{SF_DIR}/events.parquet", f"{workdir}/hb_e2e_events"
    )
    idx_root = f"{workdir}/hb_e2e_idx"

    real_lease = fsio.build_lease

    def short_ttl_lease(spark_, scope, *a, **kw):
        kw["ttl_ms"] = 1_200
        return real_lease(spark_, scope, **kw)

    real_write = build_mod.write_range_partitioned

    def slow_write(*a, **kw):
        time.sleep(3.0)  # staged write far outlives the ttl
        return real_write(*a, **kw)

    monkeypatch.setattr(fsio, "build_lease", short_ttl_lease)
    monkeypatch.setattr(build_mod, "write_range_partitioned", slow_write)
    build_mod.build_block_index(spark, tbl, "event_type", idx_root)
    monkeypatch.undo()

    from elephant_twin_spark import Engine, col

    eng = Engine(spark, idx_root)
    truth = spark.read.parquet(tbl).where(F.col("event_type") == "purchase").count()
    assert eng.query(tbl, col("event_type") == "purchase").count() == truth


# ------------------------------------------- guarded takeover + confirm

def test_takeover_delete_refuses_changed_marker(spark, workdir):
    """The stale-takeover delete is guarded on the exact bytes the
    contender judged stale: if the marker changed in between (a rival
    takeover re-created it, or the holder renewed), the delete is a
    no-op and the marker survives."""
    d = f"{workdir}/guarded_delete"
    path = f"{d}/{fsio.BUILD_LEASE_NAME}"
    stale = json.dumps(
        {"owner": "dead", "acquired_ms": int(time.time() * 1000) - 10_000,
         "ttl_ms": 1_000}
    )
    fsio.write_text(spark, path, stale)
    # the marker changes after the contender's staleness read...
    fresh = json.dumps(
        {"owner": "alive", "acquired_ms": int(time.time() * 1000),
         "ttl_ms": 60_000}
    )
    fsio.write_text(spark, path, fresh)
    # ...so a delete keyed on the stale bytes must refuse
    assert fsio._delete_if_unchanged(spark, path, expected_text=stale) is False
    assert json.loads(fsio.read_text(spark, path))["owner"] == "alive"
    # keyed on the CURRENT bytes it fires
    assert fsio._delete_if_unchanged(spark, path, expected_text=fresh) is True
    assert not fsio.exists(spark, path)


def test_acquire_confirms_own_marker_after_create(spark, workdir, monkeypatch):
    """A rival's stale-takeover delete that interleaves our create
    removes the marker we just wrote; the post-create confirmation
    re-read detects the loss and raises instead of double-granting."""
    d = f"{workdir}/post_create_confirm"
    path = f"{d}/{fsio.BUILD_LEASE_NAME}"
    real_create = fsio._try_create_exclusive

    def create_then_rival_steals(spark_, p, payload):
        ok = real_create(spark_, p, payload)
        if ok and p == path:
            # rival: delete our fresh marker (the pre-guard race) and
            # claim the lease itself
            fsio.delete(spark_, p)
            fsio.write_text(
                spark_, p,
                json.dumps({"owner": "rival",
                            "acquired_ms": int(time.time() * 1000),
                            "ttl_ms": 60_000}),
            )
        return ok

    monkeypatch.setattr(fsio, "_try_create_exclusive", create_then_rival_steals)
    with pytest.raises(fsio.BuildLeaseHeld, match="takeover race"):
        fsio.acquire_build_lease(spark, d)
    monkeypatch.undo()
    # the rival's grant is intact — no double grant, no clobbered marker
    assert json.loads(fsio.read_text(spark, path))["owner"] == "rival"


# ------------------------------------- loud guards on opt-in global windows

def test_build_vocab_unbounded_guard(spark):
    """vocab_size=None row_numbers the whole vocabulary through one
    partition — loud above the threshold, accepted explicitly with
    max_unbounded_rows=None, and never triggered on the bounded path."""
    from elephant_twin_spark.operators.pipeline import vocab

    docs = spark.createDataFrame(
        [(i, f"tok{i} shared") for i in range(20)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="ONE partition"):
        vocab.build_vocab(docs, "text", max_unbounded_rows=5)
    # explicit acceptance still works, ids deterministic
    v = vocab.build_vocab(docs, "text", max_unbounded_rows=None)
    rows = {r["token"]: r["token_id"] for r in v.collect()}
    assert rows["shared"] == 0 and len(rows) == 21
    # the bounded (training) path never counts, never raises
    top = vocab.build_vocab(docs, "text", vocab_size=3, max_unbounded_rows=5)
    assert top.count() == 3


def test_pack_sequences_global_order_guard(spark):
    """partition_col=None globally orders the corpus — loud above the
    threshold; the per-partition (100 TB) path is untouched."""
    from elephant_twin_spark.operators.pipeline import pack

    df = spark.createDataFrame(
        [(i, "a b c", "s") for i in range(20)],
        "doc_id long, text string, src string",
    )
    with pytest.raises(ValueError, match="ONE window partition"):
        pack.pack_sequences(df, "text", "doc_id", budget=10, max_global_rows=5)
    out = pack.pack_sequences(
        df, "text", "doc_id", budget=10, max_global_rows=None
    )
    assert out.count() == 20
    # partitioned path: no count job, no guard
    part = pack.pack_sequences(
        df, "text", "doc_id", budget=10, partition_col="src", max_global_rows=5
    )
    assert part.count() == 20


def test_refresh_bloom_rebinds_geometry_under_lease(spark, workdir, monkeypatch):
    """Same hole as the tokenizer, in the bloom refresher: a rebuild
    changing num_bits/num_hashes lands between the refresh's pre-lease
    snapshot and its acquire; the delta must be sketched at the
    REBUILD's width (a wrong-width probe can false-negative — i.e.
    wrongly skip a file at query time), and the published table must be
    width-consistent."""
    from elephant_twin_spark.streaming import refresh as refresh_mod
    from elephant_twin_spark import Engine, col

    tbl = tables.materialize(
        spark, f"{SF_DIR}/events.parquet", f"{workdir}/bloomgeo_events"
    )
    idx_root = f"{workdir}/bloomgeo_idx"
    build_mod.build_bloom_index(spark, tbl, "user_id", idx_root, num_bits=1024)
    idx_dir = catalog.index_dir(idx_root, tbl, "user_id", kind="bloom")

    extra = spark.read.parquet(tbl).limit(5).withColumn(
        "user_id", F.lit(987_654_321).cast("long")
    )
    extra.coalesce(1).write.mode("append").parquet(tbl)

    state = {"fired": False}
    real_acquire = fsio.acquire_build_lease

    def rebuild_then_acquire(spark_, scope, *a, **kw):
        if not state["fired"] and scope == idx_dir:
            state["fired"] = True
            build_mod.build_bloom_index(spark, tbl, "user_id", idx_root, num_bits=2048)
            # dirty again so the refresh still has a delta — the marker
            # user only exists in this post-rebuild file
            extra.withColumn("user_id", F.lit(987_654_322).cast("long")) \
                .coalesce(1).write.mode("append").parquet(tbl)
        return real_acquire(spark_, scope, *a, **kw)

    monkeypatch.setattr(fsio, "acquire_build_lease", rebuild_then_acquire)
    out = refresh_mod.refresh_bloom_index(spark, tbl, "user_id", idx_root)
    monkeypatch.undo()
    assert state["fired"] and out["mode"] == "incremental"

    desc = catalog.read_descriptor(spark, idx_dir)
    assert int(desc.options["num_bits"]) == 2048
    # every sketch row — including the delta's — is at the rebuild width
    widths = {
        r["w"]
        for r in spark.read.parquet(f"{idx_dir}/sketch")
        .select(F.size("bits").alias("w"))
        .distinct()
        .collect()
    }
    assert widths == {2048 // 64}, widths
    # and the post-rebuild marker key is found exactly (no false skip)
    eng = Engine(spark, idx_root)
    truth = spark.read.parquet(tbl).where(F.col("user_id") == 987_654_322).count()
    assert truth == 5
    assert eng.query(tbl, col("user_id") == 987_654_322).count() == truth
