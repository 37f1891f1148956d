"""Sink-format version marker for per-batch partitioned streaming sinks.

Three upgrade schemes accreted around the ``batch_run=`` partition
layout, each INFERRED from partition names on every stream start:
``batch_id=N`` → ``batch_run=legacy-N`` (``windows._migrate_legacy_
batch_partitions``), the raw→normalized run-token retag
(``gate._retag_run_partitions``), and checkpoint-loss cleanup
(``windows.drop_rollup_run``). Inference works, but every future format
change would add a fourth listing-based heuristic to every start path
(r10 verdict item 5).

This module makes the format EXPLICIT: a ``_sink_format`` marker file
(leading underscore — Spark's partition inference and file listings
ignore it, like ``_SUCCESS``) stamped ``v<N>`` on first write.

* marker == current: fast path — one file read, NO partition listing,
  no migration probes.
* marker absent: the sink is either fresh or pre-marker; the caller's
  legacy migrations run once, then the marker is stamped.
* marker from the future: hard error — a downgraded reader must not
  "migrate" (i.e. corrupt) a newer layout it cannot interpret.

Format history (bump ``CURRENT_SINK_FORMAT`` on layout change and add
the new migration to the caller's ``migrate`` closure):

* (unmarked, pre-r10) — bare ``batch_id=N`` partitions.
* (unmarked, r10 early) — ``batch_run=<raw-token>-<N>``.
* v2 (r10 final, marked since r11) — ``batch_run=<normalized-token>-<N>``
  with reserved ``legacy-*`` / ``compact--1`` tags.
"""

from __future__ import annotations

from typing import Callable, Optional

CURRENT_SINK_FORMAT = 2
MARKER_NAME = "_sink_format"


def read_sink_format(spark, sink_path: str) -> Optional[int]:
    """The sink's stamped format version, or None when unmarked (fresh
    sink, or one written before markers existed)."""
    from elephant_twin_spark.sources import fsio

    fs, _, jvm = fsio._fs_and_path(spark, sink_path)
    jpath = jvm.org.apache.hadoop.fs.Path(f"{sink_path}/{MARKER_NAME}")
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        raw = bytes(stream.readNBytes(64)).decode("ascii", "replace").strip()
    finally:
        stream.close()
    if not raw.startswith("v") or not raw[1:].isdigit():
        raise ValueError(
            f"unreadable sink-format marker {raw!r} under {sink_path} — "
            "refusing to guess the layout; fix or remove the marker"
        )
    return int(raw[1:])


def write_sink_format(
    spark,
    sink_path: str,
    version: int = CURRENT_SINK_FORMAT,
    overwrite: bool = True,
) -> bool:
    """Stamp the marker. With ``overwrite=False`` the create is ATOMIC
    (HDFS create-no-overwrite): returns False when another writer won the
    race, True when this call stamped. Overwriting callers always get
    True."""
    from elephant_twin_spark.sources import fsio

    fs, _, jvm = fsio._fs_and_path(spark, sink_path)
    jpath = jvm.org.apache.hadoop.fs.Path(f"{sink_path}/{MARKER_NAME}")
    try:
        out = fs.create(jpath, bool(overwrite))
    except Exception as exc:  # py4j wraps FileAlreadyExistsException
        if not overwrite and "AlreadyExists" in type(exc).__name__ + str(exc):
            return False
        raise
    try:
        out.write(bytearray(f"v{int(version)}\n".encode("ascii")))
    finally:
        out.close()
    return True


def ensure_sink_format(
    spark,
    sink_path: str,
    migrate: Optional[Callable[[], int]] = None,
) -> int:
    """Branch on the marker instead of inferring from partition names.

    Returns the number of partitions the ``migrate`` closure touched
    (0 on the fast path). ``migrate`` runs ONLY for an unmarked
    EXISTING sink — a marked-current sink skips straight through, and a
    marker from a NEWER format raises instead of letting an old reader
    rewrite a layout it does not understand.

    A sink that does not exist yet is left alone entirely (no dir, no
    marker): several consumers gate their reads on the sink directory's
    EXISTENCE (the gate's previously-accepted corpus read, the LSH
    index's grown-bands read), and materializing an empty directory
    holding only the marker would flip those probes onto an
    unreadable zero-file parquet path. The sink gets stamped by the
    first ensure() that finds it written — i.e. the next stream start.

    Concurrency: the marker stamp is ATOMIC (create-no-overwrite), so a
    lost stamp race is treated as already-migrated, never an error. The
    one-time ``migrate`` window itself runs under the house writer
    lease (r14 — previously it assumed a single concurrent starter per
    unmarked sink, and two unmarked-sink starters racing through
    ``migrate`` could interleave renames); the marked fast path stays
    lease-free, so steady-state stream starts pay nothing."""
    from elephant_twin_spark.sources import fsio

    found = read_sink_format(spark, sink_path)
    if found is not None:
        if found > CURRENT_SINK_FORMAT:
            raise RuntimeError(
                f"sink {sink_path} is format v{found}, newer than this "
                f"library's v{CURRENT_SINK_FORMAT} — upgrade the library "
                "or point the stream at a fresh sink"
            )
        # == current: fast path. < current: future migrations chain here
        # (none yet below v2 carry a marker).
        return 0
    fs, jroot, _ = fsio._fs_and_path(spark, sink_path)
    if not fs.exists(jroot):
        return 0
    # short ttl: migrations are a handful of renames, and a stream
    # supervisor restarting a crashed starter should not wait the
    # builders' 30-minute default to take the stale lease over. A
    # healthy slow migration stays fresh via the lease scope's
    # heartbeat (r15); one whose lease was genuinely taken over (a
    # pause past the ttl) aborts at the pre-stamp renew fence below
    # rather than stamping over the new runner.
    _MIGRATE_TTL_MS = 5 * 60 * 1000
    try:
        lease = fsio.writer_lease(spark, sink_path, ttl_ms=_MIGRATE_TTL_MS)
        lease_owner = lease.__enter__()
    except fsio.BuildLeaseHeld:
        # a concurrent starter is migrating RIGHT NOW (acquire fails
        # fast — it never waits): poll briefly for its marker instead
        # of failing this stream start over an idempotent migration
        # that someone else is already running (r14 review)
        import time as _time

        for _ in range(30):
            _time.sleep(1.0)
            if read_sink_format(spark, sink_path) is not None:
                return 0
        raise
    try:
        # re-probe under the lease: a strictly-earlier holder may have
        # migrated + stamped before releasing
        if read_sink_format(spark, sink_path) is not None:
            return 0
        n = migrate() if migrate is not None else 0
        # fence before the claim (same contract as the builders'
        # pre-publish renew): a migration that outlived the ttl and got
        # taken over must NOT stamp the marker over the new runner
        fsio.renew_writer_lease(spark, sink_path, lease_owner)
        # atomic claim: a concurrent starter that stamped first already ran
        # (or is finishing) the same idempotent migration — not an error
        write_sink_format(spark, sink_path, overwrite=False)
    finally:
        lease.__exit__(None, None, None)
    return n
