"""Sink-format marker (r10 verdict item 5): the three inference-based
upgrade schemes are now consolidated behind an explicit ``_sink_format``
version file — unmarked sinks migrate once and get stamped, marked
sinks skip every listing probe, future-format sinks refuse service.
"""

import pytest

from elephant_twin_spark.streaming import sinkfmt, windows


def test_unmarked_sink_migrates_once_then_stamps(spark, workdir):
    """v-absent → vN upgrade: the migration closure runs exactly once;
    after the marker is stamped, later starts must NOT re-probe (a
    planted legacy dir stays untouched, proving the branch is on the
    marker, not the listing)."""
    sink = f"{workdir}/fmt_sink"
    spark.range(3).write.parquet(f"{sink}/batch_id=0")

    calls = []

    def migrate():
        calls.append(1)
        return windows._migrate_legacy_batch_partitions(spark, sink)

    n = sinkfmt.ensure_sink_format(spark, sink, migrate=migrate)
    assert n == 1 and calls == [1]
    assert sinkfmt.read_sink_format(spark, sink) == sinkfmt.CURRENT_SINK_FORMAT

    # plant a new legacy-shaped dir AFTER the stamp: a marked-current
    # sink is trusted, so ensure() must fast-path without migrating
    spark.range(2).write.parquet(f"{sink}/batch_id=99")
    n2 = sinkfmt.ensure_sink_format(spark, sink, migrate=migrate)
    assert n2 == 0 and calls == [1]
    import os

    assert os.path.isdir(f"{sink}/batch_id=99".replace("file://", ""))


def test_nonexistent_sink_is_left_alone_then_stamped_once_written(spark, workdir):
    """A sink that does not exist must stay nonexistent (consumers gate
    reads on the directory's existence — an empty dir holding only the
    marker would flip those probes onto a zero-file parquet path); the
    first ensure() after the sink is written stamps it."""
    import os

    sink = f"{workdir}/fmt_fresh"
    assert sinkfmt.read_sink_format(spark, sink) is None
    assert sinkfmt.ensure_sink_format(
        spark, sink, migrate=lambda: windows._migrate_legacy_batch_partitions(spark, sink)
    ) == 0
    assert not os.path.exists(sink.replace("file://", ""))
    spark.range(2).write.parquet(f"{sink}/batch_run=abc-0")
    assert sinkfmt.ensure_sink_format(spark, sink) == 0
    assert sinkfmt.read_sink_format(spark, sink) == sinkfmt.CURRENT_SINK_FORMAT


def test_future_format_refuses_service(spark, workdir):
    sink = f"{workdir}/fmt_future"
    sinkfmt.write_sink_format(spark, sink, sinkfmt.CURRENT_SINK_FORMAT + 1)
    with pytest.raises(RuntimeError, match="newer than"):
        sinkfmt.ensure_sink_format(spark, sink)


def test_garbled_marker_is_loud(spark, workdir):
    sink = f"{workdir}/fmt_garbled"
    from elephant_twin_spark.sources import fsio

    fs, _, jvm = fsio._fs_and_path(spark, sink)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(f"{sink}/{sinkfmt.MARKER_NAME}"), True)
    out.write(bytearray(b"banana"))
    out.close()
    with pytest.raises(ValueError, match="unreadable sink-format marker"):
        sinkfmt.ensure_sink_format(spark, sink)


def test_rollup_stream_stamps_marker_end_to_end(spark, workdir, events_multifile):
    """The real writer path: a legacy batch_id sink resumed through
    cms_rollup_stream migrates AND stamps; counts match the r10
    migration contract (legacy partial + one full replay = 2x)."""
    from elephant_twin_spark.functions import sketches

    sink = f"{workdir}/fmt_cms"
    batch_df = spark.read.parquet(events_multifile)
    sketches.cms_table(batch_df, "event_type", depth=2, width=64).write.mode(
        "overwrite"
    ).parquet(f"{sink}/batch_id=0")
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 3)
        .parquet(events_multifile)
    )
    q = windows.cms_rollup_stream(
        stream, sink, f"{workdir}/fmt_cms_ck", key_col="event_type", depth=2, width=64
    )
    q.awaitTermination(120)
    assert sinkfmt.read_sink_format(spark, sink) == sinkfmt.CURRENT_SINK_FORMAT
    tags = {
        r["batch_run"]
        for r in spark.read.parquet(sink).select("batch_run").distinct().collect()
    }
    assert "legacy-0" in tags and len(tags) >= 2


def test_atomic_stamp_lost_race_is_already_migrated(spark, workdir):
    """r12 advisor fix: the marker stamp is create-no-overwrite. A
    concurrent starter that stamped first wins; the loser's
    write_sink_format(overwrite=False) returns False WITHOUT clobbering
    the winner's version, and ensure() on the now-marked sink fast-paths
    instead of racing the migration again."""
    sink = f"{workdir}/fmt_race"
    spark.range(2).write.parquet(f"{sink}/batch_run=abc-0")
    assert sinkfmt.write_sink_format(spark, sink, overwrite=False) is True
    # the losing racer: atomic create fails, version is preserved
    assert (
        sinkfmt.write_sink_format(
            spark, sink, sinkfmt.CURRENT_SINK_FORMAT + 7, overwrite=False
        )
        is False
    )
    assert sinkfmt.read_sink_format(spark, sink) == sinkfmt.CURRENT_SINK_FORMAT
    calls = []
    assert sinkfmt.ensure_sink_format(spark, sink, migrate=lambda: calls.append(1) or 0) == 0
    assert calls == []
