"""End-to-end sync-pipeline tests over the events fixture: cold start,
incremental delta, idempotent re-run, convergence, continuous loop, and
the Structured-Streaming foreachBatch form (SURVEY §5.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pypgsync_spark.catalog import load_table
from pypgsync_spark.functions.time import to_millis
from pypgsync_spark.sync import (
    ParquetSyncedTable,
    low_watermark,
    sync_continuous,
    sync_once,
    sync_table,
)

KEYS = ["event_id"]
VER = "updated_ms"


def events_ms(spark, sf_small):
    return (
        load_table(spark, sf_small, "events")
        .withColumn(VER, to_millis("ts"))
        .select("event_id", VER, "user_id", "event_type", "value", "props")
    )


def test_low_watermark_cold_start(spark, sf_small):
    src = events_ms(spark, sf_small)
    wm = low_watermark(None, src, VER)
    assert wm == src.agg(F.min(VER)).first()[0]


def test_low_watermark_resume(spark, sf_small):
    src = events_ms(spark, sf_small)
    dst = src.filter(F.col(VER) < 1704844800000)
    wm = low_watermark(dst, src, VER)
    assert wm == dst.agg(F.max(VER)).first()[0]


def test_sync_once_cold_start_copies_all(spark, sf_small):
    src = events_ms(spark, sf_small)
    merged, stats = sync_once(src, None, KEYS, VER, high=2**62)
    assert merged.count() == src.count()
    assert stats.delta_rows == src.count()


def test_sync_once_noop_when_caught_up(spark, sf_small):
    src = events_ms(spark, sf_small)
    # destination already at src max; high watermark below it → no-op
    merged, stats = sync_once(src, src, KEYS, VER, high=0)
    assert stats.delta_rows == 0


def test_sync_converges_and_is_idempotent(spark, sf_small, tmp_path):
    src = events_ms(spark, sf_small)
    store = ParquetSyncedTable(spark, str(tmp_path / "dst"))
    cutoff = 1704844800000  # Jan 10

    # run 1: only rows before cutoff visible
    s1 = sync_table(src.filter(F.col(VER) < cutoff), store, KEYS, VER)
    n1 = store.read().count()
    assert n1 == src.filter(F.col(VER) < cutoff).count() == s1.delta_rows

    # run 2: full source visible → destination converges to source
    s2 = sync_table(src, store, KEYS, VER)
    assert s2.low is not None and s2.low <= s1.high  # low re-read from the data
    got = {tuple(r) for r in store.read().collect()}
    want = {tuple(r) for r in src.collect()}
    assert got == want

    # run 3: nothing new → still converged (idempotent re-run)
    sync_table(src, store, KEYS, VER)
    assert {tuple(r) for r in store.read().collect()} == want


def test_sync_continuous_loop(spark, sf_small, tmp_path):
    src = events_ms(spark, sf_small)
    store = ParquetSyncedTable(spark, str(tmp_path / "dst"))
    stats = sync_continuous(
        lambda: src, store, KEYS, VER, iterations=3, delay_seconds=0, sleep=lambda _: None
    )
    assert len(stats) == 3
    assert store.read().count() == src.count()


def test_stream_sync_foreachbatch(spark, sf_small, tmp_path):
    """Structured-Streaming continuous mode (T1/T4): drain the events
    file through foreachBatch merge, destination equals source."""
    import shutil

    from pypgsync_spark.catalog import table_path
    from pypgsync_spark.streaming.continuous import stream_sync

    # FileStreamSource needs a *directory* of arriving files — stage the
    # fixture file into one (the realistic landing-zone shape).
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    shutil.copy(table_path(sf_small, "events"), incoming / "events.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(str(incoming)).schema
    store = ParquetSyncedTable(spark, str(tmp_path / "dst"))
    q = stream_sync(
        spark,
        source_path=str(incoming),
        schema=raw_schema,
        store=store,
        keys=["event_id"],
        version_col="ts",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    src = load_table(spark, sf_small, "events")
    got = store.read()
    assert got.count() == src.count()
    # spot-check content equality on ids + values
    assert {(r["event_id"], r["value"]) for r in got.collect()} == {
        (r["event_id"], r["value"]) for r in src.collect()
    }


def test_stream_sync_applies_late_rows(spark, sf_small, tmp_path):
    """The reference silently misses rows whose ``updated`` lags the
    destination max (SURVEY §2.10 T3: low watermark = MAX(dst.updated)
    skips them forever). The streaming merge keys on file arrival, not
    the version column, so a late row — version OLDER than everything
    already synced — still lands. This is the documented semantic
    improvement, exercised end to end."""
    from pypgsync_spark.catalog import table_path
    from pypgsync_spark.streaming.continuous import stream_sync

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    incoming = tmp_path / "incoming"
    incoming.mkdir()

    full = spark.read.parquet(table_path(sf_small, "events"))
    raw_schema = full.schema
    cutoff = F.timestamp_millis(F.lit(1704844800000))  # Jan 10

    def land(df, name: str) -> None:
        """Write df and land its part files flat in the incoming dir
        (the file stream lists top-level files only)."""
        import glob
        import shutil

        staging = tmp_path / f"_stage_{name}"
        df.coalesce(1).write.parquet(str(staging))
        for i, part in enumerate(sorted(glob.glob(str(staging / "part-*.parquet")))):
            shutil.copy(part, incoming / f"{name}_{i}.parquet")

    # batch 1: only recent rows (ts >= Jan 10) arrive first
    land(full.filter(F.col("ts") >= cutoff), "b1")

    store = ParquetSyncedTable(spark, str(tmp_path / "dst"))

    def drain():
        q = stream_sync(
            spark,
            source_path=str(incoming),
            schema=raw_schema,
            store=store,
            keys=["event_id"],
            version_col="ts",
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.awaitTermination()

    drain()
    n_recent = store.read().count()
    assert n_recent == full.filter(F.col("ts") >= cutoff).count()

    # batch 2: LATE rows arrive — every version is older than dst max
    land(full.filter(F.col("ts") < cutoff), "b2")
    drain()
    assert store.read().count() == full.count()  # nothing lost


def test_synced_table_scheme_qualified_uri(spark, sf_small, tmp_path):
    """r6 verdict #6: the _CURRENT pointer goes through the Hadoop
    FileSystem resolved for the destination URI's SCHEME — a
    scheme-qualified file:// destination (the closest a sandbox gets
    to an object-store URI) must work end-to-end, including the
    pointer flip between alternating subdirectories. os.path/open
    plumbing would have produced paths like 'file:/...' that the
    local OS calls cannot resolve."""
    src = events_ms(spark, sf_small)
    store = ParquetSyncedTable(spark, f"file://{tmp_path}/dst")
    assert store.read() is None  # no pointer yet

    sync_table(src, store, KEYS, VER)
    assert store.read().count() == src.count()
    assert store._current().endswith("/a")

    sync_table(src.union(src.limit(0)), store, KEYS, VER)  # idempotent re-run
    assert store.read().count() == src.count()


def test_unsupported_fs_classifier():
    """ADVICE r7 (sync.py pointer flip): the PUT fallback must fire ONLY
    for UnsupportedFileSystemException (no AbstractFileSystem binding —
    object stores); any other FileContext/rename failure propagates, so
    a transient rename error can never truncate the live pointer in
    place on a rename-capable filesystem."""
    from pypgsync_spark.sync import _is_unsupported_filesystem

    class _JExc:
        def __init__(self, name, cause=None):
            self._name, self._cause = name, cause

        def getClass(self):
            outer = self

            class _C:
                def getName(self):
                    return outer._name

            return _C()

        def getCause(self):
            return self._cause

    class _Py4JError(Exception):
        def __init__(self, java_exception):
            super().__init__("py4j wrapped")
            self.java_exception = java_exception

    unsupported = _JExc(
        "org.apache.hadoop.fs.UnsupportedFileSystemException"
    )
    assert _is_unsupported_filesystem(_Py4JError(unsupported))
    # ... including when buried in a cause chain
    assert _is_unsupported_filesystem(
        _Py4JError(_JExc("java.io.IOException", cause=unsupported))
    )
    # transient rename failures are NOT fallback-eligible
    assert not _is_unsupported_filesystem(
        _Py4JError(_JExc("java.io.IOException"))
    )
    assert not _is_unsupported_filesystem(
        _Py4JError(_JExc("org.apache.hadoop.fs.ParentNotDirectoryException"))
    )
    # plain Python exceptions: string-level conservative match only
    assert not _is_unsupported_filesystem(RuntimeError("boom"))
    assert _is_unsupported_filesystem(
        RuntimeError("x UnsupportedFileSystemException: no AFS for scheme")
    )
    # a FULLY walked Java chain with no USFE is authoritative: a stack
    # text that merely QUOTES the class name must not re-enable the
    # in-place pointer-truncate fallback
    quoted = _Py4JError(_JExc("java.io.IOException"))
    quoted.args = ("rename failed; earlier: UnsupportedFileSystemException",)
    assert not _is_unsupported_filesystem(quoted)


def test_pointer_flip_rename_failure_propagates(spark, sf_small, tmp_path, monkeypatch):
    """On a rename-capable filesystem, a FileContext failure that is NOT
    UnsupportedFileSystemException must propagate out of write() and
    leave the previous pointer intact (never an in-place truncate)."""
    import pytest

    from pypgsync_spark import sync as sync_mod

    src = events_ms(spark, sf_small)
    store = ParquetSyncedTable(spark, str(tmp_path / "dst"))
    sync_table(src, store, KEYS, VER)
    assert store._current().endswith("/a")

    # Simulate a transient (non-USFE) failure inside the rename block.
    monkeypatch.setattr(
        sync_mod,
        "_is_unsupported_filesystem",
        lambda exc: False,
    )
    real_jpath = store._jpath

    def boom_on_ptr(uri):
        if uri == store._ptr:  # the rename destination
            raise RuntimeError("transient rename failure")
        return real_jpath(uri)

    monkeypatch.setattr(store, "_jpath", boom_on_ptr)
    with pytest.raises(RuntimeError, match="transient rename failure"):
        store.write(src.limit(5))
    # live pointer untouched: still 'a', still readable
    monkeypatch.setattr(store, "_jpath", real_jpath)
    assert store._current().endswith("/a")
    assert store.read().count() == src.count()


def _parquet_files(store):
    cur = store._current()
    p = store._jpath(cur)
    return [
        s.getPath().getName()
        for s in store._fs(p).listStatus(p)
        if s.getPath().getName().endswith(".parquet")
    ]


def test_compact_reduces_files_and_preserves_rows(spark, sf_small, tmp_path):
    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.sync import ParquetSyncedTable, compact_store

    src = load_table(spark, sf_small, "events").select(
        "event_id", "event_type", "value"
    )
    store = ParquetSyncedTable(spark, str(tmp_path / "dst"))
    store.write(src.repartition(16))
    assert len(_parquet_files(store)) >= 16
    before = sorted(map(tuple, store.read().collect()))
    stats = compact_store(store, target_file_bytes=256 << 20)
    assert stats["compacted"] is True
    assert stats["files_before"] >= 16
    assert stats["files_after"] < stats["files_before"]
    assert len(_parquet_files(store)) == stats["files_after"]
    assert sorted(map(tuple, store.read().collect())) == before


def test_compact_noop_when_already_compact(spark, sf_small, tmp_path):
    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.sync import ParquetSyncedTable, compact_store

    src = load_table(spark, sf_small, "events").select("event_id", "value")
    store = ParquetSyncedTable(spark, str(tmp_path / "dst"))
    store.write(src.coalesce(1))
    cur_before = store._current()
    stats = compact_store(store, target_file_bytes=256 << 20)
    assert stats["compacted"] is False
    assert stats["files_before"] == stats["files_after"]
    # no-op must not rewrite or flip the pointer
    assert store._current() == cur_before


def _backdate_superseded_generation(store, dst_dir) -> None:
    """Make the superseded generation STRICTLY older than the current
    one regardless of filesystem mtime granularity (ADVICE r9: on a 1s
    granularity fs, back-to-back write/compact can land both
    generations on the same mtime, which makes vacuum's safe strict-<
    comparison a no-op and the test flaky). Explicit ``os.utime``
    backdating beats sleeping: deterministic and free."""
    import os

    cur_name = store._current().rsplit("/", 1)[-1]
    old_name = "a" if cur_name == "b" else "b"
    cur_mtime = (dst_dir / cur_name).stat().st_mtime
    past = cur_mtime - 5
    os.utime(dst_dir / old_name, (past, past))


def test_vacuum_deletes_only_superseded_generation(spark, sf_small, tmp_path):
    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.sync import (
        ParquetSyncedTable,
        compact_store,
        vacuum_store,
    )

    src = load_table(spark, sf_small, "events").select(
        "event_id", "event_type", "value"
    )
    store = ParquetSyncedTable(spark, str(tmp_path / "dst"))
    store.write(src.repartition(8))   # generation a
    compact_store(store, target_file_bytes=256 << 20)  # flips to b
    _backdate_superseded_generation(store, tmp_path / "dst")
    rows = sorted(map(tuple, store.read().collect()))
    root = store._jpath(store.path)
    fs = store._fs(root)
    names = {s.getPath().getName() for s in fs.listStatus(root)}
    assert {"a", "b"} <= names
    deleted = vacuum_store(store)
    cur_name = store._current().rsplit("/", 1)[-1]
    assert deleted == [n for n in ("a", "b") if n != cur_name]
    assert sorted(map(tuple, store.read().collect())) == rows
    # empty store: vacuum is a no-op
    empty = ParquetSyncedTable(spark, str(tmp_path / "empty"))
    assert vacuum_store(empty) == []


def test_vacuum_spares_interrupted_writer_generation(spark, sf_small, tmp_path):
    """r9 advisor fix: a writer that produced a generation but crashed
    before flipping _CURRENT leaves a directory NEWER than the current
    generation. vacuum_store must never reclaim it (it may hold the
    only copy of in-flight data); only generations the pointer has
    durably superseded — strictly older than current — are deleted."""
    import os
    import time

    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.sync import (
        ParquetSyncedTable,
        compact_store,
        vacuum_store,
    )

    src = load_table(spark, sf_small, "events").select(
        "event_id", "event_type", "value"
    )
    store = ParquetSyncedTable(spark, str(tmp_path / "dst"))
    store.write(src.repartition(4))                    # generation a
    compact_store(store, target_file_bytes=256 << 20)  # flips to b
    cur_name = store._current().rsplit("/", 1)[-1]
    old_name = "a" if cur_name == "b" else "b"
    # ADVICE r9: don't rely on write->compact landing on distinct
    # mtimes (1s-granularity filesystems make that a coin flip) —
    # explicitly backdate the superseded generation
    _backdate_superseded_generation(store, tmp_path / "dst")

    # simulate an interrupted writer: a generation directory newer than
    # the current one, pointer never flipped (mtime granularity on
    # local fs is fine, but sleep past 1s to be filesystem-agnostic)
    time.sleep(1.1)
    crashed = tmp_path / "dst" / "zz_inflight"
    crashed.mkdir()
    (crashed / "part-00000.parquet").write_bytes(b"in-flight bytes")

    deleted = vacuum_store(store)
    assert deleted == [old_name]
    assert crashed.exists() and (crashed / "part-00000.parquet").exists()
    # idempotent: a second vacuum with nothing older deletes nothing
    assert vacuum_store(store) == []


def test_vacuum_dangling_pointer_is_noop(spark, sf_small, tmp_path):
    """_CURRENT naming a missing generation (crash between delete and
    pointer write under a buggy external cleaner) must be a quiet no-op:
    nothing is provably superseded, so vacuum deletes nothing."""
    import shutil

    from pypgsync_spark.sync import ParquetSyncedTable, vacuum_store

    src = load_table(spark, sf_small, "events").select("event_id", "value")
    store = ParquetSyncedTable(spark, str(tmp_path / "dst"))
    store.write(src)
    cur_name = store._current().rsplit("/", 1)[-1]
    shutil.rmtree(tmp_path / "dst" / cur_name)
    assert vacuum_store(store) == []


def test_vacuum_propagates_non_fnf_errors(spark, sf_small, tmp_path):
    """ADVICE r9: only the dangling-pointer FileNotFoundException is a
    legitimate no-op. Any other filesystem failure (auth, transient IO)
    must propagate — a silent no-op hides unbounded storage growth."""
    import pytest

    from pypgsync_spark.sync import ParquetSyncedTable, vacuum_store

    src = load_table(spark, sf_small, "events").select("event_id", "value")
    store = ParquetSyncedTable(spark, str(tmp_path / "dst"))
    store.write(src)

    class _FailingFS:
        def __init__(self, real):
            self._real = real

        def getFileStatus(self, p):  # the probe vacuum makes
            raise RuntimeError("simulated auth failure")

        def __getattr__(self, name):  # everything else passes through
            return getattr(self._real, name)

    real_fs = store._fs
    store._fs = lambda jpath: _FailingFS(real_fs(jpath))
    with pytest.raises(RuntimeError, match="simulated auth failure"):
        vacuum_store(store)


def test_is_file_not_found_string_probe():
    """Python-side fallback classification (no java_exception chain)."""
    from pypgsync_spark.sync import _is_file_not_found

    assert _is_file_not_found(
        Exception("java.io.FileNotFoundException: File dst/a does not exist")
    )
    assert not _is_file_not_found(
        Exception("org.apache.hadoop.security.AccessControlException: denied")
    )
