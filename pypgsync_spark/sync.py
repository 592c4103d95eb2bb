"""The watermark-merge sync pipeline — the reference's reason to exist.

Reference protocol (reference session.py:50-65, pypgsync.py:12-13,
README.md:90):

1. low watermark  = ``MAX(dst.updated)``, falling back to
   ``MIN(src.updated)`` when the destination is empty (cold start);
2. high watermark = wall-clock epoch millis captured at run start;
3. read the source delta ``updated BETWEEN low AND high`` in ~10M-row
   slices;
4. upsert each chunk into the destination on the primary key;
5. (continuous mode) sleep and repeat — state lives in the data, so
   every iteration is resumable and idempotent.

Spark-native re-expression: the delta is one bounded DataFrame filter
(Catalyst pushes it to the parquet scan / JDBC source), slices are the
source's partitioning, and the upsert is a declarative last-writer-wins
merge. Order-by-updated application (reference session.py:126-133) is
unnecessary: the merge is order-free with the same fixed point.

``SyncedTable`` abstracts the destination store. The parquet
implementation here is the test substrate; a Delta/Iceberg MERGE INTO
or the JDBC upsert sink (sources/jdbc.py) are drop-in alternatives at
deploy time.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypgsync_spark.operators.merge import upsert_merge
from pypgsync_spark.plans.intervals import SlicePlan, plan_slices


def now_millis() -> int:
    """High watermark stamp (reference pypgsync.py:13)."""
    return int(time.time() * 1000)


def low_watermark(dst: DataFrame | None, src: DataFrame, column: str) -> int | None:
    """``MAX(dst.col)`` else ``MIN(src.col)`` (reference session.py:50-65).

    Returns None when the source is empty too (nothing to sync).
    Both are single-row aggregates; on parquet they resolve from
    row-group statistics without a full scan.
    """
    if dst is not None:
        row = dst.agg(F.max(column).alias("wm")).first()
        if row is not None and row["wm"] is not None:
            return int(row["wm"])
    row = src.agg(F.min(column).alias("wm")).first()
    if row is None or row["wm"] is None:
        return None
    return int(row["wm"])


@dataclass
class SyncStats:
    low: int | None
    high: int
    delta_rows: int
    plan: SlicePlan | None


def extract_delta(
    src: DataFrame,
    column: str,
    low: int | None,
    high: int,
    pushdown_cond=None,
) -> DataFrame:
    """The bounded source read: ``low <= col <= high`` (closed range,
    reference session.py:129-132). Low-inclusive re-reads the boundary
    row; harmless because the merge is idempotent.

    ``pushdown_cond(low, high) -> Column``: optional extra predicate on
    a RAW storage column, exactly equivalent to the version-column
    range. When ``column`` is derived (e.g. ``updated_ms`` computed
    from a nanos timestamp), the derived filter cannot reach the
    parquet scan; the transposed raw predicate restores row-group
    skipping (see functions.time.nanos_range_pred). When ``column`` is
    stored directly, no hook is needed — Catalyst pushes it as-is.
    """
    cond = F.col(column) <= F.lit(high)
    if low is not None:
        cond = (F.col(column) >= F.lit(low)) & cond
    if pushdown_cond is not None:
        cond = cond & pushdown_cond(low, high)
    return src.filter(cond)


def sync_once(
    src: DataFrame,
    dst: DataFrame | None,
    keys: list[str],
    version_col: str,
    high: int | None = None,
    target_rows_per_slice: int | None = None,
    pushdown_cond=None,
) -> tuple[DataFrame, SyncStats]:
    """One sync iteration: watermark → delta → merge. Returns the merged
    destination DataFrame (caller persists it) plus stats.

    ``target_rows_per_slice`` triggers explicit slice planning — only
    meaningful for JDBC-faithful execution; the DataFrame path lets the
    source's own partitioning bound per-task work.
    ``pushdown_cond`` — see :func:`extract_delta`.
    """
    high = high if high is not None else now_millis()
    low = low_watermark(dst, src, version_col)
    if low is None or low > high:
        # no-op short-circuit (reference session.py:216-218)
        empty = dst if dst is not None else src.limit(0)
        return empty, SyncStats(low=low, high=high, delta_rows=0, plan=None)
    delta = extract_delta(src, version_col, low, high, pushdown_cond=pushdown_cond)
    # ONE count job feeds both the stats and the slice plan (the plan is
    # informational for JDBC-faithful callers, who apply its range
    # predicates via spark.read.jdbc(predicates=...); the DataFrame path
    # lets the source's own partitioning bound per-task work).
    delta_rows = delta.count()
    plan = (
        plan_slices(low, high, delta_rows, target_rows_per_slice)
        if target_rows_per_slice
        else None
    )
    if dst is None:
        merged = delta
    else:
        merged = upsert_merge(dst, delta, keys=keys, version_col=version_col)
    return merged, SyncStats(low=low, high=high, delta_rows=delta_rows, plan=plan)


def _is_unsupported_filesystem(exc: Exception) -> bool:
    """True iff a Py4J-surfaced Hadoop exception (or any link in its
    cause chain) is UnsupportedFileSystemException — the one failure
    that means "this scheme has no AbstractFileSystem binding, use the
    PUT fallback". Everything else must propagate (ADVICE r7: a
    transient rename failure must NOT trigger an in-place truncate of
    the live pointer on a rename-capable filesystem)."""
    j = getattr(exc, "java_exception", None)
    if j is None:
        # No Java chain to inspect (plain Python failure, e.g. the
        # FileContext classes missing from the gateway) — the string
        # probe is all there is.
        return "UnsupportedFileSystemException" in str(exc)
    while j is not None:
        try:
            if j.getClass().getName().endswith("UnsupportedFileSystemException"):
                return True
            j = j.getCause()
        except Exception:
            # Chain walk broke mid-way (gateway hiccup) — fall back to
            # the string probe rather than guessing either way.
            return "UnsupportedFileSystemException" in str(exc)
    # A FULLY walked chain with no USFE is authoritative: do NOT let a
    # rendered stack trace that merely quotes the class name (suppressed
    # exceptions, remote-side messages) re-classify a transient rename
    # failure as fallback-eligible — the fallback truncates the live
    # pointer in place, the exact hazard ADVICE r7 closed.
    return False


def _is_file_not_found(exc: Exception) -> bool:
    """True iff a Py4J-surfaced exception (or any link in its cause
    chain) is a FileNotFoundException — the dangling-pointer case
    ``vacuum_store`` tolerates as a no-op. Anything else (auth failure,
    transient IO, misconfigured path) must propagate: silently turning
    those into a no-op vacuum lets storage grow unboundedly with no
    signal (ADVICE r9). Same chain-walk discipline as
    ``_is_unsupported_filesystem`` above."""
    j = getattr(exc, "java_exception", None)
    if j is None:
        return "FileNotFoundException" in str(exc)
    while j is not None:
        try:
            if j.getClass().getName().endswith("FileNotFoundException"):
                return True
            j = j.getCause()
        except Exception:
            return "FileNotFoundException" in str(exc)
    return False


class ParquetSyncedTable:
    """Parquet-backed destination store for the sync loop.

    Writes to an alternating pair of subdirectories so a crash mid-write
    never corrupts the readable copy (poor man's table-format commit;
    production would use Delta/Iceberg, or the JDBC upsert sink where
    Postgres itself is the store).

    All ``_CURRENT`` pointer I/O goes through the Hadoop FileSystem
    resolved for the destination URI's scheme (r6 verdict #6 — the last
    local-FS-only writer in the sync path): the alternating-directory
    commit survives an hdfs:// or s3a:// destination, matching
    sources/partitioned.py's pattern. The pointer flip is a
    FileContext rename with Options.Rename.OVERWRITE — atomic on
    HDFS/local; object stores usually lack the AbstractFileSystem
    binding FileContext needs, so the flip falls back to an
    overwrite-create of the 1-byte pointer, which on a PUT-semantics
    store is itself atomic (readers observe old or new content, never
    a torn directory).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self._ptr = f"{self.path}/_CURRENT"

    def _jpath(self, uri: str):
        return self.spark._jvm.org.apache.hadoop.fs.Path(uri)

    def _fs(self, jpath):
        return jpath.getFileSystem(self.spark._jsc.hadoopConfiguration())

    def _current(self) -> str | None:
        p = self._jpath(self._ptr)
        fs = self._fs(p)
        if not fs.exists(p):
            return None
        jvm = self.spark._jvm
        reader = jvm.java.io.BufferedReader(jvm.java.io.InputStreamReader(fs.open(p)))
        try:
            name = reader.readLine()
        finally:
            reader.close()
        if not name:
            return None
        return f"{self.path}/{name.strip()}"

    def read(self) -> DataFrame | None:
        cur = self._current()
        if cur is None:
            return None
        p = self._jpath(cur)
        if not self._fs(p).exists(p):
            return None
        return self.spark.read.parquet(cur)

    def write(self, df: DataFrame) -> None:
        cur = self._current()
        nxt = "a" if cur is None or cur.endswith("b") else "b"
        df.write.mode("overwrite").parquet(f"{self.path}/{nxt}")
        jvm = self.spark._jvm
        tmp = self._jpath(self._ptr + ".tmp")
        fs = self._fs(tmp)
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(nxt.encode("ascii")))
        finally:
            out.close()
        try:
            # HDFS/local: FileContext rename(OVERWRITE) flips the
            # pointer atomically.
            fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self.spark._jsc.hadoopConfiguration()
            )
            gw = self.spark.sparkContext._gateway
            overwrite = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
            overwrite[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
            fc.rename(tmp, self._jpath(self._ptr), overwrite)
        except Exception as exc:
            # The fallback is ONLY for schemes with no AbstractFileSystem
            # binding (object stores: FileContext cannot resolve the
            # path) — there, overwrite-create IS the atomic primitive (a
            # PUT: readers observe old or new pointer bytes, never a
            # tear), and rename would only degrade to copy+delete
            # anyway. Any OTHER failure (transient HDFS/local rename
            # error) must propagate: truncating the live pointer on a
            # rename-capable filesystem would expose a torn/empty
            # _CURRENT to concurrent readers, breaking the never-torn
            # contract above.
            if not _is_unsupported_filesystem(exc):
                raise
            dst = self._jpath(self._ptr)
            out = fs.create(dst, True)
            try:
                out.write(bytearray(nxt.encode("ascii")))
            finally:
                out.close()
            fs.delete(tmp, False)


def sync_table(
    src: DataFrame,
    store: ParquetSyncedTable,
    keys: list[str],
    version_col: str,
    high: int | None = None,
    target_rows_per_slice: int | None = None,
) -> SyncStats:
    """One full iteration against a persistent destination — the body of
    the reference's ``merge_chunks`` orchestrator (session.py:111-160).
    ``target_rows_per_slice`` passes through to :func:`sync_once` (the
    CLI's --target-rows-per-slice was parsed but never reached here —
    r11 review)."""
    dst = store.read()
    merged, stats = sync_once(
        src, dst, keys, version_col, high=high,
        target_rows_per_slice=target_rows_per_slice,
    )
    if stats.delta_rows > 0 or dst is None:
        store.write(merged)
    return stats


def sync_continuous(
    src_loader,
    store: ParquetSyncedTable,
    keys: list[str],
    version_col: str,
    iterations: int,
    delay_seconds: float = 5.0,
    sleep=time.sleep,
    target_rows_per_slice: int | None = None,
) -> list[SyncStats]:
    """Continuous mode: bounded re-run loop (reference cli.py:80-97,
    default delay 5 s at cli.py:72-74). ``src_loader()`` re-reads the
    source each iteration so new files/rows are visible. For the
    Structured-Streaming-native form see streaming/continuous.py.
    """
    out: list[SyncStats] = []
    for i in range(iterations):
        out.append(
            sync_table(
                src_loader(), store, keys, version_col,
                target_rows_per_slice=target_rows_per_slice,
            )
        )
        if i + 1 < iterations:
            sleep(delay_seconds)
    return out


def compact_store(
    store: "ParquetSyncedTable", target_file_bytes: int = 128 << 20
) -> dict:
    """Small-file compaction (the lakehouse OPTIMIZE): rewrite the
    store's current generation into ``ceil(bytes / target_file_bytes)``
    files and flip the ``_CURRENT`` pointer through the same atomic
    commit every sync write uses — readers never observe a torn table.

    Why it exists: every incremental sync rewrites the merge output
    with shuffle-partition-many files regardless of size, so a
    frequently-synced small table accumulates hundreds of KB-scale
    files and scan cost becomes file-open cost (the classic small-file
    problem; at 100 TB the same arithmetic picks ~128 MB targets so
    row-group pruning still has room to work inside each file).
    ``coalesce`` (not ``repartition``) does the rewrite — a map-only
    merge of existing partitions, no shuffle of table data.

    Returns ``{"files_before", "files_after", "bytes", "compacted"}``;
    a store already at or below the target count is left untouched.
    """
    import math

    cur = store._current()
    if cur is None:
        return {"files_before": 0, "files_after": 0, "bytes": 0, "compacted": False}
    p = store._jpath(cur)
    fs = store._fs(p)
    try:
        statuses = list(fs.listStatus(p))
    except Exception as e:
        if _is_file_not_found(e):
            # dangling pointer (current generation directory missing) —
            # the state read() tolerates as None and vacuum_store as a
            # no-op; compaction likewise has nothing to rewrite (r10
            # review: this previously crashed while its siblings
            # degraded gracefully)
            return {"files_before": 0, "files_after": 0, "bytes": 0, "compacted": False}
        raise
    parts = [
        s
        for s in statuses
        if s.getPath().getName().endswith(".parquet")
    ]
    total = sum(s.getLen() for s in parts)
    n_target = max(1, math.ceil(total / target_file_bytes))
    if len(parts) <= n_target:
        return {
            "files_before": len(parts),
            "files_after": len(parts),
            "bytes": total,
            "compacted": False,
        }
    store.write(store.read().coalesce(n_target))
    new = store._jpath(store._current())
    n_after = sum(
        1
        for s in store._fs(new).listStatus(new)
        if s.getPath().getName().endswith(".parquet")
    )
    return {
        "files_before": len(parts),
        "files_after": n_after,
        "bytes": total,
        "compacted": True,
    }


def vacuum_store(store: "ParquetSyncedTable") -> list[str]:
    """Delete superseded generation directories (the lakehouse
    VACUUM): the alternating a/b commit keeps exactly one stale copy —
    useful as a crash-recovery fallback, pure storage cost once the
    pointer flip is durable. Never touches the current generation or
    the pointer; returns the deleted paths.

    Single-writer assumption (same as the store's commit protocol):
    one process writes a given store at a time. As a belt-and-braces
    guard for an interrupted writer, directories at least as new as
    the current generation are SKIPPED — a crashed write that produced
    a generation but never flipped ``_CURRENT`` is newer than the
    current one and therefore never reclaimed here; only generations
    the pointer has durably superseded (strictly older) are deleted.
    On stores without meaningful directory mtimes (S3A reports 0 for
    synthesized directory entries) — or whose mtime granularity is
    coarser than the write-to-write gap, making the timestamps equal —
    the strict comparison degrades in the SAFE direction: nothing
    compares strictly older, so vacuum becomes a no-op rather than
    ever reclaiming an in-flight write. A dangling pointer (current
    generation directory missing — the state ``read()`` tolerates by
    returning None) is likewise a no-op, not a crash.
    """
    cur = store._current()
    if cur is None:
        return []
    keep = {cur.rsplit("/", 1)[-1], "_CURRENT"}
    root = store._jpath(store.path)
    fs = store._fs(root)
    try:
        cur_mtime = fs.getFileStatus(store._jpath(cur)).getModificationTime()
    except Exception as e:
        if _is_file_not_found(e):
            # dangling pointer: nothing is provably superseded — do not
            # guess which directory is safe to delete
            return []
        # Any OTHER failure (auth, transient IO, misconfiguration) must
        # surface — a silent no-op here means storage grows unboundedly
        # with no signal (ADVICE r9).
        raise
    deleted: list[str] = []
    for s in fs.listStatus(root):
        name = s.getPath().getName()
        if (
            s.isDirectory()
            and name not in keep
            and s.getModificationTime() < cur_mtime
        ):
            fs.delete(s.getPath(), True)
            deleted.append(name)
    return deleted
