"""Range-partitioned SQL source via PySpark 4's Python DataSource API.

The reference reads its source RDBMS in bounded slices — one SQL cursor
per watermark range, rows fetched in chunks (reference session.py:127-151,
SURVEY §2.1 S1/S2). On a JVM cluster that maps to
``spark.read.jdbc(partitionColumn=..., numPartitions=...)``
(sources/jdbc.py); this module implements the SAME contract as a native
Spark V2 source in pure Python so the slice machinery is *executable and
driver-testable in this sandbox*, with DuckDB standing in for the RDBMS:

- ``partitions()`` plans one :class:`InputPartition` per closed slice of
  ``partition_column`` (``plans.intervals.closed_intervals`` — the exact
  semantics the reference's chunker uses), each carrying its own
  ``WHERE lo <= col AND col <= hi`` SQL. Spark schedules one task per
  slice: S1, range-partitioned parallel read.
- ``read()`` executes the slice's SQL and yields Arrow record batches of
  ``fetch_size`` rows (DuckDB's ``fetch_record_batch``): S2, chunked
  cursor fetch, Arrow all the way into Spark.
- ``pushFilters()`` accepts the comparison/null filters Spark offers and
  compiles them into each slice's WHERE clause — the Python-source
  analogue of predicate pushdown reaching the scan; unsupported filters
  are handed back for Spark to evaluate post-scan.

The module carries the full source/sink matrix on this contract:

- ``pypgsync_sql`` — batch reader (S1/S2, above);
- ``pypgsync_cdc`` — the continuous polling loop as a streaming
  source: MAX-probe per micro-batch, delta sliced by the same interval
  planner, offsets in the checkpoint (:class:`SqlCdcStreamReader`);
- ``pypgsync_sink`` — batched file destination with a real two-phase
  commit, batch and streaming (staged per-task Arrow cursors, driver
  publish, abort leaves nothing; streaming epochs are replay-guarded
  by a batch-id marker);
- ``pypgsync_upsert`` — the reference's ``INSERT .. ON CONFLICT``
  EXECUTED in the destination engine at commit, batch and streaming
  (version-guarded last-writer-wins: stale or replayed deltas are
  semantic no-ops, so the streaming form needs no marker bookkeeping).

At 100 TB the same class points at a real warehouse (any DB-API/ADBC
engine that emits Arrow); the slice planner, chunked fetch, and filter
compilation are engine-agnostic. Sandbox caveat: DuckDB runs in-process
per task, so "the database" is the parquet file itself — the plumbing
(partition planning, per-task cursors, Arrow batches, pushdown) is the
real thing, the network hop is not.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

SOURCE_NAME = "pypgsync_sql"
CDC_SOURCE_NAME = "pypgsync_cdc"
SINK_NAME = "pypgsync_sink"
UPSERT_SINK_NAME = "pypgsync_upsert"

# DuckDB → Spark DDL (the fixture tables' surface; extend as needed).
_TYPE_MAP = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp_ntz",
    "FLOAT[]": "array<float>",
    "DOUBLE[]": "array<double>",
}


def _sql_literal(v) -> str | None:
    """Render a pushed filter value as a SQL literal, or None when the
    type cannot be rendered faithfully — the caller then DECLINES the
    pushdown and Spark evaluates the filter post-scan (r10 review:
    str(date(2024,1,1)) produced the unquoted 2024-01-01, which DuckDB
    binds as integer arithmetic = 2022)."""
    import datetime
    import math

    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return str(v) if math.isfinite(v) else None
    if isinstance(v, datetime.datetime):  # before date: datetime subclasses it
        if v.tzinfo is not None:
            return None  # tz-aware semantics differ per engine — decline
        return "TIMESTAMP '" + v.isoformat(sep=" ") + "'"
    if isinstance(v, datetime.date):
        return "DATE '" + v.isoformat() + "'"
    return None  # Decimal, bytes, lists, ... — decline, never str(v)


def _compile_filter(f: Filter) -> str | None:
    """One supported filter → SQL, or None when unsupported. Only
    top-level columns (len(attribute) == 1) — nested paths go back to
    Spark."""
    attr = getattr(f, "attribute", None)
    if not attr or len(attr) != 1:
        return None
    col = '"' + attr[0].replace('"', '""') + '"'
    ops = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }
    for cls, op in ops.items():
        if isinstance(f, cls):
            lit = _sql_literal(f.value)
            return None if lit is None else f"{col} {op} {lit}"
    if isinstance(f, IsNotNull):
        return f"{col} IS NOT NULL"
    if isinstance(f, IsNull):
        return f"{col} IS NULL"
    return None


def _duck_connect(db_path: str | None):
    """One connection policy for every probe/cursor in this module:
    db mode opens the DuckDB database file READ-ONLY (many reader
    processes may share it — the task-parallel shape; DuckDB's
    single-writer rule means the upserting application must have
    released the file first), parquet stand-in mode uses an anonymous
    in-memory engine.

    Callers must close what they open (``contextlib.closing`` around
    every probe/cursor body in this module — r13 ADVICE): the CDC
    driver issues one MAX probe per micro-batch plus one connection
    per slice cursor, and relying on GC accumulates file handles for
    the lifetime of a long-running stream."""
    import duckdb

    if db_path:
        return duckdb.connect(db_path, read_only=True)
    return duckdb.connect()


def _is_writer_lock_error(exc: Exception) -> bool:
    """True when a read-only open failed because the single writer
    still holds the database file — the documented handoff race. Only
    the lock conflict is retryable; any other IO error (missing file,
    corruption) must keep raising. Matched on DuckDB's lock-conflict
    phrases ('Could not set lock on file ...: Conflicting lock is
    held in <proc>'), NOT a bare 'lock' substring — the message
    embeds the database PATH, so a path that merely contains 'lock'
    (this repo's own locked_src.duckdb fixture name) would classify a
    missing-file/corruption error as the retryable race and idle the
    stream forever instead of failing it (r14 review)."""
    s = str(exc).lower()
    return "conflicting lock" in s or "could not set lock" in s


def _sql_from_clause(table_path: str, db_path: str | None) -> str:
    """One FROM-clause policy: in db mode ``table_path`` names a TABLE
    inside the database (quoted; schema-qualified names are NOT
    supported — the whole string is one quoted identifier), otherwise
    it is a parquet path served through read_parquet."""
    if db_path:
        return '"' + table_path.replace('"', '""') + '"'
    return f"read_parquet('{table_path}')"


@dataclass
class SqlSlicePartition(InputPartition):
    sql: str


class SqlSliceReader(DataSourceReader):
    def __init__(self, schema, options):
        self.options = options
        self.table_path = options["table_path"]
        self.partition_column = options["partition_column"]
        self.num_partitions = int(options.get("num_partitions", 4))
        self.fetch_size = int(options.get("fetch_size", 10_000))
        # db mode (r13, symmetric with the CDC source): table_path
        # names a TABLE inside the DuckDB database file at db_path —
        # the reference's live-RDBMS shape for the BATCH slice read
        # too (session.py:127-151). Parquet stand-in is the default.
        self.db_path = options.get("db_path")
        self.pushed_sql: list[str] = []

    def _connect(self):
        return _duck_connect(self.db_path)

    def _from_clause(self) -> str:
        return _sql_from_clause(self.table_path, self.db_path)

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        # replace, never append: Spark holds ONE reader instance per
        # .load() relation and re-plans push into the same object — an
        # append would stack filters from successive queries. (A query
        # with NO pushable filters may skip this call entirely, so
        # different queries should not share one .load(); see
        # read_sql_table.)
        self.pushed_sql = []
        for f in filters:
            sql = _compile_filter(f)
            if sql is None:
                yield f  # unsupported → Spark evaluates it post-scan
            else:
                self.pushed_sql.append(sql)

    def _bounds(self) -> tuple[int, int] | None:
        """MIN/MAX of the partition column — the same probe the
        reference issues before slicing (reference session.py:216-218);
        one metadata-scale query on the driver."""
        from contextlib import closing

        with closing(self._connect()) as con:
            lo, hi = con.execute(
                f'SELECT min("{self.partition_column}"), '
                f'max("{self.partition_column}") '
                f"FROM {self._from_clause()}"
            ).fetchone()
        if lo is None:
            return None
        return int(lo), int(hi)

    def partitions(self):
        from pypgsync_spark.plans.intervals import plan_slices

        bounds = self._bounds()
        base = f"SELECT * FROM {self._from_clause()}"
        where = list(self.pushed_sql)
        if bounds is None:
            sql = base + (" WHERE " + " AND ".join(where) if where else "")
            return [SqlSlicePartition(sql)]
        lo, hi = bounds
        # rows ≈ span is the uniform-density assumption the reference
        # makes; target sized so the plan yields num_partitions slices
        span = hi - lo + 1
        target = max(1, -(-span // self.num_partitions))
        plan = plan_slices(lo, hi, estimated_rows=span, target_rows_per_slice=target)
        parts = []
        for slo, shi in plan.slices:
            preds = [
                f'"{self.partition_column}" >= {slo}',
                f'"{self.partition_column}" <= {shi}',
                *where,
            ]
            parts.append(SqlSlicePartition(base + " WHERE " + " AND ".join(preds)))
        return parts

    def read(self, partition):
        yield from _read_arrow_slices(partition.sql, self.fetch_size, self.db_path)


class SqlSliceDataSource(DataSource):
    """``spark.read.format("pypgsync_sql")`` — see module docstring.

    Required options: ``table_path`` (parquet file the stand-in engine
    serves), ``partition_column`` (integer column to range-slice).
    Optional: ``num_partitions`` (default 4), ``fetch_size`` rows per
    Arrow batch (default 10000).
    """

    @classmethod
    def name(cls):
        return SOURCE_NAME

    def schema(self):
        from contextlib import closing

        db_path = self.options.get("db_path")
        src = _sql_from_clause(self.options["table_path"], db_path)
        with closing(_duck_connect(db_path)) as con:
            rows = con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
        fields = []
        for name, dtype, *_ in rows:
            spark_t = _TYPE_MAP.get(dtype.upper())
            if spark_t is None:
                raise ValueError(f"unmapped source type {dtype!r} for column {name!r}")
            fields.append(f"`{name}` {spark_t}")
        return ", ".join(fields)

    def reader(self, schema):
        return SqlSliceReader(schema, self.options)


def register_sql_source(spark) -> None:
    """Idempotently register the source with a session."""
    # a reader that implements pushFilters() is REJECTED outright when
    # this flag is off (runtime-settable, default false in 4.1)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(SqlSliceDataSource)
    except Exception:
        # already registered in this session — the registration is
        # name-keyed and re-registration of the same class is a no-op
        # failure we tolerate
        pass


def read_sql_table(
    spark,
    table_path: str,
    partition_column: str,
    num_partitions: int = 4,
    fetch_size: int = 10_000,
    db_path: str | None = None,
):
    """Fresh range-partitioned read through the Python SQL source.

    Always builds a NEW ``.load()``: Spark keeps one reader instance
    per load relation and filter pushdown mutates it, so sharing a
    loaded DataFrame across differently-filtered queries would leak
    one query's pushed predicates into the next (a raw ``df.count()``
    after a filtered query returns the filtered count). One load per
    query is also how the JDBC reader is idiomatically used.
    """
    register_sql_source(spark)
    reader = (
        spark.read.format(SOURCE_NAME)
        .option("table_path", table_path)
        .option("partition_column", partition_column)
        .option("num_partitions", str(num_partitions))
        .option("fetch_size", str(fetch_size))
    )
    if db_path is not None:
        reader = reader.option("db_path", db_path)
    return reader.load()


class SqlCdcStreamReader(DataSourceStreamReader):
    """The reference's continuous mode as a REAL streaming source.

    The reference polls in a loop: probe ``MAX(watermark)``, read the
    ``(last, max]`` delta in bounded slices, apply, repeat (reference
    cli.py:72-74 + session.py:216-240). Structured Streaming's source
    contract is that loop with the bookkeeping done right, and this
    class maps it 1:1:

    - ``latestOffset()`` = the MAX probe (one scalar query per
      micro-batch, driver-side — metadata-scale);
    - ``partitions(start, end)`` = the delta sliced with the SAME
      interval planner the batch engine uses: one :class:`InputPartition`
      per closed ``partition_column`` range, so every micro-batch is a
      range-partitioned parallel read, exactly like the batch source;
    - ``read()`` = per-slice SQL cursor streaming Arrow batches;
    - offsets live in the CHECKPOINT (not a hand-rolled state table —
      the reference's watermark persistence, but transactional with
      the sink via foreachBatch/idempotent merge), so restart resumes
      after the last committed batch: effectively-once.

    Offset format: ``{"last": <highest partition_column value already
    emitted>}``. Monotonically-increasing append column assumed — the
    same assumption the reference's watermark protocol makes.
    """

    def __init__(self, schema, options):
        self.options = options
        self.table_path = options["table_path"]
        self.partition_column = options["partition_column"]
        self.num_partitions = int(options.get("num_partitions", 4))
        self.fetch_size = int(options.get("fetch_size", 10_000))
        # db mode (r12 verdict #5): table_path names a TABLE inside the
        # DuckDB database file at db_path — the reference's actual
        # shape (session.py:127-133 slices a live RDBMS table, not an
        # export). The parquet stand-in remains the default.
        self.db_path = options.get("db_path")
        start = options.get("start_offset")
        self._start = int(start) if start is not None else -1
        # Highest offset this instance has ever RETURNED from
        # latestOffset — the writer-lock fallback below must be
        # monotone: handing Spark a lower offset than one already
        # recorded in the offset log would re-emit rows on the next
        # batch (a duplicate, breaking effectively-once).
        self._last_returned: int | None = None

    def initialOffset(self):  # noqa: N802
        return {"last": self._start}

    def _from_clause(self) -> str:
        return _sql_from_clause(self.table_path, self.db_path)

    def _max_id(self) -> int | None:
        from contextlib import closing

        with closing(_duck_connect(self.db_path)) as con:
            (hi,) = con.execute(
                f'SELECT max("{self.partition_column}") '
                f"FROM {self._from_clause()}"
            ).fetchone()
        return None if hi is None else int(hi)

    def latestOffset(self):  # noqa: N802
        import duckdb

        try:
            hi = self._max_id()
        except duckdb.IOException as e:
            # Writer still holds the file (the documented single-writer
            # handoff race, r13 ADVICE): mid-stream, idle at the last
            # offset this instance returned and let the NEXT trigger
            # retry, instead of failing the stream. A FRESH instance
            # (restart racing the writer) has no offset to idle at —
            # re-raising is the only answer that cannot regress the
            # offset log (the checkpointed start is not visible here).
            if (
                self.db_path
                and _is_writer_lock_error(e)
                and self._last_returned is not None
            ):
                return {"last": self._last_returned}
            raise
        last = self._start if hi is None else max(hi, self._start)
        if self._last_returned is not None:
            last = max(last, self._last_returned)
        self._last_returned = last
        return {"last": last}

    def partitions(self, start: dict, end: dict):
        from pypgsync_spark.plans.intervals import plan_slices

        lo, hi = int(start["last"]) + 1, int(end["last"])
        if lo > hi:
            # empty micro-batch: one no-op cursor (Spark requires ≥1)
            return [SqlSlicePartition(self._slice_sql(0, -1))]
        span = hi - lo + 1
        target = max(1, -(-span // self.num_partitions))
        plan = plan_slices(lo, hi, estimated_rows=span, target_rows_per_slice=target)
        return [SqlSlicePartition(self._slice_sql(a, b)) for a, b in plan.slices]

    def _slice_sql(self, lo: int, hi: int) -> str:
        return (
            f"SELECT * FROM {self._from_clause()} "
            f'WHERE "{self.partition_column}" >= {lo} '
            f'AND "{self.partition_column}" <= {hi}'
        )

    def read(self, partition):
        yield from _read_arrow_slices(partition.sql, self.fetch_size, self.db_path)

    def commit(self, end: dict) -> None:
        # offset durability is the checkpoint's job; the source keeps
        # no state of its own (restart-safe by construction)
        pass


class SqlCdcStreamDataSource(DataSource):
    """``spark.readStream.format("pypgsync_cdc")`` — continuous sync
    of an append-only SQL table. Same options as the batch source."""

    @classmethod
    def name(cls):
        return CDC_SOURCE_NAME

    def schema(self):
        return SqlSliceDataSource(self.options).schema()

    def streamReader(self, schema):  # noqa: N802
        return SqlCdcStreamReader(schema, self.options)


def register_cdc_stream_source(spark) -> None:
    """Idempotently register the streaming CDC source."""
    try:
        spark.dataSource.register(SqlCdcStreamDataSource)
    except Exception:
        pass


def read_cdc_stream(
    spark,
    table_path: str,
    partition_column: str,
    num_partitions: int = 4,
    fetch_size: int = 10_000,
    db_path: str | None = None,
):
    """Fresh streaming read through the CDC source. ``db_path`` switches
    to db mode: ``table_path`` then names a table inside the DuckDB
    database file — the reference's live-RDBMS shape, executed."""
    register_cdc_stream_source(spark)
    reader = (
        spark.readStream.format(CDC_SOURCE_NAME)
        .option("table_path", table_path)
        .option("partition_column", partition_column)
        .option("num_partitions", str(num_partitions))
        .option("fetch_size", str(fetch_size))
    )
    if db_path is not None:
        reader = reader.option("db_path", db_path)
    return reader.load()


@dataclass
class _StagedFile(WriterCommitMessage):
    path: str
    rows: int


def _stage_arrow(staging_dir: str, iterator) -> _StagedFile:
    """Stage one task's Arrow batches as a parquet cursor file — THE
    task-side half of every sink here (r10 review: it had drifted into
    three near-identical copies). Empty partitions stage nothing and
    report zero rows."""
    import os
    import uuid

    import pyarrow.parquet as pq

    os.makedirs(staging_dir, exist_ok=True)
    path = f"{staging_dir}/task-{uuid.uuid4().hex}.parquet"
    writer = None
    rows = 0
    for batch in iterator:
        if writer is None:
            writer = pq.ParquetWriter(path, batch.schema)
        writer.write_batch(batch)
        rows += batch.num_rows
    if writer is None:
        return _StagedFile(path="", rows=0)
    writer.close()
    return _StagedFile(path=path, rows=rows)


def _read_arrow_slices(sql: str, fetch_size: int, db_path: str | None = None):
    """Execute one slice's SQL and stream Arrow record batches — the
    shared cursor body of the batch and CDC readers. ``db_path`` points
    the cursor at a real DuckDB database FILE (read-only: many reader
    processes may share it, the task-parallel shape; the upsert writer
    must have released the file first — DuckDB's single-writer rule);
    None keeps the parquet stand-in (anonymous in-memory engine)."""
    from contextlib import closing

    with closing(_duck_connect(db_path)) as con:
        reader = con.execute(sql).fetch_record_batch(rows_per_batch=fetch_size)
        for batch in reader:
            yield batch


def _message_staging_dirs(messages) -> set[str]:
    """The staging directories the commit messages actually name —
    cleanup scoped to THESE, never a destination-wide glob (r10
    review: a glob sweep could reap a CONCURRENT writer's staging for
    the same destination while its tasks were still running)."""
    import os

    return {os.path.dirname(m.path) for m in messages if m and m.path}


class SqlBatchArrowWriter(DataSourceArrowWriter):
    """S4 — batched executor-side writes with a real two-phase commit.

    The reference batches INSERTs through one connection per worker
    (reference session.py:127-151's executemany path). Spark's V2 write
    protocol is that, made transactional: every task writes its
    partition's Arrow batches to a STAGED file under
    ``<dest>/_staging_<uuid>/`` (one cursor per task, rows flowing
    batch-by-batch — never materialized whole), returns a commit
    message, and only the DRIVER's ``commit()`` publishes all staged
    files into the destination atomically-enough (rename within one
    filesystem); ``abort()`` removes the staging dir so failed jobs
    leave NOTHING behind. Against a real warehouse the same protocol
    is staging tables + ``INSERT ... SELECT`` on commit.
    """

    def __init__(self, options, overwrite: bool):
        import uuid

        self.dest = options["path"]
        self.overwrite = overwrite
        self.staging = f"{self.dest}/_staging_{uuid.uuid4().hex}"

    def write(self, iterator):
        return _stage_arrow(self.staging, iterator)

    def commit(self, messages):
        import glob
        import os
        import shutil

        os.makedirs(self.dest, exist_ok=True)
        if self.overwrite:
            for old in glob.glob(f"{self.dest}/*.parquet"):
                os.remove(old)
            # a fresh overwritten destination must not inherit a prior
            # streaming query's idempotency markers — they would make a
            # NEW stream to this dest silently drop its early batches
            # (r10 review)
            for marker in glob.glob(f"{self.dest}/_committed_*"):
                os.remove(marker)
        for m in messages:
            if m and m.path:
                shutil.move(m.path, f"{self.dest}/{os.path.basename(m.path)}")
        shutil.rmtree(self.staging, ignore_errors=True)
        for d in _message_staging_dirs(messages):
            shutil.rmtree(d, ignore_errors=True)

    def abort(self, messages):
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)
        for d in _message_staging_dirs(messages):
            shutil.rmtree(d, ignore_errors=True)


class SqlBatchSinkDataSource(DataSource):
    """``df.write.format("pypgsync_sink").option("path", dest)`` —
    the batched, two-phase-commit destination (S4)."""

    @classmethod
    def name(cls):
        return SINK_NAME

    def writer(self, schema, overwrite: bool):
        return SqlBatchArrowWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):  # noqa: N802
        return SqlBatchStreamArrowWriter(self.options)


def register_sql_sink(spark) -> None:
    try:
        spark.dataSource.register(SqlBatchSinkDataSource)
    except Exception:
        pass


class SqlBatchStreamArrowWriter(DataSourceStreamArrowWriter):
    """Streaming side of the batched sink: per-micro-batch two-phase
    commit with batch-id idempotency.

    Tasks stage their Arrow batches exactly like the batch writer; the
    driver's ``commit(messages, batchId)`` publishes them under
    ``batch=<id>-`` prefixed names and drops a ``_committed_<id>``
    marker FIRST — a replayed micro-batch (crash between sink commit
    and checkpoint advance) sees its marker and publishes nothing, so
    the destination holds each batch's rows exactly once. This is the
    effectively-once contract the reference's non-atomic
    watermark-then-write loop cannot give (a crash between its two
    steps re-applies rows)."""

    def __init__(self, options):
        import uuid

        self.dest = options["path"]
        # marker namespace: distinct streaming queries writing the SAME
        # destination must not share idempotency markers (r10 review: a
        # new query starting at batchId 0 would see the old query's
        # _committed_0 and silently drop its first batches). The tag
        # must be stable across RESTARTS of one query, so it cannot be
        # a uuid — callers set query_tag per logical query; the default
        # keeps the single-query-per-destination contract.
        self.tag = options.get("query_tag", "q0")
        self.staging = f"{self.dest}/_staging_stream_{uuid.uuid4().hex}"

    def write(self, iterator):
        return _stage_arrow(self.staging, iterator)

    def _marker(self, batch_id: int) -> str:
        return f"{self.dest}/_committed_{self.tag}_{batch_id}"

    def commit(self, messages, batchId):  # noqa: N803 (Spark API name)
        import os
        import shutil

        os.makedirs(self.dest, exist_ok=True)
        if os.path.exists(self._marker(batchId)):
            # replayed micro-batch: already published — drop the stage
            self._clean_staging(messages)
            return
        # DETERMINISTIC publish names keyed by (tag, batchId, message
        # index) — messages arrive indexed by partition id, so a replay
        # after a crash MID-publish rewrites the same names instead of
        # accreting a second copy of the partially-published files
        # (r10 review: task-uuid basenames made replays duplicate rows).
        for i, m in enumerate(messages):
            if m and m.path:
                shutil.move(
                    m.path,
                    f"{self.dest}/batch={self.tag}-{batchId}-part-{i:05d}.parquet",
                )
        with open(self._marker(batchId), "w") as f:
            f.write("")
        self._clean_staging(messages)

    def _clean_staging(self, messages) -> None:
        import shutil

        # scoped to THIS writer's dir plus the dirs the messages name
        # (driver and pickled task copies may not share one staging
        # uuid) — never a destination-wide glob, which could reap a
        # concurrent writer's staging (r10 review)
        shutil.rmtree(self.staging, ignore_errors=True)
        for d in _message_staging_dirs(messages):
            shutil.rmtree(d, ignore_errors=True)

    def abort(self, messages, batchId):  # noqa: N803
        self._clean_staging(messages)


class SqlUpsertArrowWriter(DataSourceArrowWriter):
    """S3 — the reference's ``INSERT ... ON CONFLICT`` upsert sink,
    EXECUTED against the stand-in SQL engine.

    Tasks stage their partitions as Arrow-written parquet (parallel,
    batched — S4); the driver's ``commit()`` then runs ONE
    ``INSERT ... SELECT ... ON CONFLICT (keys) DO UPDATE`` over all
    staged files inside the destination engine: batch-internal
    duplicates collapse to the highest version first (QUALIFY
    row_number), and the conflict clause applies last-writer-wins —
    ``WHERE excluded.version > current.version`` — so replaying a
    stale delta cannot regress a row (the reference applies deltas in
    ``ORDER BY updated`` and has no such guard; its semantics are
    reproduced, its order-sensitivity is not). Staging + driver-side
    merge is exactly the "staging table + INSERT..SELECT" shape the
    two-phase sink documents for real warehouses — here the merge SQL
    actually runs.
    """

    def __init__(self, options):
        import uuid

        self.db_path = options["db_path"]
        self.table = options["table"]
        self.keys = [k.strip() for k in options["keys"].split(",") if k.strip()]
        self.version_col = options.get("version_col")
        staging_root = options.get(
            "staging_dir", self.db_path + "_staging"
        )
        self.staging = f"{staging_root}_{uuid.uuid4().hex}"

    def write(self, iterator):
        return _stage_arrow(self.staging, iterator)

    def _q(self, name: str) -> str:
        return '"' + name.replace('"', '""') + '"'

    def commit(self, messages):
        import shutil

        import duckdb

        files = [m.path for m in messages if m and m.path]
        if not files:
            shutil.rmtree(self.staging, ignore_errors=True)
            return
        file_list = ", ".join(f"'{p}'" for p in files)
        src = f"read_parquet([{file_list}])"
        con = duckdb.connect(self.db_path)
        try:
            cols = [
                (name, dtype)
                for name, dtype, *_ in con.execute(
                    f"DESCRIBE SELECT * FROM {src}"
                ).fetchall()
            ]
            exists = con.execute(
                "SELECT count(*) FROM duckdb_tables() WHERE table_name = ?",
                [self.table],
            ).fetchone()[0]
            if not exists:
                ddl_cols = ", ".join(f"{self._q(n)} {t}" for n, t in cols)
                pk = ", ".join(self._q(k) for k in self.keys)
                con.execute(
                    f"CREATE TABLE {self._q(self.table)} "
                    f"({ddl_cols}, PRIMARY KEY ({pk}))"
                )
            non_keys = [n for n, _ in cols if n not in self.keys]
            set_clause = ", ".join(
                f"{self._q(c)} = excluded.{self._q(c)}" for c in non_keys
            )
            pk_list = ", ".join(self._q(k) for k in self.keys)
            # explicit column lists (r10 review): INSERT ... SELECT *
            # binds POSITIONALLY, so a later batch whose column order
            # differs from the table silently swaps same-typed values
            col_list = ", ".join(self._q(n) for n, _ in cols)
            if self.version_col:
                # deterministic intra-batch collapse: version first,
                # then every remaining column — two rows carrying the
                # SAME (key, version) must not pick a winner by input
                # order (task scheduling would decide the table's
                # content)
                others = [
                    n
                    for n, _ in cols
                    if n not in self.keys and n != self.version_col
                ]
                order = ", ".join(
                    [f"{self._q(self.version_col)} DESC"]
                    + [f"{self._q(c)} DESC" for c in others]
                )
                guard = (
                    f" WHERE excluded.{self._q(self.version_col)} > "
                    f"{self._q(self.table)}.{self._q(self.version_col)}"
                )
            else:
                order = ", ".join(f"{self._q(n)} DESC" for n, _ in cols)
                guard = ""
            # all-columns-are-keys: 'DO UPDATE SET' with an empty list
            # is a parse error — degrade to DO NOTHING, the same shape
            # jdbc.upsert_sql emits for this case (a duplicate key with
            # no payload columns has nothing to update)
            conflict = (
                f"DO UPDATE SET {set_clause}{guard}" if non_keys else "DO NOTHING"
            )
            con.execute(
                f"INSERT INTO {self._q(self.table)} ({col_list}) "
                f"SELECT {col_list} FROM {src} "
                f"QUALIFY row_number() OVER "
                f"(PARTITION BY {pk_list} ORDER BY {order}) = 1 "
                f"ON CONFLICT ({pk_list}) {conflict}"
            )
        finally:
            con.close()
        shutil.rmtree(self.staging, ignore_errors=True)
        # cleanup scoped to the staging dirs the messages actually name
        # (r10 review: the old destination-wide glob could reap a
        # CONCURRENT writer's staging for the same warehouse file while
        # its tasks were still running)
        for d in _message_staging_dirs(messages):
            shutil.rmtree(d, ignore_errors=True)

    def abort(self, messages):
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)
        for d in _message_staging_dirs(messages):
            shutil.rmtree(d, ignore_errors=True)


class SqlUpsertSinkDataSource(DataSource):
    """``df.write.format("pypgsync_upsert")`` — options: ``db_path``
    (DuckDB database file, the stand-in destination engine), ``table``,
    ``keys`` (comma-separated PK), optional ``version_col`` for the
    last-writer-wins guard."""

    @classmethod
    def name(cls):
        return UPSERT_SINK_NAME

    def writer(self, schema, overwrite: bool):
        return SqlUpsertArrowWriter(self.options)

    def streamWriter(self, schema, overwrite: bool):  # noqa: N802
        return SqlUpsertStreamArrowWriter(self.options)


def register_upsert_sink(spark) -> None:
    try:
        spark.dataSource.register(SqlUpsertSinkDataSource)
    except Exception:
        pass


class SqlUpsertStreamArrowWriter(DataSourceStreamArrowWriter):
    """Streaming upsert: each micro-batch merges through the same
    ``INSERT .. ON CONFLICT`` as the batch writer. No batch-id marker
    is needed — the version guard makes a replayed epoch a semantic
    no-op (every row it carries already lost or tied the version
    comparison), which is idempotency enforced by the MERGE ITSELF
    rather than by sink bookkeeping."""

    def __init__(self, options):
        self._delegate = SqlUpsertArrowWriter(options)

    def write(self, iterator):
        return self._delegate.write(iterator)

    def commit(self, messages, batchId):  # noqa: N803
        self._delegate.commit(messages)

    def abort(self, messages, batchId):  # noqa: N803
        self._delegate.abort(messages)
