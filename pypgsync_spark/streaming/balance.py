"""Stateful incremental aggregate: the README "Question 2" balance.

The reference maintains ``user_balance`` (user_id, balance, updated)
with a plpgsql trigger that adds ``NEW.amount`` exactly once — when a
transaction first becomes certified-and-unblocked (README.md:157-198;
gating conditions at README.md:182, 195-196). That is a continuously
maintained grouped SUM with *transition gating*: a row contributes on
its first qualifying version only.

Spark-native forms, both provided:

- ``streaming_balance``: Structured Streaming
  ``groupBy(user).agg(sum)`` over the qualifying-event stream —
  the state store holds per-user running sums (SURVEY §2.10 T5).
  Streamed via the memory sink in complete mode for tests; in
  production the sink is ``foreachBatch`` merging into the balance
  table in update mode.
- ``batch_balance``: the equivalent batch re-aggregation
  (README.md:146-151's initial load) used as the oracle.

Transition gating in the streaming form: the qualifying filter keeps a
version's rows only when qualified; re-emissions of the same key are
deduplicated by ``dropDuplicates`` over the event id *within the
stream* (state-store-backed), mirroring "count each transaction once".
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pypgsync_spark.catalog import ensure_events_ts


@contextmanager
def stream_shuffle_partitions(spark: SparkSession, n: int | str | None):
    """Temporarily pin ``spark.sql.shuffle.partitions`` while a
    streaming query STARTS (the state store captures its partition
    count from this conf at first checkpoint, and AQE cannot coalesce
    stateful streaming shuffles). A session tuned for 100 TB batch
    work carries a large default (the driver harness uses 200) that
    costs ~200 empty state-store tasks per micro-batch on a small
    stream; stateful-operator parallelism should be sized to the
    stream's key cardinality / available cores instead. ``n="auto"``
    (the runners' default) uses ``defaultParallelism`` — one state
    partition per core; ``n=None`` leaves the session untouched."""
    if n is None:
        yield
        return
    if n == "auto":
        n = spark.sparkContext.defaultParallelism
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@contextmanager
def no_data_microbatches(spark: SparkSession, enabled: bool):
    """Temporarily pin ``spark.sql.streaming.noDataMicroBatches.enabled``
    while a drain-and-stop query runs. After the last data batch,
    availableNow schedules one extra NO-DATA micro-batch whose only job
    is watermark-driven state cleanup — and that eviction pass scans
    every state row, which for a stream-stream join costs as much as
    the data batch itself (t10 measured: 16.1 s with the cleanup batch,
    2.3 s without, identical 2175-row result). For a drain whose
    checkpoint and state die with the query, that work is pure waste.

    Skipping it is output-preserving for every shape this engine
    drains: inner stream-stream joins emit on match during input
    processing (eviction emits nothing); complete-mode aggregates
    re-emit the same final table each batch; dropDuplicates /
    dropDuplicatesWithinWatermark emit a row in its ARRIVAL batch and
    use later batches only to prune state; stateless screens keep no
    state at all. It would NOT be safe for an append-mode windowed
    aggregate or an event-time-timeout flatMapGroups (their output is
    finalized by the cleanup batch) — no such query exists here, and a
    long-lived production stream keeps the default (its cleanup batch
    is what bounds state between bursts)."""
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "true" if enabled else "false")
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextmanager
def state_store_provider(spark: SparkSession, provider: str | None):
    """Temporarily pin the streaming state-store provider while a query
    starts (the provider is captured into the checkpoint at first
    start). ``"rocksdb"`` selects Spark's built-in RocksDB provider —
    the 100 TB setting: state lives off-heap on local disk with
    incremental changelog checkpoints, so stateful operators (the
    transition gate, dropDuplicatesWithinWatermark, session windows)
    scale to key cardinalities that would OOM the default in-memory
    HDFS-backed provider. ``None`` leaves the session untouched; any
    other string is passed through as a provider class name."""
    if provider is None:
        yield
        return
    if provider == "rocksdb":
        provider = ROCKSDB_PROVIDER
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, provider)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def _file_stream(spark: SparkSession, schema: "T.StructType", source_path: str):
    """Parquet file-stream source. Spark's file source needs a
    *directory*; when handed a single file, stream its parent with a
    pathGlobFilter restricted to that file name.

    The is-it-a-file probe goes through the Hadoop FileSystem for the
    URI's scheme (r10 review): ``os.path.isfile`` is always False for
    hdfs://, s3a:// and explicit file: URIs, which would silently skip
    the single-file workaround exactly where it is needed. A path that
    does not exist yet (a landing zone created later) streams as a
    directory, the previous behavior."""
    reader = spark.readStream.schema(schema)
    jp = spark._jvm.org.apache.hadoop.fs.Path(source_path)
    fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jp) and fs.getFileStatus(jp).isFile():
        reader = reader.option("pathGlobFilter", jp.getName())
        source_path = str(jp.getParent())
    return reader.parquet(source_path)


def drain_to_memory(
    spark: SparkSession,
    agg: DataFrame,
    query_name: str,
    state_partitions: int | str | None = "auto",
    store_provider: str | None = None,
    output_mode: str = "complete",
    skip_no_data_batch: bool = True,
) -> DataFrame:
    """Drain a streaming DataFrame through a memory sink with an
    availableNow trigger and return the sink table — the ONE place the
    drain idiom lives, so trigger/output-mode changes apply once
    instead of in every stateful query (five copies before r8; the r10
    review found three append-mode re-implementations, now folded in
    via ``output_mode``: "complete" for running aggregates, "append"
    for watermarked dedup / stream-stream joins / screens).

    ``skip_no_data_batch`` (default on; env kill-switch
    ``SPARK_GRAFT_STREAM_NODATA=1`` restores the cleanup batch) skips
    availableNow's trailing no-data micro-batch — see
    :func:`no_data_microbatches` for the output-preservation argument;
    pass ``False`` for any future query whose append-mode output is
    finalized by watermark advance."""
    import os

    if os.environ.get("SPARK_GRAFT_STREAM_NODATA") == "1":
        skip_no_data_batch = False
    with stream_shuffle_partitions(spark, state_partitions), state_store_provider(
        spark, store_provider
    ), no_data_microbatches(spark, not skip_no_data_batch):
        q = (
            agg.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(query_name)


def qualifying(events: DataFrame, status_col: str = "event_type", blocked: str = "error") -> DataFrame:
    """The README Q2 gate: certified AND not blocked → fixture analogue:
    event_type <> 'error' (FIXTURES.md role mapping)."""
    return events.filter(F.col(status_col) != blocked)


def batch_balance(events: DataFrame) -> DataFrame:
    """Initial aggregate load (README.md:146-151): decimal-exact sum →
    double for oracle comparability."""
    return (
        qualifying(events)
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("balance"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def streaming_balance(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    query_name: str = "user_balance_stream",
    id_col: str = "event_id",
    state_partitions: int | str | None = "auto",
    store_provider: str | None = None,
) -> DataFrame:
    """Run the stateful balance as a real streaming query over parquet
    files, drain with availableNow, return the final balance table.

    ``dropDuplicates([id_col])`` is the transition gate (each event id
    contributes once, state-store-backed); complete-mode memory sink
    exposes the running aggregate for verification.
    ``state_partitions`` sizes the state store (see
    :func:`stream_shuffle_partitions`); ``store_provider="rocksdb"``
    swaps the state backend (see :func:`state_store_provider`).
    """
    src = ensure_events_ts(_file_stream(spark, schema, source_path), event_time=True)
    agg = (
        qualifying(src)
        .dropDuplicates([id_col])
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("balance"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return drain_to_memory(
        spark, agg, query_name, state_partitions, store_provider
    )


def session_window_stats(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    gap: str = "1 hour",
    watermark: str = "2 days",
    query_name: str = "session_windows_stream",
    state_partitions: int | str | None = "auto",
) -> DataFrame:
    """Per-user session windows (``session_window`` with an inactivity
    ``gap``): the state store merges overlapping [ts, ts+gap) windows as
    events arrive — the streaming-native form of the batch lag()-based
    sessionization (w4). Returns (user_id, session_start_ms, n, total).

    Merge semantics: two consecutive events share a session iff
    ``next_ts - prev_ts < gap`` at Spark's native microsecond
    precision — the oracle must compare in micros, not millis, or
    exact-boundary sessions split differently.
    """
    src = ensure_events_ts(_file_stream(spark, schema, source_path), event_time=True)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )
    return drain_to_memory(spark, agg, query_name, state_partitions).select(
        F.col("user_id"),
        F.unix_millis(F.col("w.start")).alias("session_start_ms"),
        F.col("n"),
        F.col("total"),
    )


def windowed_event_counts(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    window: str = "1 day",
    watermark: str = "2 days",
    query_name: str = "windowed_counts_stream",
    state_partitions: int | str | None = "auto",
) -> DataFrame:
    """Tumbling-window streaming aggregation with a watermark — the
    bounded-late-data improvement over the reference's silent late-row
    loss (SURVEY §2.10 T3). Returns (window_start_ms, event_type, n, total)."""
    src = ensure_events_ts(_file_stream(spark, schema, source_path), event_time=True)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )
    return drain_to_memory(spark, agg, query_name, state_partitions).select(
        F.unix_millis(F.col("w.start")).alias("window_start_ms"),
        F.col("event_type"),
        F.col("n"),
        F.col("total"),
    )


def sliding_event_counts(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
    query_name: str = "sliding_counts_stream",
    state_partitions: int | str | None = "auto",
) -> DataFrame:
    """HOPPING (sliding) window streaming aggregation — the streaming
    twin of the a17 batch rollup: ``F.window(ts, window, slide)``
    expands each event into window/slide membership rows BEFORE the
    stateful aggregation, so the state store holds (window × type)
    partials (window/slide × a tumbling rollup's state), never events.
    Returns (win_start_ms, event_type, n)."""
    src = ensure_events_ts(_file_stream(spark, schema, source_path), event_time=True)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return drain_to_memory(spark, agg, query_name, state_partitions).select(
        F.unix_millis(F.col("w.start")).alias("win_start_ms"),
        F.col("event_type"),
        F.col("n"),
    )


def enriched_segment_rollup(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    dim: DataFrame,
    query_name: str = "enriched_rollup_stream",
    state_partitions: int | str | None = "auto",
) -> DataFrame:
    """Stream-STATIC broadcast enrichment + stateful rollup: the event
    stream joins a static dimension (broadcast per micro-batch — no
    state, no watermark needed for the join itself) and aggregates per
    (segment, type). The static side is re-resolvable each batch, so a
    dim refresh lands without restarting the query. Returns
    (c_mktsegment, event_type, n, total)."""
    src = ensure_events_ts(_file_stream(spark, schema, source_path), event_time=True)
    joined = src.join(F.broadcast(dim), src.user_id == dim.c_custkey, "inner")
    agg = joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )
    return drain_to_memory(spark, agg, query_name, state_partitions)
