"""Streaming checkpoint-restart resilience (r9 verdict #5).

The reference's headline resilience claim is "we can always stop and
start the program again" (reference README.md:90). The batch side has
replay/idempotency tests (test_sync.py); this is the streaming twin:
kill the transition-gated balance stream MID-DRAIN with an injected
foreachBatch crash, restart from the same checkpoint, and assert
exactly-once convergence to the batch oracle — on both the default
in-memory (HDFS-backed) and RocksDB state-store providers.

Two crash points, because they fail differently when recovery is
wrong:

- crash BEFORE the epoch's files land → the restart must REPLAY the
  uncommitted epoch (losing it under-counts);
- crash AFTER the files land but before the checkpoint commit → the
  replayed epoch re-writes its output; per-epoch OVERWRITE mode must
  dedupe it (a plain append would double-count — foreachBatch is only
  at-least-once).

Gate state rolls back with the failed epoch (state commits with the
batch), so the replayed rows must re-pass the gate rather than being
suppressed by half-committed state — the oracle compare catches both
the under- and over-count direction.
"""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from pypgsync_spark.catalog import ensure_events_ts, load_table, table_path

N_FILES = 6
CRASH_EPOCH = 3  # epochs 0..2 commit, the drain dies inside epoch 3


def _stage_incoming(spark, sf_small, tmp_path):
    """Split the events fixture into N_FILES arrival files, landed flat
    (the file stream lists top-level files only). event_id is unique in
    the fixture, so any row→file split preserves the gate's semantics
    and the batch oracle is the plain qualifying aggregate."""
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(table_path(sf_small, "events"))
    staging = tmp_path / "_stage"
    raw.repartition(N_FILES).write.parquet(str(staging))
    parts = sorted(glob.glob(str(staging / "part-*.parquet")))
    assert len(parts) == N_FILES
    for i, p in enumerate(parts):
        shutil.copy(p, incoming / f"f{i}.parquet")
    return incoming, raw.schema


def _writer(contrib_dir, crash_epoch=None, crash_after_write=False):
    """The per-epoch overwrite writer gated_balance uses
    (streaming/gated.py:280-285), with an optional injected crash."""

    def write(batch, epoch_id):
        if crash_epoch is not None and epoch_id == crash_epoch and not crash_after_write:
            raise RuntimeError("injected crash before write")
        batch.write.mode("overwrite").parquet(f"{contrib_dir}/epoch={epoch_id}")
        if crash_epoch is not None and epoch_id == crash_epoch and crash_after_write:
            raise RuntimeError("injected crash after write")

    return write


def _run_gate(spark, incoming, schema, ckpt, provider, writer):
    """One availableNow drain of the gated contribution stream — the
    same wiring as gated_balance (streaming/gated.py:244), with
    maxFilesPerTrigger=1 so the drain is many micro-batches and a
    mid-drain crash point exists."""
    from pypgsync_spark.streaming.balance import (
        state_store_provider,
        stream_shuffle_partitions,
    )
    from pypgsync_spark.streaming.gated import (
        gated_contributions_stream,
        pin_num_buckets,
    )

    src = ensure_events_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(incoming)),
        event_time=True,
    )
    pinned = pin_num_buckets(
        spark, ckpt, "auto", spark.sparkContext.defaultParallelism
    )
    contrib = gated_contributions_stream(src, num_buckets=pinned)
    with stream_shuffle_partitions(spark, "auto"), state_store_provider(
        spark, provider
    ):
        q = (
            contrib.writeStream.foreachBatch(writer)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()  # raises StreamingQueryException on crash


def _balance_from_log(spark, contrib_dir):
    # same aggregate gated_balance computes from its contribution log
    return (
        spark.read.parquet(str(contrib_dir))
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("balance"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def _skip_unless_rocksdb(spark):
    from pypgsync_spark.streaming.balance import ROCKSDB_PROVIDER

    try:
        spark.sparkContext._jvm.java.lang.Class.forName(ROCKSDB_PROVIDER)
    except Exception:
        pytest.skip("RocksDB state store provider not in this Spark build")


@pytest.mark.parametrize("provider", [None, "rocksdb"])
@pytest.mark.parametrize("crash_after_write", [False, True])
def test_gate_checkpoint_restart_exactly_once(
    spark, sf_small, tmp_path, provider, crash_after_write
):
    if provider == "rocksdb":
        _skip_unless_rocksdb(spark)

    incoming, schema = _stage_incoming(spark, sf_small, tmp_path)
    contrib = tmp_path / "contrib"
    ckpt = str(tmp_path / "ckpt")

    # run 1: dies inside epoch CRASH_EPOCH — a real mid-drain failure,
    # surfaced through awaitTermination
    with pytest.raises(Exception, match="injected crash"):
        _run_gate(
            spark,
            incoming,
            schema,
            ckpt,
            provider,
            _writer(contrib, crash_epoch=CRASH_EPOCH, crash_after_write=crash_after_write),
        )

    # the crash really was mid-drain: ≥1 epoch committed, < all files
    landed = {p.name for p in contrib.glob("epoch=*")} if contrib.exists() else set()
    expected_landed = CRASH_EPOCH + (1 if crash_after_write else 0)
    assert len(landed) == expected_landed
    assert 0 < len(landed) < N_FILES

    # Force-unload every loaded state-store provider before the
    # restart: within one JVM the provider cache would otherwise serve
    # the gate's state from MEMORY, and the test would not prove the
    # claim it exists for — that state is recovered from the CHECKPOINT
    # on disk, the process-restart path. With the unload, run 2's first
    # batch must reload its state maps from the checkpoint files.
    spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()

    # run 2: restart from the SAME checkpoint with a healthy writer —
    # must replay the uncommitted epoch and drain the rest
    _run_gate(spark, incoming, schema, ckpt, provider, _writer(contrib))

    from pypgsync_spark.streaming.balance import batch_balance

    got = sorted(map(tuple, _balance_from_log(spark, contrib).collect()))
    want = sorted(
        map(tuple, batch_balance(load_table(spark, sf_small, "events")).collect())
    )
    assert got == want  # exactly-once: no lost epoch, no double-write


# --- r10 verdict #5: the OTHER stateful shapes survive restart too ---
#
# The gate test above proves value-state (applyInPandasWithState)
# recovery. dropDuplicatesWithinWatermark keys and a stream-stream
# join's two-sided row buffers are recovered through different state
# formats, so they get the same recipe: mid-drain crash (before/after
# the epoch's files land), provider-cache force-unload so recovery
# provably comes from checkpoint FILES, restart, convergence to the
# batch oracle. Watermarks here are deliberately HUGE (365 days): the
# arrival files are a random row split, so a realistic delay could
# legitimately drop late rows — state-BOUND behavior is covered by the
# t9/t13 oracle queries; these tests isolate exactly-once recovery.


def _crash_then_restart(spark, run, contrib, crash_after_write):
    """Shared choreography: crashed run 1 -> mid-drain sanity ->
    provider unload -> healthy run 2."""
    with pytest.raises(Exception, match="injected crash"):
        run(_writer(contrib, crash_epoch=CRASH_EPOCH, crash_after_write=crash_after_write))
    landed = {p.name for p in contrib.glob("epoch=*")} if contrib.exists() else set()
    assert len(landed) == CRASH_EPOCH + (1 if crash_after_write else 0)
    assert 0 < len(landed) < N_FILES
    spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    run(_writer(contrib))


@pytest.mark.parametrize("provider", [None, "rocksdb"])
@pytest.mark.parametrize("crash_after_write", [False, True])
def test_dedup_checkpoint_restart_exactly_once(
    spark, sf_small, tmp_path, provider, crash_after_write
):
    if provider == "rocksdb":
        _skip_unless_rocksdb(spark)
    incoming, schema = _stage_incoming(spark, sf_small, tmp_path)
    contrib = tmp_path / "contrib"
    ckpt = str(tmp_path / "ckpt")

    def run(writer):
        from pypgsync_spark.streaming.balance import (
            state_store_provider,
            stream_shuffle_partitions,
        )

        def side():
            return ensure_events_ts(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(str(incoming)),
                event_time=True,
            )

        # two reads of the same files = deterministic at-least-once
        # delivery (dedupe.py's duplicate_input), so the dedup state is
        # doing real work in every epoch
        deduped = (
            side()
            .unionByName(side())
            .withWatermark("ts", "365 days")
            .dropDuplicatesWithinWatermark(["event_id"])
        )
        with stream_shuffle_partitions(spark, "auto"), state_store_provider(
            spark, provider
        ):
            q = (
                deduped.writeStream.foreachBatch(writer)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    _crash_then_restart(spark, run, contrib, crash_after_write)

    got = sorted(
        r["event_id"]
        for r in spark.read.parquet(str(contrib)).select("event_id").collect()
    )
    want = sorted(
        r["event_id"]
        for r in load_table(spark, sf_small, "events").select("event_id").collect()
    )
    assert got == want  # each event exactly once: no lost epoch, no
    # replayed duplicate, no key double-emitted across the restart


@pytest.mark.parametrize("provider", [None, "rocksdb"])
@pytest.mark.parametrize("crash_after_write", [False, True])
def test_stream_stream_join_checkpoint_restart_exactly_once(
    spark, sf_small, tmp_path, provider, crash_after_write
):
    if provider == "rocksdb":
        _skip_unless_rocksdb(spark)
    incoming, schema = _stage_incoming(spark, sf_small, tmp_path)
    contrib = tmp_path / "contrib"
    ckpt = str(tmp_path / "ckpt")

    def run(writer):
        from pypgsync_spark.streaming.balance import (
            state_store_provider,
            stream_shuffle_partitions,
        )

        def side(event_type, id_alias, ts_alias, user_alias):
            src = ensure_events_ts(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(str(incoming)),
                event_time=True,
            )
            return (
                src.filter(F.col("event_type") == event_type)
                .select(
                    F.col("event_id").alias(id_alias),
                    F.col("user_id").alias(user_alias),
                    F.col("ts").alias(ts_alias),
                )
                .withWatermark(ts_alias, "365 days")
            )

        left = side("error", "error_id", "error_ts", "user_id")
        right = side("click", "click_id", "click_ts", "r_user_id")
        joined = left.join(
            right,
            (F.col("user_id") == F.col("r_user_id"))
            & (F.col("click_ts") >= F.col("error_ts") - F.expr("INTERVAL 6 HOURS"))
            & (F.col("click_ts") <= F.col("error_ts")),
            "inner",
        ).select("error_id", "click_id")
        with stream_shuffle_partitions(spark, "auto"), state_store_provider(
            spark, provider
        ):
            q = (
                joined.writeStream.foreachBatch(writer)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    _crash_then_restart(spark, run, contrib, crash_after_write)

    ev = load_table(spark, sf_small, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("click_ts"),
    )
    want = sorted(
        map(
            tuple,
            err.join(
                clk,
                (F.col("user_id") == F.col("r_user_id"))
                & (F.col("click_ts") >= F.col("error_ts") - F.expr("INTERVAL 6 HOURS"))
                & (F.col("click_ts") <= F.col("error_ts")),
                "inner",
            )
            .select("error_id", "click_id")
            .collect(),
        )
    )
    assert want, "fixture must produce at least one error-click pair"
    got = sorted(
        map(
            tuple,
            spark.read.parquet(str(contrib))
            .select("error_id", "click_id")  # drop the epoch partition col
            .collect(),
        )
    )
    assert got == want  # every pair exactly once across the restart


def test_content_fingerprint_is_md5_of_normalized_text(spark):
    """pipe5 emits attributes derived from normalized_text and dedups
    on content_fingerprint; the two live as separate functions (so
    fingerprint consumers' closures stay untouched) but MUST stay the
    same normalization — this pins md5(normalized_text(c)) to be
    expression-identical to content_fingerprint(c)."""
    from pyspark.sql import functions as F

    from pypgsync_spark.functions.text import content_fingerprint, normalized_text

    a = content_fingerprint(F.col("text"))
    b = F.md5(normalized_text(F.col("text")))
    assert str(a._jc) == str(b._jc)


def test_stream_ingest_curation_cross_batch(spark, tmp_path):
    """The composed screen -> watermarked-dedup contract across
    MICRO-BATCH boundaries: a duplicate (whitespace/case variant)
    arriving in a LATER batch still collapses (state held under the
    watermark), corpus content is screened in every batch, and novel
    content passes exactly once."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pypgsync_spark.functions.text import content_fingerprint
    from pypgsync_spark.streaming.dedupe import stream_ingest_curation

    src = tmp_path / "incoming"
    src.mkdir()
    # batch 1: novel Z with the EARLIEST possible synthesized event time
    # (pipe5's epoch-0-residue regression: Spark initializes the
    # event-time watermark at 0 ms, so without the base-day offset this
    # row's crawl_ts would be epoch 0 — born late, silently dropped),
    # novel A, novel B; batch 2: variant of A (same fingerprint,
    # different raw bytes), novel C, and D whose content sits in the corpus
    b1 = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["zero epoch doc", "Alpha beta GAMMA", "delta epsilon"],
        }
    )
    b2 = pd.DataFrame(
        {
            "doc_id": [3, 4, 5],
            "text": ["  alpha   BETA gamma ", "zeta eta theta", "corpus known doc"],
        }
    )
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2).coalesce(1).write.parquet(str(src / "f2"))
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": ["Corpus KNOWN doc"]})
    )

    schema = spark.read.parquet(str(src / "f1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
        .withColumn(
            "crawl_ts",
            F.timestamp_millis(
                F.lit(86400000) + F.col("doc_id") * F.lit(3600000)
            ),
        )
    )
    out = stream_ingest_curation(
        spark,
        stream,
        corpus,
        text_col="text",
        ts_col="crawl_ts",
        watermark="30 days",
        query_name="test_pipe5_xbatch_mem",
    )
    got = sorted(r["__fp"] for r in out.select("__fp").collect())
    expect_texts = [
        "zero epoch doc",
        "Alpha beta GAMMA",
        "delta epsilon",
        "zeta eta theta",
    ]
    want = sorted(
        r["f"]
        for r in spark.createDataFrame(pd.DataFrame({"text": expect_texts}))
        .select(content_fingerprint("text").alias("f"))
        .collect()
    )
    assert got == want  # A once (variant collapsed), B, C; D screened


def test_epoch_zero_event_time_is_born_late(spark, tmp_path):
    """Documents the Spark semantics behind pipe5's base-day offset:
    the event-time watermark INITIALIZES at 0 ms, so a row whose event
    time is exactly epoch 0 is already late in the very first
    micro-batch and dropDuplicatesWithinWatermark silently drops it.
    Any synthesized event-time column must therefore stay strictly
    above epoch 0. If this test ever fails, Spark changed the initial
    watermark and the base-day rule can be revisited."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pypgsync_spark.streaming.balance import drain_to_memory

    src = tmp_path / "zero_epoch"
    pdf = pd.DataFrame({"doc_id": [0, 1]})
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src))
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .parquet(str(src))
        .withColumn("ts", F.timestamp_millis(F.col("doc_id") * F.lit(3600000)))
    )
    deduped = stream.withWatermark("ts", "30 days").dropDuplicatesWithinWatermark(
        ["doc_id"]
    )
    out = drain_to_memory(
        spark, deduped, "test_zero_epoch_mem", output_mode="append"
    )
    assert [r["doc_id"] for r in out.select("doc_id").collect()] == [1]


def test_curation_stream_plan_shape(spark, tmp_path):
    """pipe5's scale contract on the analyzed streaming plan: the
    corpus screen is a STATELESS LeftAnti join (re-planned per batch
    against the static side) and the ONLY stateful operator is the
    watermarked fingerprint dedup — state bounded by arrival rate ×
    watermark delay, never corpus size."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pypgsync_spark.streaming.dedupe import curation_stream

    src = tmp_path / "plan_src"
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["a doc"]})
    ).coalesce(1).write.parquet(str(src))
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .parquet(str(src))
        .withColumn(
            "crawl_ts",
            F.timestamp_millis(F.lit(86400000) + F.col("doc_id") * F.lit(1000)),
        )
    )
    corpus = spark.createDataFrame(pd.DataFrame({"doc_id": [2], "text": ["other"]}))
    composed = curation_stream(stream, corpus)
    plan = composed._jdf.queryExecution().analyzed().toString()
    assert plan.count("DeduplicateWithinWatermark") == 1  # the one stateful op
    assert "LeftAnti" in plan  # the zero-state screen
    assert "EventTimeWatermark" in plan  # dedup state is watermark-bounded
    # nothing else stateful in the composition
    for stateful in ("Aggregate", "FlatMapGroupsWithState", "Deduplicate ("):
        assert stateful not in plan, stateful


# --- r11 verdict #4: the COMPOSED pipe5 pipeline survives restart ---
#
# The three per-shape proofs above cover value-state, watermarked-dedup
# state, and join state in isolation. pipe5 composes a map-only Gopher
# gate, a stateless corpus anti-join, and watermarked fingerprint
# dedup into ONE streaming query; a mid-batch crash there fails after
# rows have passed the gate but before the dedup state commits (state
# commits with the epoch), so the restart must re-gate, re-screen, and
# re-dedup the replayed epoch without losing or double-emitting a
# fingerprint. Same recipe: crash before/after the epoch's files land,
# provider-cache force-unload, healthy restart, exact batch oracle —
# on both state-store providers.


def _stage_documents(spark, sf_small, tmp_path):
    """Split the documents fixture into N_FILES arrival files (flat:
    the file stream lists top-level files only)."""
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    raw = spark.read.parquet(table_path(sf_small, "documents"))
    staging = tmp_path / "_stage"
    raw.repartition(N_FILES).write.parquet(str(staging))
    parts = sorted(glob.glob(str(staging / "part-*.parquet")))
    assert len(parts) == N_FILES
    for i, p in enumerate(parts):
        shutil.copy(p, incoming / f"f{i}.parquet")
    return incoming, raw.schema


def _gated_doc_stream(spark, incoming, schema):
    """pipe5's stage 1, verbatim semantics: at-least-once delivery
    (every file read by two sources), the shared gopher_metrics gate
    with pipe4's thresholds, fingerprint-determined attributes only,
    and the base-day-offset synthesized event time."""
    from pypgsync_spark.functions.text import (
        gopher_metrics,
        gopher_structural_gate,
        normalized_text,
        tokens,
    )

    def side():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(incoming))
            .filter(F.col("doc_id") % 10 == 0)
        )

    stream = side().unionByName(side())
    tkd = stream.select("doc_id", "text", tokens(F.col("text")).alias("tk"))
    gm = gopher_metrics(F.col("tk"))
    return (
        tkd.select(
            "doc_id",
            "text",
            gm["n_words"].alias("n_tokens"),
            gm["mean_word_len"].alias("mwl"),
            gm["symbol_word_ratio"].alias("swr"),
            gm["alpha_word_frac"].alias("awf"),
        )
        .filter(
            gopher_structural_gate(
                F.col("n_tokens"), F.col("mwl"), F.col("swr"), F.col("awf")
            )
        )
        .select(
            "text",
            F.length(normalized_text(F.col("text"))).cast("long").alias("norm_chars"),
            "n_tokens",
            F.timestamp_millis(
                F.lit(86400000) + (F.col("doc_id") % 97) * F.lit(3600000)
            ).alias("crawl_ts"),
        )
    )


@pytest.mark.parametrize("provider", [None, "rocksdb"])
@pytest.mark.parametrize("crash_after_write", [False, True])
def test_curation_pipeline_checkpoint_restart_exactly_once(
    spark, sf_small, tmp_path, provider, crash_after_write
):
    if provider == "rocksdb":
        _skip_unless_rocksdb(spark)
    incoming, schema = _stage_documents(spark, sf_small, tmp_path)
    contrib = tmp_path / "contrib"
    ckpt = str(tmp_path / "ckpt")

    def run(writer):
        from pypgsync_spark.streaming.balance import (
            state_store_provider,
            stream_shuffle_partitions,
        )
        from pypgsync_spark.streaming.dedupe import curation_stream

        gated = _gated_doc_stream(spark, incoming, schema)
        corpus = spark.read.parquet(table_path(sf_small, "documents")).filter(
            F.col("doc_id") % 10 != 0
        )
        composed = curation_stream(
            gated, corpus, text_col="text", ts_col="crawl_ts", watermark="365 days"
        )
        with stream_shuffle_partitions(spark, "auto"), state_store_provider(
            spark, provider
        ):
            q = (
                composed.writeStream.foreachBatch(writer)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    _crash_then_restart(spark, run, contrib, crash_after_write)

    # batch oracle through the SAME kernels: gate-passing fresh docs,
    # fingerprinted, anti-joined against the corpus fingerprints,
    # distinct — one row per novel fingerprint
    from pypgsync_spark.functions.text import (
        content_fingerprint,
        gopher_metrics,
        gopher_structural_gate,
        normalized_text,
        tokens,
    )

    docs = spark.read.parquet(table_path(sf_small, "documents"))
    gm = gopher_metrics(F.col("tk"))
    passing = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text", tokens(F.col("text")).alias("tk"))
        .select(
            "text",
            gm["n_words"].alias("n_tokens"),
            gm["mean_word_len"].alias("mwl"),
            gm["symbol_word_ratio"].alias("swr"),
            gm["alpha_word_frac"].alias("awf"),
        )
        .filter(
            gopher_structural_gate(
                F.col("n_tokens"), F.col("mwl"), F.col("swr"), F.col("awf")
            )
        )
        .select(
            content_fingerprint("text").alias("__fp"),
            F.length(normalized_text(F.col("text"))).cast("long").alias("norm_chars"),
            "n_tokens",
        )
    )
    corpus_fps = (
        docs.filter(F.col("doc_id") % 10 != 0)
        .select(content_fingerprint("text").alias("__fp"))
    )
    want = sorted(
        map(
            tuple,
            passing.join(corpus_fps, on="__fp", how="left_anti")
            .distinct()
            .collect(),
        )
    )
    assert want, "fixture must yield at least one novel passing fingerprint"
    got = sorted(
        map(
            tuple,
            spark.read.parquet(str(contrib))
            .select("__fp", "norm_chars", "n_tokens")
            .collect(),
        )
    )
    assert got == want  # exactly-once through the COMPOSED pipeline:
    # the replayed epoch re-passed the gate and re-screened, and no
    # fingerprint was lost with the crashed epoch or emitted twice


def test_semantic_screen_stream_is_stateless(spark, sf_small):
    """pipe6's streaming stage must be ENTIRELY stateless: map-only
    signature, explode, stream-static left join — no watermark, no
    dedup, no aggregate, no state store. Corpus growth costs a
    per-batch re-plan of the static side, never streaming state."""
    from pypgsync_spark.streaming.dedupe import semantic_screen_stream

    path = table_path(sf_small, "embeddings")
    schema = spark.read.parquet(path).schema
    incoming = (
        spark.readStream.schema(schema).parquet(path).filter(F.col("vec_id") % 10 == 0)
    )
    corpus = spark.read.parquet(path).filter(F.col("vec_id") % 10 != 0)
    composed = semantic_screen_stream(incoming, corpus)
    plan = composed._jdf.queryExecution().analyzed().toString()
    assert "Join LeftOuter" in plan  # the stream-static band probe
    for stateful in (
        "EventTimeWatermark",
        "Deduplicate",
        "Aggregate",
        "FlatMapGroupsWithState",
    ):
        assert stateful not in plan, stateful


def test_semantic_screen_candidate_recall(spark, sf_small):
    """pipe6's banded probe must surface (nearly) every true
    above-threshold neighbor as a candidate. True pairs are the
    re-embedded near-duplicates (first component +0.25, cos ~ 0.97
    against their originals); 4x8-bit banding catches each with
    p ~ 95% at that cosine, and the fixture measures 61/64 — the
    floor pins 0.85 so a banding regression (wrong shift, wrong
    mask, dropped band) fails loudly while leaving room for honest
    per-pair LSH misses (which the DuckDB oracle reproduces exactly:
    the miss set is deterministic given the seed-42 planes)."""
    from pypgsync_spark.operators.similarity import cosine, hyperplane_signature

    emb = spark.read.parquet(table_path(sf_small, "embeddings"))
    pert = F.concat(
        F.array(F.element_at(F.col("embedding"), 1).cast("double") + F.lit(0.25)),
        F.transform(
            F.slice(F.col("embedding"), 2, F.size(F.col("embedding")) - 1),
            lambda x: x.cast("double"),
        ),
    )
    inc = emb.filter((F.col("vec_id") % 7 == 3) & (F.col("vec_id") % 10 != 0)).select(
        (F.col("vec_id") + F.lit(1000000)).alias("a"), pert.alias("va")
    )
    corp = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("vb")
    )
    true_pairs = (
        inc.crossJoin(corp)
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") > 0.9)
        .select("a", "b")
    )

    def bands(df, vcol, idc):
        s = df.select(idc, hyperplane_signature(F.col(vcol), 64, 32).alias("s"))
        return s.select(
            idc,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftrightunsigned(F.col("s"), 8 * b)
                            .bitwiseAND(F.lit(255))
                            .alias("val"),
                        )
                        for b in range(4)
                    ]
                )
            ).alias("bk"),
        ).select(idc, "bk.band", "bk.val")

    cand = (
        bands(inc, "va", "a")
        .join(bands(corp, "vb", "b"), on=["band", "val"])
        .select("a", "b")
        .dropDuplicates()
    )
    t = true_pairs.count()
    hit = true_pairs.join(cand, on=["a", "b"], how="left_semi").count()
    assert t > 0, "fixture must contain above-threshold neighbors"
    assert hit / t >= 0.85, f"candidate recall {hit}/{t}"


def test_image_screen_stream_is_stateless_and_complete(spark, sf_small):
    """mm10's streaming stage must be ENTIRELY stateless (pipe6's
    contract: map-only decode→dHash, band explode, stream-static left
    join — no watermark, no dedup, no aggregate, no state store), and
    the banded probe must be COMPLETE at radius 3 (the pigeonhole
    argument): every incoming image whose group-mates exist in the
    corpus must surface its exact duplicate (id+1, hamming 0) and its
    single-pixel near-dup (id+2, hamming <= 2) among the verdicts."""
    from pypgsync_spark.queries import REGISTRY
    from pypgsync_spark.streaming.dedupe import image_screen_stream

    path = table_path(sf_small, "documents")
    schema = spark.read.parquet(path).schema
    incoming = (
        spark.readStream.schema(schema).parquet(path).filter(F.col("doc_id") % 10 == 0)
    )
    corpus = spark.read.parquet(path).filter(F.col("doc_id") % 10 != 0)
    composed = image_screen_stream(incoming, corpus)
    plan = composed._jdf.queryExecution().analyzed().toString()
    assert "Join LeftOuter" in plan  # the stream-static band probe
    for stateful in (
        "EventTimeWatermark",
        "Deduplicate",
        "Aggregate",
        "FlatMapGroupsWithState",
    ):
        assert stateful not in plan, stateful

    out = {
        r["doc_id"]: (r["n_matches"], r["best_hamming"], r["is_novel"])
        for r in REGISTRY["mm10_stream_image_screen"].fn(spark, sf_small).collect()
    }
    max_id = spark.read.parquet(path).agg(F.max("doc_id")).first()[0]
    whole_group = [i for i in out if i + 2 <= max_id]
    assert whole_group, "fixture too small for any complete group"
    for i in whole_group:
        nm, bh, novel = out[i]
        # exact dup at i+1 (hamming 0) and near-dup at i+2 (<= 2 bits
        # flipped by the single-pixel bump) both share a band by
        # pigeonhole, so the screen must report >= 2 matches, best 0
        assert nm >= 2, (i, out[i])
        assert bh == 0, (i, out[i])
        assert novel == 0, (i, out[i])


@pytest.mark.parametrize("crash_after_write", [False, True])
def test_cross_modal_screen_checkpoint_restart_exactly_once(
    spark, sf_small, tmp_path, crash_after_write
):
    """pipe7's composition proof (r13 verdict #7), extended to the
    multimodal leg: text gate -> image band screen chained over ONE
    stream into one sink, crashed mid-drain and restarted from the
    checkpoint. The reassembled epochs must equal the one-shot batch
    verdict computed through the SAME kernels — the replayed epoch
    re-passed the gate and re-screened (overwrite idempotence), and no
    incoming doc was lost with the crashed epoch or screened twice."""
    from pypgsync_spark.functions.text import (
        gopher_metrics,
        gopher_structural_gate,
        tokens,
    )
    from pypgsync_spark.operators.multimodal import (
        PH_BANDS,
        dhash_band_explode,
        image_dhash_bands,
        with_neardup_image_payload,
    )
    from pypgsync_spark.streaming.dedupe import image_screen_stream

    incoming, schema = _stage_documents(spark, sf_small, tmp_path)
    contrib = tmp_path / "contrib"
    ckpt = str(tmp_path / "ckpt")

    def gate(df):
        tkd = df.filter(F.col("doc_id") % 10 == 0).select(
            "doc_id", tokens(F.col("text")).alias("tk")
        )
        gm = gopher_metrics(F.col("tk"))
        return (
            tkd.select(
                "doc_id",
                gm["n_words"].alias("n_tokens"),
                gm["mean_word_len"].alias("mwl"),
                gm["symbol_word_ratio"].alias("swr"),
                gm["alpha_word_frac"].alias("awf"),
            )
            .filter(
                gopher_structural_gate(
                    F.col("n_tokens"), F.col("mwl"), F.col("swr"), F.col("awf")
                )
            )
            .select("doc_id")
        )

    corpus = spark.read.parquet(table_path(sf_small, "documents")).filter(
        F.col("doc_id") % 10 != 0
    )

    def run(writer):
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(incoming))
        )
        composed = image_screen_stream(gate(src), corpus, max_hamming=3)
        q = (
            composed.writeStream.foreachBatch(writer)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _crash_then_restart(spark, run, contrib, crash_after_write)

    # one-shot batch expectation through the SAME kernels: gate the
    # batch read, band-join gate survivors against the corpus bands,
    # per-doc verdict
    docs = spark.read.parquet(table_path(sf_small, "documents"))
    inc = gate(docs)
    e = dhash_band_explode(image_dhash_bands(with_neardup_image_payload(docs)))
    left = e.join(inc, on="doc_id").select(
        F.col("doc_id").alias("in_id"),
        *[F.col(f"b{b}").alias(f"a{b}") for b in range(PH_BANDS)],
        "bi",
        "bv",
    )
    right = e.filter(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").alias("cand_id"),
        *[F.col(f"b{b}").alias(f"x{b}") for b in range(PH_BANDS)],
        "bi",
        "bv",
    )
    hamming = sum(
        F.bit_count(F.col(f"a{b}").bitwiseXOR(F.col(f"x{b}")))
        for b in range(PH_BANDS)
    )
    pairs = (
        left.join(right, on=["bi", "bv"])
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= 3)
        .dropDuplicates(["in_id", "cand_id"])
    )
    agg = pairs.groupBy("in_id").agg(
        F.count(F.lit(1)).alias("nm"), F.min("hamming").alias("bh")
    )
    want = sorted(
        (r["doc_id"], r["nm"] or 0, r["bh"] if r["bh"] is not None else -1)
        for r in inc.join(
            agg, on=inc["doc_id"] == agg["in_id"], how="left"
        ).collect()
    )
    assert want and any(nm > 0 for _, nm, _ in want), (
        "fixture must include gate-passing incoming docs with corpus matches"
    )

    drained = spark.read.parquet(str(contrib))
    hits = (
        drained.filter(F.col("cand_id").isNotNull() & (F.col("hamming") <= 3))
        .dropDuplicates(["doc_id", "cand_id"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nm"), F.min("hamming").alias("bh"))
        .withColumnRenamed("doc_id", "doc_id_r")
    )
    base = drained.select("doc_id").dropDuplicates(["doc_id"])
    got = sorted(
        (r["doc_id"], r["nm"] or 0, r["bh"] if r["bh"] is not None else -1)
        for r in base.join(
            hits, on=base["doc_id"] == hits["doc_id_r"], how="left"
        ).collect()
    )
    assert got == want


def test_audio_screen_stream_is_stateless_and_complete(spark, sf_small):
    """mm12's streaming stage must be ENTIRELY stateless (the
    banded_screen_stream contract, same as mm10's image twin), and the
    banded probe COMPLETE at radius 3: every incoming audio doc whose
    group-mates exist in the corpus must surface its exact duplicate
    (id+1, hamming 0) and its single-SAMPLE edit (id+2, hamming <= 2 —
    the bump touches one frame, so at most the 2 comparison bits whose
    window includes it flip) among the verdicts."""
    from pypgsync_spark.queries import REGISTRY
    from pypgsync_spark.streaming.dedupe import audio_screen_stream

    path = table_path(sf_small, "documents")
    schema = spark.read.parquet(path).schema
    incoming = (
        spark.readStream.schema(schema).parquet(path).filter(F.col("doc_id") % 10 == 0)
    )
    corpus = spark.read.parquet(path).filter(F.col("doc_id") % 10 != 0)
    composed = audio_screen_stream(incoming, corpus)
    plan = composed._jdf.queryExecution().analyzed().toString()
    assert "Join LeftOuter" in plan  # the stream-static band probe
    for stateful in (
        "EventTimeWatermark",
        "Deduplicate",
        "Aggregate",
        "FlatMapGroupsWithState",
    ):
        assert stateful not in plan, stateful

    out = {
        r["doc_id"]: (r["n_matches"], r["best_hamming"], r["is_novel"])
        for r in REGISTRY["mm12_stream_audio_screen"].fn(spark, sf_small).collect()
    }
    max_id = spark.read.parquet(path).agg(F.max("doc_id")).first()[0]
    whole_group = [i for i in out if i + 2 <= max_id]
    assert whole_group, "fixture too small for any complete group"
    for i in whole_group:
        nm, bh, novel = out[i]
        assert nm >= 2, (i, out[i])
        assert bh == 0, (i, out[i])
        assert novel == 0, (i, out[i])


def test_video_screen_stream_is_stateless_and_complete(spark, sf_small):
    """mm14's streaming stage must be ENTIRELY stateless (the
    banded_screen_stream contract, same as the image/audio twins), and
    the banded probe COMPLETE at radius 3: every incoming video doc
    whose group-mates exist in the corpus must surface its exact
    duplicate (id+1, hamming 0) and its single-PIXEL luma edit (id+2,
    hamming <= 2 — the bump touches one block sum, so at most the 2
    comparison bits whose window includes it flip) among the
    verdicts."""
    from pypgsync_spark.queries import REGISTRY
    from pypgsync_spark.streaming.dedupe import video_screen_stream

    path = table_path(sf_small, "documents")
    schema = spark.read.parquet(path).schema
    incoming = (
        spark.readStream.schema(schema).parquet(path).filter(F.col("doc_id") % 10 == 0)
    )
    corpus = spark.read.parquet(path).filter(F.col("doc_id") % 10 != 0)
    composed = video_screen_stream(incoming, corpus)
    plan = composed._jdf.queryExecution().analyzed().toString()
    assert "Join LeftOuter" in plan  # the stream-static band probe
    for stateful in (
        "EventTimeWatermark",
        "Deduplicate",
        "Aggregate",
        "FlatMapGroupsWithState",
    ):
        assert stateful not in plan, stateful

    out = {
        r["doc_id"]: (r["n_matches"], r["best_hamming"], r["is_novel"])
        for r in REGISTRY["mm14_stream_video_screen"].fn(spark, sf_small).collect()
    }
    max_id = spark.read.parquet(path).agg(F.max("doc_id")).first()[0]
    whole_group = [i for i in out if i + 2 <= max_id]
    assert whole_group, "fixture too small for any complete group"
    for i in whole_group:
        nm, bh, novel = out[i]
        assert nm >= 2, (i, out[i])
        assert bh == 0, (i, out[i])
        assert novel == 0, (i, out[i])
