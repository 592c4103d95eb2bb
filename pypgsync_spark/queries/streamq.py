"""Structured-Streaming queries (SURVEY §2.10 T1-T5).

Each runs a *real* streaming query (parquet file source, availableNow
trigger, memory sink), drains it synchronously, and returns the result
table — so the driver's batch-style harness can hash-compare the final
state against a batch oracle. The continuous-mode trigger cadence
(processingTime = 5 s, reference cli.py:72-74) is exercised in pytest,
not here, to keep driver runs fast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pypgsync_spark.catalog import table_path
from pypgsync_spark.functions.text import gopher_gate_sql
from pypgsync_spark.queries import register
from pypgsync_spark.streaming.balance import (
    session_window_stats,
    streaming_balance,
    windowed_event_counts,
)


def _events_stream_source(spark: SparkSession, sf_dir: str):
    """Raw file schema for the events streaming source (file streaming
    sources need an explicit schema; ts arrives as nanos BIGINT and is
    normalized inside the streaming transforms).

    Pins the session timezone to UTC like catalog.load_table does (r10
    review: this path replicated only the nanosAsLong half of the
    CLAUDE.md events-ts rule — on a caller session with a non-UTC zone
    the NTZ->LTZ cast in ensure_events_ts(event_time=True) would shift
    every unix_millis(window.start) by the zone offset and break
    epoch-millis parity with the UTC-naive DuckDB oracles)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(table_path(sf_dir, "events")).schema


@register(
    "t5_stateful_balance",
    survey="T5,A5,T1,T4",
    doc="The README Q2 trigger-maintained user_balance as a stateful "
    "streaming aggregation: event-id dedup (transition gate) + grouped "
    "sum, drained via availableNow into a memory sink.",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS balance,
           count(*) AS n_events
    FROM events WHERE event_type <> 'error'
    GROUP BY user_id
    """,
)
def t5_stateful_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = _events_stream_source(spark, sf_dir)
    return streaming_balance(
        spark,
        source_path=table_path(sf_dir, "events"),
        schema=schema,
        query_name="t5_balance_mem",
    )


@register(
    "t6_windowed_counts",
    survey="T5,§2.10",
    doc="Tumbling 1-day event-time windows with a watermark — the "
    "bounded-late-data improvement over the reference's silent late-row "
    "loss (T3).",
    oracle="""
    SELECT epoch_ms(date_trunc('day', ts)) AS window_start_ms,
           event_type,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events GROUP BY 1, 2
    """,
)
def t6_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = _events_stream_source(spark, sf_dir)
    return windowed_event_counts(
        spark,
        source_path=table_path(sf_dir, "events"),
        schema=schema,
        query_name="t6_windows_mem",
    )


@register(
    "t7_session_windows",
    survey="T5,§2.10 ext,W1",
    doc="Streaming session windows (1-hour inactivity gap) per user — "
    "state-store window merging; the streaming-native form of w4's "
    "lag()-based sessionization. Oracle = gaps-and-islands at "
    "MICROsecond precision (Spark merges sessions at native ts "
    "precision; a millis-rounded oracle splits exact-boundary "
    "sessions differently).",
    oracle="""
    SELECT user_id,
           CAST(min(ms) AS BIGINT) AS session_start_ms,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM (
        SELECT user_id, value, ms,
               SUM(is_start) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS UNBOUNDED PRECEDING) AS sess
        FROM (
            SELECT user_id, value, event_id,
                   epoch_ms(ts) AS ms, epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts)
                             - lag(epoch_us(ts)) OVER (
                                 PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                             >= 3600000000 THEN 1
                        WHEN lag(epoch_us(ts)) OVER (
                                 PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                             IS NULL THEN 1
                        ELSE 0 END AS is_start
            FROM events)
    ) GROUP BY user_id, sess
    """,
)
def t7_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = _events_stream_source(spark, sf_dir)
    return session_window_stats(
        spark,
        source_path=table_path(sf_dir, "events"),
        schema=schema,
        query_name="t7_sessions_mem",
    )


@register(
    "t9_stream_dedup_watermarked",
    survey="T5,ext:dedup,§2.10 ext",
    doc="Streaming dedup with BOUNDED state: the events stream unioned "
    "with itself (deterministic at-least-once simulation — every row "
    "delivered twice) through dropDuplicatesWithinWatermark, so each "
    "event id survives exactly once while the state store only holds "
    "keys until the watermark passes them (plain dropDuplicates state "
    "grows forever on a 100 TB ingest). Result aggregated per type for "
    "a stable hash.",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events
    GROUP BY event_type
    """,
)
def t9_stream_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from pypgsync_spark.streaming.dedupe import dedup_within_watermark

    schema = _events_stream_source(spark, sf_dir)
    deduped = dedup_within_watermark(
        spark,
        source_path=table_path(sf_dir, "events"),
        schema=schema,
        query_name="t9_dedup_mem",
    )
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@register(
    "t8_transition_gated_balance",
    bench=17,
    survey="A5,T5,T4",
    doc="The reference's trigger semantics EXACTLY (README.md:157-198): "
    "a custom stateful operator (applyInPandasWithState, one boolean "
    "of state per event id) emits each id's contribution once — on its "
    "first QUALIFYING version — then balances aggregate batch-side. "
    "Multi-version transition behavior (v1 blocked → v2 ok) is "
    "pytest-asserted; on the single-version fixture the gate reduces "
    "to the qualifying filter, which the oracle states.",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS balance,
           count(*) AS n_events
    FROM events WHERE event_type <> 'error'
    GROUP BY user_id
    """,
)
def t8_transition_gated_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pypgsync_spark.streaming.gated import gated_balance

    import os

    from pypgsync_spark.queries.syncq import _pid_scratch_dir

    schema = _events_stream_source(spark, sf_dir)
    # fresh work dir PER CALL (each run must drain from scratch — a
    # reused checkpoint would make reruns no-op reads of the old
    # contribution log and falsify the bench's steady figure), nested
    # under a pid-scoped parent so the r9 dead-pid reaper bounds the
    # /tmp growth the old bare mkdtemp leaked every run (r10 review)
    parent = _pid_scratch_dir("t8_gated", sf_dir)
    os.makedirs(parent, exist_ok=True)
    work = tempfile.mkdtemp(prefix="run_", dir=parent)
    return gated_balance(
        spark,
        source_path=table_path(sf_dir, "events"),
        schema=schema,
        contrib_dir=f"{work}/contrib",
        checkpoint_dir=f"{work}/ckpt",
        # state-partition count sized to the stateful op's key
        # cardinality (128 hash buckets), not the core count: at
        # one-per-core (32) each micro-batch pays 32 state-store
        # commits + 32 Python stateful-worker rounds for ≤4 buckets
        # each (measured 4.2 s; 8 partitions 1.7 s isolated).
        # Production sizes this to buckets/cores like every
        # state_partitions knob; the operator default stays "auto".
        state_partitions=8,
    )


@register(
    "t10_stream_stream_join",
    bench=29,
    survey="§2.10 ext,§2.3",
    doc="Watermark-bounded stream-stream interval join: every error "
    "event paired with the same user's click events from the "
    "preceding 6 hours — two watermarked sub-streams of the events "
    "source joined on user_id plus an event-time range. The "
    "watermark + range bound let the state store evict both sides "
    "continuously (the only stream-stream join shape that runs "
    "unbounded); drained via availableNow into an append-mode memory "
    "sink, so the final table equals the batch interval join the "
    "oracle states.",
    oracle="""
    SELECT e.event_id AS error_id, c.event_id AS click_id
    FROM events e JOIN events c
      ON e.user_id = c.user_id
     AND e.event_type = 'error' AND c.event_type = 'click'
     AND c.ts >= e.ts - INTERVAL 6 HOUR AND c.ts <= e.ts
    """,
)
def t10_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pypgsync_spark.streaming.joins import interval_join_events

    schema = _events_stream_source(spark, sf_dir)
    return interval_join_events(
        spark,
        source_path=table_path(sf_dir, "events"),
        schema=schema,
        query_name="t10_ssj_mem",
        # a stream-stream join keeps state on BOTH sides, so its
        # per-partition state-store overhead is double a single
        # stateful op's; at this fixture's key cardinality (150 users)
        # 8 partitions is 2.6× faster end-to-end than one-per-core
        # (measured 7.2 s → 2.8 s). Production sizes this to key
        # cardinality / cores, same as every state_partitions knob.
        state_partitions=8,
    )


@register(
    "t11_cdc_stream_sync",
    bench=34,
    survey="T1,T2,S1,S2",
    doc="The reference's continuous polling loop as a REAL streaming "
    "source (sources/pysource.py SqlCdcStreamReader): each micro-batch "
    "probes MAX(event_id) (the watermark probe, T2), slices the "
    "(last, max] delta with the sync engine's interval planner into "
    "range-partitioned SQL cursors against the stand-in engine, and "
    "streams Arrow batches; offsets ride the checkpoint, so restarts "
    "resume after the last committed batch. Drained with availableNow "
    "into a grouped aggregate the batch oracle states.",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events
    GROUP BY event_type
    """,
)
def t11_cdc_stream_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import functions as F

    from pypgsync_spark.sources.pysource import read_cdc_stream
    from pypgsync_spark.streaming.balance import (
        no_data_microbatches,
        stream_shuffle_partitions,
    )

    src = read_cdc_stream(
        spark, table_path(sf_dir, "events"), "event_id", num_partitions=4
    )
    agg = src.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )
    import os

    from pypgsync_spark.queries.syncq import _pid_scratch_dir

    # fresh checkpoint per call under a reaped pid-scoped parent (r10
    # review — same rationale as t8's work dir)
    parent = _pid_scratch_dir("t11_cdc_ck", sf_dir)
    os.makedirs(parent, exist_ok=True)
    ck = tempfile.mkdtemp(prefix="run_", dir=parent)
    # complete-mode agg: the trailing no-data cleanup batch re-emits
    # the identical table, so skip it (balance.no_data_microbatches)
    with stream_shuffle_partitions(spark, 8), no_data_microbatches(spark, False):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("t11_cdc_mem")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("t11_cdc_mem")


@register(
    "t12_stream_corpus_screen",
    bench=43,
    survey="§2.10 ext,ext:dedup",
    doc="Stream-static anti join (streaming/dedupe.py "
    "stream_corpus_screen): incoming documents (fresh doc_id % 10 == 0 "
    "plus re-crawls of every doc_id % 7 == 3 doc under id+1000000) "
    "stream against the STATIC corpus fingerprint set; only content "
    "the corpus lacks is emitted. Zero streaming state — the screen "
    "is a per-micro-batch join against the batch side; intra-stream "
    "collapse is deliberately left to the watermarked dedup (t9) "
    "downstream, so fresh docs and their own re-crawls both pass "
    "(which the oracle states).",
    oracle="""
    WITH fp AS (
      SELECT doc_id, n_chars,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
      FROM documents
    ),
    incoming AS (
      SELECT doc_id, n_chars, f FROM fp WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, n_chars, f
      FROM fp WHERE doc_id % 7 = 3
    )
    SELECT i.doc_id, i.n_chars FROM incoming i
    WHERE NOT EXISTS (
      SELECT 1 FROM fp c WHERE c.doc_id % 10 <> 0 AND c.f = i.f
    )
    """,
)
def t12_stream_corpus_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from pypgsync_spark.streaming.balance import _file_stream
    from pypgsync_spark.streaming.dedupe import stream_corpus_screen

    path = table_path(sf_dir, "documents")
    schema = spark.read.parquet(path).schema
    docs = _file_stream(spark, schema, path)
    fresh = docs.filter(F.col("doc_id") % 10 == 0)
    recrawl = docs.filter(F.col("doc_id") % 7 == 3).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000000)
    )
    corpus = spark.read.parquet(path).filter(F.col("doc_id") % 10 != 0)
    out = stream_corpus_screen(
        spark,
        fresh.unionByName(recrawl),
        corpus,
        query_name="t12_screen_mem",
    )
    return out.select("doc_id", "n_chars")


@register(
    "t13_stream_sliding_counts",
    bench=75,
    survey="T5,T3,§2.10 ext",
    doc="Streaming hopping (sliding) windows: per-type counts over "
    "2-hour windows sliding hourly, drained availableNow — the "
    "streaming twin of the a17 batch rollup, sharing its oracle "
    "(complete-mode drain over a bounded fixture computes the full "
    "result). State carries (window × type) partials — 2× a tumbling "
    "rollup's state, never raw events; the watermark bounds state "
    "retention in a live run.",
    oracle="""
    WITH e AS (SELECT epoch_ms(ts) AS ms, event_type FROM events),
    x AS (
      SELECT (ms // 3600000) * 3600000 - k * 3600000 AS win_start_ms, event_type
      FROM e, (SELECT unnest(range(0, 2)) AS k) g
    )
    SELECT win_start_ms, event_type, count(*) AS n
    FROM x GROUP BY win_start_ms, event_type
    """,
)
def t13_stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pypgsync_spark.streaming.balance import sliding_event_counts

    schema = _events_stream_source(spark, sf_dir)
    return sliding_event_counts(
        spark,
        source_path=table_path(sf_dir, "events"),
        schema=schema,
        query_name="t13_sliding_mem",
    )


@register(
    "t14_stream_enriched_rollup",
    bench=79,
    survey="T5,§2.3,§2.10 ext",
    doc="Stream-static broadcast enrichment: the event stream joins "
    "the static customer dimension (every fixture user_id is a "
    "custkey) per micro-batch — the join itself keeps NO state and "
    "re-resolves the static side each batch, so a dim refresh lands "
    "live — then a stateful rollup per (market segment, event type). "
    "State is bounded by segment × type cardinality, never events. "
    "The batch oracle states the same join + rollup.",
    oracle="""
    SELECT c_mktsegment, event_type, count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    """,
)
def t14_stream_enriched_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.streaming.balance import enriched_segment_rollup

    schema = _events_stream_source(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return enriched_segment_rollup(
        spark,
        source_path=table_path(sf_dir, "events"),
        schema=schema,
        dim=dim,
        query_name="t14_enriched_mem",
    )


@register(
    "pipe5_stream_curation",
    bench=122,
    survey="ext:quality,ext:dedup,§2.10 ext,T3,T4",
    doc="End-to-end STREAMING curation — the live-ingest twin of "
    "pipe4's batch pipeline, realizing the full contract "
    "streaming/dedupe.py documents: an at-least-once incoming crawl "
    "(fresh doc_id % 10 == 0 docs plus re-crawls of every "
    "doc_id % 7 == 3 doc under id+1000000, the t12 simulation, with "
    "EVERY row delivered twice) flows through (1) the Gopher "
    "structural-quality gate — map-only on the stream, pipe4's exact "
    "thresholds via THE shared gopher_metrics kernel, cheapest stage "
    "first so junk never reaches state — then (2) the stream-static "
    "corpus screen (anti join on the content fingerprint against the "
    "standing corpus; zero streaming state) and (3) watermarked "
    "content dedup (dropDuplicatesWithinWatermark on the fingerprint; "
    "state bounded by arrival rate x watermark delay, never corpus "
    "size). Output: one row per NOVEL passing fingerprint, carrying "
    "only fingerprint-DETERMINED attributes (normalized length, token "
    "count) — survivor identity under first-seen dedup is arrival-"
    "order-dependent, so doc-identity columns (doc_id, crawl_ts) stay "
    "out of the emitted row; that is what makes an exact batch oracle "
    "possible. Event time is the synthesized crawl_ts the fixture "
    "lacks (1 day + (doc_id % 97) hours — a real ingest has arrival "
    "time; the base day keeps it above Spark's INITIAL zero watermark, "
    "under which an epoch-0 event time is born late and silently "
    "dropped).",
    oracle=f"""
    WITH tkd AS (
      SELECT doc_id,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm,
             string_split_regex(lower(trim(text)), '\\s+') AS tk
      FROM documents
    ),
    m AS (
      SELECT doc_id, md5(norm) AS f,
             CAST(length(norm) AS BIGINT) AS norm_chars,
             CAST(len(tk) AS BIGINT) AS n_tokens,
             round(list_sum(list_transform(tk, w -> length(w))) * 1.0
                   / greatest(len(tk), 1), 6) AS mwl,
             round(len(list_filter(tk, w -> regexp_matches(w, '#|\\.\\.\\.'))) * 1.0
                   / greatest(len(tk), 1), 6) AS swr,
             round(len(list_filter(tk, w -> regexp_matches(w, '[a-z]'))) * 1.0
                   / greatest(len(tk), 1), 6) AS awf
      FROM tkd
    ),
    surv AS (
      SELECT DISTINCT f, norm_chars, n_tokens FROM m
      WHERE (doc_id % 10 = 0 OR doc_id % 7 = 3)
        AND {gopher_gate_sql()}
    )
    SELECT s.f AS fp, s.norm_chars, s.n_tokens
    FROM surv s
    WHERE NOT EXISTS (SELECT 1 FROM m c WHERE c.doc_id % 10 <> 0 AND c.f = s.f)
    """,
)
def pipe5_stream_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from pypgsync_spark.functions.text import (
        gopher_metrics,
        gopher_structural_gate,
        normalized_text,
        tokens,
    )
    from pypgsync_spark.streaming.balance import _file_stream
    from pypgsync_spark.streaming.dedupe import stream_ingest_curation

    path = table_path(sf_dir, "documents")
    schema = spark.read.parquet(path).schema

    docs = _file_stream(spark, schema, path)
    fresh = docs.filter(F.col("doc_id") % 10 == 0)
    recrawl = docs.filter(F.col("doc_id") % 7 == 3).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000000)
    )
    # deterministic at-least-once delivery: every row arrives twice,
    # synthesized from ONE file-stream source (ADVICE r11: a second
    # incoming() pair re-listed and re-scanned the same parquet path —
    # duplicating ROWS after one read halves the source cost; the
    # cross-BATCH duplicate shape stays covered by the curation
    # restart + cross-batch pytests)
    stream = (
        fresh.unionByName(recrawl)
        .withColumn("__dup", F.explode(F.array(F.lit(0), F.lit(1))))
        .drop("__dup")
    )

    # stage 1 — Gopher gate, map-only: token array aliased in its own
    # select (tx6 CollapseProject discipline), metrics from THE shared
    # kernel with pipe4's thresholds; fingerprint-determined attributes
    # (normalized length, token count) computed here, doc-identity
    # columns dropped before state
    tkd = stream.select(
        "doc_id", "text", tokens(F.col("text")).alias("tk")
    )
    gm = gopher_metrics(F.col("tk"))
    gated = (
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
            # 1 day + (doc_id % 97) hours — the base day keeps every
            # synthesized event-time STRICTLY ABOVE epoch 0: Spark
            # initializes the event-time watermark at 0 ms, so a row
            # whose event time is exactly epoch 0 is born late and
            # silently dropped by dropDuplicatesWithinWatermark (found
            # at sf0.1, where doc_ids 0/970/1940/... hit % 97 == 0;
            # pinned by the epoch-0 doc in the cross-batch pytest)
            F.timestamp_millis(
                F.lit(86400000) + (F.col("doc_id") % 97) * F.lit(3600000)
            ).alias("crawl_ts"),
        )
    )

    corpus = spark.read.parquet(path).filter(F.col("doc_id") % 10 != 0)
    out = stream_ingest_curation(
        spark,
        gated,
        corpus,
        text_col="text",
        ts_col="crawl_ts",
        watermark="30 days",
        query_name="pipe5_curation_mem",
    )
    return out.select(F.col("__fp").alias("fp"), "norm_chars", "n_tokens")


from pypgsync_spark.queries.vector import _duck_hyperplane_sig  # noqa: E402


@register(
    "pipe6_stream_semantic_screen",
    bench=126,
    survey="ext:similarity,ext:dedup,§2.10 ext",
    doc="Streaming SEMANTIC corpus screen — the embedding analogue of "
    "t12's exact-fingerprint screen, and the live-ingest half of "
    "SemDeDup. Incoming = novel vectors (vec_id % 10 == 0, as-is) "
    "plus RE-EMBEDDED near-duplicates (every vec_id % 7 == 3 corpus "
    "member with its first component shifted +0.25, re-tagged "
    "+1000000 — cos ≈ 0.99 against its original: the re-crawled-"
    "content simulation in embedding space, exact float arithmetic "
    "both engines share). Each incoming vector is hyperplane-LSH "
    "signed (seed-42 literal planes, 32 bits, map-only), exploded "
    "into 4×8-bit bands, and stream-static LEFT-joined against the "
    "corpus's LEAN band keys — (band, val, cand_id) only, embeddings "
    "never ride the stream shuffle. 8-bit bands put the probe in the "
    "correct LSH regime for a SCREEN: a random pair shares a band "
    "with p≈1.6% (candidates stay ~2% of the cross product) while a "
    "cos 0.99 near-dup is caught with p>99.9% — the first pipe6 cut "
    "used 2-bit bands, whose 90% candidate admission made the "
    "\"screen\" a disguised cross join at scale. The stream stage is "
    "entirely STATELESS (no watermark, no state store; plan-asserted); "
    "the verdict on the ~2% candidates is batch work on the drained "
    "rows (production: foreachBatch), scored by the exact-SEQUENTIAL "
    "vectorized cosine kernel (cosine_scores_seq — cumsum folds, "
    "bit-identical to list_dot_product, ~100× the interpreted HOF "
    "path the first cut paid). Output per incoming vector: candidate "
    "count, max exact cosine (-2 sentinel when no candidate), and "
    "the novel/duplicate decision at cos 0.9.",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    inc AS (
      SELECT vec_id, v FROM e WHERE vec_id % 10 = 0
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id,
             list_concat([v[1] + 0.25], v[2:]) AS v
      FROM e WHERE vec_id % 7 = 3 AND vec_id % 10 <> 0
    ),
    corp AS (SELECT vec_id, v FROM e WHERE vec_id % 10 <> 0),
    si AS (SELECT vec_id, v, {{sig}} AS sig FROM inc),
    sc AS (SELECT vec_id, v, {{sig}} AS sig FROM corp),
    bi AS (SELECT vec_id, v, band, (sig >> (8 * band)) & 255 AS val
           FROM si, (SELECT unnest(range(4)) AS band) b),
    bc AS (SELECT vec_id AS cand_id, v AS cv, band, (sig >> (8 * band)) & 255 AS val
           FROM sc, (SELECT unnest(range(4)) AS band) b),
    cand AS (
      SELECT DISTINCT l.vec_id, r.cand_id, l.v, r.cv
      FROM bi l JOIN bc r USING (band, val)
    ),
    scored AS (
      SELECT vec_id, cand_id,
             list_dot_product(v, cv)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)))
               AS cos
      FROM cand
    )
    SELECT i.vec_id,
           CAST(COUNT(s.cand_id) AS BIGINT) AS n_cand,
           round(coalesce(MAX(s.cos), -2.0), 6) AS max_cos,
           CAST(CASE WHEN MAX(s.cos) IS NULL OR MAX(s.cos) <= 0.9
                THEN 1 ELSE 0 END AS INT) AS is_novel
    FROM inc i LEFT JOIN scored s ON i.vec_id = s.vec_id
    GROUP BY i.vec_id
    """.replace("{sig}", _duck_hyperplane_sig("v", 32)),
)
def pipe6_stream_semantic_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from pypgsync_spark.operators.similarity import cosine_scores_seq
    from pypgsync_spark.streaming.balance import _file_stream, drain_to_memory
    from pypgsync_spark.streaming.dedupe import semantic_screen_stream

    emb_path = table_path(sf_dir, "embeddings")
    schema = spark.read.parquet(emb_path).schema

    def incoming_of(df: DataFrame) -> DataFrame:
        """novel + perturbed re-crawl, from ONE source (works on the
        stream and, re-applied to the batch read, reconstructs the
        same vectors for post-drain scoring)."""
        as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
        novel = df.filter(F.col("vec_id") % 10 == 0).select(
            "vec_id", as_double.alias("embedding")
        )
        pert = F.concat(
            F.array(
                F.element_at(F.col("embedding"), 1).cast("double") + F.lit(0.25)
            ),
            F.transform(
                F.slice(
                    F.col("embedding"), 2, F.size(F.col("embedding")) - 1
                ),  # dimension-agnostic, like the oracle's v[2:]
                lambda x: x.cast("double"),
            ),
        )
        recrawl = df.filter(
            (F.col("vec_id") % 7 == 3) & (F.col("vec_id") % 10 != 0)
        ).select(
            (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
            pert.alias("embedding"),
        )
        return novel.unionByName(recrawl)

    corpus = spark.read.parquet(emb_path).filter(F.col("vec_id") % 10 != 0)
    drained = drain_to_memory(
        spark,
        semantic_screen_stream(
            incoming_of(_file_stream(spark, schema, emb_path)),
            corpus,
            nbits=32,
            bands=4,
        ),
        "pipe6_screen_mem",
        output_mode="append",
    )

    # batch verdict on the drained screen rows: collapse multi-band
    # hits, score the ~2% candidates with the exact-sequential kernel,
    # decide at cos 0.9
    inc_vecs = incoming_of(spark.read.parquet(emb_path))
    pairs = (
        drained.filter(F.col("cand_id").isNotNull())
        .select("vec_id", "cand_id")
        .dropDuplicates(["vec_id", "cand_id"])
    )
    with_vecs = pairs.join(
        corpus.select(
            F.col("vec_id").alias("cand_id"),
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("cv"),
        ),
        on="cand_id",
    ).join(inc_vecs.select("vec_id", F.col("embedding").alias("v")), on="vec_id")
    scored = cosine_scores_seq(with_vecs, "v", "cv")
    # the agg side re-derives from the same memory-sink view as base;
    # a fresh key name sidesteps the self-join attribute conflict
    agg = (
        scored.groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("nc"), F.max("cos").alias("mc"))
        .withColumnRenamed("vec_id", "vec_id_r")
    )
    base = drained.select("vec_id").dropDuplicates(["vec_id"])
    return base.join(
        agg, on=base["vec_id"] == agg["vec_id_r"], how="left"
    ).select(
        "vec_id",
        F.coalesce(F.col("nc"), F.lit(0)).cast("long").alias("n_cand"),
        F.round(F.coalesce(F.col("mc"), F.lit(-2.0)), 6).alias("max_cos"),
        F.when(F.col("mc").isNull() | (F.col("mc") <= 0.9), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_novel"),
    )


from pypgsync_spark.queries.textops import _DUCK_PH_SIG_CHAIN  # noqa: E402


@register(
    "pipe7_cross_modal_screen",
    bench=130,
    survey="ext:quality,ext:multimodal,ext:dedup,§2.10 ext",
    doc="CROSS-MODAL streaming curation (r13 verdict #7): the text "
    "gate (pipe5's stage 1 — the shared Gopher kernel with pipe4's "
    "product-constant thresholds) and the image near-dup screen "
    "(mm10's stateless band screen) composed over the SAME document "
    "stream in ONE availableNow pipeline — the stream is read once "
    "and flows gate → screen as chained stateless stages feeding a "
    "single sink, so the two modalities are screened without "
    "double-materializing the source (the composition proof the two "
    "standalone screens don't give). Incoming = doc_id % 10 == 0; the "
    "map-only gate drops junk BEFORE any image work (cheapest stage "
    "first — at 100 TB the decode is the cost, so gate placement is "
    "the scale decision), survivors' images ride mm9's real "
    "container-decode dHash chain into the stream-static band join "
    "against the persisted corpus band table. Per passing doc: token "
    "count (gate leg) + match count / best hamming / novelty (image "
    "leg), the per-incoming verdict being batch work on the drained "
    "rows as in mm10. The oracle restates BOTH legs end-to-end: "
    "tokenize → Gopher gate → md5 pixels → dHash bands → bucket join "
    "→ hamming → verdict.",
    oracle=f"""
    {_DUCK_PH_SIG_CHAIN}
    tkd7 AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
      FROM documents WHERE doc_id % 10 = 0
    ),
    g7 AS (
      SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
             round(list_sum(list_transform(tk, w -> length(w))) * 1.0
                   / greatest(len(tk), 1), 6) AS mwl,
             round(len(list_filter(tk, w -> regexp_matches(w, '#|\\.\\.\\.'))) * 1.0
                   / greatest(len(tk), 1), 6) AS swr,
             round(len(list_filter(tk, w -> regexp_matches(w, '[a-z]'))) * 1.0
                   / greatest(len(tk), 1), 6) AS awf
      FROM tkd7
    ),
    inc AS (SELECT doc_id, n_tokens FROM g7 WHERE {gopher_gate_sql()}),
    cand AS (
      SELECT DISTINCT a.doc_id AS in_id, b.doc_id AS cand_id
      FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv
      WHERE a.doc_id IN (SELECT doc_id FROM inc) AND b.doc_id % 10 <> 0
    ),
    ham AS (
      SELECT c.in_id, c.cand_id,
             bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
           + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
             AS hamming
      FROM cand c
      JOIN sig sa ON c.in_id = sa.doc_id
      JOIN sig sb ON c.cand_id = sb.doc_id
    ),
    hits AS (
      SELECT in_id, count(*) AS nm, min(hamming) AS bh
      FROM ham WHERE hamming <= 3 GROUP BY in_id
    )
    SELECT i.doc_id, i.n_tokens,
           CAST(coalesce(h.nm, 0) AS BIGINT) AS n_matches,
           CAST(coalesce(h.bh, -1) AS INT) AS best_hamming,
           CAST(CASE WHEN h.nm IS NULL THEN 1 ELSE 0 END AS INT) AS is_novel
    FROM inc i LEFT JOIN hits h ON i.doc_id = h.in_id
    """,
)
def pipe7_cross_modal_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from pypgsync_spark.functions.text import (
        gopher_metrics,
        gopher_structural_gate,
        tokens,
    )
    from pypgsync_spark.streaming.balance import _file_stream, drain_to_memory
    from pypgsync_spark.streaming.dedupe import image_screen_stream

    path = table_path(sf_dir, "documents")
    schema = spark.read.parquet(path).schema

    def gate(df: DataFrame) -> DataFrame:
        """pipe5's stage-1 shape: token array aliased in its own
        select (tx6 CollapseProject discipline), metrics from THE
        shared kernel — applied to the stream side only."""
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
            .select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"))
        )

    # ONE stream: gate -> image screen, chained stateless stages into
    # a single sink (no second listing/scan of the source)
    corpus = spark.read.parquet(path).filter(F.col("doc_id") % 10 != 0)
    drained = drain_to_memory(
        spark,
        image_screen_stream(
            gate(_file_stream(spark, schema, path)), corpus, max_hamming=3
        ),
        "pipe7_cross_mem",
        output_mode="append",
    )

    # batch verdict on the drained screen rows — THE shared verdict
    # (textops._screen_verdict, one copy with mm10/mm12; r14 review:
    # this carried a third line-for-line copy) — then n_tokens from a
    # LEAN batch projection (r14 optimization round, guide §1.2 "don't
    # compute things you throw away"): the drained rows exist only for
    # stream-GATED docs, so the inner join on doc_id already enforces
    # the gate — re-running the three regex metric HOFs and the gate
    # filter on the batch read recomputed a filter the join discards
    # (measured 0.7-0.9 s vs 0.2 s warm at sf0.1 for the batch leg);
    # gopher_metrics' n_words IS size(tokens), so the lean projection
    # is value-identical
    from pypgsync_spark.queries.textops import _screen_verdict

    n_tok = (
        spark.read.parquet(path)
        .filter(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id",
            F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
    )
    return (
        _screen_verdict(drained, max_hamming=3)
        .join(n_tok, on="doc_id")
        .select("doc_id", "n_tokens", "n_matches", "best_hamming", "is_novel")
    )
