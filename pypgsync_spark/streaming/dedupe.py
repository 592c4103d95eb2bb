"""Streaming deduplication with bounded state.

The batch dedup layer (operators/dedup.py) assumes a bounded input; a
continuous ingest pipeline needs the streaming form. Plain
``dropDuplicates`` on a stream keeps every seen key in the state store
forever — unbounded state, the classic slow-death of a 100 TB ingest
job. ``dropDuplicatesWithinWatermark`` holds a key only until the
event-time watermark passes it: state is bounded by (arrival rate ×
watermark delay), the correct contract when duplicates arrive close
together (retries, at-least-once sources — exactly the sync engine's
JDBC/file ingest profile).

This is the streaming complement of the sync merge: the merge makes
re-delivery idempotent at rest; watermarked dedup makes it cheap in
flight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pypgsync_spark.catalog import ensure_events_ts
from pypgsync_spark.streaming.balance import _file_stream


def dedup_within_watermark(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    id_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "2 days",
    duplicate_input: bool = True,
    query_name: str = "stream_dedup",
    state_partitions: int | str | None = "auto",
) -> DataFrame:
    """Run watermarked streaming dedup over the events files and return
    the drained (deduplicated) rows from the memory sink.

    ``duplicate_input=True`` unions the file stream with a second read
    of the same files — a deterministic at-least-once-delivery
    simulation: every row arrives exactly twice, and the dedup must
    emit it exactly once.
    """
    src = ensure_events_ts(_file_stream(spark, schema, source_path), event_time=True)
    if duplicate_input:
        dup = ensure_events_ts(_file_stream(spark, schema, source_path), event_time=True)
        src = src.unionByName(dup)
    deduped = src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )
    from pypgsync_spark.streaming.balance import drain_to_memory

    return drain_to_memory(
        spark,
        deduped,
        query_name,
        state_partitions=state_partitions,
        output_mode="append",
    )


def stream_corpus_screen(
    spark: SparkSession,
    stream: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    query_name: str = "stream_corpus_screen",
    state_partitions: int | str | None = "auto",
) -> DataFrame:
    """Stream-STATIC anti join: emit only stream rows whose content
    fingerprint is absent from the standing ``corpus`` (a batch
    DataFrame). The streaming face of
    operators/incremental.incremental_dedup_exact's corpus screen —
    each micro-batch joins against the static side with zero state
    (Spark re-plans the static side per batch; at deploy scale the
    corpus fingerprints are a bucketed table, so the per-batch join is
    a no-shuffle bucket probe). Intra-stream duplicates are NOT
    collapsed here — that is ``dedup_within_watermark``'s job
    downstream, with its bounded state; composing screen → watermarked
    dedup gives the full streaming ingest-dedup contract.

    Drains via availableNow into a memory sink and returns the result.
    """
    from pypgsync_spark.functions.text import content_fingerprint
    from pypgsync_spark.streaming.balance import drain_to_memory

    fp = content_fingerprint(text_col)
    screened = stream.withColumn("__fp", fp).join(
        corpus.select(fp.alias("__fp")), on="__fp", how="left_anti"
    ).drop("__fp")
    return drain_to_memory(
        spark,
        screened,
        query_name,
        state_partitions=state_partitions,
        output_mode="append",
    )


def stream_ingest_curation(
    spark: SparkSession,
    stream: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    ts_col: str = "crawl_ts",
    watermark: str = "30 days",
    query_name: str = "stream_ingest_curation",
    state_partitions: int | str | None = "auto",
) -> DataFrame:
    """The full streaming ingest-dedup contract this module's docstring
    promises, composed: corpus screen (stream-STATIC anti join on the
    content fingerprint — zero state, per-batch probe of the standing
    corpus) THEN watermarked content dedup
    (``dropDuplicatesWithinWatermark`` keyed on the fingerprint —
    state bounded by arrival rate × watermark delay). Screen-first is
    the scale order: content the corpus already holds never enters the
    dedup state store. The caller applies its quality gate upstream
    (map-only, cheapest first) and must provide an event-time column
    ``ts_col`` for the watermark. The raw text is dropped once
    fingerprinted — only the fingerprint and caller-selected
    fingerprint-determined attributes ride through the state store and
    the sink.

    Drains via availableNow into an append-mode memory sink and
    returns the drained rows (one per novel fingerprint).
    """
    from pypgsync_spark.streaming.balance import drain_to_memory

    return drain_to_memory(
        spark,
        curation_stream(stream, corpus, text_col, ts_col, watermark),
        query_name,
        state_partitions=state_partitions,
        output_mode="append",
    )


def curation_stream(
    stream: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    ts_col: str = "crawl_ts",
    watermark: str = "30 days",
) -> DataFrame:
    """:func:`stream_ingest_curation`'s composition, un-drained —
    screen (stateless anti join) then watermarked fingerprint dedup
    (the ONE stateful operator). Exposed separately so the plan-shape
    pytest can assert exactly that on the analyzed streaming plan, and
    so deployments can attach their own sink."""
    from pypgsync_spark.functions.text import content_fingerprint

    fp = content_fingerprint(text_col)
    screened = (
        stream.withColumn("__fp", fp)
        .drop(text_col)
        .join(corpus.select(fp.alias("__fp")), on="__fp", how="left_anti")
    )
    return screened.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["__fp"]
    )


# single-slot cache for the corpus band table (the _PH_BANDS_CACHE /
# _SHINGLE_CACHE convention): at most one live copy per process
_CORPUS_BANDS_CACHE: list = []


def semantic_screen_stream(
    stream: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    nbits: int = 32,
    bands: int = 4,
) -> DataFrame:
    """Streaming SEMANTIC corpus screen — the embedding analogue of
    :func:`stream_corpus_screen`'s exact-fingerprint anti join: for
    each incoming vector, find its hyperplane-LSH candidate neighbors
    in the standing corpus. Entirely STATELESS streaming: a map-only
    signature (``nbits`` literal-plane dot products, the v2b seed-42
    planes), a ×``bands`` explode, and a stream-STATIC left outer
    equi-join on (band, value) against the corpus's LEAN band keys —
    (band, val, candidate id) only; embeddings do NOT ride the shuffle
    (the d3 band-table discipline). No watermark, no state store: the
    join re-probes the static side per micro-batch, so corpus growth
    costs a re-plan, never streaming state.

    Emits one row per (incoming id, band, candidate id) — candidate id
    NULL when a band finds nothing. The cosine verdict (exact scoring
    of the few candidates, novel/duplicate decision) is per-batch
    BATCH work downstream — in production inside ``foreachBatch``,
    here on the drained result — because a per-key aggregate in-stream
    would reintroduce state for what is a pure screen.

    ``bands`` × (nbits // bands)-bit banding: any pair whose
    signatures agree on some band becomes a candidate. The 4×8-bit
    default is the SCREEN regime: a random pair shares a band with
    p ≈ 1.6% (candidates stay ~2% of the cross product) while a
    cos ≈ 0.99 near-duplicate is caught with p > 99.9% — 2-bit bands
    were tried first and admit ~90% of ALL pairs, which makes the
    "screen" a disguised cross join at scale. Recall tuning happens
    at this seam (more bits per band = stricter).
    """
    from pyspark.sql import functions as F

    from pypgsync_spark.operators.similarity import hyperplane_signatures_seq

    if nbits % bands:
        raise ValueError(f"bands ({bands}) must divide nbits ({nbits})")
    width = nbits // bands
    mask = (1 << width) - 1

    def banded(df: DataFrame, out_id: str) -> DataFrame:
        # signatures via the vectorized sequential kernel — the Column
        # HOF form pays nbits interpreted folds PER ROW and was
        # measured as pipe6's bottleneck (2.6 s to sign an 1,800-row
        # corpus); bit-identical swap (similarity.py docstring)
        s = hyperplane_signatures_seq(
            df, id_col=id_col, vec_col=vec_col, dim=dim, nbits=nbits
        )
        return (
            s.select(F.col(id_col).alias(out_id), F.col("sig").alias("__sig"))
            .select(
                out_id,
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(b).alias("band"),
                                F.shiftrightunsigned(F.col("__sig"), width * b)
                                .bitwiseAND(F.lit(mask))
                                .alias("val"),
                            )
                            for b in range(bands)
                        ]
                    )
                ).alias("bk"),
            )
            .select(out_id, F.col("bk.band").alias("band"), F.col("bk.val").alias("val"))
        )

    stream_bands = banded(stream, "vec_id_in")
    # ADVICE r12: a stream-static join re-evaluates the static side on
    # EVERY micro-batch, so without a cache the whole corpus is
    # re-signed per batch — invisible in an availableNow drain, a
    # linear-in-batches tax in a continuous run. Persist the lean band
    # table (3 small columns, the expensive signing paid once per
    # corpus version) under the single-slot convention dhash_near_pairs
    # uses (operators/multimodal.py _PH_BANDS_CACHE): at most one live
    # copy per process, the previous one released on the next call.
    from pypgsync_spark.operators.multimodal import single_slot_persist

    corpus_bands = single_slot_persist(
        _CORPUS_BANDS_CACHE, banded(corpus, "cand_id")
    )
    return stream_bands.join(corpus_bands, on=["band", "val"], how="left_outer").select(
        F.col("vec_id_in").alias(id_col), "band", "cand_id"
    )


# single-slot cache for the corpus IMAGE band table (same convention)
_IMG_BANDS_CACHE: list = []

# the audio screen's own corpus slot (dhash_near_pairs's cache rule:
# signature families scope their slot, they don't share one)
_AUD_SCREEN_BANDS_CACHE: list = []


def banded_screen_stream(
    stream_docs: DataFrame,
    corpus_docs: DataFrame,
    signer,
    cache: list,
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """THE stateless banded-signature corpus screen, signer-generic —
    one copy of the stream-vs-standing-corpus geometry that
    :func:`image_screen_stream` (perceptual dHash) and
    :func:`audio_screen_stream` (energy-envelope fingerprint) share
    (the dhash_band_explode lesson: two drifting copies of a shared
    geometry defeat the shared oracle fragment).

    ``signer(docs) -> (doc_id, b0..b3)`` produces the modality's
    64-bit signature as PH_BANDS 16-bit band values; everything after
    the signer is modality-blind. Entirely STATELESS streaming, the
    :func:`semantic_screen_stream` shape: per incoming row one
    Arrow-batched signer map stage, a ×PH_BANDS explode into (band
    index, band value) keys, and a stream-STATIC left outer equi-join
    against the corpus's PERSISTED band table — payloads never ride
    the stream shuffle; the corpus side carries only (band key,
    candidate id, four 16-bit signature bands), and its decode is paid
    once per corpus version (``cache`` = the family's single slot),
    not once per micro-batch. The exact hamming verify is a map-only
    ``bit_count(xor)`` on the joined row; the per-incoming aggregate
    (match count / best hamming / novelty) is batch work on the
    drained rows (production: foreachBatch) — a per-key aggregate
    in-stream would reintroduce state for a pure screen.

    By the pigeonhole argument (operators/multimodal.dhash_near_pairs):
    any corpus signature within hamming PH_BANDS - 1 = 3 of an
    incoming one shares at least one full band, so the bucket join
    finds ALL near-duplicates at radius ``max_hamming`` ≤ 3 with ONE
    shuffle and no cross join. Emits (incoming id, candidate id,
    hamming) — one row per shared band (the post-drain aggregate
    collapses multiplicity), candidate NULL when a band bucket is
    empty.

    ``max_hamming`` is a COMPLETENESS guard only: it validates that
    the caller's intended radius is within what the banding
    guarantees; the emitted rows carry the raw hamming of every
    shared-band candidate, and the radius cut belongs to the caller's
    verdict step. Filtering in-stream would be wrong here: a doc whose
    only shared-band candidates exceed the radius would lose ALL its
    rows and silently vanish from the novelty verdict, since
    left-outer NULLs are only produced for EMPTY buckets.
    """
    from pyspark.sql import functions as F

    from pypgsync_spark.operators.multimodal import (
        PH_BANDS,
        dhash_band_explode,
        single_slot_persist,
    )

    if max_hamming > PH_BANDS - 1:
        raise ValueError(
            f"band-LSH only guarantees radius {PH_BANDS - 1} with {PH_BANDS} bands"
        )

    def banded(df: DataFrame, id_out: str, p: str) -> DataFrame:
        e = dhash_band_explode(signer(df))
        return e.select(
            F.col("doc_id").alias(id_out),
            *[F.col(f"b{b}").alias(f"{p}{b}") for b in range(PH_BANDS)],
            "bi",
            "bv",
        )

    stream_bands = banded(stream_docs, "in_id", "s")
    corpus_bands = single_slot_persist(cache, banded(corpus_docs, "cand_id", "c"))

    hamming = sum(
        F.bit_count(F.col(f"s{b}").bitwiseXOR(F.col(f"c{b}")))
        for b in range(PH_BANDS)
    )
    return (
        stream_bands.join(corpus_bands, on=["bi", "bv"], how="left_outer")
        .select(
            F.col("in_id").alias(id_col),
            "bi",
            "cand_id",
            F.when(F.col("cand_id").isNotNull(), hamming)
            .cast("int")
            .alias("hamming"),
        )
    )


def image_screen_stream(
    stream_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Streaming MULTIMODAL corpus screen — live image ingest near-dup'd
    against a standing corpus: mm9's perceptual-hash chain
    (operators/multimodal.py: real container decode → integer dHash →
    4×16-bit bands) as the stream side of :func:`banded_screen_stream`
    (see it for the statelessness, persisted-corpus, and pigeonhole
    completeness arguments). Reference parity: the reference has no
    media pipeline at all (540-LoC SQLAlchemy sync CLI); this is
    extension-layer capability for a pretraining ingest."""
    from pypgsync_spark.operators.multimodal import (
        image_dhash_bands,
        with_neardup_image_payload,
    )

    return banded_screen_stream(
        stream_docs,
        corpus_docs,
        lambda df: image_dhash_bands(
            with_neardup_image_payload(df, id_col=id_col)
        ),
        _IMG_BANDS_CACHE,
        id_col=id_col,
        max_hamming=max_hamming,
    )


def audio_screen_stream(
    stream_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Streaming AUDIO ingest screen — mm11's energy-envelope
    fingerprint chain (operators/multimodal.py: real RIFF/WAVE decode
    → integer frame energies → 64 circular comparison bits → 4×16-bit
    bands) as the stream side of :func:`banded_screen_stream`,
    completing the modality matrix (image: mm9 batch pairs + mm10
    stream screen; audio: mm11 batch pairs + this). Same geometry,
    same pigeonhole completeness at radius 3, own corpus slot."""
    from pypgsync_spark.operators.multimodal import (
        audio_fingerprint_bands,
        with_neardup_audio_payload,
    )

    return banded_screen_stream(
        stream_docs,
        corpus_docs,
        lambda df: audio_fingerprint_bands(
            with_neardup_audio_payload(df, id_col=id_col)
        ),
        _AUD_SCREEN_BANDS_CACHE,
        id_col=id_col,
        max_hamming=max_hamming,
    )


# the video screen's own corpus-band slot (modalities scope, not
# share — all three screens may run in one composed pipeline)
_VID_SCREEN_BANDS_CACHE: list = []


def video_screen_stream(
    stream_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Streaming VIDEO ingest screen — mm13's luma-envelope fingerprint
    chain (operators/multimodal.py: real YUV4MPEG2 container decode →
    per-frame integer Y-block sums → 64 circular comparison bits →
    4×16-bit bands) as the stream side of
    :func:`banded_screen_stream`, closing the 3×2 modality matrix
    (image mm9/mm10, audio mm11/mm12, video mm13/this). Same geometry,
    same pigeonhole completeness at radius 3, own corpus slot."""
    from pypgsync_spark.operators.multimodal import (
        video_fingerprint_bands,
        with_neardup_video_payload,
    )

    return banded_screen_stream(
        stream_docs,
        corpus_docs,
        lambda df: video_fingerprint_bands(
            with_neardup_video_payload(df, id_col=id_col)
        ),
        _VID_SCREEN_BANDS_CACHE,
        id_col=id_col,
        max_hamming=max_hamming,
    )
