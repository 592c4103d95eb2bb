"""Transition-gated contributions: the reference's trigger semantics,
exactly.

The reference's ``user_balance`` trigger (reference README.md:157-198)
adds ``NEW.amount`` when a row *transitions into* the qualifying state
(insert trigger gate README.md:179-183; update trigger gate
README.md:191-197: OLD not qualifying AND NEW qualifying) — each
transaction contributes exactly once, on its first qualifying version,
and later updates do not re-add (an acknowledged approximation of the
reference design).

``t5``'s ``dropDuplicates(event_id)`` gate is correct when version 1 of
a row is already qualifying, but keeps the FIRST-SEEN version of each
id — so an id whose v1 is non-qualifying and v2 qualifies would never
contribute. This module implements the exact gate as a custom stateful
operator: ``applyInPandasWithState`` keyed by event id, one boolean of
state per id ("has contributed"), emitting a (user_id, value)
contribution row on the first qualifying version only.

Scale notes: state is one boolean per event id — at 100 TB that is the
RocksDB state store (``spark.sql.streaming.stateStore.providerClass``),
and ids age out of state via a processing-time timeout once their
source retention window passes (not set here: the fixture is bounded).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pypgsync_spark.catalog import ensure_events_ts
from pypgsync_spark.streaming.balance import _file_stream

CONTRIB_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("contributed", T.BooleanType())])


def _gate(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit the first qualifying version of this event id, ever.

    Rows within a batch are scanned in event-time order (a batch may
    carry several versions of the id); the state boolean carries the
    once-only guarantee across batches and restarts (checkpointed).
    """
    contributed = state.get[0] if state.exists else False
    out = []
    if not contributed:
        # A key's rows within a batch may span several Arrow chunks in
        # arbitrary order — concatenate ALL of them and sort once, or
        # the emitted contribution may not be the earliest-ts
        # qualifying version (diverging from the reference trigger).
        chunks = list(pdfs)
        pdf = pd.concat(chunks) if chunks else pd.DataFrame()
        if len(pdf):
            qual = pdf[pdf["qualifying"]].sort_values("ts", kind="mergesort")
            if len(qual):
                first = qual.iloc[0]
                out.append(
                    pd.DataFrame(
                        {
                            "event_id": [key[0]],
                            "user_id": [first["user_id"]],
                            "value": [float(first["value"])],
                        }
                    )
                )
                contributed = True
        state.update((contributed,))
    else:
        # drain the iterator (required by the contract) without work
        for _ in pdfs:
            pass
    return iter(out)


def gated_contributions_stream(
    src: DataFrame,
    blocked: str = "error",
) -> DataFrame:
    """Wire the gate over a streaming events DataFrame → append-mode
    stream of (event_id, user_id, value) contribution rows."""
    tagged = src.select(
        "event_id",
        "user_id",
        "value",
        # micros, not cast("long") (which floors to SECONDS and would
        # tie-break same-second versions arbitrarily)
        F.unix_micros(F.col("ts")).alias("ts"),
        (F.col("event_type") != blocked).alias("qualifying"),
    )
    return tagged.groupBy("event_id").applyInPandasWithState(
        _gate,
        outputStructType=CONTRIB_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def gated_balance(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    contrib_dir: str,
    checkpoint_dir: str,
    state_partitions: int | str | None = "auto",
) -> DataFrame:
    """Run the transition-gated contribution stream into a parquet
    contribution log (drain-and-stop, checkpointed — resumable across
    runs like the reference's continuous mode), then aggregate the
    cumulative per-user balances batch-side.

    Chaining the stateful gate directly into a streaming groupBy-sum
    would be a second stateful operator in the same query; the
    append-log + batch-sum split keeps each stage in its supported
    output mode. The contribution log is written one epoch_id-named
    subdirectory per epoch in OVERWRITE mode: foreachBatch is
    at-least-once (gate state rolls back with a failed epoch and a
    replayed epoch re-emits), so a plain append could double-write an
    epoch whose files landed before the checkpoint commit — per-epoch
    overwrite makes the replay idempotent.
    """
    src = ensure_events_ts(_file_stream(spark, schema, source_path))
    contrib = gated_contributions_stream(src)

    def append_contribs(batch: DataFrame, epoch_id: int) -> None:
        if not batch.isEmpty():
            batch.write.mode("overwrite").parquet(f"{contrib_dir}/epoch={epoch_id}")

    from pypgsync_spark.streaming.balance import stream_shuffle_partitions

    with stream_shuffle_partitions(spark, state_partitions):
        q = (
            contrib.writeStream.foreachBatch(append_contribs)
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    import os

    if not os.path.isdir(contrib_dir):
        # no epoch emitted anything (empty / fully-blocked source)
        contrib_empty = spark.createDataFrame([], CONTRIB_SCHEMA)
        return contrib_empty.groupBy("user_id").agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("balance"),
            F.count(F.lit(1)).alias("n_events"),
        )
    return (
        spark.read.parquet(contrib_dir)
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("balance"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
