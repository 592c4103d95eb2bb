"""Transition gate on the transformWithState API (Spark 4).

Same semantics as ``streaming/gated.py`` (the reference's trigger:
each event id contributes its value exactly once, on its first
QUALIFYING version — README.md:157-198), re-expressed on Structured
Streaming's arbitrary-stateful-processing successor API
(``transformWithStateInPandas``). What the new API buys at 100 TB:

- state is DECLARED (``getValueState`` with a schema), not packed into
  a single tuple the way ``applyInPandasWithState`` requires — the
  state store can evolve schemas and compose multiple variables;
- native per-state TTL (``ttlDurationMs``) replaces the hand-rolled
  expiry bookkeeping of the old gate: ids unseen past the TTL fall
  out of the store without a timeout dance;
- timers / initial state / multiple state variables are available to
  grow the operator (e.g. per-id version history) without re-plumbing.

Keying: the processor keys on ``event_id`` directly — the new runtime
owns the per-key loop, so the old API's manual bucket-vectorization
trick is unnecessary for correctness; the bucket variant remains the
higher-throughput choice when Python-crossing dominates.

SANDBOX GATE: the transformWithState Python runtime speaks protobuf to
the JVM state server (``pyspark.sql.streaming.proto.StateMessage_pb2``)
and ``google.protobuf`` is not installed in this container, so the
operator cannot EXECUTE here (verified: the streaming Python runner
exits -2 importing the proto module). :data:`HAS_TWS_RUNTIME` reports
availability; the pytest coverage skips without it and the catalog
deliberately registers no query for it — ``streaming/gated.py``
(applyInPandasWithState, protobuf-free) remains the executable gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pypgsync_spark.catalog import ensure_events_ts
from pypgsync_spark.streaming.balance import (
    _file_stream,
    state_store_provider,
    stream_shuffle_partitions,
)

def _tws_runtime_available() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


HAS_TWS_RUNTIME = _tws_runtime_available()

CONTRIB_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


class _GateProcessor:
    """StatefulProcessor: one boolean ValueState per event id."""

    def __init__(self, ttl_ms: int | None):
        self._ttl_ms = ttl_ms

    def init(self, handle):
        self._seen = handle.getValueState(
            "seen", "flag boolean", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        if self._seen.exists():
            # refresh-on-touch (r10 review): re-writing the flag resets
            # the native TTL, matching gated.py's retention model — an
            # id stays in the contributed set while it keeps arriving;
            # without this the TTL runs from FIRST contribution and a
            # still-live id re-contributes when it expires.
            self._seen.update((True,))
            return iter([])
        chunks = [pdf for pdf in rows if len(pdf)]
        if not chunks:
            return iter([])
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        # earliest-ts qualifying version, stable sort — gated.py:117's
        # exact semantics (r10 review: Arrow chunk order is arbitrary,
        # so emitting the first row seen was nondeterministic when one
        # batch carried two qualifying versions of an id)
        first = pdf.sort_values("ts", kind="mergesort").iloc[[0]][
            ["event_id", "user_id", "value"]
        ]
        self._seen.update((True,))
        return iter([first])

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter([])

    def handleInitialState(self, key, initialState, timerValues):
        pass

    def close(self):
        pass


def gated_balance_tws(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    checkpoint_dir: str,
    blocked: str = "error",
    ttl_ms: int | None = None,
    state_partitions: int | str | None = "auto",
    store_provider: str | None = None,
    query_name: str = "gated_tws_mem",
) -> DataFrame:
    """Drain the transformWithState gate over the events stream into a
    memory sink, then aggregate per-user balances batch-side (same
    two-step shape as :func:`streaming.gated.gated_balance` and for the
    same reason: the gate's output is an append stream of
    contributions; the cumulative balance is a batch aggregate over
    the contribution log)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass dynamically so the module imports even on a Spark
    # without the API (import-try discipline); isinstance checks in
    # the runtime want a real StatefulProcessor
    proc_cls = type("GateProcessor", (StatefulProcessor,), dict(_GateProcessor.__dict__))
    src = ensure_events_ts(_file_stream(spark, schema, source_path), event_time=True)
    qualifying = src.filter(F.col("event_type") != blocked).select(
        "event_id",
        "user_id",
        "value",
        # micros, not cast("long") — same tie-break resolution as
        # gated.py:231; the gate sorts on this to emit the EARLIEST
        # qualifying version deterministically
        F.unix_micros(F.col("ts")).alias("ts"),
    )
    contrib = qualifying.groupBy("event_id").transformWithStateInPandas(
        statefulProcessor=proc_cls(ttl_ms),
        outputStructType=CONTRIB_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
    )
    with stream_shuffle_partitions(spark, state_partitions), state_store_provider(
        spark, store_provider
    ):
        q = (
            contrib.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(query_name)
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("balance"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
