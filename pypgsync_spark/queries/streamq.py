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
from pypgsync_spark.queries import register
from pypgsync_spark.streaming.balance import streaming_balance, windowed_event_counts


def _events_stream_source(spark: SparkSession, sf_dir: str):
    """Raw file schema for the events streaming source (file streaming
    sources need an explicit schema; ts arrives as nanos BIGINT and is
    normalized inside the streaming transforms)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
