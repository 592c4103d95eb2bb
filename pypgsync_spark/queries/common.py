"""Shared query-closure helpers (r12 consolidation; r10 verdict #2).

One home for the decimal-exact aggregate contract and the events
fixture plumbing that core.py / joins.py / syncq.py each re-stated
since r5. Centralizing them pins the float policy in ONE place:

- ``dsum``: every float SUM in the catalog goes through
  ``decimal(18,2)`` then casts back to double, so Spark's partial-agg
  reassociation cannot diverge from DuckDB's serial summation (the
  oracle hash compare is exact). Changing this function re-stales
  every dependent query's fingerprint — which is precisely the point:
  the contract cannot drift silently anymore.
- ``MS_JAN*``: UTC-midnight epoch-millis boundaries of the events
  fixture (2024-01-01..01-30), shared by range predicates on both the
  Spark and oracle sides. Constants fingerprint by VALUE
  (fingerprint.py `_const_payload`), so referencing them from here is
  hash-identical to the old per-module copies.
- ``events`` / ``events_ms``: the canonical events load —
  ``catalog.load_table`` (nanos normalization + UTC pinning, the
  CLAUDE.md rule) plus the epoch-millis projection the sync/watermark
  queries key on (reference session.py:57-64 watermark compare).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypgsync_spark.catalog import load_table
from pypgsync_spark.functions.time import to_millis

# Epoch-millis constants (UTC midnights; events span 2024-01-01..01-30)
MS_JAN01 = 1704067200000
MS_JAN05 = 1704412800000
MS_JAN10 = 1704844800000  # delta low watermark (syncq)
MS_JAN20 = 1705708800000  # stale-destination high cutoff (syncq)


def dsum(col: F.Column) -> F.Column:
    """Decimal-exact sum -> double (bit-stable vs the DuckDB oracle)."""
    return F.sum(col.cast("decimal(18,2)")).cast("double")


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def events_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events(spark, sf_dir).withColumn("updated_ms", to_millis("ts"))
