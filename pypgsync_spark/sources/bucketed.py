"""Bucketed destination tables — co-located incremental merge.

The 100 TB sync story: the destination is rewritten every cycle by the
upsert merge, and if it is a plain parquet directory EVERY merge
shuffles the full table on the merge key — at 100 TB that shuffle is
the whole job. Bucketing the destination on the merge key makes its
scan already-hash-partitioned (``HashPartitioning(keys, num_buckets)``
straight off the FileScan), so the merge's full-outer sort-merge join
plans with NO exchange on the big side; only the (delta-sized) source
shuffles, into the bucket layout. This is the Spark analogue of the
reference's in-place ``INSERT .. ON CONFLICT`` (reference
session.py:135-151), which likewise pays only delta-proportional work
on Postgres' heap.

Invariants:

- ``num_buckets`` is pinned per table (same reasoning as the streaming
  state-bucket pin, streaming/gated.py): changing it silently
  reintroduces the full-table exchange on the next merge.
- The merged result is written back with the SAME bucketing
  (:func:`write_bucketed`), so every subsequent sync round keeps the
  no-shuffle property — tested round-over-round in
  tests/test_bucketed.py.
- Bucket metadata lives in the session catalog via ``saveAsTable``;
  production holds it in a shared metastore (or a Delta/Iceberg table
  clustered on the key — identical plan shape).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypgsync_spark.operators.merge import join_merge, latest_per_key


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed (and sorted) on
    ``keys``. ``path`` makes it an external table (tests point this at
    a tmpdir so nothing lands in the default warehouse)."""
    w = (
        df.write.format("parquet")
        .bucketBy(num_buckets, keys[0], *keys[1:])
        .sortBy(keys[0], *keys[1:])
        .mode(mode)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_merge(
    spark: SparkSession,
    table: str,
    delta: DataFrame,
    keys: Sequence[str],
    version_col: str,
    num_buckets: int,
) -> DataFrame:
    """Merge ``delta`` onto the bucketed table ``table`` (last-writer-
    wins on ``version_col``) without shuffling the table side.

    The delta is repartitioned to the table's bucket count FIRST, so
    its window dedup (one row per key) and the join reuse one exchange:
    total plan = bucketed scan (no exchange) + ONE delta exchange +
    full-outer sort-merge join. ``num_buckets`` must match the table's
    pinned bucket count.
    """
    dst = spark.table(table)
    d = delta.repartition(num_buckets, *[F.col(k) for k in keys])
    d = latest_per_key(d, keys, version_col)
    return join_merge(dst, d, keys, version_col)
