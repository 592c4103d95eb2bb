"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's watermark-
merge sync pipeline, end to end) on sf0.001. ``queries()`` /
``oracle_sql()`` expose the full named catalog from
``pypgsync_spark.queries`` — one entry per implemented operator from
SURVEY §2 plus the extension layer (dedup / similarity / text /
multimodal / streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import pypgsync_spark.queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full sync pipeline (watermark → delta → merge) on
    the sf0.001 events fixture (SURVEY §2.9 C3/C4 + §2.1 S3)."""
    return q.REGISTRY["c4_sync_pipeline"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
