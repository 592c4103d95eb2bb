"""SparkSession factory.

One place to set the knobs that matter for both the local test harness
and a real multi-executor cluster:

- UTC session timezone (oracle comparability: DuckDB timestamps are
  UTC-naive).
- AQE on (runtime coalescing, skew-join splitting) — the Spark-native
  replacement for the reference's hand-rolled EXPLAIN-based slice
  planning (reference session.py:201-240).
- shuffle partitions sized to cores locally; on a cluster AQE's
  coalescing makes the initial number far less critical.
- Arrow enabled for the Pandas-UDF paths (similarity/multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "pypgsync_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    On a real cluster, pass ``master=None`` with an external
    spark-submit master; locally defaults to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = DEFAULT_CPUS
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Fixture files are small; don't let tiny files fragment scans.
        # At 100 TB this would be 128m+ and driven by the real file sizes.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
