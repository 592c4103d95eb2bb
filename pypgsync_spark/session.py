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


def _resolve_master(master: str | None, cpus: int) -> str | None:
    """'auto' → local[cpus]; None → None (builder must not call
    .master(), deferring to spark-submit); anything else passes
    through verbatim."""
    if master == "auto":
        return f"local[{cpus}]"
    return master


def get_spark(
    app_name: str = "pypgsync_spark",
    master: str | None = "auto",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master="auto"`` (the default) runs ``local[$SPARK_GRAFT_CPUS]``.
    On a real cluster, pass ``master=None``: the builder then does NOT
    call ``.master()`` at all, so spark-submit's ``--master`` wins (r11
    review: the old ``master or local[...]`` fallback silently
    overrode an external cluster manager with local mode — builder
    options beat the submit-time ``spark.master`` property).
    """
    cpus = DEFAULT_CPUS
    master = _resolve_master(master, cpus)
    shuffle_partitions = shuffle_partitions or cpus
    b = (
        SparkSession.builder.appName(app_name)
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
    if master is not None:
        b = b.master(master)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
