"""Linear-scaling probe for the headline sync merge (SCALE.md evidence).

The bench's headline figure (rows merged per second) is measured on
the sf0.1 fixture — ~10⁵ rows, small enough that fixed per-job costs
are a visible fraction. This probe stages the SAME events table at
larger multipliers (id-shifted copies; timestamps unchanged, so the
stale/delta split keeps its exact selectivity) and times the SAME
upsert merge the bench probe runs (stale destination + fresh delta →
last-writer-wins, queries/syncq.py::s3_upsert_merge's shape). If
rows/s HOLDS OR GROWS as rows grow 10×, the merge is linear in this
range — the plan properties SCALE.md claims (shuffle ~|keys|,
WindowGroupLimit pre-shuffle top-1, no driver-side work proportional
to rows) are being measured, not asserted.

Staged inputs live under a tempdir and are deleted afterwards; the
fixture itself is never duplicated on disk inside the repo.

Usage:
    python scripts/probe_scale.py             # multipliers 1 10
    python scripts/probe_scale.py 1 10 30     # up to ~18M rows at 30x

Prints one JSON line per multiplier plus a scaling summary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F

from pypgsync_spark.catalog import load_table
from pypgsync_spark.functions.time import to_millis
from pypgsync_spark.operators.merge import upsert_merge
from pypgsync_spark.queries.syncq import MS_JAN10, MS_JAN20
from pypgsync_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def stage(spark, mult: int, base: str) -> tuple[str, int]:
    """Write events×mult (event_id shifted per copy) as 32 parquet
    files; one staging job, excluded from the timed region."""
    ev = (
        load_table(spark, SF_DIR, "events")
        .withColumn("updated_ms", to_millis("ts"))
        .select("event_id", "updated_ms", "user_id", "event_type", "value", "props")
    )
    if mult > 1:
        ev = (
            ev.withColumn(
                "__c", F.explode(F.array(*[F.lit(i) for i in range(mult)]))
            )
            .withColumn(
                "event_id",
                F.col("event_id") + F.col("__c").cast("long") * F.lit(10**9),
            )
            .drop("__c")
        )
    path = f"{base}/events_x{mult}"
    ev.repartition(32).write.parquet(path)
    return path, spark.read.parquet(path).count()


def merge_once(spark, path: str) -> None:
    df = spark.read.parquet(path)
    stale = df.filter(F.col("updated_ms") < MS_JAN20).select(
        "event_id",
        (F.col("updated_ms") - 1000).alias("updated_ms"),
        "user_id",
        "event_type",
        (F.col("value") - 1).alias("value"),
        "props",
    )
    fresh = df.filter(F.col("updated_ms") >= MS_JAN10)
    upsert_merge(
        stale, fresh, keys=["event_id"], version_col="updated_ms"
    ).write.format("noop").mode("overwrite").save()


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark(app_name="pypgsync_spark_probe_scale")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="probe_scale_")
    results = []
    try:
        for m in mults:
            path, n = stage(spark, m, base)
            t0 = time.time()
            merge_once(spark, path)  # cold: codegen + footer reads
            cold = time.time() - t0
            warm = []
            for _ in range(3):
                t0 = time.time()
                merge_once(spark, path)
                warm.append(time.time() - t0)
            sec = min(warm)
            r = {
                "multiplier": m,
                "rows": n,
                "cold_sec": round(cold, 3),
                "steady_sec": round(sec, 3),
                "rows_per_sec": round(n / max(sec, 1e-9)),
                "load_avg": [round(x, 2) for x in os.getloadavg()],
            }
            results.append(r)
            print(json.dumps(r))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()
    if len(results) >= 2:
        a, b = results[0], results[-1]
        ratio = (b["rows_per_sec"] / a["rows_per_sec"]) if a["rows_per_sec"] else 0
        print(
            json.dumps(
                {
                    "summary": f"{b['multiplier']}x/{a['multiplier']}x "
                    "throughput ratio",
                    "ratio": round(ratio, 3),
                    "linear_or_better": ratio >= 0.9,
                }
            )
        )


if __name__ == "__main__":
    main()
