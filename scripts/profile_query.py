"""Per-stage profile of one or more catalog queries (guide §1/§7).

Runs each named query through the noop sink in a fresh session with the
Spark event log enabled, then parses the event log to attribute wall
time to stages: submit→complete span, executor run time, shuffle
read/write bytes, task count. This substitutes for the (disabled) Spark
UI: it answers "which stage / exchange is the time going to" without
guessing.

Usage:
    python scripts/profile_query.py d2_ngram_jaccard_pairs [more...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_query.py ...

Prints, per query: total wall (cold, warm), then the top stages of the
WARM run by span with their shuffle traffic, and the job count.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pypgsync_spark.queries import REGISTRY  # noqa: E402
from pypgsync_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _parse_events(log_dir: str) -> list[dict]:
    events = []
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        paths.extend(os.path.join(root, fn) for fn in files)
    for path in paths:
        base = os.path.basename(path)
        if "appstatus_" in base or base.endswith(".crc"):
            continue
        with open(path, errors="replace") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(ev, dict):
                    events.append(ev)
    return events


def _stage_report(events: list[dict], t_mark: float, t_end: float) -> None:
    """Summarize stages submitted inside the [t_mark, t_end) ms window."""
    stages = []
    n_jobs = 0
    for ev in events:
        if ev.get("Event") == "SparkListenerJobStart":
            if t_mark <= ev.get("Submission Time", 0) < t_end:
                n_jobs += 1
        if ev.get("Event") != "SparkListenerStageCompleted":
            continue
        si = ev["Stage Info"]
        sub = si.get("Submission Time")
        comp = si.get("Completion Time")
        if sub is None or comp is None or not (t_mark <= sub < t_end):
            continue
        acc = {
            a.get("Name"): a.get("Value")
            for a in si.get("Accumulables", [])
            if isinstance(a.get("Value"), (int, float))
        }
        stages.append(
            {
                "stage": si["Stage ID"],
                "name": (si.get("Stage Name", "") + " | "
                         + si.get("Details", "").split("\n")[0])[:110],
                "span_ms": comp - sub,
                "tasks": si.get("Number of Tasks"),
                "run_ms": acc.get("internal.metrics.executorRunTime", 0),
                "sh_read_mb": round(
                    (acc.get("internal.metrics.shuffle.read.localBytesRead", 0)
                     + acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0))
                    / 1e6, 2),
                "sh_write_mb": round(
                    acc.get("internal.metrics.shuffle.write.bytesWritten", 0) / 1e6, 2),
                "py_ms": acc.get("internal.metrics.executorDeserializeTime", 0),
                "rows_out": acc.get("number of output rows", None),
            }
        )
    stages.sort(key=lambda s: -s["span_ms"])
    total_span = sum(s["span_ms"] for s in stages)
    print(f"  warm run: {len(stages)} stages, {n_jobs} jobs, "
          f"sum(stage span) {total_span/1000:.2f}s")
    for s in stages[:14]:
        print(
            f"    stage {s['stage']:>4} span {s['span_ms']/1000:6.2f}s "
            f"run {s['run_ms']/1000:7.2f}s tasks {s['tasks']:>3} "
            f"shR {s['sh_read_mb']:>8.2f}MB shW {s['sh_write_mb']:>8.2f}MB  {s['name']}"
        )


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print("usage: profile_query.py <query> [query...]", file=sys.stderr)
        sys.exit(1)
    for n in names:
        if n not in REGISTRY:
            print(f"unknown query: {n}", file=sys.stderr)
            sys.exit(1)

    log_dir = tempfile.mkdtemp(prefix="pq_eventlog_")
    try:
        spark = get_spark(
            app_name="profile_query",
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": log_dir,
                "spark.eventLog.compress": "false",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        # warm the session (codegen, python worker pool, parquet footers)
        REGISTRY["a6_count_star"].fn(spark, SF_DIR).count()

        results = []
        for name in names:
            fn = REGISTRY[name].fn
            spark.sparkContext.setJobDescription(f"profile:{name}:cold")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            cold = time.time() - t0
            # warm run, marked so the report can isolate its stages
            t_mark = time.time() * 1000
            spark.sparkContext.setJobDescription(f"profile:{name}:warm")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            warm = time.time() - t0
            t_end = time.time() * 1000
            results.append((name, cold, warm, t_mark, t_end))
            spark.sparkContext.setJobDescription(None)
        spark.stop()

        events = _parse_events(log_dir)
        for name, cold, warm, t_mark, t_end in results:
            print(f"\n== {name}: cold {cold:.2f}s warm {warm:.2f}s ==")
            _stage_report(events, t_mark, t_end)
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
