"""Simulate the driver's verify: fresh default-config SparkSession,
entry() smoke at sf0.001, every queries() entry vs its oracle_sql()
via DuckDB at sf0.01 (the driver's correctness scale).

Usage: python scripts/driver_sim.py [sf_dir] [query_name ...]
(query names restrict the sweep; entry() smoke runs either way)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

args = sys.argv[1:]
sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.01"
only = set(args)

# Deliberately NOT our tuned session: mimic a plain driver session.
spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver_sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

import __spark_entry__ as e
from tests.oracle_harness import compare, duck_connection

t0 = time.time()
df = e.entry(spark)
rows = df.count()
print(f"entry(): {rows} rows, schema={df.columns}, {time.time()-t0:.1f}s")
assert rows > 0

print(
    "note: 'WindowExec: No Partition Defined' warnings below come from "
    "reference-literal W1/W2 global row_number shapes and tiny-row "
    "queries; scale-path ranks are guarded against SinglePartition by "
    "tests/test_plans.py"
)

qs = e.queries()
if only:
    unknown = only - set(qs)
    assert not unknown, f"unknown query names: {sorted(unknown)}"
    qs = {n: f for n, f in qs.items() if n in only}
oracles = e.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} with oracles")

failed = []
for name, fn in sorted(qs.items()):
    t0 = time.time()
    # per-query isolation (r10 review): the real driver records a
    # per-row err and continues — fail-fasting here meant one broken
    # query hid the status of every query after it in the sweep
    try:
        if name in oracles:
            ok, msg = compare(spark, sf_dir, fn, oracles[name])
            status = "OK " if ok else "FAIL"
            if not ok:
                failed.append((name, msg))
        else:
            n = fn(spark, sf_dir).count()
            ok, msg, status = True, f"rows-only ({n} rows)", "ROWS"
    except Exception as e:  # noqa: BLE001 — recorded as a FAIL row
        status, msg = "ERR ", f"{type(e).__name__}: {e}"[:300]
        failed.append((name, msg))
    print(f"  {status} {name}: {msg} [{time.time()-t0:.1f}s]")

print(f"\n{len(qs) - len(failed)}/{len(qs)} ok")
if failed:
    for name, msg in failed:
        print(f"FAILED {name}: {msg}")
    sys.exit(1)
