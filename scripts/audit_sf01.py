"""Cross-scale oracle audit at sf0.1 — the scripted form of the
SCALE.md claim (r8: 173/173, r9: 177/177; re-derived by hand three
rounds running, r9 verdict #4 asked for one command).

Runs the driver-identical oracle compare (scripts/driver_sim.py — the
same compare the driver's correctness sweep does: row count + column
names + order-insensitive normalized value hash) at sf0.1 over every
oracle-checked registry query EXCEPT those whose DUCKDB ORACLE is
quadratic. The exclusions are an oracle-cost statement, not a Spark
one: the excluded queries' Spark plans are the PPJoin/banded/LSH scale
paths (plan-asserted in tests/test_plans.py), but their DuckDB oracles
join all document pairs (O(n²) at 6k docs ≈ 36M shingle-pair rows),
so checking them at sf0.1 costs hours in DuckDB for no extra signal —
their sf0.01 driver rows, sf0.001 oracle rows, goldens, and
completeness pytests stand.

Usage:
    python scripts/audit_sf01.py              # full audit, ~15-25 min
    python scripts/audit_sf01.py --list       # print the name list only

Exit 0 iff every included query hash-matches its oracle at sf0.1.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF01 = "/root/testdata/sf0.1"

# Dedup-family queries whose DuckDB ORACLES are quadratic in document
# count (all-pairs shingle/embedding joins with no prefix/LSH filter on
# the oracle side). The Spark side of every one of these is the
# bucketed scale path; they are verified at sf0.01 (driver sweep) and
# sf0.001, with goldens + recall/completeness pytests.
QUADRATIC_ORACLES = {
    "d2_ngram_jaccard_pairs",
    "d5_near_dup_components",
    "d6_embedding_near_dup",
    "d7_incremental_dedup",
    "d8_delta_jaccard_pairs",
    "d9_cluster_canonical",
    "d10_winnow_substring_pairs",
    "d11_winnow_containment",
    "d12_cross_source_neardup",
    "d13_threshold_sensitivity",
    "pipe2_dedup_pack_pipeline",
    "tx3_decontamination",
}


def audit_names() -> list[str]:
    from pypgsync_spark.queries import REGISTRY

    missing = QUADRATIC_ORACLES - set(REGISTRY)
    assert not missing, f"exclusion list names unknown queries: {sorted(missing)}"
    return [
        n
        for n, s in REGISTRY.items()
        if s.oracle and n not in QUADRATIC_ORACLES
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--list", action="store_true", help="print names and exit")
    ap.add_argument("--sf-dir", default=SF01)
    args = ap.parse_args()

    # driver_sim's positional parsing treats an argv[0] WITHOUT a '/'
    # as a query name — absolutize so `--sf-dir sf0.1`-style relative
    # values route to the sf_dir slot instead of failing as an unknown
    # query.
    args.sf_dir = os.path.abspath(args.sf_dir)

    names = audit_names()
    if args.list:
        print("\n".join(names))
        print(
            f"# {len(names)} included, {len(QUADRATIC_ORACLES)} excluded "
            "(quadratic DuckDB oracles)",
            file=sys.stderr,
        )
        return

    print(
        f"cross-scale audit: {len(names)} oracle-checked queries at "
        f"{args.sf_dir} ({len(QUADRATIC_ORACLES)} excluded: quadratic "
        "DuckDB oracles — Spark plans for those are the bucketed scale "
        "paths, see module docstring)"
    )
    # Delegate to driver_sim so the compare is literally the driver's:
    # same plain local[8] session, same DuckDB harness, same normalize.
    rc = subprocess.call(
        [sys.executable, os.path.join(ROOT, "scripts", "driver_sim.py"), args.sf_dir]
        + names
    )
    if rc == 0:
        print(f"AUDIT PASS: {len(names)}/{len(names)} hash-match at sf0.1")
    else:
        print("AUDIT FAIL: see driver_sim output above", file=sys.stderr)
    sys.exit(rc)


if __name__ == "__main__":
    main()
