"""Record verification fingerprints for the latest driver sweep.

Run at ROUND START, before any code edit. At that moment HEAD is the
driver's ``round N: verdict/...`` commit, which only adds root report
files on top of the end-of-round snapshot — so the package code at HEAD
is bit-identical to what CORRECTNESS_r{N}.json's sweep executed, and
computing fingerprints *now* captures exactly the code each green row
vouches for.

Safety guard: refuses to record when any ``pypgsync_spark/**`` file
differs (committed or working-tree) from the commit that wrote the
CORRECTNESS file — in that case the backfill script (which reads the
historical tree out of git) is the right tool.

Writes/merges ``FINGERPRINTS.json``:
    {query_name: {"fp": <hex>, "round": N}}
keeping entries for queries whose latest green is an OLDER round
(those come from backfill) untouched unless this sweep re-greened them.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def latest_round() -> tuple[int, str]:
    best = (0, "")
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m and int(m.group(1)) > best[0]:
            best = (int(m.group(1)), path)
    if not best[0]:
        raise SystemExit("no CORRECTNESS_r*.json found")
    return best


def code_unchanged_since(path: str) -> bool:
    rel = os.path.relpath(path, ROOT)
    try:
        commit = subprocess.run(
            ["git", "log", "-1", "--format=%H", "--", rel],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout.strip()
        if not commit:
            return False
        diff = subprocess.run(
            ["git", "diff", "--name-only", commit, "--", "pypgsync_spark"],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout.strip()
        return diff == ""
    except subprocess.CalledProcessError:
        return False


def main() -> None:
    force = "--force" in sys.argv
    rnd, cpath = latest_round()
    if not code_unchanged_since(cpath) and not force:
        raise SystemExit(
            f"pypgsync_spark/ differs from the commit that wrote "
            f"{os.path.basename(cpath)}; fingerprints computed now would "
            "not match the swept code. Use scripts/backfill_fingerprints.py, "
            "or --force if you know the diff is behavior-neutral."
        )

    with open(cpath) as f:
        rows = json.load(f)

    from pypgsync_spark.queries import REGISTRY, _is_green_row
    from pypgsync_spark.queries.fingerprint import spec_fingerprint

    store_path = os.path.join(ROOT, "FINGERPRINTS.json")
    store: dict = {}
    if os.path.exists(store_path):
        with open(store_path) as f:
            store = json.load(f)

    recorded = 0
    for name, row in rows.items():
        if not _is_green_row(row) or name not in REGISTRY:
            continue
        spec = REGISTRY[name]
        store[name] = {"fp": spec_fingerprint(spec.fn, spec.oracle), "round": rnd}
        recorded += 1

    # drop entries for queries no longer registered
    store = {k: v for k, v in store.items() if k in REGISTRY}
    with open(store_path, "w") as f:
        json.dump(store, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"recorded {recorded} fingerprints for round {rnd} -> FINGERPRINTS.json "
          f"({len(store)} total entries)")


if __name__ == "__main__":
    main()
