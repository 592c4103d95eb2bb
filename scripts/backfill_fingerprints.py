"""Backfill verification fingerprints from git history (any round).

For a query whose LAST green row is round N < latest, the code that row
vouches for is the end-of-round-N snapshot — the PARENT of the driver's
``round N: verdict/...`` commit (that commit only adds root report
files). This script materializes that tree with ``git worktree``, loads
the old package there in a subprocess, applies the CURRENT fingerprint
algorithm (loaded by file path — fingerprint.py is stdlib-only and
self-contained), and records ``{"fp", "round": N}`` for every query
whose latest green is round N and which existed in that tree.

Queries whose fingerprint has since changed simply record the OLD
fingerprint — the registry's staleness check then (correctly) marks
them stale and the next sweep re-verifies them. Queries already
recorded at a newer round are left alone.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = """
import importlib.util, json, sys
tree, fp_path = sys.argv[1], sys.argv[2]
sys.path.insert(0, tree)
spec = importlib.util.spec_from_file_location("_fp", fp_path)
fp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fp)
from pypgsync_spark.queries import REGISTRY
out = {}
for name, s in REGISTRY.items():
    try:
        out[name] = fp.spec_fingerprint(s.fn, s.oracle)
    except Exception:
        pass
print(json.dumps(out))
"""


def git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=ROOT, capture_output=True, text=True, check=True
    ).stdout.strip()


def greens_by_round() -> dict[str, int]:
    """THE green-row map — delegated to the package so the predicate
    lives in one place (r10 review: it was triplicated here, in
    record_fingerprints and in queries/__init__)."""
    sys.path.insert(0, ROOT)
    from pypgsync_spark.queries import _last_green_round

    return _last_green_round()


def historical_fps(rnd: int) -> dict[str, str]:
    rel = f"CORRECTNESS_r{rnd:02d}.json"
    # the commit that ADDED the file is the round's verdict commit; a
    # later touch (typo fix, reformat) must not re-key the snapshot to
    # an arbitrary mid-round tree (r10 review)
    commit = git("log", "--diff-filter=A", "-1", "--format=%H", "--", rel)
    if not commit:
        return {}
    snapshot = git("rev-parse", f"{commit}^")
    wt = tempfile.mkdtemp(prefix=f"fp_r{rnd}_")
    try:
        git("worktree", "add", "--detach", wt, snapshot)
        out = subprocess.run(
            [sys.executable, "-c", _RUNNER, wt,
             os.path.join(ROOT, "pypgsync_spark", "queries", "fingerprint.py")],
            capture_output=True, text=True, cwd=wt,
        )
        if out.returncode != 0:
            print(f"round {rnd}: runner failed:\n{out.stderr[-2000:]}", file=sys.stderr)
            return {}
        return json.loads(out.stdout.strip().splitlines()[-1])
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt], cwd=ROOT,
                       capture_output=True)


def main() -> None:
    last = greens_by_round()
    store_path = os.path.join(ROOT, "FINGERPRINTS.json")
    store: dict = {}
    if os.path.exists(store_path):
        with open(store_path) as f:
            store = json.load(f)

    # INCLUDE the latest round (r10 review): this script is the
    # documented recovery path when record_fingerprints.py refused
    # because HEAD had already drifted — and after a full sweep the
    # vast majority of queries' last green IS the latest round, so the
    # old `r < latest` filter made the recovery a near-no-op and the
    # whole sweep budget burned re-verifying untouched code. The
    # latest round's snapshot comes from git history exactly like any
    # older round's (the verdict commit's parent).
    need_rounds = sorted(
        {r for q, r in last.items()
         if not isinstance(store.get(q), dict) or store[q].get("round") != r}
    )
    print(f"backfilling rounds: {need_rounds}")
    added = 0
    for rnd in need_rounds:
        fps = historical_fps(rnd)
        for name, r in last.items():
            if r != rnd or name not in fps:
                continue
            cur = store.get(name)
            if isinstance(cur, dict) and cur.get("round", 0) >= rnd:
                continue
            store[name] = {"fp": fps[name], "round": rnd}
            added += 1
        print(f"round {rnd}: {len(fps)} historical fingerprints computed")

    with open(store_path, "w") as f:
        json.dump(store, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"added {added} backfilled entries -> FINGERPRINTS.json ({len(store)} total)")


if __name__ == "__main__":
    main()
