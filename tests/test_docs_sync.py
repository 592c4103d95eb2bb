"""Docs-vs-reality sync checks (round-4 #8 / round-5 verdict #6).

Three rounds in a row, a stale throughput figure survived a verdict
flag because nothing failed when README/SCALE drifted from the
recorded bench numbers. These checks make the drift a red test:

- every ``BENCH_rNN: <figure>`` citation in README.md / SCALE.md must
  match what that BENCH file actually recorded (a figure may lag a
  round, but it can never misquote its named source);
- the query counts in COVERAGE.md and README.md must equal the live
  registry (so registering a query forces the docs to regenerate in
  the same commit).
"""

from __future__ import annotations

import json
import os
import re

import pytest

from pypgsync_spark.queries import REGISTRY

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name: str) -> str:
    with open(os.path.join(ROOT, name)) as f:
        return f.read()


@pytest.mark.parametrize("doc", ["README.md", "SCALE.md"])
def test_bench_citations_match_recorded_numbers(doc):
    text = _read(doc)
    # \b stops backtracking from splitting the round number when the
    # citation is followed by ')' etc. ("BENCH_r06)" must not parse as
    # round 0, figure 6)
    cites = re.findall(r"BENCH_r(\d+)\b:?\s*([\d,]+)", text)
    assert cites, f"{doc} must cite its throughput source as BENCH_rNN: <rows/s>"
    for rnd, figure in cites:
        path = os.path.join(ROOT, f"BENCH_r{int(rnd):02d}.json")
        with open(path) as f:
            bench = json.load(f)
        recorded = (bench.get("parsed") or {}).get("sync_rows_per_sec")
        if recorded is None:
            # the driver's 2000-char tail capture can truncate the JSON
            # line head, leaving parsed=None (r6 did) — fall back to
            # grepping the figure out of the raw tail (and going
            # forward, bench_local_r{N}.json carries the full output)
            m = re.search(r'"sync_rows_per_sec": (\d+)', bench.get("tail") or "")
            recorded = int(m.group(1)) if m else None
        assert recorded is not None, f"{path} has no recorded sync_rows_per_sec"
        assert int(figure.replace(",", "")) == recorded, (
            f"{doc} quotes {figure} for round {rnd}, but {path} recorded "
            f"{recorded}"
        )


def test_coverage_total_matches_registry():
    text = _read("COVERAGE.md")
    m = re.search(r"Total queries: (\d+) \((\d+) oracle-checked, (\d+) rows-only\)", text)
    assert m, "COVERAGE.md missing its total line — regenerate (scripts/gen_coverage.py)"
    total, with_oracle, rows_only = map(int, m.groups())
    live_oracle = sum(1 for s in REGISTRY.values() if s.oracle)
    assert total == len(REGISTRY), "COVERAGE.md total stale — regenerate"
    assert with_oracle == live_oracle, "COVERAGE.md oracle count stale — regenerate"
    assert rows_only == len(REGISTRY) - live_oracle


def test_readme_catalog_count_matches_registry():
    m = re.search(r"the named catalog: (\d+) queries", _read("README.md"))
    assert m, "README.md should state the catalog size"
    assert int(m.group(1)) == len(REGISTRY), "README.md catalog count stale"
