"""Named query catalog — the driver contract surface.

Every operator from SURVEY §2 (plus the extension layer) is exposed as
a named query: a Spark callable ``(spark, sf_dir) -> DataFrame`` and,
where ANSI-SQL-expressible, an equivalent DuckDB oracle SQL string.
The driver runs both at sf0.01 and compares row-count + schema +
order-insensitive value hash, so every computed column is aliased
identically on both sides and every nondeterminism source (float sum
order, ties in top-k) is normalized (decimal-exact sums cast to
double; unique tie-break columns).

Submodules register specs into ``REGISTRY`` at import time:
    core     scans, filters, aggregates, windows, sorts, set ops, scalars
    joins    equi/left/semi/anti joins + TPC-H-style analytics
    syncq    watermark, slice planning, merge/upsert pipeline
    textops  dedup + text-analysis extension layer
    vector   similarity search over embeddings
    streamq  structured-streaming operators (stateful agg, windows)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver does a rows-only check
    survey: str  # SURVEY §2 operator ids this query covers
    doc: str
    bench: int | None = None  # headline-bench rank; None => not benched


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, survey: str, doc: str, oracle: str | None, bench: int | None = None
):
    """Decorator: add a query callable to the registry.

    ``bench`` opts the query into bench.py's headline list at that rank
    (a stable execution order independent of the registry's per-round
    verification rotation). A query registered with ``bench`` lands in
    the same commit as its bench entry by construction — the round-2
    verdict's "keep the sweep honest" rule.
    """

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, survey=survey, doc=doc, bench=bench
        )
        return fn

    return wrap


def bench_queries() -> list[str]:
    """Names of bench-tagged queries in stable rank order."""
    tagged = [(s.bench, name) for name, s in REGISTRY.items() if s.bench is not None]
    return [name for _, name in sorted(tagged)]


def _is_green_row(row) -> bool:
    """THE definition of a green driver row (r10 review: it was
    triplicated across __init__, record_fingerprints and backfill —
    a driver schema change updating one copy would silently fork
    staleness ordering from recording)."""
    return isinstance(row, dict) and bool(
        row.get("hash_match") or row.get("err") == "no_oracle"
    )


def _last_green_round() -> dict[str, int]:
    """Map query name -> the LATEST round number in which it had a
    green (or by-design rows-only) row in a CORRECTNESS_r*.json at the
    repo root. Names absent from the map have never been verified."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            continue
        for name, row in data.items():
            if _is_green_row(row):
                last[name] = max(last.get(name, 0), rnd)
    return last


def _recorded_fingerprints() -> dict[str, dict]:
    """FINGERPRINTS.json at the repo root: query name ->
    ``{"fp": <hex>, "round": N}`` — the fingerprint of the code that
    round N's green row actually ran (recorded at round start by
    scripts/record_fingerprints.py, backfilled from git history by
    scripts/backfill_fingerprints.py)."""
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        with open(os.path.join(root, "FINGERPRINTS.json")) as f:
            data = json.load(f)
    except Exception:
        return {}
    return data if isinstance(data, dict) else {}


def _is_stale(name: str, spec: QuerySpec, last_green: int, recorded: dict) -> bool:
    """A query is STALE when its last green row cannot vouch for the
    code at HEAD: never verified, no fingerprint recorded for the green
    round, or the fingerprint changed since. Function-level (round-5
    verdict #1): the fingerprint covers the query callable's transitive
    in-package source closure plus its oracle text, so editing an
    unrelated query in the same module no longer un-verifies this one."""
    if last_green == 0:
        return True
    rec = recorded.get(name)
    if not isinstance(rec, dict) or rec.get("round") != last_green:
        return True
    from pypgsync_spark.queries.fingerprint import spec_fingerprint

    return spec_fingerprint(spec.fn, spec.oracle) != rec.get("fp")


def _load_all() -> None:
    # Registration order is deliberate: the driver's correctness sweep
    # walks the registry in registration order and may stop at a count
    # or time budget (round 1 stopped at entry 50), so the families
    # that have not yet received driver-side CORRECTNESS rows register
    # FIRST...
    from pypgsync_spark.queries import (  # noqa: F401
        syncq,
        textops,
        vector,
        streamq,
        core,
        joins,
    )

    # ...and, self-maintaining across rounds: the registry is ordered
    # by staleness. A query counts as STALE — and sorts to the front,
    # with the never-verified — when its function-level fingerprint
    # (AST-normalized source closure + oracle, fingerprint.py) differs
    # from the one recorded for its last green round: a green row only
    # vouches for the code that produced it (the round-3 advisor found
    # d2/d5 broken at HEAD yet absent from an all-green sweep, because
    # the old rotation keyed on last-green-round alone; the round-5
    # verdict then found the module-mtime successor re-staled 51
    # untouched queries whenever a sibling was edited). Within the
    # stale set, REGRESSION RISK outranks novelty: a previously-green
    # query whose closure changed sorts before a never-verified one —
    # the former is working code that an edit may have broken (exactly
    # the r3 d2/d5 failure mode), the latter ships with fresh pytest +
    # local-oracle coverage and can wait a round for its driver row
    # without leaving changed code unvouched. Then ascending bench
    # RANK (bench-tagged queries run every round regardless, so a
    # broken one fails the bench too; the rank makes the order
    # deterministic and age-respecting — a query tagged in an earlier
    # round has a lower rank and claims its first driver row before a
    # newer sibling), untagged last; then ascending last-green round,
    # then registration order. With the driver's 50-row cap this still
    # ROTATES: re-checked queries move back, stale ones come around.
    last = _last_green_round()
    recorded = _recorded_fingerprints()
    # (r7 verdict #9) Oracle-less specs sort behind EVERY oracle-checked
    # one, stale or not: their driver row can only ever report
    # "no_oracle" — the rows-only goldens + pytest carry their
    # verification locally — so a re-staled d3/d4 must never claim one
    # of the 50 hash-checkable sweep slots ahead of a query the driver
    # can actually value-check.
    ordered = _sweep_order(list(enumerate(REGISTRY.items())), last, recorded)
    rotated = {name: spec for _, (name, spec) in ordered}
    REGISTRY.clear()
    REGISTRY.update(rotated)


SWEEP_CAP = 50  # the driver's observed per-round correctness-sweep budget


def _sweep_order(items, last: dict, recorded: dict):
    """The registry ordering, extracted pure for testability.

    ``items`` is ``list[(registration_idx, (name, spec))]``; returns it
    sorted by the sweep-priority key documented in :func:`_load_all`,
    then applies the r10-verdict-#1a promotion: when the re-staled-
    green block alone would fill the driver's whole ``SWEEP_CAP``-row
    window (the r10 end-state, where a mass closure edit re-staled 50
    greens and the round's one NEW query missed its first driver row
    by a single slot), the OLDEST never-verified oracle-checked query
    is promoted into the window's last slot. At most one query is
    promoted per round — the displaced green keeps its local-oracle +
    pytest cover and comes around next round — so the regression-risk-
    outranks-novelty rule still governs every other slot."""
    ordered = sorted(
        items,
        key=lambda t: (
            # truthiness, matching oracle_sql()'s filter (r10 review:
            # `is None` let an empty-string oracle claim a
            # hash-checkable sweep slot the driver can never use)
            0 if t[1][1].oracle else 1,
            0 if _is_stale(t[1][0], t[1][1], last.get(t[1][0], 0), recorded) else 1,
            0 if last.get(t[1][0], 0) > 0 else 1,
            t[1][1].bench if t[1][1].bench is not None else 10**9,
            last.get(t[1][0], 0),
            t[0],
        ),
    )
    # never-verified => last_green == 0 => stale by definition, so the
    # first oracle-checked never-verified item is exactly the query the
    # promotion rule targets; if it already sits inside the window
    # (fewer than SWEEP_CAP stale greens ahead of it), nothing moves.
    first_new = next(
        (
            i
            for i, t in enumerate(ordered)
            if t[1][1].oracle and last.get(t[1][0], 0) == 0
        ),
        None,
    )
    if first_new is not None and first_new >= SWEEP_CAP:
        ordered.insert(SWEEP_CAP - 1, ordered.pop(first_new))
    return ordered


_load_all()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
