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
            if isinstance(row, dict) and (
                row.get("hash_match") or row.get("err") == "no_oracle"
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def _impl_mtime(fn: Callable) -> float:
    """Latest mtime across the package modules a query's callable
    (transitively, at module scope) depends on — its queries module
    plus every ``pypgsync_spark`` module reachable through module-level
    imports (operators/, functions/, streaming/, ...)."""
    import inspect
    import sys

    seen: set[str] = set()
    latest = 0.0
    stack = [getattr(fn, "__module__", "")]
    while stack:
        name = stack.pop()
        if not name.startswith("pypgsync_spark") or name in seen:
            continue
        seen.add(name)
        mod = sys.modules.get(name)
        if mod is None:
            continue
        path = getattr(mod, "__file__", None)
        if path:
            import os

            try:
                latest = max(latest, os.path.getmtime(path))
            except OSError:
                pass
        for val in vars(mod).values():
            if inspect.ismodule(val):
                stack.append(getattr(val, "__name__", ""))
            else:
                owner = getattr(val, "__module__", None)
                if isinstance(owner, str):
                    stack.append(owner)
    return latest


def _green_round_mtimes() -> dict[int, float]:
    """Round number -> mtime of its CORRECTNESS_r*.json."""
    import glob
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out: dict[int, float] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            try:
                out[int(m.group(1))] = os.path.getmtime(path)
            except OSError:
                pass
    return out


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
    # with the never-verified — when any package module it reaches
    # through module-level imports was modified after the CORRECTNESS
    # file of its last green round was written: a green row only
    # vouches for the code that produced it (the round-3 advisor found
    # d2/d5 broken at HEAD yet absent from an all-green sweep, because
    # the old rotation keyed on last-green-round alone). Within equal
    # staleness, bench-tagged queries go first (they run every round
    # regardless, so a broken one fails the bench too), then ascending
    # last-green round, then registration order. With the driver's
    # 50-row cap this still ROTATES: re-checked queries move back,
    # stale ones come around.
    last = _last_green_round()
    round_mtimes = _green_round_mtimes()
    ordered = sorted(
        enumerate(REGISTRY.items()),
        key=lambda t: (
            0
            if _impl_mtime(t[1][1].fn) > round_mtimes.get(last.get(t[1][0], 0), 0.0)
            else 1,
            0 if t[1][1].bench is not None else 1,
            last.get(t[1][0], 0),
            t[0],
        ),
    )
    rotated = {name: spec for _, (name, spec) in ordered}
    REGISTRY.clear()
    REGISTRY.update(rotated)


_load_all()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
