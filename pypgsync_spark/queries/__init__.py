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


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, survey: str, doc: str, oracle: str | None):
    """Decorator: add a query callable to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, survey=survey, doc=doc)
        return fn

    return wrap


def _load_all() -> None:
    # Registration order is deliberate: the driver's correctness sweep
    # walks the registry in registration order, so the families that
    # have not yet received driver-side CORRECTNESS rows (round-1 sweep
    # stopped at entry 50) register FIRST.  core/joins were fully
    # driver-verified in round 1 (48/48 green) and go last.
    from pypgsync_spark.queries import (  # noqa: F401
        syncq,
        textops,
        vector,
        streamq,
        core,
        joins,
    )


_load_all()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
