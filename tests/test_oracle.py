"""Differential oracle tests: every registered query with an oracle
must match DuckDB at sf0.001 (fast) — the local mirror of the driver's
sf0.01 CORRECTNESS gate."""

from __future__ import annotations

import pytest

from pypgsync_spark.queries import REGISTRY
from tests.oracle_harness import compare

ORACLE_SPECS = sorted(name for name, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_SPECS = sorted(name for name, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_oracle_match(spark, sf_small, name):
    spec = REGISTRY[name]
    ok, msg = compare(spark, sf_small, spec.fn, spec.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_SPECS)
def test_rows_only_runs(spark, sf_small, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_small)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_approx_percentiles_rank_error_bounded(spark, sf_small):
    """a12b's sketch answers judged by RANK error (the sketch's actual
    contract; value error depends on local density, rank error does
    not): the returned value's rank within its group must sit within
    one rank position + sketch tolerance of the target quantile."""
    from pypgsync_spark.catalog import load_table

    vals: dict[str, list[float]] = {}
    for r in load_table(spark, sf_small, "events").select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(float(r["value"]))
    approx = {
        r["event_type"]: r
        for r in REGISTRY["a12b_approx_percentiles"].fn(spark, sf_small).collect()
    }
    assert set(vals) == set(approx)
    for et, xs in vals.items():
        xs.sort()
        n = len(xs)
        for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            v = float(approx[et][name])
            rank_lo = sum(1 for x in xs if x < v) / n
            rank_hi = sum(1 for x in xs if x <= v) / n
            tol = 1.0 / n + 1e-4  # one rank position + sketch accuracy
            assert rank_lo - tol <= q <= rank_hi + tol, (et, name, v, rank_lo, rank_hi)
