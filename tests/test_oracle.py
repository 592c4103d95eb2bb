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
