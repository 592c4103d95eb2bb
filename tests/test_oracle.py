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


def test_a12b_groups_stay_in_exact_sketch_regime():
    """ADVICE r7: a12b's exact oracle (quantile_disc vs
    percentile_approx) holds only while every (event_type) group fits
    the GK sketch's accuracy=100000 exact regime. A fixture/scale bump
    past that turns the permanently-green oracle into a hard sweep
    failure with nothing flagging the regime boundary — so flag it
    HERE: max rows-per-group across every shipped fixture scale must
    stay under accuracy/2 (comfortable margin below the buffer-compress
    threshold where rank error becomes possible)."""
    import os

    import duckdb

    ACCURACY = 100_000  # keep in sync with a12b_approx_percentiles
    con = duckdb.connect()
    try:
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            path = f"/root/testdata/{sf}/events.parquet"
            if not os.path.exists(path):
                continue
            (max_group,) = con.execute(
                f"""SELECT max(n) FROM (
                    SELECT count(*) AS n FROM read_parquet('{path}')
                    GROUP BY event_type)"""
            ).fetchone()
            assert max_group < ACCURACY // 2, (
                f"{sf}: largest event_type group has {max_group} rows — "
                f"approaching percentile_approx accuracy={ACCURACY}'s "
                "exact regime boundary; bump accuracy or demote a12b "
                "to the rank-error-bounded check only"
            )
    finally:
        con.close()


def test_a7b_hll_bounded_by_exact_distinct(spark):
    """r7 verdict #5: a7b (rows-only HLL sketch) was the one rows-only
    query with neither a golden nor a bound. Pin it against exact a7:
    HLL++ at rsd=0.02 must land within 3*rsd of the true distinct
    count at every shipped fixture scale — the sketch's own accuracy
    contract, engine-checkable without an oracle."""
    import os

    RSD = 0.02  # keep in sync with a7b_approx_distinct_users
    for sf in ("sf0.001", "sf0.01"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.exists(sf_dir):
            continue
        exact = REGISTRY["a7_distinct_users"].fn(spark, sf_dir).collect()[0]["n_users"]
        approx = (
            REGISTRY["a7b_approx_distinct_users"]
            .fn(spark, sf_dir)
            .collect()[0]["n_users_approx"]
        )
        assert abs(approx - exact) <= max(3 * RSD * exact, 1), (sf, exact, approx)
