"""As-of join semantics vs a brute-force model, all four mode axes
(backward/forward × inclusive/strict) plus tolerance — and the plan
property that justifies the operator: one exchange, no nested loop."""

from __future__ import annotations

import random

import pytest

from pypgsync_spark.operators.asof import asof_join


def _model(l_rows, r_rows, direction="backward", strict=False, tolerance=None):
    out = []
    for k, lts in l_rows:
        best = None
        for rk, rts, v in r_rows:
            if rk != k:
                continue
            if direction == "backward":
                ok = rts < lts if strict else rts <= lts
            else:
                ok = rts > lts if strict else rts >= lts
            if not ok:
                continue
            if tolerance is not None and abs(lts - rts) > tolerance:
                continue
            if best is None:
                best = (rts, v)
            elif direction == "backward" and rts > best[0]:
                best = (rts, v)
            elif direction == "forward" and rts < best[0]:
                best = (rts, v)
        out.append((k, lts, best[1] if best else None))
    return sorted(out)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_modes_match_model(spark, direction, strict):
    rng = random.Random(direction + str(strict))
    l_rows = [(rng.randrange(4), rng.randrange(50)) for _ in range(40)]
    # unique (k, ts) on the right — the operator's determinism contract
    r_keys = set()
    r_rows = []
    while len(r_rows) < 30:
        k, ts = rng.randrange(4), rng.randrange(50)
        if (k, ts) not in r_keys:
            r_keys.add((k, ts))
            r_rows.append((k, ts, f"v{len(r_rows)}"))
    l = spark.createDataFrame(l_rows, ["k", "ts"])
    r = spark.createDataFrame(r_rows, ["k", "ts", "v"])
    got = sorted(
        (row["k"], row["ts"], row["v"])
        for row in asof_join(
            l, r, ["k"], "ts", direction=direction, strict=strict
        ).collect()
    )
    assert got == _model(l_rows, r_rows, direction, strict)


def test_asof_tolerance(spark):
    l = spark.createDataFrame([(1, 10), (1, 100)], ["k", "ts"])
    r = spark.createDataFrame([(1, 7, "x")], ["k", "ts", "v"])
    got = {
        (row["ts"], row["v"])
        for row in asof_join(l, r, ["k"], "ts", tolerance=5).collect()
    }
    assert got == {(10, "x"), (100, None)}


def test_asof_value_col_clash_raises(spark):
    l = spark.createDataFrame([(1, 10, "a")], ["k", "ts", "v"])
    r = spark.createDataFrame([(1, 7, "x")], ["k", "ts", "v"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(l, r, ["k"], "ts")


def test_asof_plan_single_exchange_no_nested_loop(spark):
    l = spark.createDataFrame([(1, 10)], ["k", "ts"])
    r = spark.createDataFrame([(1, 7, "x")], ["k", "ts", "v"])
    plan = (
        asof_join(l, r, ["k"], "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_asof_null_keys_never_match(spark):
    # round-5 advisor: NULL join keys must not pair up (SQL semantics,
    # and what the DuckDB ASOF oracle does). NULL-key left rows survive
    # with a NULL payload; NULL-key / NULL-ts right rows are ignored.
    l = spark.createDataFrame(
        [(None, 10), (1, 10)], "k int, ts int"
    )
    r = spark.createDataFrame(
        [(None, 5, "null-key"), (1, None, "null-ts"), (1, 7, "real")],
        "k int, ts int, v string",
    )
    got = sorted(
        ((row["k"], row["ts"], row["v"]) for row in asof_join(l, r, ["k"], "ts").collect()),
        key=str,
    )
    assert got == sorted([(None, 10, None), (1, 10, "real")], key=str)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_null_left_ts_matches_nothing(spark, direction):
    """r10 review: a left row with a NULL timestamp has no position on
    the time axis and must match nothing (SQL/DuckDB ASOF semantics).
    The forward path previously ordered ts DESC with Spark's default
    nulls-LAST, which handed NULL-ts left rows the smallest-ts right
    payload."""
    from pyspark.sql import types as T

    l_schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("ts", T.LongType())]
    )
    l = spark.createDataFrame([(1, None), (1, 5)], l_schema)
    r = spark.createDataFrame([(1, 3, "x"), (1, 7, "y")], ["k", "ts", "v"])
    got = {
        (row["k"], row["ts"], row["v"])
        for row in asof_join(l, r, ["k"], "ts", direction=direction).collect()
    }
    want_matched = (1, 5, "x") if direction == "backward" else (1, 5, "y")
    assert got == {(1, None, None), want_matched}
