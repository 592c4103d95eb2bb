"""Bucketed range join vs a brute-force model: containment exactness
(including overlapping intervals → multiple matches), left semantics,
and the no-nested-loop plan property."""

from __future__ import annotations

import random

import pytest

from pypgsync_spark.operators.rangejoin import range_join


def _model(points, intervals):
    return sorted(
        (p, sid)
        for p in points
        for sid, lo, hi in intervals
        if lo <= p <= hi
    )


def test_range_join_matches_model_overlapping_intervals(spark):
    rng = random.Random(7)
    points = [rng.randrange(200) for _ in range(60)]
    intervals = [
        (i, lo, lo + rng.randrange(1, 40))
        for i, lo in enumerate(rng.randrange(180) for _ in range(15))
    ]
    pts = spark.createDataFrame([(p,) for p in points], ["v"])
    iv = spark.createDataFrame(intervals, ["sid", "slice_lo", "slice_hi"])
    got = sorted((r["v"], r["sid"]) for r in range_join(pts, iv, "v").collect())
    assert got == _model(points, intervals)


def test_range_join_left_keeps_unmatched(spark):
    pts = spark.createDataFrame([(5,), (500,)], ["v"])
    iv = spark.createDataFrame([(0, 0, 9)], ["sid", "slice_lo", "slice_hi"])
    got = {(r["v"], r["sid"]) for r in range_join(pts, iv, "v", how="left").collect()}
    assert got == {(5, 0), (500, None)}


def test_range_join_left_null_payload_not_duplicated(spark):
    # round-5 advisor repro: a MATCHED point row carrying a NULL in a
    # payload column must not also come back as a phantom unmatched row
    # (the old anti-join on all point columns was null-unsafe)
    pts = spark.createDataFrame(
        [(5, None), (500, "x")], "v int, tag string"
    )
    iv = spark.createDataFrame([(0, 0, 9)], ["sid", "slice_lo", "slice_hi"])
    rows = range_join(pts, iv, "v", how="left").collect()
    assert len(rows) == 2
    got = {(r["v"], r["tag"], r["sid"]) for r in rows}
    assert got == {(5, None, 0), (500, "x", None)}


def test_range_join_left_null_point_and_duplicates(spark):
    # NULL point value → kept once as unmatched; duplicate identical
    # point rows keep their multiplicity on both branches
    pts = spark.createDataFrame(
        [(None,), (5,), (5,), (500,), (500,)], "v int"
    )
    iv = spark.createDataFrame([(0, 0, 9)], ["sid", "slice_lo", "slice_hi"])
    got = sorted(
        ((r["v"], r["sid"]) for r in range_join(pts, iv, "v", how="left").collect()),
        key=str,
    )
    assert got == sorted(
        [(None, None), (5, 0), (5, 0), (500, None), (500, None)], key=str
    )


def test_range_join_explicit_bucket_width(spark):
    pts = spark.createDataFrame([(i,) for i in range(50)], ["v"])
    iv = spark.createDataFrame(
        [(0, 10, 19), (1, 20, 45)], ["sid", "slice_lo", "slice_hi"]
    )
    got = sorted(
        (r["v"], r["sid"])
        for r in range_join(pts, iv, "v", bucket_width=7).collect()
    )
    assert got == _model(range(50), [(0, 10, 19), (1, 20, 45)])


def test_range_join_clash_and_how_raise(spark):
    pts = spark.createDataFrame([(5,)], ["v"])
    iv = spark.createDataFrame([(0, 0, 9)], ["v", "slice_lo", "slice_hi"])
    with pytest.raises(ValueError, match="overlapping"):
        range_join(pts, iv, "v")
    iv2 = spark.createDataFrame([(0, 0, 9)], ["sid", "slice_lo", "slice_hi"])
    with pytest.raises(ValueError, match="unsupported how"):
        range_join(pts, iv2, "v", how="full")


def test_range_join_plan_no_nested_loop(spark):
    pts = spark.createDataFrame([(5,)], ["v"])
    iv = spark.createDataFrame([(0, 0, 9)], ["sid", "slice_lo", "slice_hi"])
    plan = (
        range_join(pts, iv, "v")._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
