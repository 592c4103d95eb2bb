"""Merge-operator semantics: last-writer-wins fixed point, idempotency,
order independence, and equivalence of the two physical formulations
(the properties SURVEY §5/§7 requires of the upsert, per README.md:90
and session.py:142-144)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import types as T

from pypgsync_spark.operators.merge import (
    coalesce_merge,
    latest_per_key,
    new_keys_only,
    upsert_merge,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("updated", T.LongType()),
        T.StructField("val", T.StringType()),
    ]
)


def rows_set(df):
    return {tuple(r) for r in df.collect()}


def expected_lww(dst_rows, delta_rows):
    """Reference model: per key, max version wins; delta beats dst on
    version ties."""
    best: dict[int, tuple] = {}
    for prio, rows in ((0, dst_rows), (1, delta_rows)):
        for r in rows:
            cur = best.get(r[0])
            if cur is None or (r[1], prio) >= (cur[0][1], cur[1]):
                # within one side, later row in list with same (ver)
                # also wins — but we only generate unique (id,ver) per
                # side so ordering inside a side is irrelevant
                best[r[0]] = (r, prio)
    return {r for r, _ in best.values()}


def test_upsert_merge_basic(spark):
    dst = spark.createDataFrame([(1, 10, "old"), (2, 10, "keep")], SCHEMA)
    delta = spark.createDataFrame([(1, 20, "new"), (3, 5, "ins")], SCHEMA)
    out = rows_set(upsert_merge(dst, delta, ["id"], "updated"))
    assert out == {(1, 20, "new"), (2, 10, "keep"), (3, 5, "ins")}


def test_upsert_merge_tie_source_wins(spark):
    dst = spark.createDataFrame([(1, 10, "dst")], SCHEMA)
    delta = spark.createDataFrame([(1, 10, "src")], SCHEMA)
    out = rows_set(upsert_merge(dst, delta, ["id"], "updated"))
    assert out == {(1, 10, "src")}


def test_upsert_merge_idempotent(spark):
    """Re-applying the same delta converges (reference crash-resume
    property, README.md:90)."""
    dst = spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], SCHEMA)
    delta = spark.createDataFrame([(2, 30, "b2"), (3, 30, "c")], SCHEMA)
    once = upsert_merge(dst, delta, ["id"], "updated")
    twice = upsert_merge(once, delta, ["id"], "updated")
    assert rows_set(once) == rows_set(twice)


def test_upsert_merge_order_independent(spark):
    """Applying [d1 then d2] equals applying [d2 then d1] when key-
    version pairs are unique — the declarative replacement for the
    reference's ORDER BY updated application order (session.py:126-133)."""
    dst = spark.createDataFrame([(i, 0, "base") for i in range(20)], SCHEMA)
    d1 = spark.createDataFrame([(i, 1, "v1") for i in range(0, 15)], SCHEMA)
    d2 = spark.createDataFrame([(i, 2, "v2") for i in range(5, 20)], SCHEMA)
    a = upsert_merge(upsert_merge(dst, d1, ["id"], "updated"), d2, ["id"], "updated")
    b = upsert_merge(upsert_merge(dst, d2, ["id"], "updated"), d1, ["id"], "updated")
    assert rows_set(a) == rows_set(b)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_upsert_merge_random_property(spark, seed):
    """Random upsert sequences ≡ model last-writer-wins (SURVEY §5.4)."""
    rng = random.Random(seed)
    dst_rows = [(i, rng.randrange(100), f"d{i}") for i in rng.sample(range(30), 20)]
    delta_rows = [(i, rng.randrange(100), f"s{i}") for i in rng.sample(range(30), 15)]
    dst = spark.createDataFrame(dst_rows, SCHEMA)
    delta = spark.createDataFrame(delta_rows, SCHEMA)
    out = rows_set(upsert_merge(dst, delta, ["id"], "updated"))
    assert out == expected_lww(dst_rows, delta_rows)


def test_coalesce_merge_matches_upsert(spark):
    dst = spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], SCHEMA)
    delta = spark.createDataFrame([(2, 30, "b2"), (3, 30, "c")], SCHEMA)
    u = rows_set(upsert_merge(dst, delta, ["id"], "updated"))
    c = rows_set(coalesce_merge(dst, latest_per_key(delta, ["id"], "updated"), ["id"]))
    assert u == c


def test_latest_per_key(spark):
    df = spark.createDataFrame([(1, 1, "a"), (1, 3, "c"), (1, 2, "b")], SCHEMA)
    assert rows_set(latest_per_key(df, ["id"], "updated")) == {(1, 3, "c")}


def test_new_keys_only(spark):
    src = spark.createDataFrame([(1, 1, "a"), (2, 1, "b"), (3, 1, "c")], SCHEMA)
    dst = spark.createDataFrame([(2, 99, "x")], SCHEMA)
    assert {r[0] for r in new_keys_only(src, dst, ["id"]).collect()} == {1, 3}


def test_merge_schema_mismatch_raises(spark):
    dst = spark.createDataFrame([(1, 10, "a")], SCHEMA)
    bad = dst.drop("val")
    with pytest.raises(ValueError, match="schema mismatch"):
        upsert_merge(dst, bad, ["id"], "updated")
    with pytest.raises(ValueError, match="at least one key"):
        upsert_merge(dst, dst, [], "updated")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_join_merge_random_property(spark, seed):
    """join_merge (the bucketed-destination formulation) ≡ model LWW ≡
    upsert_merge, under its contract: dst unique per key, delta
    pre-collapsed with latest_per_key."""
    from pypgsync_spark.operators.merge import join_merge

    rng = random.Random(seed)
    dst_rows = [(i, rng.randrange(100), f"d{i}") for i in rng.sample(range(30), 20)]
    delta_rows = [(i, rng.randrange(100), f"s{i}") for i in rng.sample(range(30), 15)]
    dst = spark.createDataFrame(dst_rows, SCHEMA)
    delta = spark.createDataFrame(delta_rows, SCHEMA)
    out = rows_set(
        join_merge(dst, latest_per_key(delta, ["id"], "updated"), ["id"], "updated")
    )
    assert out == expected_lww(dst_rows, delta_rows)
    assert out == rows_set(upsert_merge(dst, delta, ["id"], "updated"))


def test_join_merge_idempotent_and_tie_source_wins(spark):
    from pypgsync_spark.operators.merge import join_merge

    dst = spark.createDataFrame([(1, 10, "dst"), (2, 20, "b")], SCHEMA)
    delta = spark.createDataFrame([(1, 10, "src"), (3, 30, "c")], SCHEMA)
    once = join_merge(dst, delta, ["id"], "updated")
    assert rows_set(once) == {(1, 10, "src"), (2, 20, "b"), (3, 30, "c")}
    twice = join_merge(once, delta, ["id"], "updated")
    assert rows_set(once) == rows_set(twice)


def test_bucket_checksums_flag_exactly_divergent_buckets(spark):
    """A bucket is flagged out-of-sync IFF its rows actually differ —
    the property that makes the digest join a safe repair targeter."""
    from pyspark.sql import functions as F

    from pypgsync_spark.operators.merge import diff_buckets

    src = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    # corrupt versions for k % 97 == 0, drop k % 101 == 0
    dst = src.filter(F.col("k") % 101 != 0).withColumn(
        "v", F.when(F.col("k") % 97 == 0, F.col("v") + 1).otherwise(F.col("v"))
    )
    out = {r["bucket"]: r["in_sync"] for r in
           diff_buckets(src, dst, "k", "v", num_buckets=16).collect()}
    bad = {k % 16 for k in range(0, 500) if k % 97 == 0 or k % 101 == 0}
    assert out == {b: b not in bad for b in range(16)}


def test_bucket_checksums_identical_sides_all_in_sync(spark):
    from pyspark.sql import functions as F

    from pypgsync_spark.operators.merge import diff_buckets

    df = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    out = diff_buckets(df, df, "k", "v", num_buckets=8)
    assert out.filter("NOT in_sync").count() == 0
    assert out.count() == 8
