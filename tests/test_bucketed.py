"""Bucketed co-located merge: correctness vs the union+window merge,
and the plan property that justifies it — the destination side of the
merge join must NOT shuffle (no exchange above the bucketed scan),
round over round."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pypgsync_spark.catalog import load_table
from pypgsync_spark.operators.merge import upsert_merge
from pypgsync_spark.sources.bucketed import bucketed_merge, write_bucketed

N_BUCKETS = 4
KEYS = ["event_id"]
VER = "updated_ms"


def _events(spark, sf_small):
    df = load_table(spark, sf_small, "events")
    return df.select(
        "event_id", F.unix_millis(F.col("ts").cast("timestamp")).alias(VER),
        "user_id", "event_type", "value",
    )


@pytest.fixture()
def split(spark, sf_small):
    df = _events(spark, sf_small)
    cut = df.approxQuantile(VER, [0.7], 0.0)[0]
    dst = df.filter(F.col(VER) < cut)
    # delta: newer rows plus updates to existing keys (version + 1000)
    delta = df.filter(F.col(VER) >= cut).unionByName(
        dst.limit(50).withColumn(VER, F.col(VER) + 1000)
    )
    return dst, delta


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_bucketed_merge_matches_union_window(spark, sf_small, split, tmp_path):
    dst, delta = split
    write_bucketed(dst, "t_dst_a", KEYS, N_BUCKETS, path=str(tmp_path / "a"))
    merged = bucketed_merge(spark, "t_dst_a", delta, KEYS, VER, N_BUCKETS)
    expect = upsert_merge(dst, delta, KEYS, VER)
    assert _rows(merged) == _rows(expect)


def test_bucketed_merge_never_shuffles_destination(spark, sf_small, split, tmp_path):
    """THE scale property: one exchange total (the delta), zero above
    the bucketed destination scan — and it must survive the write-back,
    i.e. hold again on the NEXT sync round."""
    dst, delta = split
    table = "t_dst_b0"
    write_bucketed(dst, table, KEYS, N_BUCKETS, path=str(tmp_path / "b0"))
    for rnd in range(2):
        merged = bucketed_merge(spark, table, delta, KEYS, VER, N_BUCKETS)
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, (rnd, plan)
        assert "SortMergeJoin" in plan, (rnd, plan)
        assert "Bucketed: true" in plan, (rnd, plan)
        # write back with the same pinned bucketing to the next table
        # generation (a sync cycle can't overwrite the table it reads —
        # generation swap is the production pattern) → invariant holds
        table = f"t_dst_b{rnd + 1}"
        write_bucketed(merged, table, KEYS, N_BUCKETS, path=str(tmp_path / f"b{rnd + 1}"))


def test_bucketed_merge_delta_updates_win(spark, sf_small, split, tmp_path):
    dst, delta = split
    write_bucketed(dst, "t_dst_c", KEYS, N_BUCKETS, path=str(tmp_path / "c"))
    merged = bucketed_merge(spark, "t_dst_c", delta, KEYS, VER, N_BUCKETS)
    # keys updated in the delta must surface the +1000 version
    updated = {r["event_id"]: r[VER] for r in delta.join(dst, on=KEYS, how="semi").collect()}
    got = {
        r["event_id"]: r[VER]
        for r in merged.filter(F.col("event_id").isin(list(updated))).collect()
    }
    assert got == updated
