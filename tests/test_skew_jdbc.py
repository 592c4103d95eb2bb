"""Skew-operator equivalence + JDBC SQL-text rendering (the pieces a
live Postgres would exercise; SURVEY §2.1 S1/S3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pypgsync_spark.catalog import load_table
from pypgsync_spark.operators.skew import distinct_count_two_stage, salted_inner_join
from pypgsync_spark.plans.intervals import plan_slices
from pypgsync_spark.sources.jdbc import upsert_sql


def test_salted_join_equals_plain_join(spark, sf_small):
    orders = load_table(spark, sf_small, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey"
    )
    customer = load_table(spark, sf_small, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_nationkey"
    )
    plain = orders.join(customer, on="custkey")
    salted = salted_inner_join(orders, customer, on=["custkey"], n_salt=4)
    assert salted.count() == plain.count()
    a = {tuple(r) for r in salted.select("custkey", "o_orderkey", "c_nationkey").collect()}
    b = {tuple(r) for r in plain.select("custkey", "o_orderkey", "c_nationkey").collect()}
    assert a == b


def test_two_stage_distinct_matches_exact(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    got = {
        (r["event_type"], r["n_distinct"])
        for r in distinct_count_two_stage(ev, "event_type", "user_id").collect()
    }
    want = {
        (r["event_type"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_upsert_sql_renders_on_conflict():
    sql = upsert_sql("dst", ["id", "updated", "value"], keys=["id"])
    assert sql == (
        "INSERT INTO dst (id, updated, value) VALUES (%s, %s, %s) "
        "ON CONFLICT (id) DO UPDATE SET updated = excluded.updated, "
        "value = excluded.value"
    )


def test_jdbc_predicates_cover_range_disjointly():
    plan = plan_slices(0, 99, estimated_rows=1000, target_rows_per_slice=250)
    preds = plan.jdbc_predicates("updated")
    assert len(preds) == 4
    assert preds[0] == "updated >= 0 AND updated <= 24"
    assert preds[-1].endswith("<= 99")
