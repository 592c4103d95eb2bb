"""Core operator queries: SURVEY §2.2 (P1-P10), §2.4 (A1-A7),
§2.5 (W1-W2 + analytic extensions), §2.6 (O1-O3), §2.7 (set ops),
§2.8 (scalar functions).

Role mapping (FIXTURES.md §C): the reference's ``transactions`` table →
``events`` fixture (id→event_id, updated→unix_millis(ts),
status→event_type with 'error' ≈ 'BLOCKED', amount→value).

Normalization rules used throughout (and mirrored in every oracle):
- timestamps surface as BIGINT epoch millis (``unix_millis`` /
  DuckDB ``epoch_ms``) with the Spark session pinned to UTC;
- double aggregates go through DECIMAL(18,2) so they are exact and
  order-independent, then cast back to double;
- every LIMIT/top-k carries a unique tie-break column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pypgsync_spark.catalog import load_table
from pypgsync_spark.functions.time import events_range_pred, to_millis
from pypgsync_spark.operators.topk import topk, topk_per_key
from pypgsync_spark.operators.windowed import (
    distributed_row_number,
    row_number_boundaries,
)
from pypgsync_spark.queries import register

# Shared helpers (consolidated to queries/common.py in r12)
from pypgsync_spark.queries.common import (  # noqa: E402
    MS_JAN01,
    MS_JAN05,
    MS_JAN10,
    MS_JAN20,
    dsum as _dsum,
    events as _events,
    events_ms as _events_ms,
)


# ---------------------------------------------------------------- P1/P2

@register(
    "p1_full_scan",
    survey="P1,S7,F5",
    doc="Full projection of events with epoch-millis normalization "
    "(reference session.py:128 SELECT *).",
    oracle="""
    SELECT event_id, epoch_ms(ts) AS updated_ms, user_id, event_type, value, props
    FROM events
    """,
)
def p1_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).select(
        "event_id", to_millis("ts").alias("updated_ms"), "user_id", "event_type", "value", "props"
    )


@register(
    "p2_project_column",
    survey="P2",
    doc="Single-column projection (reference session.py:273-276 probe) — "
    "plan should show a one-column parquet ReadSchema.",
    oracle="SELECT event_id, epoch_ms(ts) AS updated_ms FROM events",
)
def p2_project_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).select("event_id", to_millis("ts").alias("updated_ms"))


# ------------------------------------------------------------ P3-P10

@register(
    "p3_filter_range_closed",
    survey="P3,C3",
    doc="Closed watermark-range predicate (reference session.py:129-132 "
    "slice bound: updated BETWEEN lo AND hi).",
    oracle=f"""
    SELECT event_id, epoch_ms(ts) AS updated_ms
    FROM events
    WHERE epoch_ms(ts) >= {MS_JAN05} AND epoch_ms(ts) <= {MS_JAN20}
    """,
)
def p3_filter_range_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_ms(spark, sf_dir)
    # Range stated on the raw parquet column (exact transposition; the
    # helper picks ts vs legacy ts_nanos) so it reaches PushedFilters;
    # on the derived updated_ms it cannot.
    return df.filter(
        events_range_pred(df, MS_JAN05, MS_JAN20, hi_inclusive=True)
    ).select("event_id", "updated_ms")


@register(
    "p4_filter_range_halfopen",
    survey="P4,W2",
    doc="Half-open window-range predicate (reference session.py:264-271 "
    "interval_to_expr: col >= start AND col < end).",
    oracle=f"""
    SELECT event_id, epoch_ms(ts) AS updated_ms
    FROM events
    WHERE epoch_ms(ts) >= {MS_JAN05} AND epoch_ms(ts) < {MS_JAN20}
    """,
)
def p4_filter_range_halfopen(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_ms(spark, sf_dir)
    return df.filter(
        events_range_pred(df, MS_JAN05, MS_JAN20, hi_inclusive=False)
    ).select("event_id", "updated_ms")


@register(
    "p5_filter_modulo",
    survey="P5,F6",
    doc="Modulo predicate (reference session.py:290-292 rownum % N = 1).",
    oracle="SELECT event_id, user_id FROM events WHERE event_id % 10 = 1",
)
def p5_filter_modulo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_id") % 10 == 1)
        .select("event_id", "user_id")
    )


@register(
    "p6_filter_eq",
    survey="P6",
    doc="Equality predicate (README.md:219 status = 'BLOCKED').",
    oracle="SELECT event_id, user_id, value FROM events WHERE event_type = 'error'",
)
def p6_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "value")
    )


@register(
    "p7_filter_neq",
    survey="P7",
    doc="Inequality predicate (README.md:150 status <> 'BLOCKED').",
    oracle="SELECT event_id, event_type FROM events WHERE event_type <> 'error'",
)
def p7_filter_neq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") != "error")
        .select("event_id", "event_type")
    )


# Derived nullable column standing in for the reference's nullable
# certified_by_user (README.md:150,182): certified iff purchase.
def _certified() -> F.Column:
    return F.when(F.col("event_type") == "purchase", F.col("updated_ms"))


@register(
    "p8_filter_not_null",
    survey="P8",
    doc="IS NOT NULL predicate on a nullable epoch-millis column "
    "(README.md:150 certified_by_user IS NOT NULL).",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END AS certified_ms
    FROM events
    WHERE CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END IS NOT NULL
    """,
)
def p8_filter_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_ms(spark, sf_dir).withColumn("certified_ms", _certified())
    return df.filter(F.col("certified_ms").isNotNull()).select("event_id", "certified_ms")


@register(
    "p8b_filter_is_null",
    survey="P8",
    doc="IS NULL predicate (README.md:195-196 trigger gate).",
    oracle="""
    SELECT count(*) AS cnt FROM events
    WHERE (CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) IS NULL
    """,
)
def p8b_filter_is_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_ms(spark, sf_dir).withColumn("certified_ms", _certified())
    return df.filter(F.col("certified_ms").isNull()).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "p9_filter_expr",
    survey="P9,F2,F3,F4",
    doc="Expression predicate: abs() + epoch-millis interval arithmetic "
    "(README.md:305-307: abs(amount) >= k AND age > interval).",
    oracle=f"""
    SELECT event_id, value, epoch_ms(ts) AS updated_ms
    FROM events
    WHERE abs(value) >= 150
      AND (epoch_ms(ts) - {MS_JAN01}) / 1000 > 10 * 86400
    """,
)
def p9_filter_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_ms(spark, sf_dir)
    return df.filter(
        (F.abs(F.col("value")) >= 150)
        & ((F.col("updated_ms") - MS_JAN01) / 1000 > 10 * 86400)
    ).select("event_id", "value", "updated_ms")


@register(
    "p10_filter_conjunction",
    survey="P10",
    doc="Multi-term AND composition (reference session.py:130-132).",
    oracle=f"""
    SELECT event_id FROM events
    WHERE event_type = 'purchase' AND value > 50 AND epoch_ms(ts) < {MS_JAN20}
    """,
)
def p10_filter_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_ms(spark, sf_dir)
    return df.filter(
        (F.col("event_type") == "purchase")
        & (F.col("value") > 50)
        & (F.col("updated_ms") < MS_JAN20)
    ).select("event_id")


# ------------------------------------------------------------- A1-A7

@register(
    "a1_max_watermark",
    survey="A1,C3",
    doc="Ungrouped MAX — resume watermark (reference session.py:57-59). "
    "Resolves from parquet row-group stats, no full scan.",
    oracle="SELECT max(epoch_ms(ts)) AS max_updated FROM events",
)
def a1_max_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).agg(F.max(to_millis("ts")).alias("max_updated"))


@register(
    "a2_min_watermark",
    survey="A2,C3",
    doc="Ungrouped MIN — cold-start watermark (reference session.py:61-63).",
    oracle="SELECT min(epoch_ms(ts)) AS min_updated FROM events",
)
def a2_min_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).agg(F.min(to_millis("ts")).alias("min_updated"))


@register(
    "a3_count_filtered",
    survey="A3",
    doc="COUNT(*) under equality filter (README.md:217-219, Q3a).",
    oracle="SELECT count(*) AS cnt FROM events WHERE event_type = 'error'",
)
def a3_count_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "a4_user_balance",
    bench=5,
    survey="A4,P7",
    doc="Grouped SUM — the README Q2 initial user_balance load "
    "(README.md:146-151): decimal-exact sum per user.",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS balance,
           count(*) AS n_events,
           max(epoch_ms(ts)) AS updated_ms
    FROM events WHERE event_type <> 'error'
    GROUP BY user_id
    """,
)
def a4_user_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") != "error")
        .groupBy("user_id")
        .agg(
            _dsum(F.col("value")).alias("balance"),
            F.count(F.lit(1)).alias("n_events"),
            F.max(to_millis("ts")).alias("updated_ms"),
        )
    )


@register(
    "a5_incremental_balance",
    survey="A5,T5",
    doc="Incremental aggregate maintenance (README.md:157-198 trigger): "
    "base balance over old rows merged with delta balance over new rows "
    "via full-outer sum — the oracle checks the fixed point equals a "
    "full re-aggregation.",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS balance
    FROM events WHERE event_type <> 'error'
    GROUP BY user_id
    """,
)
def a5_incremental_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_ms(spark, sf_dir).filter(F.col("event_type") != "error")
    dec = F.col("value").cast("decimal(18,2)")
    base = (
        df.filter(F.col("updated_ms") < MS_JAN10)
        .groupBy("user_id")
        .agg(F.sum(dec).alias("bal"))
    )
    delta = (
        df.filter(F.col("updated_ms") >= MS_JAN10)
        .groupBy("user_id")
        .agg(F.sum(dec).alias("bal"))
    )
    merged = base.alias("b").join(delta.alias("d"), on="user_id", how="full_outer")
    zero = F.lit(0).cast("decimal(18,2)")
    return merged.select(
        "user_id",
        (F.coalesce(F.col("b.bal"), zero) + F.coalesce(F.col("d.bal"), zero))
        .cast("double")
        .alias("balance"),
    )


@register(
    "a6_count_star",
    survey="A6",
    doc="Exact COUNT(*) for slice planning — replaces the reference's "
    "EXPLAIN-estimate (session.py:219-234); parquet metadata-only.",
    oracle="SELECT count(*) AS cnt FROM lineitem",
)
def a6_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "a7_distinct_users",
    survey="A7",
    doc="Exact COUNT(DISTINCT) (reference's approximate total, "
    "session.py:296-298, done exactly).",
    oracle="SELECT count(DISTINCT user_id) AS n_users FROM events",
)
def a7_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).agg(F.countDistinct("user_id").alias("n_users"))


@register(
    "a7b_approx_distinct_users",
    survey="A7,X2",
    doc="HyperLogLog++ approximate distinct — the distributed analogue "
    "of the reference's EXPLAIN cardinality estimate. No oracle (sketch "
    "values are engine-specific); driver records rows-only.",
    oracle=None,
)
def a7b_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx")
    )


@register(
    "a8_groupby_multi_agg",
    survey="A4,A3",
    doc="Multi-aggregate groupBy over event types: count/sum/min/max/avg "
    "with decimal-exact normalization.",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           min(value) AS min_value,
           max(value) AS max_value,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_value
    FROM events GROUP BY event_type
    """,
)
def a8_groupby_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    total = _dsum(F.col("value"))
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            total.alias("total_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.round(total / F.count(F.lit(1)), 6).alias("avg_value"),
        )
    )


@register(
    "a9_rollup",
    bench=8,
    survey="§2.4 ext",
    doc="ROLLUP hierarchy totals over lineitem (flag → flag+status → "
    "grand total) with GROUPING_ID disambiguating subtotal rows from "
    "genuine NULL keys. One shuffle; Spark expands grouping sets "
    "map-side.",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a9_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "a10_cube",
    survey="§2.4 ext",
    doc="CUBE over orders (status × priority): all four grouping "
    "combinations in one pass.",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           count(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a10_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            _dsum(F.col("o_totalprice")).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "a11_grouping_sets",
    survey="§2.4 ext",
    doc="Explicit GROUPING SETS ((event_type), (user_id), ()) — "
    "per-type totals, per-user totals, and the grand total in one "
    "aggregation.",
    oracle="""
    SELECT event_type, user_id,
           GROUPING(event_type, user_id) AS gid,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
           count(*) AS n
    FROM events GROUP BY GROUPING SETS ((event_type), (user_id), ())
    """,
)
def a11_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupingSets(
            [["event_type"], ["user_id"], []], "event_type", "user_id"
        )
        .agg(
            F.grouping_id().alias("gid"),
            _dsum(F.col("value")).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "a12_percentiles",
    survey="§2.4 ext",
    doc="Exact interpolated percentiles per event type (F.percentile == "
    "DuckDB quantile_cont). At 100 TB swap for percentile_approx "
    "(t-digest, mergeable map-side) — the exact form needs the full "
    "sorted group.",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def a12_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.round(F.percentile("value", 0.5), 6).alias("p50"),
            F.round(F.percentile("value", 0.9), 6).alias("p90"),
            F.round(F.percentile("value", 0.99), 6).alias("p99"),
        )
    )


@register(
    "a12b_approx_percentiles",
    survey="§2.4 ext,X2",
    doc="The at-scale percentile path: percentile_approx (Greenwald-"
    "Khanna sketch, mergeable map-side — the shuffle carries one "
    "sketch per (group × task) instead of every value; the exact form "
    "sorts the full group). Oracle-checked (r6 verdict #7): the GK "
    "sketch is EXACT while a group fits its accuracy buffer and "
    "returns an element of the input set (no arithmetic, no float "
    "divergence), so DuckDB's discrete quantile matches "
    "value-for-value — accuracy=100000 keeps that exact regime "
    "through sf0.1's 20k-row groups (verified both scales; 10000 "
    "diverged at sf0.1), while past the buffer the documented "
    "rank-error contract takes over, pytest-bounded vs exact "
    "percentiles (tests/test_oracle.py).",
    oracle="""
    SELECT event_type,
           quantile_disc(value, 0.5) AS p50,
           quantile_disc(value, 0.9) AS p90,
           quantile_disc(value, 0.99) AS p99
    FROM events GROUP BY event_type
    """,
)
def a12b_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 100_000).alias("p50"),
            F.percentile_approx("value", 0.9, 100_000).alias("p90"),
            F.percentile_approx("value", 0.99, 100_000).alias("p99"),
        )
    )


# ------------------------------------------------------------- W1-W4

@register(
    "w1_row_number_boundaries",
    bench=6,
    survey="W1,W2,P5",
    doc="The reference's signature windowed-range trick: global "
    "row_number + modulo boundary filter (session.py:273-292).",
    oracle="""
    SELECT event_id, rownum FROM (
        SELECT event_id, row_number() OVER (ORDER BY event_id) AS rownum FROM events
    ) WHERE rownum % 100 = 1
    """,
)
def w1_row_number_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    return row_number_boundaries(_events(spark, sf_dir), "event_id", 100)


@register(
    "w1b_distributed_rank",
    bench=10,
    survey="W1,W2",
    doc="w1's boundary extraction through the TWO-PASS distributed rank "
    "(range-repartition + per-partition prefix-sum offsets) instead of "
    "the single-task global window — identical result, no "
    "single-partition exchange; the 100 TB form of the reference's "
    "ROW_NUMBER trick.",
    oracle="""
    SELECT event_id, rownum FROM (
        SELECT event_id, row_number() OVER (ORDER BY event_id) AS rownum FROM events
    ) WHERE rownum % 100 = 1
    """,
)
def w1b_distributed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranked = distributed_row_number(
        _events(spark, sf_dir).select("event_id"), ["event_id"]
    )
    return ranked.filter((F.col("rownum") - 1) % 100 == 0).select("event_id", "rownum")


@register(
    "w1c_rank_desc",
    survey="W1,W2",
    doc="The reference README's DESC-ordered windowed-range variant "
    "(README.md:94-101: ROW_NUMBER() OVER (ORDER BY updated DESC)) via "
    "the two-pass distributed rank — descending range partitioning, "
    "same no-single-task plan.",
    oracle="""
    SELECT updated_ms, rownum FROM (
        SELECT epoch_ms(ts) AS updated_ms,
               row_number() OVER (ORDER BY ts DESC, event_id DESC) AS rownum
        FROM events
    ) WHERE rownum % 250 = 1
    """,
)
def w1c_rank_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranked = distributed_row_number(
        _events(spark, sf_dir).select("ts", "event_id"),
        ["ts", "event_id"],
        ascending=False,
    )
    return ranked.filter((F.col("rownum") - 1) % 250 == 0).select(
        to_millis("ts").alias("updated_ms"), "rownum"
    )


@register(
    "w2_windowed_ranges_ts",
    survey="W2,C1",
    doc="Boundary extraction on the time column with unique tie-break "
    "(session.py:283-308 windowed_query).",
    oracle="""
    SELECT updated_ms, rownum FROM (
        SELECT epoch_ms(ts) AS updated_ms,
               row_number() OVER (ORDER BY ts, event_id) AS rownum
        FROM events
    ) WHERE rownum % 250 = 1
    """,
)
def w2_windowed_ranges_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.orderBy(F.col("ts"), F.col("event_id"))
    return (
        _events(spark, sf_dir)
        .select(to_millis("ts").alias("updated_ms"), F.row_number().over(w).alias("rownum"))
        .filter(F.col("rownum") % 250 == 1)
    )


@register(
    "w3_running_balance",
    survey="W1,A5",
    doc="README Q2 running balance as an analytic window: "
    "sum over (partition by user order by time rows unbounded "
    "preceding), latest row per user (SURVEY §2.5 note).",
    oracle="""
    SELECT user_id, CAST(running AS DOUBLE) AS balance FROM (
        SELECT user_id,
               SUM(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type <> 'error'
    ) WHERE rn = 1
    """,
)
def w3_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir).filter(F.col("event_type") != "error")
    wsum = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wlast = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        df.withColumn("running", F.sum(F.col("value").cast("decimal(18,2)")).over(wsum))
        .withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("running").cast("double").alias("balance"))
    )


@register(
    "w4_sessionize_lag",
    survey="W1",
    doc="Sessionization via lag(): count sessions per user with a "
    "1-hour inactivity gap (analytic-window extension).",
    oracle="""
    SELECT user_id, count(*) AS n_sessions FROM (
        SELECT user_id,
               CASE WHEN prev_ms IS NULL OR updated_ms - prev_ms > 3600000
                    THEN 1 ELSE 0 END AS is_start
        FROM (
            SELECT user_id, epoch_ms(ts) AS updated_ms,
                   lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
            FROM events
        )
    ) WHERE is_start = 1 GROUP BY user_id
    """,
)
def w4_sessionize_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    df = _events_ms(spark, sf_dir).withColumn("prev_ms", F.lag("updated_ms").over(w))
    return (
        df.withColumn(
            "is_start",
            F.when(
                F.col("prev_ms").isNull() | (F.col("updated_ms") - F.col("prev_ms") > 3600000),
                1,
            ).otherwise(0),
        )
        .filter(F.col("is_start") == 1)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )


@register(
    "w5_window_analytics",
    survey="W1",
    doc="Analytic-window extension beyond row_number: ntile quartiles, "
    "lead (next order price), first_value (first order date) per "
    "customer — one shuffle on the partition key serves all three "
    "functions (single Window exchange).",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ntile(4) OVER w AS quartile,
           lead(o_totalprice) OVER w AS next_price,
           first_value(epoch_ms(o_orderdate)) OVER w AS first_date_ms
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w5_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first(to_millis("o_orderdate")).over(w).alias("first_date_ms"),
    )


# ------------------------------------------------------------- O1-O3

@register(
    "o1_sort_limit",
    survey="O1",
    doc="ORDER BY ASC with LIMIT (reference session.py:133 ordered scan; "
    "unique tie-break for determinism).",
    oracle="""
    SELECT event_id, epoch_ms(ts) AS updated_ms FROM events
    ORDER BY ts, event_id LIMIT 100
    """,
)
def o1_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk(
        _events_ms(spark, sf_dir).select("event_id", "updated_ms", "ts"),
        [F.col("ts").asc(), F.col("event_id").asc()],
        100,
    ).select("event_id", "updated_ms")


@register(
    "o2_topk_single_key",
    survey="O2",
    doc="Per-user latest-10 (README.md:250-255, Q3b): filter + ORDER BY "
    "DESC + LIMIT — plans as TakeOrderedAndProject, the index-free top-k.",
    oracle="""
    SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) AS orderdate_ms, o_totalprice
    FROM orders WHERE o_custkey = 42
    ORDER BY o_orderdate DESC, o_orderkey LIMIT 10
    """,
)
def o2_topk_single_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return topk(
        orders.filter(F.col("o_custkey") == 42),
        [F.col("o_orderdate").desc(), F.col("o_orderkey").asc()],
        10,
    ).select(
        "o_orderkey",
        "o_custkey",
        to_millis("o_orderdate").alias("orderdate_ms"),
        "o_totalprice",
    )


@register(
    "o3_topk_per_key",
    bench=7,
    survey="O2,W1",
    doc="Top-3 orders per customer via ranked window (the scale form of "
    "Q3b across all keys at once; WindowGroupLimit pushdown).",
    oracle="""
    SELECT o_orderkey, o_custkey, rn FROM (
        SELECT o_orderkey, o_custkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def o3_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return topk_per_key(
        orders, ["o_custkey"], [F.col("o_orderdate").desc(), F.col("o_orderkey").asc()], 3
    ).select("o_orderkey", "o_custkey", "rn")


# ---------------------------------------------------------- set ops

@register(
    "set_union_all",
    survey="§2.7",
    doc="UNION ALL of two filtered branches (the upsert's "
    "insert ∪ update partition, session.py:142-144).",
    oracle="""
    SELECT event_id, 'signup' AS branch FROM events WHERE event_type = 'signup'
    UNION ALL
    SELECT event_id, 'error' AS branch FROM events WHERE event_type = 'error'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    a = e.filter(F.col("event_type") == "signup").select(
        "event_id", F.lit("signup").alias("branch")
    )
    b = e.filter(F.col("event_type") == "error").select(
        "event_id", F.lit("error").alias("branch")
    )
    return a.unionByName(b)


@register(
    "set_intersect",
    survey="§2.7",
    doc="INTERSECT of key sets.",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    a = e.filter(F.col("event_type") == "purchase").select("user_id")
    b = e.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@register(
    "set_except",
    survey="§2.7",
    doc="EXCEPT (anti set difference).",
    oracle="""
    SELECT event_id FROM events WHERE event_type = 'purchase'
    EXCEPT
    SELECT event_id FROM events WHERE value > 100
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    a = e.filter(F.col("event_type") == "purchase").select("event_id")
    b = e.filter(F.col("value") > 100).select("event_id")
    return a.subtract(b)  # EXCEPT DISTINCT semantics


# ------------------------------------------------------ scalar F1-F6

@register(
    "f1_epoch_roundtrip",
    survey="F1,F5",
    doc="Epoch-millis ↔ timestamp round trip + seconds truncation "
    "(README.md:148 extract(epoch from now())*1000 family).",
    oracle="""
    SELECT event_id,
           epoch_ms(ts) AS updated_ms,
           CAST(floor(epoch_ms(ts) / 1000) AS BIGINT) AS updated_s,
           epoch_ms(make_timestamp(epoch_ms(ts) * 1000)) AS roundtrip_ms
    FROM events
    """,
)
def f1_epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_ms(spark, sf_dir)
    return df.select(
        "event_id",
        "updated_ms",
        F.floor(F.col("updated_ms") / 1000).cast("long").alias("updated_s"),
        F.unix_millis(F.timestamp_millis(F.col("updated_ms"))).alias("roundtrip_ms"),
    )


@register(
    "f2_abs_arith",
    survey="F2,F3,F6",
    doc="abs(), arithmetic, and modulo scalar functions "
    "(README.md:298,306; session.py:292).",
    oracle="""
    SELECT event_id,
           round(abs(value - 100), 2) AS dist_from_100,
           event_id % 7 AS id_mod7
    FROM events
    """,
)
def f2_abs_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).select(
        "event_id",
        F.round(F.abs(F.col("value") - 100), 2).alias("dist_from_100"),
        (F.col("event_id") % 7).alias("id_mod7"),
    )


@register(
    "f4_interval_span",
    survey="F4,A1,A2",
    doc="Interval comparison as epoch-millis arithmetic (README.md:299, "
    "306-307): users active over a span > 20 days.",
    oracle="""
    SELECT user_id, max(epoch_ms(ts)) - min(epoch_ms(ts)) AS span_ms
    FROM events GROUP BY user_id
    HAVING max(epoch_ms(ts)) - min(epoch_ms(ts)) > 20 * 86400000
    """,
)
def f4_interval_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    ms = to_millis("ts")
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg((F.max(ms) - F.min(ms)).alias("span_ms"))
        .filter(F.col("span_ms") > 20 * 86400000)
    )


@register(
    "f_json_extract",
    survey="§2.8 ext",
    doc="JSON property extraction from events.props (extension layer; "
    "get_json_object, JVM-side).",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """,
)
def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pypgsync_spark.functions.json import json_get_long

    df = _events(spark, sf_dir).withColumn("k", json_get_long("props", "k"))
    return df.filter(F.col("k") >= 50).select("event_id", "k")


@register(
    "f_string_funcs",
    survey="§2.8,F7",
    doc="String scalar functions: upper/substr/length/concat.",
    oracle="""
    SELECT event_id,
           upper(event_type) AS et_upper,
           substr(event_type, 1, 3) AS et_prefix,
           length(event_type) AS et_len,
           event_type || ':' || CAST(user_id AS VARCHAR) AS et_key
    FROM events
    """,
)
def f_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).select(
        "event_id",
        F.upper("event_type").alias("et_upper"),
        F.substring("event_type", 1, 3).alias("et_prefix"),
        F.length("event_type").alias("et_len"),
        F.concat_ws(":", F.col("event_type"), F.col("user_id").cast("string")).alias("et_key"),
    )


@register(
    "f_case_when",
    survey="§2.8",
    doc="CASE WHEN bucketing + grouped count.",
    oracle="""
    SELECT CASE WHEN value >= 200 THEN 'high'
                WHEN value >= 100 THEN 'mid'
                ELSE 'low' END AS bucket,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def f_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = (
        F.when(F.col("value") >= 200, "high")
        .when(F.col("value") >= 100, "mid")
        .otherwise("low")
    )
    return (
        _events(spark, sf_dir)
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "f_date_trunc",
    survey="§2.8,F5",
    doc="Daily rollup via date_trunc (the partition-by-date layout probe "
    "— the Spark analogue of the README's BRIN time-range reasoning).",
    oracle="""
    SELECT epoch_ms(date_trunc('day', ts)) AS day_ms,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
)
def f_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(F.unix_millis(F.date_trunc("DAY", F.col("ts"))).alias("day_ms"))
        .agg(F.count(F.lit(1)).alias("n"), _dsum(F.col("value")).alias("total_value"))
    )


@register(
    "a14_pivot_types",
    survey="§2.4 ext",
    doc="Pivot: per-user event counts spread across the five event_type "
    "columns. The value list is PINNED (not discovered) — Spark's "
    "unpinned pivot runs an extra distinct-collect job over the corpus "
    "and makes the output schema data-dependent, both wrong at 100 TB. "
    "Plans as one conditional aggregate, same shuffle as a plain "
    "groupBy.",
    oracle="""
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'error')    AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
)
def a14_pivot_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .pivot("event_type", types)
        .count()
        # pivot leaves NULL where a (user, type) pair never occurred;
        # the FILTER oracle counts 0 there
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types],
        )
    )


@register(
    "a15_multi_distinct",
    bench=27,
    survey="A7,A4",
    doc="Grouped multi-distinct aggregate: distinct users AND distinct "
    "active days per event type in one pass — Catalyst plans the two "
    "DISTINCT columns through a single Expand (each input row fans to "
    "one tagged row per distinct spec, partially aggregated map-side), "
    "so the data shuffles once on the group key instead of once per "
    "distinct column; the plain count rides the same Expand.",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT CAST(ts AS DATE)) AS n_days,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def a15_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct(F.to_date("ts")).alias("n_days"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "w7_range_frame",
    bench=31,
    survey="W1,W2,F3",
    doc="Event-time RANGE window frame: per user, the trailing-24-hour "
    "event count and value sum at every event — RANGE BETWEEN on the "
    "epoch-millis order key, so frame membership follows VALUES not "
    "row positions (peers with equal timestamps all join the frame, "
    "which also makes the result tie-deterministic). One shuffle on "
    "user_id; in-partition frames evaluate with a sliding two-pointer "
    "pass, never re-scanning the window per row.",
    oracle="""
    SELECT event_id, user_id, epoch_ms(ts) AS ms,
           CAST(count(*) OVER w AS BIGINT) AS n_24h,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_24h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
                 RANGE BETWEEN 86400000 PRECEDING AND CURRENT ROW)
    """,
)
def w7_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("updated_ms")
        .rangeBetween(-86400000, 0)
    )
    return _events_ms(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.col("updated_ms").alias("ms"),
        F.count(F.lit(1)).over(w).alias("n_24h"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("sum_24h"),
    )


@register(
    "skew1_heavy_hitters",
    bench=49,
    survey="A4,O2,ext:skew",
    doc="Join-key skew profiler: the 10 heaviest user_id keys in "
    "events with their frequency share — the diagnostic that decides "
    "whether a join needs salting (j8) or AQE skew splitting. One "
    "map-side-combined groupBy; the top-10 plans as "
    "TakeOrderedAndProject (heap, no global sort) and the corpus "
    "total rides along as a scalar subquery, so the share needs no "
    "window over the full key table.",
    oracle="""
    SELECT user_id, count(*) AS n,
           round(count(*) * 1.0 / (SELECT count(*) FROM events), 6) AS share
    FROM events GROUP BY user_id
    ORDER BY n DESC, user_id LIMIT 10
    """,
)
def skew1_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # lazy scalar subquery — the a21/j20/j29 idiom (r10 review: the
    # previous temp-view + SQL-text form mutated session catalog state
    # and maintained a second shape of the same plan)
    total = ev.agg(F.count(F.lit(1))).scalar()
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            "n",
            F.round(F.col("n") / total, 6).alias("share"),
        )
        .orderBy(F.col("n").desc(), F.col("user_id"))
        .limit(10)
    )


@register(
    "a16_cohort_retention",
    bench=55,
    survey="A4,A7,F5",
    doc="Cohort retention matrix: users bucketed by first-seen day, "
    "then distinct active users per (cohort_day, day offset) — the "
    "classic product-analytics rollup. Two map-side-combined shuffles "
    "(per-user min day; distinct users per cell), no window over the "
    "fact table.",
    oracle="""
    WITH f AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT f.cohort_day,
           CAST(datediff('day', f.cohort_day, a.d) AS INT) AS offset_days,
           count(DISTINCT a.user_id) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def a16_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    day = F.to_date("ts")
    first = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    act = ev.select("user_id", day.alias("d")).distinct()
    return (
        act.join(first, on="user_id")
        .groupBy(
            "cohort_day",
            F.datediff("d", "cohort_day").cast("int").alias("offset_days"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "w8_cumulative_users",
    bench=56,
    survey="W1,A7,A4",
    doc="Daily activity rollup with RUNNING totals, windowed-distinct-"
    "free: cumulative distinct users = count of users whose FIRST-seen "
    "day is <= d, so one per-user min + per-day counts + cumsums over "
    "day-level rows (metadata-scale) replace the O(days x users) "
    "running-set a naive windowed distinct would maintain. The day key "
    "is epoch-millis floor division (the a17 pattern) emitted as "
    "BIGINT day-start millis, so neither engine performs a DATE cast "
    "(Spark would cast the nanos-normalized ts, DuckDB the raw parquet "
    "one — the r7 hash divergence class), and the window sums are "
    "pinned BIGINT on both sides (DuckDB promotes windowed SUM(BIGINT) "
    "to HUGEINT).",
    oracle="""
    WITH e AS (
      SELECT user_id, (epoch_ms(ts) // 86400000) * 86400000 AS day_ms
      FROM events
    ),
    f AS (SELECT user_id, min(day_ms) AS fd FROM e GROUP BY user_id),
    nd AS (SELECT fd, count(*) AS new_users FROM f GROUP BY fd),
    ad AS (SELECT day_ms, count(*) AS n_events FROM e GROUP BY day_ms)
    SELECT ad.day_ms, ad.n_events,
           CAST(SUM(ad.n_events) OVER (ORDER BY ad.day_ms
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_events,
           CAST(SUM(COALESCE(nd.new_users, 0)) OVER (ORDER BY ad.day_ms
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM ad LEFT JOIN nd ON nd.fd = ad.day_ms
    """,
)
def w8_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ms = to_millis(F.col("ts"))
    ev = _events(spark, sf_dir).select(
        "user_id", (ms - ms % F.lit(86400000)).alias("day_ms")
    )
    first = ev.groupBy("user_id").agg(F.min("day_ms").alias("fd"))
    new_users = first.groupBy("fd").agg(F.count(F.lit(1)).alias("new_users"))
    per_day = ev.groupBy("day_ms").agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy()
        .orderBy("day_ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_day.join(new_users, per_day["day_ms"] == new_users["fd"], "left")
        .select(
            "day_ms",
            "n_events",
            F.sum("n_events").over(w).alias("cum_events"),
            F.sum(F.coalesce("new_users", F.lit(0))).over(w).alias("cum_users"),
        )
    )


@register(
    "a17_sliding_window_counts",
    bench=62,
    survey="A4,T3 ext",
    doc="Hopping (sliding) window rollup: per-type event counts over "
    "2-hour windows sliding every hour — F.window(ts, '2 hours', "
    "'1 hour'), the batch twin of the streaming tumbling rollup (t6). "
    "Spark expands each event into width/slide = 2 window membership "
    "rows BEFORE the aggregation (the oracle states that expansion "
    "explicitly: k in {0,1} hour offsets off the epoch-aligned floor), "
    "then map-side combines — the shuffle carries (window × type) "
    "partials, 2× a tumbling rollup's, never 2× the events.",
    oracle="""
    WITH e AS (SELECT epoch_ms(ts) AS ms, event_type FROM events),
    x AS (
      SELECT (ms // 3600000) * 3600000 - k * 3600000 AS win_start_ms, event_type
      FROM e, (SELECT unnest(range(0, 2)) AS k) g
    )
    SELECT win_start_ms, event_type, count(*) AS n
    FROM x GROUP BY win_start_ms, event_type
    """,
)
def a17_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = F.window("ts", "2 hours", "1 hour")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            to_millis(F.col("w.start")).alias("win_start_ms"), "event_type", "n"
        )
    )


@register(
    "a18_event_type_sets",
    bench=63,
    survey="A4,§2.7 ext",
    doc="Array aggregation: per-user DISTINCT event-type set as a "
    "SORTED array (collect_set + sort_array == DuckDB "
    "list_sort(list_distinct(list(...)))) plus the event count — the "
    "profile-building shape (one row per entity, nested set column) "
    "that feeds feature stores. collect_set is an algebraic aggregate: "
    "map-side partial sets merge in the shuffle, which carries "
    "per-(user × task) DISTINCT types (bounded by the type "
    "cardinality), never the event stream; the sort pins array order. "
    "The set is SERIALIZED to a ','-joined string for the contract: "
    "the r7 driver sweep proved its pandas canonicalizer cannot hash "
    "an array column (unhashable type: 'list'), so the comparable "
    "shape is the joined string — the array form stays one "
    "array_join removal away for operator use.",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list_distinct(list(event_type))), ',')
             AS types,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def a18_event_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("event_type")), ","
            ).alias("types"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "a19_unpivot_features",
    bench=64,
    survey="A14 ext,P2",
    doc="UNPIVOT (melt): lineitem's numeric feature columns reshaped "
    "wide->long into (keys, feature, val) — the feature-table "
    "normalization step before per-feature statistics or a feature "
    "store load; inverse of a14's pivot. Spark plans Expand (each "
    "input row emits one row per value column in the same task) — a "
    "map-only 3x row expansion, zero shuffle, and the scan reads only "
    "the five referenced columns.",
    oracle="""
    SELECT l_orderkey, l_linenumber, feature, val FROM (
      UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
               FROM lineitem)
      ON l_quantity, l_discount, l_tax INTO NAME feature VALUE val
    )
    """,
)
def a19_unpivot_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
    )
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="feature",
        valueColumnName="val",
    )


@register(
    "w9_decile_profile",
    bench=72,
    survey="W1,A4 ext",
    doc="ntile decile profile: rank every event's value into 10 "
    "equal-count buckets WITHIN its event_type (partitioned window — "
    "no global sort, each type's deciles computed where its rows "
    "live), then per-(type, decile) count + mean. Deterministic under "
    "ties via the (value, event_id) order; ntile pinned BIGINT on "
    "both engines (the w8 dtype-hash lesson). The follow-on rollup "
    "map-side combines to 10·|types| rows.",
    oracle="""
    WITH d AS (
      SELECT event_type, value,
             CAST(ntile(10) OVER (
               PARTITION BY event_type ORDER BY value, event_id
             ) AS BIGINT) AS decile
      FROM events
    )
    SELECT event_type, decile, count(*) AS n,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
             AS avg_value
    FROM d GROUP BY event_type, decile
    """,
)
def w9_decile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    d = _events(spark, sf_dir).select(
        "event_type", "value", F.ntile(10).over(w).cast("long").alias("decile")
    )
    return d.groupBy("event_type", "decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(_dsum(F.col("value")) / F.count(F.lit(1)), 6).alias("avg_value"),
    )


@register(
    "a21_value_histogram",
    bench=77,
    survey="A4,X2 ext",
    doc="Fixed-width 20-bin histogram of event values: the min/max "
    "ride as DataFrame.scalar() uncorrelated subqueries (one-time "
    "jobs, injected as literals — no 1-row join), the bin index is "
    "pure double arithmetic identical on both engines (same "
    "left-associative (v-mn)*20/(mx-mn) expression, IEEE doubles), "
    "and the rollup map-side combines 20 groups. The equal-WIDTH "
    "complement of w9's equal-COUNT deciles.",
    oracle="""
    WITH s AS (
      SELECT min(value) AS mn, max(value) AS mx FROM events
    )
    SELECT CAST(least(floor((value - mn) * 20 / (mx - mn)), 19) AS BIGINT)
             AS bin,
           count(*) AS n
    FROM events, s
    GROUP BY bin
    """,
)
def a21_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    mn = ev.agg(F.min("value")).scalar()
    mx = ev.agg(F.max("value")).scalar()
    bin_ = F.least(
        F.floor((F.col("value") - mn) * 20 / (mx - mn)), F.lit(19)
    ).cast("long")
    return ev.groupBy(bin_.alias("bin")).agg(F.count(F.lit(1)).alias("n"))


@register(
    "a22_feature_moments",
    bench=80,
    survey="A4,A14 ext,X2",
    doc="Per-feature standardization statistics + outlier census over "
    "a19's unpivoted (feature, val) stream: mean and variance derived "
    "from EXACT decimal power sums (sum, sum-of-squares — both "
    "algebraic, map-side combined; decimal(18,2)² = decimal(36,4) "
    "stays exact), converted to double only at the end with the SAME "
    "expression order on both engines, then one broadcast join of the "
    "3-row stats table back onto the stream counts |z| > 3 outliers. "
    "Two scans of a map-only Expand — no window, no second shuffle of "
    "the data: the z-threshold compare uses identical IEEE doubles.",
    oracle="""
    WITH long AS (
      SELECT feature, val FROM (
        UNPIVOT (SELECT l_quantity, l_discount, l_tax FROM lineitem)
        ON l_quantity, l_discount, l_tax INTO NAME feature VALUE val
      )
    ),
    stats AS (
      SELECT feature, count(*) AS n,
             CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(val AS DECIMAL(18,2)) * CAST(val AS DECIMAL(18,2)))
                  AS DOUBLE) AS s2
      FROM long GROUP BY feature
    ),
    m AS (
      SELECT feature, n, s1 / n AS mean,
             sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std
      FROM stats
    )
    SELECT m.feature, n, round(mean, 6) AS mean, round(std, 6) AS std,
           CAST(sum(CASE WHEN abs(val - mean) > 3 * std THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM long JOIN m USING (feature)
    GROUP BY m.feature, n, mean, std
    """,
)
def a22_feature_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pypgsync_spark.operators.dedup import spread_if_underpartitioned

    # the 3-column projection arrives in as many partitions as the
    # fixture file has row groups (3 at sf0.1) while the decimal
    # Expand + power-sum aggregation is CPU-dense — spread it across
    # the cores first (guide §2: parallelism decoupled from input
    # bytes; r14 profile: 0.96 s over 3 tasks -> ~0.1 s over 32)
    li = spread_if_underpartitioned(
        load_table(spark, sf_dir, "lineitem").select(
            "l_quantity", "l_discount", "l_tax"
        )
    )
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="feature",
        valueColumnName="val",
    )
    vd = F.col("val").cast("decimal(18,2)")
    stats = long.groupBy("feature").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vd).cast("double").alias("s1"),
        F.sum(vd * vd).cast("double").alias("s2"),
    )
    m = stats.select(
        "feature",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("std"),
    )
    return (
        long.join(F.broadcast(m), on="feature")
        .groupBy("feature", "n", "mean", "std")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("val") - F.col("mean")) > 3 * F.col("std"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            "feature",
            "n",
            F.round("mean", 6).alias("mean"),
            F.round("std", 6).alias("std"),
            "n_outliers",
        )
    )


@register(
    "a23_event_funnel",
    bench=81,
    survey="A4,W1 ext",
    doc="Ordered conversion funnel view → click → purchase: per user, "
    "nested RUNNING flags over one (user, time) window — seen_view, "
    "then click-after-view, then purchase-after-that — so stage "
    "membership respects event ORDER, not mere presence (a user who "
    "purchases before ever viewing does not convert). The window is "
    "PARTITIONED by user (no global sort; Spark chains the two "
    "window layers over one exchange+sort since the spec is "
    "identical), per-user flags collapse with max, and the funnel "
    "report is a 1-row conditional aggregate.",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id FROM events
    ),
    w1 AS (
      SELECT user_id, event_type, ms, event_id,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ms, event_id
                     ROWS UNBOUNDED PRECEDING) AS seen_view
      FROM e
    ),
    w2 AS (
      SELECT user_id, event_type,
             seen_view,
             max(CASE WHEN event_type = 'click' AND seen_view = 1
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ms, event_id
                     ROWS UNBOUNDED PRECEDING) AS seen_cav
      FROM w1
    ),
    per_user AS (
      SELECT user_id,
             max(seen_view) AS had_view,
             max(CASE WHEN event_type = 'click' AND seen_view = 1
                      THEN 1 ELSE 0 END) AS had_cav,
             max(CASE WHEN event_type = 'purchase' AND seen_cav = 1
                      THEN 1 ELSE 0 END) AS had_paf
      FROM w2 GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(sum(had_view) AS BIGINT) AS n_viewed,
           CAST(sum(had_cav) AS BIGINT) AS n_clicked_after_view,
           CAST(sum(had_paf) AS BIGINT) AS n_purchased_after_funnel
    FROM per_user
    """,
)
def a23_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_ms(spark, sf_dir).select(
        "user_id", "event_type", "updated_ms", "event_id"
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("updated_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_view = F.when(F.col("event_type") == "view", 1).otherwise(0)
    w1 = ev.withColumn("seen_view", F.max(is_view).over(win))
    cav = F.when(
        (F.col("event_type") == "click") & (F.col("seen_view") == 1), 1
    ).otherwise(0)
    w2 = w1.withColumn("seen_cav", F.max(cav).over(win))
    paf = F.when(
        (F.col("event_type") == "purchase") & (F.col("seen_cav") == 1), 1
    ).otherwise(0)
    per_user = w2.groupBy("user_id").agg(
        F.max("seen_view").alias("had_view"),
        F.max(cav).alias("had_cav"),
        F.max(paf).alias("had_paf"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("had_view").cast("long").alias("n_viewed"),
        F.sum("had_cav").cast("long").alias("n_clicked_after_view"),
        F.sum("had_paf").cast("long").alias("n_purchased_after_funnel"),
    )


@register(
    "w10_session_spans",
    bench=87,
    survey="W1 ext,A4",
    doc="Gaps-and-islands session spans: w4's lag-gap session starts "
    "become running session ids (sum of start flags over the same "
    "(user, time) window — Spark chains lag, the running sum and the "
    "per-session rollup over ONE exchange+sort since every layer "
    "shares the window spec), then per user the session count, "
    "longest span in ms (exact long arithmetic) and mean events per "
    "session (one double division, rounded 6).",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_ms(ts) AS ms, event_id,
             lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ms, event_id) AS prev_ms
      FROM (SELECT user_id, ts, event_id, epoch_ms(ts) AS ms FROM events)
    ),
    f AS (
      SELECT user_id, ms, event_id,
             CASE WHEN prev_ms IS NULL OR ms - prev_ms > 3600000
                  THEN 1 ELSE 0 END AS is_start
      FROM e
    ),
    g AS (
      SELECT user_id, ms,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM f
    ),
    s AS (
      SELECT user_id, sess_id, count(*) AS n_events,
             max(ms) - min(ms) AS span_ms
      FROM g GROUP BY user_id, sess_id
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(max(span_ms) AS BIGINT) AS max_span_ms,
           round(CAST(SUM(n_events) AS DOUBLE) / count(*), 6) AS avg_events
    FROM s GROUP BY user_id
    """,
)
def w10_session_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_ms(spark, sf_dir).select("user_id", "updated_ms", "event_id")
    w = Window.partitionBy("user_id").orderBy("updated_ms", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("updated_ms") - F.lag("updated_ms").over(w)
    is_start = F.when(gap.isNull() | (gap > 3600000), 1).otherwise(0)
    sess = (
        ev.withColumn("is_start", is_start)
        .withColumn("sess_id", F.sum("is_start").over(run))
        .groupBy("user_id", "sess_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("updated_ms") - F.min("updated_ms")).alias("span_ms"),
        )
    )
    return sess.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.max("span_ms").cast("long").alias("max_span_ms"),
        F.round(
            F.sum("n_events").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_events"),
    )


@register(
    "o4_keyset_page",
    bench=89,
    survey="O1 ext,P1",
    doc="Keyset (cursor) pagination — the scale-safe alternative to "
    "OFFSET: page after cursor (ms, event_id) = (2024-01-15T00:00Z, "
    "0) in (ms, event_id) order, 100 rows. The row-comparison "
    "predicate is a plain filter, so the scan prunes BEFORE the "
    "sort and the physical plan is TakeOrderedAndProject (per-"
    "partition top-k + driver merge of 100-row heaps) — no global "
    "sort, no skip-scan of dead rows, unlike OFFSET which at 100 TB "
    "must still produce and discard every preceding row.",
    oracle="""
    SELECT event_id, epoch_ms(ts) AS ms, event_type
    FROM events
    WHERE epoch_ms(ts) > 1705276800000
       OR (epoch_ms(ts) = 1705276800000 AND event_id > 0)
    ORDER BY ms, event_id LIMIT 100
    """,
)
def o4_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_ms(spark, sf_dir)
    cur_ms, cur_id = 1705276800000, 0
    # Redundant-but-PUSHABLE conjunct on the RAW ts column (r10
    # review): the row-comparison predicate below sits on the derived
    # updated_ms, which Catalyst cannot invert into a PushedFilter —
    # without the range conjunct the scan reads every row group and
    # the docstring's "prunes BEFORE the sort" claim is false. The
    # keyset predicate implies ms >= cur_ms exactly, so adding it
    # changes no rows (the p3 transposition pattern).
    ev = df.filter(events_range_pred(df, lo_ms=cur_ms)).select(
        "event_id", F.col("updated_ms").alias("ms"), "event_type"
    )
    return (
        ev.filter(
            (F.col("ms") > cur_ms)
            | ((F.col("ms") == cur_ms) & (F.col("event_id") > cur_id))
        )
        .orderBy("ms", "event_id")
        .limit(100)
    )


@register(
    "w11_mom_growth",
    bench=93,
    survey="W1 ext,A4",
    doc="Month-over-month revenue growth: orders roll up to integer "
    "month ids (year*100+month — pure int arithmetic, no DATE-type "
    "canonicalization in the contract), revenue decimal-exact, then "
    "lag/delta/growth over the ~80-row month table — the deliberate "
    "place for an unpartitioned window (metadata-scale by "
    "construction, like samp3's mixture weights). Growth is one "
    "double division of two exact-decimal-derived doubles, rounded "
    "6; the first month's NULLs pass through both engines.",
    oracle="""
    WITH m AS (
      SELECT year(o_orderdate) * 100 + month(o_orderdate) AS month_id,
             count(*) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
      FROM orders GROUP BY month_id
    )
    SELECT month_id, n_orders,
           CAST(rev_d AS DOUBLE) AS revenue,
           CAST(lag(rev_d) OVER (ORDER BY month_id) AS DOUBLE) AS prev_revenue,
           round((CAST(rev_d AS DOUBLE)
                  - CAST(lag(rev_d) OVER (ORDER BY month_id) AS DOUBLE))
                 / CAST(lag(rev_d) OVER (ORDER BY month_id) AS DOUBLE),
                 6) AS mom_growth
    FROM m
    """,
)
def w11_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("month_id")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_d"),
    )
    w = Window.orderBy("month_id")
    prev = F.lag("rev_d").over(w)
    return m.select(
        "month_id",
        "n_orders",
        F.col("rev_d").cast("double").alias("revenue"),
        prev.cast("double").alias("prev_revenue"),
        F.round(
            (F.col("rev_d").cast("double") - prev.cast("double"))
            / prev.cast("double"),
            6,
        ).alias("mom_growth"),
    )


@register(
    "profile3_correlation_matrix",
    bench=94,
    survey="A4,A14 ext,X2",
    doc="Single-pass Pearson correlations between the three lineitem "
    "measures from EXACT decimal power sums (sum, sum-of-squares, "
    "cross products — all algebraic, map-side combined; no built-in "
    "corr(), whose engine-internal accumulation order is not "
    "contract-stable). One scan, one 1-row aggregate; the corr "
    "formula then runs on doubles in the SAME expression order on "
    "both engines and rounds to 6. The a22 pattern widened to "
    "covariances — what a feature-profiling pass computes before "
    "feature selection at 100 TB.",
    oracle="""
    WITH s AS (
      SELECT count(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sd,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sqq,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sdd,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sqd,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS spd
      FROM lineitem
    )
    SELECT n,
           round((n * sqp - sq * sp)
                 / (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)),
                 6) AS corr_qty_price,
           round((n * sqd - sq * sd)
                 / (sqrt(n * sqq - sq * sq) * sqrt(n * sdd - sd * sd)),
                 6) AS corr_qty_disc,
           round((n * spd - sp * sd)
                 / (sqrt(n * spp - sp * sp) * sqrt(n * sdd - sd * sd)),
                 6) AS corr_price_disc
    FROM s
    """,
)
def profile3_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(18,2)")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sq"),
        F.sum(p).cast("double").alias("sp"),
        F.sum(d).cast("double").alias("sd"),
        F.sum(q * q).cast("double").alias("sqq"),
        F.sum(p * p).cast("double").alias("spp"),
        F.sum(d * d).cast("double").alias("sdd"),
        F.sum(q * p).cast("double").alias("sqp"),
        F.sum(q * d).cast("double").alias("sqd"),
        F.sum(p * d).cast("double").alias("spd"),
    )
    n = F.col("n")

    def corr(sxy, sx, sy, sxx, syy):
        return F.round(
            (n * F.col(sxy) - F.col(sx) * F.col(sy))
            / (
                F.sqrt(n * F.col(sxx) - F.col(sx) * F.col(sx))
                * F.sqrt(n * F.col(syy) - F.col(sy) * F.col(sy))
            ),
            6,
        )

    return s.select(
        "n",
        corr("sqp", "sq", "sp", "sqq", "spp").alias("corr_qty_price"),
        corr("sqd", "sq", "sd", "sqq", "sdd").alias("corr_qty_disc"),
        corr("spd", "sp", "sd", "spp", "sdd").alias("corr_price_disc"),
    )


@register(
    "w12_rank_distribution",
    bench=96,
    survey="W1 ext",
    doc="percent_rank + cume_dist profile: per event_type's top-5 events "
    "by value, each carrying its exact rank position within the full "
    "type partition — percent_rank=(rank-1)/(n-1), cume_dist=rn/n, "
    "both single divisions of identical longs (tie-free under the "
    "(value, event_id) order), rounded 6. The ranking windows and the "
    "top-5 filter share one (type, value) exchange+sort; the desc "
    "row_number plans as WindowGroupLimit so each task keeps 5 rows "
    "per type before the shuffle.",
    oracle="""
    WITH r AS (
      SELECT event_type, event_id, value,
             percent_rank() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS pr,
             cume_dist() OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS cd,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT event_type, CAST(rn AS BIGINT) AS top_rn, event_id, value,
           round(pr, 6) AS pct_rank, round(cd, 6) AS cume
    FROM r WHERE rn <= 5
    """,
)
def w12_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("event_type", "event_id", "value")
    asc = Window.partitionBy("event_type").orderBy("value", "event_id")
    desc = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("pr", F.percent_rank().over(asc))
        .withColumn("cd", F.cume_dist().over(asc))
        .withColumn("rn", F.row_number().over(desc))
        .filter(F.col("rn") <= 5)
        .select(
            "event_type",
            F.col("rn").cast("long").alias("top_rn"),
            "event_id",
            "value",
            F.round("pr", 6).alias("pct_rank"),
            F.round("cd", 6).alias("cume"),
        )
    )


@register(
    "w13_user_streaks",
    bench=98,
    survey="W1 ext,A4",
    doc="Gaps-and-islands: per-user consecutive-active-day streaks. "
    "Distinct (user, day) activity rows get a per-user row_number; "
    "day_ms minus rank*86400000 is constant within a consecutive run "
    "(the island key), so streaks fall out of two hash aggregations "
    "— no self-join, no iterative pass. Day keys are epoch-millis "
    "floor products (the w8 class: no engine-side DATE cast) and the "
    "island arithmetic is pure BIGINT, so the contract carries only "
    "integers. Scale: the distinct and both groupBys share the "
    "user_id-prefixed key, so AQE coalesces one shuffle cascade; "
    "output is one row per user.",
    oracle="""
    WITH e AS (
      SELECT DISTINCT user_id, (epoch_ms(ts) // 86400000) * 86400000 AS day_ms
      FROM events
    ),
    i AS (
      SELECT user_id, day_ms,
             day_ms - CAST(row_number() OVER (PARTITION BY user_id
                                              ORDER BY day_ms) AS BIGINT)
                      * 86400000 AS isl
      FROM e
    ),
    st AS (SELECT user_id, isl, count(*) AS len FROM i GROUP BY user_id, isl)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS max_streak,
           CAST(SUM(len) AS BIGINT) AS active_days
    FROM st GROUP BY user_id
    """,
)
def w13_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ms = to_millis(F.col("ts"))
    act = (
        _events(spark, sf_dir)
        .select("user_id", (ms - ms % F.lit(86400000)).alias("day_ms"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_ms")
    isl = (
        F.col("day_ms") - F.row_number().over(w).cast("long") * F.lit(86400000)
    ).alias("isl")
    st = (
        act.select("user_id", "day_ms", isl)
        .groupBy("user_id", "isl")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return st.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("max_streak"),
        F.sum("len").cast("long").alias("active_days"),
    )


@register(
    "w14_gap_fill_locf",
    bench=99,
    survey="W1 ext,A4,T3 ext",
    doc="Time-series gap fill with last-observation-carried-forward: "
    "hourly per-type averages left-joined onto a dense (type x hour) "
    "spine, missing hours filled by last(avg, ignorenulls) over the "
    "per-type hour order — the resample/ffill step a metrics or "
    "feature-engineering pipeline runs before modeling. The spine is "
    "sequence(min_hr, max_hr) per type, exploded straight out of the "
    "SAME grouped aggregate that owns the bounds — no keyless join "
    "anywhere (a global-bounds cross join would plan the "
    "BroadcastNestedLoopJoin the registry-wide sweep bans) and the "
    "spine is metadata-scale by construction (calendar hours x "
    "|types|, independent of row count); hour keys are epoch-millis "
    "floor products (no DATE casts) and the average is the "
    "decimal-exact _dsum contract. A gap hour inherits the latest "
    "preceding observed hour's average via last(ignorenulls); the "
    "per-type spine starts at the type's first observed hour, so "
    "filled_avg is never NULL.",
    oracle="""
    WITH e AS (
      SELECT event_type, (epoch_ms(ts) // 3600000) * 3600000 AS hr_ms, value
      FROM events
    ),
    d AS (
      SELECT event_type, hr_ms, count(*) AS n_events,
             round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*), 6) AS hour_avg
      FROM e GROUP BY event_type, hr_ms
    ),
    s AS (
      SELECT event_type,
             unnest(generate_series(min(hr_ms), max(hr_ms), 3600000)) AS hr_ms
      FROM e GROUP BY event_type
    )
    SELECT s.event_type, s.hr_ms,
           CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
           d.hour_avg,
           last_value(d.hour_avg IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.hr_ms
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_avg
    FROM s LEFT JOIN d ON d.event_type = s.event_type AND d.hr_ms = s.hr_ms
    """,
)
def w14_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ms = to_millis(F.col("ts"))
    ev = _events(spark, sf_dir).select(
        "event_type", (ms - ms % F.lit(3600000)).alias("hr_ms"), "value"
    )
    hourly = ev.groupBy("event_type", "hr_ms").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(_dsum(F.col("value")) / F.count(F.lit(1)), 6).alias("hour_avg"),
    )
    spine = (
        ev.groupBy("event_type")
        .agg(F.min("hr_ms").alias("lo"), F.max("hr_ms").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.lit(3600000).cast("long"))
            ).alias("hr_ms"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr_ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(hourly, ["event_type", "hr_ms"], "left").select(
        "event_type",
        "hr_ms",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "hour_avg",
        F.last("hour_avg", ignorenulls=True).over(w).alias("filled_avg"),
    )


@register(
    "a24_zscore_outliers",
    bench=100,
    survey="A4,§2.4 ext",
    doc="Per-type z-score outlier census: mean/stddev from EXACT "
    "decimal power sums (one grouped pass, map-side combined — the "
    "profile3 moment contract, never the engine-internal stddev() "
    "whose accumulation order is not contract-stable), broadcast "
    "back onto the events, |z| > 2 flagged and aggregated per type. "
    "The standardization expression runs on doubles in the SAME "
    "order on both engines, so the boundary predicate and max|z| "
    "hash-match; rate and max round to 6. Two scans of the fact "
    "(one for moments, one for scoring) but zero fact-sized "
    "shuffles: the stats side is |types| rows and broadcasts.",
    oracle="""
    WITH s AS (
      SELECT event_type, count(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
             CAST(SUM(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS svv
      FROM events GROUP BY event_type
    ),
    z AS (
      SELECT e.event_type,
             abs((e.value - s.sv / s.n)
                 / sqrt(s.svv / s.n - (s.sv / s.n) * (s.sv / s.n))) AS az
      FROM events e JOIN s USING (event_type)
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN az > 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           round(CAST(SUM(CASE WHEN az > 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS outlier_rate,
           round(max(az), 6) AS max_abs_z
    FROM z GROUP BY event_type
    """,
)
def a24_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("event_type", "value")
    v = F.col("value").cast("decimal(18,2)")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("double").alias("sv"),
        F.sum(v * v).cast("double").alias("svv"),
    )
    mean = F.col("sv") / F.col("n")
    az = F.abs(
        (F.col("value") - mean) / F.sqrt(F.col("svv") / F.col("n") - mean * mean)
    )
    flag = F.when(F.col("az") > 2, 1).otherwise(0)
    return (
        ev.join(F.broadcast(s), "event_type")
        .select("event_type", az.alias("az"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(flag).cast("long").alias("n_outliers"),
            F.round(
                F.sum(flag).cast("double") / F.count(F.lit(1)), 6
            ).alias("outlier_rate"),
            F.round(F.max("az"), 6).alias("max_abs_z"),
        )
    )
