"""Join queries: SURVEY §2.3 (the merge-implied join surface) plus the
TPC-H-style analytical joins over the star schema.

The reference never joins explicitly — its upsert co-traversal *is* a
keyed merge (reference session.py:111-160) and the watermark compare is
an anti-join by range (session.py:57-64 vs 129-132). Here the implied
join machinery is exposed directly: inner/left/semi/anti equi-joins,
with broadcast hints on the dimension side (region/nation/customer are
small dims; Catalyst would broadcast them anyway under the threshold,
but at 100 TB an explicit hint documents intent and survives stats
drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pypgsync_spark.catalog import load_table
from pypgsync_spark.functions.time import to_millis
from pypgsync_spark.queries import register


# Shared decimal-exact sum (consolidated to queries/common.py in r12;
# closes the r10-deferred duplication with core.py/syncq.py)
from pypgsync_spark.queries.common import dsum as _dsum  # noqa: E402


@register(
    "j1_inner_equi",
    survey="§2.3",
    doc="Inner equi-join chain customer⋈nation⋈region with grouped agg; "
    "dims broadcast (no shuffle of the fact side on a cluster).",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def j1_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            _dsum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


@register(
    "j2_star_revenue",
    survey="§2.3,A4",
    doc="Star join orders⋈customer⋈nation⋈region → revenue per region.",
    oracle="""
    SELECT r_name, count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def j2_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = F.broadcast(load_table(spark, sf_dir, "customer"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


@register(
    "j3_left_join",
    survey="§2.3",
    doc="Left outer join keeping unmatched dimension rows "
    "(count(col) skips nulls on both engines).",
    oracle="""
    SELECT n_name, count(c_custkey) AS n_cust
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def j3_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    return (
        nation.join(customer, nation.n_nationkey == customer.c_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_cust"))
    )


@register(
    "j4_semi_join",
    survey="§2.3",
    doc="Left-semi join: customers with at least one order (EXISTS).",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def j4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "j5_anti_join",
    survey="§2.3,C3",
    doc="Left-anti join: customers with no 2001 orders — the keyed form "
    "of the reference's 'rows not yet in destination' watermark compare "
    "(session.py:57-64). (Date-restricted so the result is non-empty: "
    "the fixture's FK coverage is total.)",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01'
    )
    """,
)
def j5_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2001-01-01"
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "j6_shipping_topk",
    bench=3,
    survey="§2.3,O2,A4",
    doc="TPC-H Q3 shape: segment-filtered customer⋈orders⋈lineitem, "
    "revenue per order, top-10 (decimal-exact revenue, unique tie-break).",
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           epoch_ms(o_orderdate) AS orderdate_ms
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def j6_shipping_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = F.broadcast(load_table(spark, sf_dir, "customer"))
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = "1998-01-01"
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("double")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter((F.col("o_orderdate") < cutoff) & (F.col("l_shipdate") > cutoff))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(revenue.alias("revenue"))
        .select(
            "o_orderkey", "revenue", to_millis("o_orderdate").alias("orderdate_ms")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "j7_region_nation_revenue",
    bench=4,
    survey="§2.3,A4",
    doc="TPC-H Q5 shape: revenue by nation for one region and a "
    "date-bounded order year (joins five tables).",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
)
def j7_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("double")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1999-01-01")
        )
        .groupBy("n_name")
        .agg(revenue.alias("revenue"))
    )


@register(
    "q1_pricing_summary",
    bench=1,
    survey="A4,O1,§2.8",
    doc="TPC-H Q1 pricing summary over lineitem: the headline wide "
    "aggregation (8 aggregates, decimal-exact, whole-stage codegen).",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
           round(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    disc_price = (price * (F.lit(1) - disc)).cast("decimal(18,4)")
    charge = disc_price * (F.lit(1) + tax)
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= "2001-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / cnt, 6).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / cnt, 6).alias("avg_price"),
            F.round(F.sum(disc).cast("double") / cnt, 6).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@register(
    "q6_forecast_revenue",
    bench=2,
    survey="A4,P3,P9",
    doc="TPC-H Q6 shape: single filtered sum — the predicate-pushdown "
    "and row-group-skipping showcase (the Spark analogue of the "
    "README's BRIN reasoning).",
    oracle="""
    SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * F.col("l_discount").cast("decimal(18,2)")
    ).cast("decimal(18,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "j8_salted_join",
    bench=9,
    survey="§2.3,ext:skew",
    doc="Skew-mitigated inner join: orders salted over 8 reducers, "
    "customer replicated 8x, joined on (custkey, salt) — identical "
    "result to the plain join (the oracle states it), but a hot "
    "custkey's rows spread over 8 tasks instead of one. The manual "
    "fallback for broadcast-ineligible skewed joins AQE can't split.",
    oracle="""
    SELECT c_nationkey, count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def j8_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pypgsync_spark.operators.skew import salted_inner_join

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_nationkey"
    )
    joined = salted_inner_join(orders, customer, on=["custkey"], n_salt=8)
    return joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice")).alias("total"),
    )


@register(
    "a13_distinct_per_key",
    survey="A7,ext:skew",
    doc="Exact per-key COUNT(DISTINCT) via the two-stage shuffle "
    "(groupBy(key,value) then count): a hot key's distinct values "
    "spread across all reducers in stage 1 instead of one task "
    "receiving them all.",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_distinct
    FROM events GROUP BY event_type
    """,
)
def a13_distinct_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pypgsync_spark.operators.skew import distinct_count_two_stage

    return distinct_count_two_stage(
        load_table(spark, sf_dir, "events"), key="event_type", value="user_id"
    )


@register(
    "j9_promo_revenue",
    survey="§2.3,A4,P6",
    doc="TPC-H Q14 shape: lineitem ⋈ part (broadcast dim), promo-type "
    "revenue fraction — conditional aggregation over a fact⋈dim join.",
    oracle="""
    SELECT round(
             100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2)))
                  ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
             6) AS promo_pct,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def j9_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0)))
            .cast("double")
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "j10_supplier_volume",
    survey="§2.3,A4",
    doc="TPC-H Q7-lite: lineitem ⋈ supplier ⋈ nation (both dims "
    "broadcast), revenue volume per supplier nation.",
    oracle="""
    SELECT n_name,
           count(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def j10_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


@register(
    "j11_having_bigorders",
    survey="§2.3,A4",
    doc="TPC-H Q18 shape: grouped HAVING filter (orders whose total "
    "lineitem quantity exceeds 300) joined back to orders. The "
    "aggregate is algebraic (map-side partial sum); the join probe "
    "side is the post-HAVING survivors, a tiny fraction of orders — "
    "broadcast back onto the orders fact at scale.",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, total_qty
    FROM orders
    JOIN (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
    ) big ON o_orderkey = l_orderkey
    """,
)
def j11_having_bigorders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    big = (
        li.groupBy("l_orderkey")
        .agg(qty.alias("qty_dec"))
        .filter(F.col("qty_dec") > 300)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
    )
    return orders.join(
        F.broadcast(big), orders.o_orderkey == big.l_orderkey
    ).select("o_orderkey", "o_custkey", "o_totalprice", "total_qty")


@register(
    "j12_small_qty_revenue",
    survey="§2.3,A4",
    doc="TPC-H Q17 shape: correlated scalar subquery (per-part average "
    "quantity) decorrelated into an aggregate-then-join. Brand filter "
    "is applied FIRST and semi-joined onto lineitem via broadcast, so "
    "the per-part average is computed only over the ~1/25 of lineitem "
    "that can contribute — the decorrelation Catalyst itself would "
    "pick, made explicit. Exact decimal avg = decimal sum / count, one "
    "double division on both engines (order-independent).",
    oracle="""
    WITH pf AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4'),
    lf AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN pf ON l_partkey = p_partkey
    ),
    aq AS (
        SELECT l_partkey AS pk,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS avg_qty
        FROM lf GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly
    FROM lf JOIN aq ON l_partkey = pk
    WHERE l_quantity < 0.2 * avg_qty
    """,
)
def j12_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    pf = part.filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    lf = li.join(F.broadcast(pf), li.l_partkey == pf.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    aq = lf.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        lf.join(F.broadcast(aq), lf.l_partkey == aq.pk)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0)
            .alias("avg_yearly")
        )
    )


@register(
    "j13_asof_prior_event",
    survey="§2.3 ext:asof",
    doc="As-of join (operators/asof.py): each error event picks up the "
    "latest prior-or-simultaneous non-error event of the same user — "
    "the union+window formulation: ONE shuffle on user_id, no "
    "BroadcastNestedLoopJoin (the naive range-join plan). Right side "
    "pre-collapsed per (user, ts) for determinism. Oracle is DuckDB's "
    "native ASOF LEFT JOIN.",
    oracle="""
    WITH e AS (
      SELECT event_id, epoch_ms(ts) AS updated_ms, user_id, event_type, value
      FROM events
    ),
    l AS (SELECT event_id, user_id, updated_ms FROM e WHERE event_type = 'error'),
    r AS (
      SELECT user_id, updated_ms, event_id AS prior_id, value AS prior_value
      FROM e WHERE event_type <> 'error'
      QUALIFY row_number() OVER (
        PARTITION BY user_id, updated_ms ORDER BY event_id DESC) = 1
    )
    SELECT l.event_id, l.user_id, l.updated_ms, r.prior_id, r.prior_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.updated_ms >= r.updated_ms
    """,
)
def j13_asof_prior_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pypgsync_spark.operators.asof import asof_join
    from pypgsync_spark.queries.common import events_ms as _events_ms

    e = _events_ms(spark, sf_dir)
    left = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "updated_ms"
    )
    w = Window.partitionBy("user_id", "updated_ms").orderBy(F.col("event_id").desc())
    right = (
        e.filter(F.col("event_type") != "error")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "updated_ms",
            F.col("event_id").alias("prior_id"),
            F.col("value").alias("prior_value"),
        )
    )
    return asof_join(
        left,
        right,
        on=["user_id"],
        left_ts="updated_ms",
        value_cols=["prior_id", "prior_value"],
    )


@register(
    "j14_late_shipments",
    bench=23,
    survey="§2.3,A4,F4",
    doc="Late-shipment report (TPC-H Q12 flavor on this fixture's "
    "columns): lineitems shipped >90 days after order date, counted "
    "and revenue-summed per order priority. The interval predicate "
    "lives in the JOIN's post-filter — both sides shuffle once on "
    "orderkey (sort-merge at scale) and the priority rollup is a "
    "map-side-combined agg over five groups. Revenue is computed in "
    "EXACT decimal arithmetic — each double input is cast to "
    "decimal(18,2) BEFORE the multiply, so the product (scale 4) and "
    "its sum are exact on both engines. The r6 hash mismatch was the "
    "double→decimal rounding-tie class: Spark casts via the shortest "
    "string repr with HALF_UP while DuckDB rounds the raw binary "
    "value, so a product like 123.45499999999999 splits the engines; "
    "casting 2-dp inputs first removes the tie class entirely "
    "(2-dp fixture values scale to near-integers, never near-halves).",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_late,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS late_revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    """,
)
def j14_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    price_dec = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_dec = F.col("l_discount").cast("decimal(18,2)")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_late"),
            F.sum(price_dec * (F.lit(1).cast("decimal(18,2)") - disc_dec))
            .cast("double")
            .alias("late_revenue"),
        )
    )


@register(
    "j15_large_orders",
    # bench rank retired r9 (verdict #7): j27/j28 cover the
    # agg-before-join TPC-H family in the bench; j15 stays
    # oracle-checked in the sweep.
    survey="§2.3,A4",
    doc="Large-order lookup (TPC-H Q18 flavor): aggregate lineitem by "
    "orderkey FIRST (map-side-combined, the fact table collapses "
    "~4:1 before any join), keep orders above the quantity threshold, "
    "then join orders + broadcast customer. Aggregating before "
    "joining is the decisive 100 TB move — the alternative "
    "join-then-aggregate shuffles the full fact×dim product.",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180
    )
    SELECT c_name, o_orderkey, o_totalprice, sum_qty
    FROM big
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    """,
)
def j15_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 180)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = F.broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )


@register(
    "j16_small_quantity_revenue",
    # bench rank retired r9 (verdict #7): same Q17 decorrelated shape
    # as j12; j16 stays oracle-checked in the sweep.
    survey="§2.3,A4",
    doc="Correlated-aggregate filter (TPC-H Q17 flavor): yearly "
    "revenue from lineitems whose quantity is below half their part's "
    "average quantity. The correlated scalar subquery decorrelates to "
    "a per-part aggregate joined back to the fact table — the "
    "aggregate side collapses to one row per part before the join, so "
    "the extra pass costs one map-side-combined shuffle, not a "
    "fact×fact self-join. half_avg is exact: quantities are integral "
    "doubles, so the mean's numerator sums without rounding in any "
    "order.",
    oracle="""
    WITH pa AS (
      SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN pa USING (l_partkey)
    WHERE l_quantity < half_avg
    """,
)
def j16_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pa = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(pa, on="l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (_dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly")
        )
    )


@register(
    "j17_top_supplier",
    bench=59,
    survey="§2.3,A1,A4",
    doc="Top supplier by revenue (TPC-H Q15 flavor): per-supplier "
    "revenue rollup, keep the supplier(s) hitting the global max — "
    "the max-of-aggregates decorrelation. The scalar max is a 1-row "
    "broadcast joined back onto the per-supplier rollup (never a "
    "global sort or a second fact pass), then the supplier dim "
    "attaches by equi-join. Revenue uses the exact-decimal discipline "
    "(inputs cast to decimal BEFORE the multiply — see j14): ties for "
    "the max compare exactly, so 'WHERE rev = max(rev)' is "
    "deterministic on both engines.",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE r = (SELECT max(r) FROM rev)
    """,
)
def j17_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    rev = li.groupBy("l_suppkey").agg(F.sum(price * disc).alias("__rev"))
    mx = rev.agg(F.max("__rev").alias("__mx"))
    return (
        rev.join(F.broadcast(mx), F.col("__rev") == F.col("__mx"))
        .join(sup, rev.l_suppkey == sup.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("__rev").cast("double").alias("total_rev")
        )
    )


@register(
    "j18_pending_priority_orders",
    bench=68,
    survey="§2.3,A3",
    doc="EXISTS-subquery order report (TPC-H Q4 shape on this "
    "fixture's columns): count of ORDERS per priority having at least "
    "one lineitem shipped > 60 days after the order date. The EXISTS "
    "becomes a LEFT SEMI join with the interval predicate inside the "
    "join condition, so each order contributes once no matter how "
    "many lineitems qualify (the j14 inner-join counts lineitems — "
    "different operator). Both sides shuffle once on orderkey; the "
    "semi join short-circuits per probe row (no fanout, no dedup "
    "pass) and the priority rollup map-side combines to five groups.",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def j18_pending_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "j19_customer_order_histogram",
    bench=69,
    survey="§2.3,A4",
    doc="Order-count distribution (TPC-H Q13): customers LEFT-joined "
    "to orders, orders counted per customer (zero-order customers "
    "kept by counting the nullable join column), then a histogram of "
    "customers by order count. Two map-side-combined shuffles — "
    "custkey then c_count — and the second input is already one row "
    "per customer; no window, no global sort.",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def j19_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count() skips NULLs
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "j20_idle_rich_customers",
    bench=70,
    survey="§2.3,§2.4,A4",
    doc="Scalar-subquery threshold + NOT EXISTS (TPC-H Q22 shape): "
    "customers with above-average positive balance and no RECENT "
    "order (none on/after 2001-01-01 — every fixture customer has "
    "SOME order, so Q22's no-orders-at-all predicate would select "
    "nothing), counted and balance-summed per nation. The average is "
    "compared CROSS-MULTIPLIED in exact decimal (bal*n > total) so no "
    "engine-specific float division decides boundary membership; the "
    "scalar aggregate rides as a broadcast single-row join, and the "
    "NOT EXISTS is a LEFT ANTI join on custkey whose build side is "
    "date-filtered BEFORE the join (the filter reaches the parquet "
    "scan). One shuffle (custkey) + one broadcast; the nation rollup "
    "is map-side.",
    oracle="""
    WITH pos AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS tot,
             CAST(count(*) AS DECIMAL(10,0)) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, count(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > tot
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2001-01-01'
      )
    GROUP BY c_nationkey
    """,
)
def j20_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    # native uncorrelated scalar subqueries (DataFrame.scalar, Spark
    # 4.0): each aggregate runs once as a subquery job and its result
    # is injected as a literal into the predicate — no join at all (a
    # condition-less 1-row broadcast would plan the banned
    # BroadcastNestedLoopJoin)
    pos = customer.filter(F.col("c_acctbal") > 0)
    tot = pos.agg(F.sum(bal)).scalar()
    n = pos.agg(F.count(F.lit(1)).cast("decimal(10,0)")).scalar()
    return (
        customer.filter(bal * n > tot)
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


@register(
    "j21_lone_late_supplier",
    bench=71,
    survey="§2.3,A4,O2",
    doc="Suppliers who kept multi-supplier orders waiting (TPC-H Q21 "
    "shape): per (order, supplier) a late flag (any lineitem shipped "
    "> 90 days after order date), then per order the supplier count, "
    "late count, and — when exactly ONE supplier was late on a "
    "multi-supplier order — that supplier, who gets the blame row. "
    "The classic EXISTS/NOT-EXISTS pair is restated as two-level "
    "aggregation (identical semantics, stated identically in the "
    "oracle): two keyed shuffles replace two correlated subquery "
    "scans, and the top-10 is TakeOrderedAndProject with a suppkey "
    "tie-break.",
    oracle="""
    WITH f AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_orderkey, l_suppkey
    ),
    o AS (
      SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late,
             max(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
      FROM f GROUP BY l_orderkey
    )
    SELECT s_suppkey, s_name, count(*) AS numwait
    FROM o JOIN supplier ON s_suppkey = late_supp
    WHERE n_supp >= 2 AND n_late = 1
    GROUP BY s_suppkey, s_name
    ORDER BY numwait DESC, s_suppkey LIMIT 10
    """,
)
def j21_lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pypgsync_spark.operators.topk import topk

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1
    ).otherwise(0)
    f = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    o = f.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    blamed = (
        o.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(sup), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return topk(blamed, [F.col("numwait").desc(), F.col("s_suppkey")], 10)


@register(
    "j22_nation_trade_matrix",
    bench=76,
    survey="§2.3,A4",
    doc="Nation-to-nation trade matrix (TPC-H Q7 shape): revenue "
    "between every (supplier nation, customer nation) pair through "
    "lineitem⋈orders⋈customer⋈supplier with the nation dim joined "
    "TWICE under different aliases — the self-aliased broadcast-dim "
    "pattern. The fact chain shuffles once on orderkey; customer, "
    "supplier and both nation sides broadcast, so the 25×25 matrix "
    "rollup map-side combines without the fact side ever shuffling "
    "for a dimension. Exact-decimal revenue (the j14 discipline).",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           count(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    GROUP BY supp_nation, cust_nation
    """,
)
def j22_nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = F.broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    )
    supplier = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("__cn_key"), F.col("n_name").alias("cust_nation")
        )
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("__sn_key"))
        .join(n2, F.col("c_nationkey") == F.col("__cn_key"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(price * disc).cast("double").alias("revenue"),
        )
    )


@register(
    "j23_market_share",
    bench=82,
    survey="§2.3,A4",
    doc="National market share (TPC-H Q8 shape): for the ASIA-region "
    "customer market, per order year, total revenue and the share "
    "supplied by NATION_5. Supplier nation and customer "
    "region attach through two INDEPENDENT broadcast chains "
    "(region→nation→customer prunes the fact rows; a 1-col supplier "
    "flag dim tags each item) so the orderkey shuffle join is the "
    "only exchange of fact data. Share = double division of two "
    "exact-decimal sums, rounded to 6 on both engines.",
    oracle="""
    SELECT year(o_orderdate) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS mkt_revenue,
           CAST(SUM(CASE WHEN sn.n_name = 'NATION_5'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END)
                AS DOUBLE) AS nation_revenue,
           round(CAST(SUM(CASE WHEN sn.n_name = 'NATION_5'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))))
                        AS DOUBLE), 6) AS mkt_share
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region ON cn.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY o_year
    """,
)
def j23_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    # Customer side collapses to the set of ASIA custkeys (broadcast).
    asia_cust = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            nation.select("n_nationkey", "n_regionkey"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    # Supplier side collapses to a (suppkey, is_target) flag dim.
    supp_flag = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            nation.select(
                F.col("n_nationkey").alias("__snk"),
                F.col("n_name").alias("__sname"),
            ),
            F.col("s_nationkey") == F.col("__snk"),
        )
        .select(
            "s_suppkey",
            (F.col("__sname") == "NATION_5").alias("is_target"),
        )
    )
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_flag, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(vol).cast("double").alias("mkt_revenue"),
            F.sum(F.when(F.col("is_target"), vol).otherwise(zero))
            .cast("double")
            .alias("nation_revenue"),
        )
        .select(
            "o_year",
            "mkt_revenue",
            "nation_revenue",
            F.round(F.col("nation_revenue") / F.col("mkt_revenue"), 6).alias(
                "mkt_share"
            ),
        )
    )


@register(
    "j24_returned_items",
    bench=83,
    survey="§2.3,A4,O2",
    doc="Top returning customers (TPC-H Q10 shape): revenue lost to "
    "returned items (l_returnflag = 'R') for orders placed in one "
    "quarter, attributed to the customer and their nation; top 20. "
    "The quarter filter prunes orders BEFORE the fact join; customer "
    "and nation broadcast onto the aggregated (custkey, revenue) "
    "rows (group first, widen later — dims join 20 aggregated rows' "
    "worth of groups, not 60k lineitems). Ordering and the top-k "
    "tie-break run on the EXACT decimal revenue; double only in the "
    "output projection.",
    oracle="""
    WITH rev AS (
      SELECT c_custkey, c_name, n_name,
             count(*) AS n_items,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev_d
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-04-01'
      GROUP BY c_custkey, c_name, n_name
    )
    SELECT c_custkey, c_name, n_name, n_items,
           CAST(rev_d AS DOUBLE) AS revenue
    FROM rev
    ORDER BY rev_d DESC, c_custkey LIMIT 20
    """,
)
def j24_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pypgsync_spark.operators.topk import topk

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    customer = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_nationkey"
        )
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    per_cust = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1996-04-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_items"), F.sum(vol).alias("rev_d"))
    )
    top = topk(per_cust, [F.col("rev_d").desc(), F.col("o_custkey")], 20)
    return (
        top.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "n_items",
            F.col("rev_d").cast("double").alias("revenue"),
        )
    )


@register(
    "j25_priority_return_matrix",
    bench=84,
    survey="§2.3,A4",
    doc="Order-priority service matrix (TPC-H Q12 shape, adapted: the "
    "fixture has no l_shipmode, so the classic mode×priority pivot "
    "becomes returnflag×priority): per l_returnflag, how many line "
    "items belong to URGENT/HIGH-priority orders vs the rest. The "
    "orders side is projected to (orderkey, is_high BOOLEAN) before "
    "the join — one fact-side shuffle, conditional counts map-side "
    "combine into 3 rows.",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_returnflag
    """,
)
def j25_priority_return_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_high"),
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(F.col("is_high"), 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@register(
    "j26_disjunctive_promo_revenue",
    bench=85,
    survey="§2.3,A4,P1",
    doc="Disjunctive brand/quantity/size promo revenue (TPC-H Q19 "
    "shape): one scalar revenue over an OR of three conjunctive "
    "arms, each pairing a part predicate (brand, size) with a "
    "lineitem predicate (quantity band). part broadcasts; the "
    "OR collapses into the single broadcast-hash-join's post-filter "
    "so the fact side is scanned once with no shuffle at all, and "
    "Catalyst still pushes the common l_quantity <= 30 bound and "
    "p_size <= 15 bound down into each parquet scan.",
    oracle="""
    SELECT count(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
           AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
           AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
           AND p_size BETWEEN 1 AND 15)
    """,
)
def j26_disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    )
    qty = F.col("l_quantity")
    size = F.col("p_size")
    arm = lambda brand, qlo, qhi, shi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & qty.between(qlo, qhi)
        & size.between(1, shi)
    )
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            arm("Brand#12", 1, 11, 5)
            | arm("Brand#23", 10, 20, 10)
            | arm("Brand#3", 20, 30, 15)
        )
        .agg(F.count(F.lit(1)).alias("n_items"), F.sum(vol).cast("double").alias("revenue"))
    )


@register(
    "j27_min_cost_supplier",
    bench=103,
    survey="§2.3,W1,O2",
    doc="Minimum-cost supplier per part (TPC-H Q2 shape, adapted: the "
    "test schema has no partsupp, so the per-(part,supplier) offer "
    "price is MIN(l_extendedprice) observed in lineitem). The "
    "correlated-min subquery is one window MIN over the already "
    "(partkey,suppkey)-aggregated offers; lineitem is explicitly "
    "repartitioned on l_partkey first, and partitioning on the "
    "leading key satisfies BOTH the (partkey,suppkey) groupBy's and "
    "the partkey window's clustering requirement — one fact shuffle "
    "total, plan-asserted (without the repartition Spark inserts a "
    "second exchange: HashPartitioning(partkey,suppkey) does not "
    "satisfy ClusteredDistribution(partkey)). Part "
    "slice filter (p_size<=10, ECONOMY) and supplier→nation attach "
    "as broadcast dims; final top-100 is a total-order "
    "TakeOrderedAndProject (s_acctbal DESC, n_name, s_name, "
    "p_partkey — (s_name, p_partkey) is unique, so LIMIT is "
    "deterministic). MIN of doubles is bit-exact on both engines; "
    "the equality join-back compares identical stored values.",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS offer_price
      FROM lineitem GROUP BY 1, 2),
    best AS (
      SELECT *, MIN(offer_price) OVER (PARTITION BY l_partkey)
               AS best_price
      FROM offers)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, offer_price
    FROM best
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE offer_price = best_price
      AND p_size <= 10 AND p_type = 'ECONOMY'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def j27_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    # One shuffle serves both keyed stages: hash-partitioning on
    # l_partkey alone co-locates every (partkey, suppkey) group AND
    # every window partition, so neither the groupBy nor the window
    # adds an exchange (asserted in tests/test_plans.py).
    offers = (
        li.repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("offer_price"))
    )
    w = Window.partitionBy("l_partkey")
    best = offers.withColumn("best_price", F.min("offer_price").over(w)).filter(
        F.col("offer_price") == F.col("best_price")
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 10) & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey", "p_name")
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    return (
        best.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "offer_price"
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "j28_nation_profit",
    bench=104,
    survey="§2.3,A4",
    doc="Product-line profit by supplier nation and order year (TPC-H "
    "Q9 shape, adapted: no ps_supplycost, so cost is proxied by "
    "p_retailprice * l_quantity). Five-way join where the only "
    "fact-data exchange is lineitem↔orders on orderkey: the "
    "name-filtered part slice and the supplier→nation chain both "
    "ride as broadcast dims, and the LIKE filter prunes the fact "
    "rows before the shuffle. Profit sums through exact "
    "decimal(18,2) arithmetic on both engines, cast double at the "
    "end (the j23/catalog convention).",
    oracle="""
    SELECT n_name AS nation,
           year(o_orderdate) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    - CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2)))
                AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def j28_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    profit = dec("l_extendedprice") * (F.lit(1) - dec("l_discount")) - dec(
        "p_retailprice"
    ) * dec("l_quantity")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@register(
    "j29_important_parts",
    bench=105,
    survey="§2.3,A4",
    doc="Important-stock scan (TPC-H Q11 shape, adapted: per-part "
    "value is the discounted revenue supplied from a two-nation "
    "slice, in place of ps_supplycost * ps_availqty). The global "
    "threshold is a scalar subquery: the per-part aggregate is "
    "computed once, its exact-decimal grand total collapses to one "
    "row and rides back as a native scalar subquery "
    "(DataFrame.scalar, the j20 pattern — no driver barrier, no "
    "cross-join node). The threshold is relative "
    "(2× the mean per-part value), so the selected fraction is "
    "scale-free — a fixed fraction of the grand total would select "
    "nothing once the part population grows 10×. Threshold compare "
    "happens in IEEE double on both engines from identical "
    "exact-decimal inputs.",
    oracle="""
    WITH pv AS (
      SELECT l_partkey AS part_key,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7')
      GROUP BY 1)
    SELECT part_key, CAST(val AS DOUBLE) AS part_value
    FROM pv
    WHERE CAST(val AS DOUBLE)
          > 2.0 * (SELECT CAST(SUM(val) AS DOUBLE) / COUNT(*) FROM pv)
    """,
)
def j29_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name").isin("NATION_3", "NATION_7"))
        .select("s_suppkey")
    )
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    pv = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("part_key"))
        .agg(F.sum(vol).alias("val_dec"))
        # Materialize the per-part aggregate ONCE: the scalar subquery
        # below is a separate job, and without the checkpoint it would
        # re-run the lineitem scan + join + groupBy a second time
        # (verified: two FileScans, no ReusedExchange). The checkpoint
        # holds one row per part — the small side — never fact rows.
        .localCheckpoint(eager=False)
    )
    # Native scalar subquery (DataFrame.scalar, the j20 pattern), not
    # a cross-joined 1-row frame: a broadcast cross join would plan as
    # BroadcastNestedLoopJoin and trip the registry-wide
    # quadratic-join sweep.
    mean_val = pv.agg(
        F.sum("val_dec").cast("double") / F.count(F.lit(1))
    ).scalar()
    return (
        pv.filter(F.col("val_dec").cast("double") > F.lit(2.0) * mean_val)
        .select(
            "part_key", F.col("val_dec").cast("double").alias("part_value")
        )
    )


@register(
    "j30_supplier_part_census",
    bench=106,
    survey="§2.3,A7",
    doc="Distinct-supplier census per part attribute group (TPC-H Q16 "
    "shape, adapted: no partsupp, so the part↔supplier relation is "
    "the distinct (l_partkey, l_suppkey) pairs observed in "
    "lineitem; no s_comment, so the Q16 complaints exclusion "
    "becomes the negative-balance suppliers). Shape under test: an "
    "ANTI-join exclusion feeding a multi-attribute COUNT(DISTINCT) "
    "— the excluded-supplier set is broadcast (tiny by "
    "construction), the NOT-IN predicates prune part rows before "
    "the fact join, and the count-distinct shuffles the already "
    "pair-distinct (brand, type, size, suppkey) tuples, never raw "
    "lineitem rows. Reference analogue: the catalog existence "
    "checks' NOT-EXISTS probe (reference session.py:170-192) "
    "generalized to a grouped census.",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def j30_supplier_part_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#13")
            & (~F.col("p_type").like("PROMO%"))
            & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_suppliers = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(bad_suppliers, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "j31_excess_shippers",
    bench=107,
    survey="§2.3,A4,W2",
    doc="Suppliers holding an outsized share of a part line (TPC-H Q20 "
    "shape, adapted: no ps_availqty, so 'excess stock' is a "
    "supplier shipping more than 1.5× the per-supplier average "
    "quantity of a gear part inside the 1998 ship-date window). "
    "Shape under test: grouped SUM → window-relative threshold → "
    "LEFT SEMI join back to the supplier dimension. The threshold "
    "compare is exact integer-scaled decimal algebra on both "
    "engines (2·qty·cnt > 3·total — no division, no doubles), so "
    "no boundary row can flip between Spark and the oracle. One "
    "fact shuffle on (suppkey, partkey); the partkey window rides "
    "the same hash partitioning via a partkey-only repartition "
    "(the j27 trick); supplier+nation ride as broadcast dims.",
    oracle="""
    WITH sq AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%gear%'
        AND l_shipdate >= DATE '1998-01-01'
        AND l_shipdate < DATE '1999-01-01'
      GROUP BY 1, 2),
    th AS (
      SELECT *,
             SUM(qty) OVER (PARTITION BY l_partkey) AS total,
             COUNT(*) OVER (PARTITION BY l_partkey) AS cnt
      FROM sq)
    SELECT s_suppkey, s_name, n_name,
           CAST(s_acctbal AS DOUBLE) AS acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM th
                        WHERE 2 * qty * cnt > 3 * total)
    """,
)
def j31_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1998-01-01")
            & (F.col("l_shipdate") < "1999-01-01")
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
    )
    # Partition on l_partkey alone so the (suppkey, partkey) groupBy
    # AND the partkey window share one exchange (the j27 pattern).
    sq = (
        li.repartition("l_partkey")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    qualified = (
        sq.withColumn("total", F.sum("qty").over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .filter(F.lit(2) * F.col("qty") * F.col("cnt") > F.lit(3) * F.col("total"))
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(load_table(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    # The qualified-key set is bounded by the supplier dimension's
    # cardinality, so the semi join's build side is always
    # dim-sized — hint it so the supplier side never shuffles (AQE
    # reaches the same join but only after exchanging the dim).
    return supp.join(
        F.broadcast(qualified),
        F.col("s_suppkey") == F.col("l_suppkey"),
        "left_semi",
    ).select(
        "s_suppkey",
        "s_name",
        "n_name",
        F.col("s_acctbal").cast("double").alias("acctbal"),
    )
