"""Relational + event-time query coverage (Spark builtins, SURVEY §2.4-2.7).

The reference inherits generic relational capability from pandas
(SURVEY.md §2.2 P7-P10, §2.4 'absent' rows); here each category is a
first-class Spark query with a DuckDB oracle: aggregation pipelines,
multi-way joins, top-k, window ranking, cube grouping, event-time
bucketing and sessionization.

Determinism: money in scaled BIGINT; averages as one SUM/COUNT double
division; event time in integer microseconds (see queries/__init__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import load_table, register


def _cents(col):
    return F.round(col * 100).cast("long")


# ---------------------------------------------------------------------------
# q1: pricing summary (filter + groupBy agg; TPC-H Q1 shape)
# ---------------------------------------------------------------------------
@register("q1_pricing_summary", sql="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_base_price_c,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
              * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS sum_disc_price_e4,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
              * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)
              * CAST(ROUND((1 + l_tax) * 100) AS BIGINT)) AS BIGINT)
         AS sum_charge_e6,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_price_c,
       CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_disc_e2,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    price_c = _cents(F.col("l_extendedprice"))
    disc_comp_c = F.round((1 - F.col("l_discount")) * 100).cast("long")
    tax_c = F.round((1 + F.col("l_tax")) * 100).cast("long")
    qty = F.round("l_quantity").cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(price_c).alias("sum_base_price_c"),
            F.sum(price_c * disc_comp_c).alias("sum_disc_price_e4"),
            F.sum(price_c * disc_comp_c * tax_c).alias("sum_charge_e6"),
            (F.sum(qty).cast("double") / F.count(F.lit(1)).cast("double"))
            .alias("avg_qty"),
            (F.sum(price_c).cast("double") / F.count(F.lit(1)).cast("double"))
            .alias("avg_price_c"),
            (F.sum(_cents(F.col("l_discount"))).cast("double")
             / F.count(F.lit(1)).cast("double")).alias("avg_disc_e2"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q3: shipping priority (3-way join + agg + deterministic top-k)
# ---------------------------------------------------------------------------
@register("q3_top_orders", sql="""
SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
              * CAST(ROUND((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_e4,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_e4 DESC, o_orderkey ASC
LIMIT 10""")
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    pivot = F.lit("1998-01-01").cast("timestamp_ntz")
    return (
        li.filter(F.col("l_shipdate") > pivot)
        .join(o.filter(F.col("o_orderdate") < pivot),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_cents(F.col("l_extendedprice"))
                   * F.round((1 - F.col("l_discount")) * 100).cast("long"))
             .alias("revenue_e4"))
        .select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.col("revenue_e4").cast("long"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            "o_orderpriority")
        .orderBy(F.col("revenue_e4").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q4 shape: correlated EXISTS -> left-semi join (TPC-H Q4; adapted to
# the synthetic lineitem's columns: shipped-after-order instead of
# commit<receipt, same plan shape — semi join on key + range predicate)
# ---------------------------------------------------------------------------
@register("q4_order_priority", sql="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority""")
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    return (
        o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(li.select("l_orderkey", "l_shipdate"),
              (F.col("l_orderkey") == F.col("o_orderkey"))
              & (F.col("l_shipdate") > F.col("o_orderdate")),
              "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# q5: local-supplier revenue (6-way join; TPC-H Q5 shape)
# ---------------------------------------------------------------------------
@register("q5_region_revenue", sql="""
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
              * CAST(ROUND((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_e4
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name""")
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_cents(F.col("l_extendedprice"))
                   * F.round((1 - F.col("l_discount")) * 100).cast("long"))
             .cast("long").alias("revenue_e4"))
    )


# ---------------------------------------------------------------------------
# q6: forecast revenue (pushdown-friendly scan filter + scalar agg)
# ---------------------------------------------------------------------------
@register("q6_forecast_revenue", sql="""
SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
              * CAST(ROUND(l_discount * 100) AS BIGINT)), 0) AS BIGINT)
         AS revenue_e4,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.07
  AND l_quantity < 24""")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.04) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(
            F.coalesce(F.sum(_cents(F.col("l_extendedprice"))
                             * _cents(F.col("l_discount"))), F.lit(0))
            .cast("long").alias("revenue_e4"),
            F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# window ranking: top customer per nation (SURVEY §2.5 analog)
# ---------------------------------------------------------------------------
@register("top_customer_per_nation", sql="""
SELECT * FROM (
  SELECT n.n_name, CAST(c.c_custkey AS BIGINT) AS c_custkey,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS spend_c,
         CAST(row_number() OVER (
           PARTITION BY n.n_name
           ORDER BY CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) DESC, c.c_custkey ASC) AS BIGINT) AS rk
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name, c.c_custkey
) WHERE rk <= 3""")
def top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    spend = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "c_custkey")
        .agg(F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("spend_c"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("spend_c").desc(), F.col("c_custkey").asc())
    return (
        spend.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("n_name", F.col("c_custkey").cast("long").alias("c_custkey"),
                "spend_c", "rk")
    )


# ---------------------------------------------------------------------------
# cube grouping (SURVEY §2.4 'absent' grouping sets — Spark builtin)
# ---------------------------------------------------------------------------
@register("cube_returnflag_status", sql="""
SELECT CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
         AS grp,
       COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)""")
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.round("l_quantity").cast("long")).cast("long")
             .alias("sum_qty"),
             F.grouping_id().cast("long").alias("grp"))
        .select("grp",
                F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
                F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
                "n", "sum_qty")
    )


# ---------------------------------------------------------------------------
# set operations (SURVEY §2.7 — absent in the reference, Spark builtins)
# ---------------------------------------------------------------------------
@register("set_ops_customers", sql="""
WITH building AS (
  SELECT CAST(c_custkey AS BIGINT) AS custkey FROM customer
  WHERE c_mktsegment = 'BUILDING'
),
with_orders AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS custkey
                FROM orders)
SELECT 'active' AS segment_class, custkey
FROM (SELECT custkey FROM building INTERSECT SELECT custkey FROM with_orders)
UNION ALL
SELECT 'dormant' AS segment_class, custkey
FROM (SELECT custkey FROM building EXCEPT SELECT custkey FROM with_orders)""")
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = (c.filter(F.col("c_mktsegment") == "BUILDING")
                .select(F.col("c_custkey").cast("long").alias("custkey")))
    with_orders = o.select(
        F.col("o_custkey").cast("long").alias("custkey")).distinct()
    active = building.intersect(with_orders).select(
        F.lit("active").alias("segment_class"), "custkey")
    dormant = building.exceptAll(with_orders).distinct().select(
        F.lit("dormant").alias("segment_class"), "custkey")
    return active.unionAll(dormant)


@register("distinct_types_per_brand", sql="""
SELECT p_brand,
       CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types,
       CAST(COUNT(DISTINCT p_size) AS BIGINT) AS n_sizes,
       COUNT(*) AS n_parts
FROM part GROUP BY p_brand""")
def distinct_types_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.countDistinct("p_type").cast("long").alias("n_types"),
        F.countDistinct("p_size").cast("long").alias("n_sizes"),
        F.count(F.lit(1)).alias("n_parts"))


# ---------------------------------------------------------------------------
# correlated NOT EXISTS -> left-anti join: customers with no large
# order, per nation (anti-join breadth; nation broadcast)
# ---------------------------------------------------------------------------
@register("customers_without_big_orders", sql="""
SELECT n.n_name, COUNT(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000)
GROUP BY n.n_name""")
def customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return (
        c.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# exact quantiles: percentile_cont over scaled cents — interpolation is
# the same a+(b-a)*frac in Spark's percentile and DuckDB's
# quantile_cont, so the doubles compare bit-exactly (probed incl. an
# awkward p=0.37 before trusting it)
# ---------------------------------------------------------------------------
@register("price_quantiles", sql="""
SELECT l_returnflag,
       quantile_cont(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.25)
         AS p25,
       quantile_cont(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.5)
         AS p50,
       quantile_cont(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.75)
         AS p75,
       quantile_cont(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.9)
         AS p90,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag""")
def price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    c = F.round(F.col("l_extendedprice") * 100).cast("long")
    li = li.select("l_returnflag", c.alias("c"))
    # one percentile buffer per group (array form), not four
    ps = F.percentile("c", F.array(*[F.lit(p)
                                     for p in (0.25, 0.5, 0.75, 0.9)]))
    return (
        li.groupBy("l_returnflag")
        .agg(ps.alias("ps"), F.count(F.lit(1)).alias("n"))
        .select("l_returnflag",
                F.col("ps")[0].alias("p25"), F.col("ps")[1].alias("p50"),
                F.col("ps")[2].alias("p75"), F.col("ps")[3].alias("p90"),
                "n")
    )


# ---------------------------------------------------------------------------
# ntile deciles over per-customer spend (window-function breadth;
# deterministic via the (spend, custkey) total order)
# ---------------------------------------------------------------------------
@register("customer_spend_deciles", sql="""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_c
  FROM orders GROUP BY o_custkey
),
tiled AS (
  SELECT o_custkey, total_c,
         ntile(10) OVER (ORDER BY total_c ASC, o_custkey ASC) AS decile
  FROM spend
)
SELECT CAST(decile AS BIGINT) AS decile, COUNT(*) AS n_customers,
       CAST(SUM(total_c) AS BIGINT) AS decile_total_c,
       CAST(MIN(total_c) AS BIGINT) AS min_c,
       CAST(MAX(total_c) AS BIGINT) AS max_c
FROM tiled GROUP BY decile""")
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long")
        .alias("total_c"))
    # ntile needs a total order -> single-partition window, but its
    # input is the per-customer AGGREGATE (2 slim columns), already
    # reduced by the shuffle above; at extreme customer cardinality
    # switch to percentile-boundary bucketing instead of exact ntile
    w = Window.orderBy(F.col("total_c").asc(), F.col("o_custkey").asc())
    tiled = spend.withColumn("decile", F.ntile(10).over(w))
    return tiled.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("total_c").cast("long").alias("decile_total_c"),
        F.min("total_c").cast("long").alias("min_c"),
        F.max("total_c").cast("long").alias("max_c"))


# ---------------------------------------------------------------------------
# event-time: tumbling hourly aggregation (streaming-compatible shape;
# the same expression runs under readStream + watermark, see streaming/)
# ---------------------------------------------------------------------------
@register("events_hourly", sql="""
SELECT CAST(epoch_us(ts) // 3600000000 * 3600 AS BIGINT) AS hour_epoch_s,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_c
FROM events
GROUP BY 1, 2""")
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")  # ts is LONG nanoseconds
    return (
        # exact integer div end-to-end (CLAUDE.md): at MICROsecond
        # magnitude the double division happens to be ULP-safe (micros
        # < 2^53 and quotients sit >= 2.8e-10 from integers), but the
        # nanos twin of this pattern mis-bucketed — don't keep the trap
        ev.withColumn("hour_epoch_s",
                      F.expr("((ts div 1000) div 3600000000) * 3600"))
        .groupBy("hour_epoch_s", "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.round(F.col("value") * 100).cast("long")).cast("long")
             .alias("value_c"))
    )


# ---------------------------------------------------------------------------
# semi-structured: JSON property extraction (SURVEY §2.8 'absent
# date/json/map functions' — Spark builtins, demonstrated first-class)
# ---------------------------------------------------------------------------
@register("events_json_props", sql="""
-- json_valid guard + TRY_CAST: DuckDB's ->> RAISES on malformed JSON
-- and CAST raises on non-numeric strings, where Spark's
-- get_json_object returns NULL — malformed/empty props must be a NULL
-- skipped by the aggregates on BOTH engines, never a job-killing error
-- (adversarial-events probe)
WITH k AS (
  SELECT event_type,
         TRY_CAST(CASE WHEN json_valid(props) THEN props->>'$.k' END
                  AS BIGINT) AS k
  FROM events)
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS k_total,
       CAST(MIN(k) AS BIGINT) AS k_min,
       CAST(MAX(k) AS BIGINT) AS k_max,
       COUNT(*) AS n
FROM k GROUP BY event_type""")
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # try_cast both engines: a non-numeric $.k is NULL (skipped by the
    # aggregates), never an ANSI CAST_INVALID_INPUT that kills the job
    # (adversarial-events probe)
    k = F.expr("try_cast(get_json_object(props, '$.k') AS LONG)")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("k_total"),
        F.min(k).cast("long").alias("k_min"),
        F.max(k).cast("long").alias("k_max"),
        F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# event-time: sliding windows (1 hour long, 15 min slide) — each event
# belongs to exactly 4 windows; batch emulation explodes the 4 bucket
# offsets (streaming twin: F.window(ts, '1 hour', '15 minutes'))
# ---------------------------------------------------------------------------
@register("events_sliding", sql="""
SELECT CAST((epoch_us(e.ts) // 900000000 - k.k) * 900 AS BIGINT)
         AS window_start_s,
       e.event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS value_c
FROM events e CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k
GROUP BY 1, 2""")
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("bucket", F.expr("(ts div 1000) div 900000000"))
    exploded = ev.select(
        "event_type", "value",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"),
        "bucket")
    return (
        exploded.withColumn(
            "window_start_s",
            ((F.col("bucket") - F.col("k")) * 900).cast("long"))
        .groupBy("window_start_s", "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.round(F.col("value") * 100).cast("long")).cast("long")
             .alias("value_c"))
    )


# ---------------------------------------------------------------------------
# as-of join: last-touch attribution — for each purchase, the most
# recent view of the same user at-or-before it.  Spark lacks ASOF JOIN;
# operators/asof.py supplies the scalable union+window form (one key
# shuffle, no row explosion).  The oracle is the INDEPENDENT
# formulation: inequality join + max_by with a [ts, id] tie-break.
# ---------------------------------------------------------------------------
@register("events_asof_attribution", sql="""
-- ASOF LEFT JOIN replaces the former per-user inequality join + MAX
-- (quadratic per key — timed out at the skew-100x clone, same class
-- the funnel oracle shed in funnel.py).  DuckDB's ASOF picks the
-- single greatest v.ts_us <= p.ts_us per probe but breaks right-side
-- timestamp TIES arbitrarily, so v is pre-deduped to one row per
-- (user_id, ts_us) keeping MAX(event_id) — the Spark operator's
-- payload-struct tie-break (operators/asof.py:16-19).
WITH e AS (SELECT user_id, event_id, event_type,
                  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),
p AS (SELECT user_id, event_id, ts_us FROM e
      WHERE event_type = 'purchase'),
v AS (SELECT user_id, MAX(event_id) AS view_id, ts_us FROM e
      WHERE event_type = 'view' GROUP BY user_id, ts_us)
SELECT p.user_id, p.event_id AS purchase_id, p.ts_us,
       CAST(v.view_id AS BIGINT) AS view_id,
       CAST(v.ts_us AS BIGINT) AS view_ts_us,
       CAST((p.ts_us - v.ts_us) // 1000000 AS BIGINT) AS lag_s
FROM p ASOF LEFT JOIN v
  ON v.user_id = p.user_id AND v.ts_us <= p.ts_us""")
def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts div 1000"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts_us")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts_us")
    # time_buckets: one bot user holding 45% of events is a WINDOW
    # skew — the single (user)-partitioned sort task held 45M rows at
    # the skew-100x clone and ground for most of an hour.  The asof
    # operator's hot-key pre-split spreads every key's timeline over
    # 32 stitched ranges (results property-tested identical); the two
    # extra small aggregations are noise at uniform scale.
    out = asof_join(purchases, views, on="user_id", left_ts="ts_us",
                    right_cols=["view_id"], time_buckets=32)
    return out.select(
        "user_id", "purchase_id", "ts_us",
        F.col("view_id").cast("long").alias("view_id"),
        F.col("ts_us_right").alias("view_ts_us"),
        F.expr("(ts_us - ts_us_right) div 1000000").cast("long")
        .alias("lag_s"))


# ---------------------------------------------------------------------------
# q7 shape: two-nation volume shipping — disjunctive cross-nation
# (nation names adapted to the synthetic nation table)
# predicate over a 6-way join, yearly breakdown (TPC-H Q7)
# ---------------------------------------------------------------------------
@register("q7_nation_volume", sql="""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume_e4) AS BIGINT) AS revenue_e4
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
           * CAST(ROUND((1 - l.l_discount) * 100) AS BIGINT) AS volume_e4
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
     OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9')
) shipping
GROUP BY supp_nation, cust_nation, l_year""")
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    # pre-filter both nation dims to the two-name IN list BEFORE the
    # joins: the disjunctive pair predicate below can't fully push, so
    # without this the plan relies on Catalyst's partial-predicate
    # extraction to avoid carrying all nations' rows through five joins
    pair = ["NATION_9", "NATION_10"]
    n1 = n.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("s_nk"),
        F.col("n_name").alias("supp_nation"))
    n2 = n.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("c_nk"),
        F.col("n_name").alias("cust_nation"))
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(((F.col("supp_nation") == "NATION_9")
                 & (F.col("cust_nation") == "NATION_10"))
                | ((F.col("supp_nation") == "NATION_10")
                   & (F.col("cust_nation") == "NATION_9")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(_cents(F.col("l_extendedprice"))
                   * F.round((1 - F.col("l_discount")) * 100).cast("long"))
             .cast("long").alias("revenue_e4"))
    )


# ---------------------------------------------------------------------------
# pivot-style conditional aggregation: per-user event-type counts as
# columns.  Explicit when()-aggregates instead of df.pivot() so the
# output schema is FIXED (pivot infers columns from data — a moving
# target for the oracle); the oracle uses FILTER-clause aggregates.
# ---------------------------------------------------------------------------
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

@register("events_user_pivot", sql=f"""
SELECT user_id,
       {", ".join(f"CAST(COUNT(*) FILTER (event_type = '{t}') AS BIGINT)"
                  f" AS n_{t}" for t in _EVENT_TYPES)},
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
            FILTER (event_type = 'purchase') AS BIGINT) AS purchase_c
FROM events GROUP BY user_id""")
def events_user_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    vc = F.round(F.col("value") * 100).cast("long")
    aggs = [F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
            for t in _EVENT_TYPES]
    aggs.append(F.sum(F.when(F.col("event_type") == "purchase", vc))
                .cast("long").alias("purchase_c"))
    return ev.groupBy("user_id").agg(*aggs)


# ---------------------------------------------------------------------------
# q17 shape: correlated scalar aggregate — revenue from lineitems whose
# quantity is below 20% of their part's average (TPC-H Q17, grouped by
# brand instead of one brand).  Decorrelates to a per-part aggregate
# joined back; the avg is a single SUM/COUNT double division so the
# 0.2x threshold compares identically across engines.
# ---------------------------------------------------------------------------
@register("q17_small_quantity_revenue", sql="""
WITH avgq AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT p.p_brand,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS small_qty_revenue_c,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN avgq a ON a.l_partkey = l.l_partkey
WHERE CAST(l.l_quantity AS DOUBLE) < 0.2 * a.avg_qty
GROUP BY p.p_brand""")
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    part = load_table(spark, sf_dir, "part")
    avgq = li.groupBy("l_partkey").agg(
        (F.sum(F.round("l_quantity").cast("long")).cast("double")
         / F.count(F.lit(1)).cast("double")).alias("avg_qty"))
    return (
        li.join(F.broadcast(part),
                F.col("p_partkey") == F.col("l_partkey"))
        .join(avgq.withColumnRenamed("l_partkey", "a_partkey"),
              F.col("a_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity").cast("double")
                < 0.2 * F.col("avg_qty"))
        .groupBy("p_brand")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("long")
             .alias("small_qty_revenue_c"),
             F.count(F.lit(1)).alias("n_lineitems"))
    )


# ---------------------------------------------------------------------------
# GROUPING SETS: independent rollups in one pass (completes the
# cube/rollup family — the sets here are NOT a cube prefix: by-flag,
# by-status, and grand total, skipping the (flag,status) pair)
# ---------------------------------------------------------------------------
@register("lineitem_grouping_sets", sql="""
SELECT COALESCE(l_returnflag, '<all>') AS flag,
       COALESCE(l_linestatus, '<all>') AS status,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
def lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql("""
        SELECT COALESCE(l_returnflag, '<all>') AS flag,
               COALESCE(l_linestatus, '<all>') AS status,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")


# ---------------------------------------------------------------------------
# RANGE-frame window: per-user trailing 10-minute moving sum/count over
# event time — the frame is value-based (microseconds), not row-based,
# so it handles irregular event spacing correctly
# ---------------------------------------------------------------------------
_TRAIL_US = 10 * 60 * 1_000_000

@register("events_trailing_10min", sql=f"""
SELECT user_id, event_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
              PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN {_TRAIL_US} PRECEDING AND CURRENT ROW)
            AS BIGINT) AS trail_value_c,
       CAST(COUNT(*) OVER (
              PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN {_TRAIL_US} PRECEDING AND CURRENT ROW)
            AS BIGINT) AS trail_n
FROM events""")
def events_trailing_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev = ev.select("user_id", "event_id",
                   F.expr("ts div 1000").alias("ts_us"),
                   F.round(F.col("value") * 100).cast("long").alias("vc"))
    w = (Window.partitionBy("user_id").orderBy("ts_us")
         .rangeBetween(-_TRAIL_US, 0))
    return ev.select(
        "user_id", "event_id", "ts_us",
        F.sum("vc").over(w).cast("long").alias("trail_value_c"),
        F.count(F.lit(1)).over(w).cast("long").alias("trail_n"))


# ---------------------------------------------------------------------------
# event-time: gap-based sessionization (lag + running sum windows)
# ---------------------------------------------------------------------------
SESSION_GAP_US = 30 * 60 * 1_000_000

@register("events_sessions", sql=f"""
WITH x AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
),
y AS (
  SELECT *, CASE WHEN prev_us IS NULL
                   OR ts_us - prev_us > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_sess
  FROM x
),
z AS (
  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id
            ORDER BY ts_us, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM y
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       CAST(MIN(ts_us) AS BIGINT) AS start_us,
       CAST((MAX(ts_us) - MIN(ts_us)) // 1000000 AS BIGINT) AS duration_s
FROM z GROUP BY user_id, session_id""")
def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.expr("ts div 1000")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    x = ev.select("user_id", "event_id", ts_us.alias("ts_us"))
    y = x.withColumn("prev_us", F.lag("ts_us").over(w)).withColumn(
        "new_sess",
        F.when(F.col("prev_us").isNull()
               | (F.col("ts_us") - F.col("prev_us") > SESSION_GAP_US), 1)
        .otherwise(0))
    z = y.withColumn(
        "session_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
    return (
        z.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("ts_us").cast("long").alias("start_us"),
             ((F.max("ts_us") - F.min("ts_us")) / 1_000_000).cast("long")
             .alias("duration_s"))
    )


# ---------------------------------------------------------------------------
# Round-3 TPC-H widening.  The testdata schema is TPC-H-ish but slimmer
# (no partsupp / l_shipmode / c_phone / p_container), so q2/q11/q12/q16/
# q20/q21 have no faithful mapping; the nine below keep each original
# query's SHAPE (market-share ratio, outer-join distribution, correlated
# max, disjunctive pushdown, ...) on the columns that exist.  Scale
# notes per query; money stays in scaled-BIGINT until one final division.
# ---------------------------------------------------------------------------
_VOL_E4_SQL = ("CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
               " * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)")


def _vol_e4():
    return (_cents(F.col("l_extendedprice"))
            * F.round((1 - F.col("l_discount")) * 100).cast("long"))


@register("q8_market_share", sql=f"""
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_2' THEN {_VOL_E4_SQL}
                     ELSE 0 END) AS BIGINT) AS nation_vol_e4,
       CAST(SUM({_VOL_E4_SQL}) AS BIGINT) AS total_vol_e4,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_2' THEN {_VOL_E4_SQL}
                     ELSE 0 END) AS DOUBLE)
         / CAST(SUM({_VOL_E4_SQL}) AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n1.n_regionkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY o_year""")
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's revenue share inside a region, by
    year.  Scale: lineitem|x|orders is the only big shuffle; customer/
    supplier/nation/region are broadcast, and the ASIA filter prunes
    the customer side BEFORE its join (region→nation→customer chain of
    broadcasts).  Numerator and denominator aggregate as BIGINT in one
    pass; the share is one long→double division."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    asia_nk = (n.join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
                      F.col("n_regionkey") == F.col("r_regionkey"))
               .select("n_nationkey"))
    asia_cust = (cst.join(F.broadcast(asia_nk),
                          F.col("c_nationkey") == F.col("n_nationkey"))
                 .select("c_custkey"))
    supp_nation = (sup.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"),
                             F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"))
        .select("s_suppkey", "supp_nation"))
    vol = _vol_e4()
    nation_vol = F.sum(F.when(F.col("supp_nation") == "NATION_2", vol)
                       .otherwise(F.lit(0).cast("long"))).cast("long")
    total_vol = F.sum(vol).cast("long")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(asia_cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp_nation), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(nation_vol.alias("nation_vol_e4"),
             total_vol.alias("total_vol_e4"),
             (nation_vol.cast("double") / total_vol.cast("double"))
             .alias("mkt_share"))
    )


@register("q9_product_profit", sql=f"""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({_VOL_E4_SQL}) AS BIGINT) AS profit_e4
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year""")
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp → revenue, not net profit): per
    supplier-nation x year for parts matching a name fragment.  The
    part filter broadcasts and semi-prunes lineitem FIRST — at 100 TB
    the '%red%' dimension cut happens before the orders shuffle."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")).select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    supp_nation = (sup.join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "nation"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supp_nation), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(_vol_e4()).cast("long").alias("profit_e4"))
    )


@register("q10_returned_items", sql=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS c_acctbal_c,
       CAST(SUM({_VOL_E4_SQL}) AS BIGINT) AS revenue_e4
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-10-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY c.c_custkey, c.c_name, n.n_name, c_acctbal_c
ORDER BY revenue_e4 DESC, c.c_custkey LIMIT 20""")
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter.  The returnflag + date filters push to the scans; customer
    and nation broadcast; ties break on c_custkey so the LIMIT is
    deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem", spread=True).filter(
        F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-10-01")
        & (F.col("o_orderdate") < "1998-01-01"))
    cst = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cst), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name",
                 _cents(F.col("c_acctbal")).alias("c_acctbal_c"))
        .agg(F.sum(_vol_e4()).cast("long").alias("revenue_e4"))
        .orderBy(F.col("revenue_e4").desc(), "c_custkey")
        .limit(20)
    )


@register("q13_order_count_distribution", sql="""
WITH per_cust AS (
  SELECT c.c_custkey,
         CAST(COALESCE(o.n, 0) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN (
    SELECT o_custkey, COUNT(*) AS n FROM orders
    WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey
  ) o ON o.o_custkey = c.c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count""")
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customers by how many (non-urgent) orders they
    placed, INCLUDING zero — the outer-join-then-histogram pattern.
    Scale: orders pre-aggregates to one row per customer BEFORE the
    join (map-side-combinable), so the left join moves |customers| +
    |customers-with-orders| rows, never raw orders."""
    cst = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    per_cust_orders = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"))
    return (
        cst.join(per_cust_orders,
                 F.col("o_custkey") == F.col("c_custkey"), "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).cast("long")
                .alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
    )


@register("q14_promo_revenue", sql=f"""
SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_VOL_E4_SQL}
                     ELSE 0 END) AS BIGINT) AS promo_e4,
       CAST(SUM({_VOL_E4_SQL}) AS BIGINT) AS total_e4,
       100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_VOL_E4_SQL}
                             ELSE 0 END) AS DOUBLE)
             / CAST(SUM({_VOL_E4_SQL}) AS DOUBLE) AS promo_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
  AND l.l_shipdate < TIMESTAMP '1997-10-01'""")
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of one month's revenue from promo parts.  Date
    filter pushes to the lineitem scan; part broadcasts; the percent is
    (100 * promo) / total as one double op pair on exact BIGINTs."""
    li = load_table(spark, sf_dir, "lineitem", spread=True).filter(
        (F.col("l_shipdate") >= "1997-09-01")
        & (F.col("l_shipdate") < "1997-10-01"))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = _vol_e4()
    promo = F.sum(F.when(F.col("p_type") == "PROMO", vol)
                  .otherwise(F.lit(0).cast("long"))).cast("long")
    total = F.sum(vol).cast("long")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .agg(promo.alias("promo_e4"), total.alias("total_e4"),
             (F.lit(100.0) * promo.cast("double") / total.cast("double"))
             .alias("promo_pct"))
    )


@register("q15_top_supplier", sql="""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(ROUND((1 - l_discount) * 100) AS BIGINT))
              AS BIGINT) AS total_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, rev.total_e4
FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
WHERE rev.total_e4 = (SELECT MAX(total_e4) FROM rev)""")
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the quarter's max revenue — the
    correlated-scalar-max shape.  Revenue aggregates once per supplier
    (map-side combinable); the max runs as an unpartitioned window over
    that ALREADY-REDUCED |suppliers|-row table, not the raw lineitems,
    then supplier broadcasts in."""
    li = load_table(spark, sf_dir, "lineitem", spread=True).filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01"))
    sup = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_vol_e4()).cast("long").alias("total_e4"))
    w = Window.partitionBy()
    best = (rev.withColumn("mx", F.max("total_e4").over(w))
            .filter(F.col("total_e4") == F.col("mx")))
    return (
        best.join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_e4")
    )


@register("q18_large_orders", sql="""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS o_totalprice_c,
       CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 250)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o_orderdate_s,
         o_totalprice_c""")
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold, with
    their customers.  The HAVING subquery becomes a pre-aggregated
    qualifying-keys frame LEFT-SEMI-joined into lineitem — quantities
    aggregate once, qualifying keys shuffle once, customer broadcasts."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.round("l_quantity").cast("long")).alias("sum_qty"))
           .filter(F.col("sum_qty") > 250))
    return (
        o.join(big.withColumnRenamed("l_orderkey", "big_orderkey"),
               F.col("big_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cst), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "c_custkey", "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd")
                .alias("o_orderdate_s"),
                _cents(F.col("o_totalprice")).alias("o_totalprice_c"),
                F.col("sum_qty").cast("long").alias("sum_qty"))
    )


@register("q19_disjunctive_revenue", sql=f"""
SELECT CAST(SUM({_VOL_E4_SQL}) AS BIGINT) AS revenue_e4,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)""")
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under a 3-arm brand/size/quantity disjunction.
    The part side pre-filters to the UNION of brand/size envelopes (a
    pushable disjunction on one table) before broadcasting; the exact
    cross-table arms apply after the join."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    p = load_table(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)))
    arm = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30)))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(arm)
        .agg(F.sum(_vol_e4()).cast("long").alias("revenue_e4"),
             F.count(F.lit(1)).cast("long").alias("n_items"))
    )


@register("q22_idle_customers", sql="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
           / CAST(COUNT(*) AS BIGINT) AS avg_c
  FROM customer WHERE c_acctbal > 0
)
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS totacctbal_c
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) > (SELECT avg_c FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n.n_name""")
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    orders (the testdata has no orderless customers), bucketed by
    nation.  The average is one scaled-int SUM/COUNT division broadcast
    as a scalar; recent orders prune to distinct custkeys before the
    anti-join, so the anti side shuffles |recent customers| keys, not
    |orders| rows."""
    cst = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    avg_row = (cst.filter(F.col("c_acctbal") > 0)
               .agg((F.sum(_cents(F.col("c_acctbal"))).cast("double")
                     / F.count(F.lit(1))).alias("avg_c")))
    recent = (o.filter(F.col("o_orderdate") >= "2000-01-01")
              .select("o_custkey").distinct())
    return (
        cst.join(F.broadcast(avg_row))
        .filter(_cents(F.col("c_acctbal")) > F.col("avg_c"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numcust"),
             F.sum(_cents(F.col("c_acctbal"))).cast("long")
             .alias("totacctbal_c"))
    )


# ---------------------------------------------------------------------------
# bucketed interval join: views inside each purchase's trailing 6-hour
# attribution window.  Spark lacks a range-join strategy (an
# inequality join nests loops); operators/interval.py buckets time so
# the match runs as ONE hash equi-join on (user, bucket) — the shape
# that survives hot users and 100x data.  Oracle: plain inequality
# join (DuckDB handles the small fixture fine).
# ---------------------------------------------------------------------------
ATTRIBUTION_WINDOW_US = 21_600_000_000  # 6 hours (synthetic event density)


@register("purchase_view_windows", sql=f"""
WITH e AS (SELECT user_id, event_id, event_type,
                  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),
p AS (SELECT user_id, event_id AS purchase_id,
             ts_us - {ATTRIBUTION_WINDOW_US} AS lo_us, ts_us AS hi_us
      FROM e WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts_us FROM e WHERE event_type = 'view'),
-- trailing-window COUNT/MIN/MAX without materializing pairs: the old
-- banded v x p inequality join emitted every (purchase, view-in-6h)
-- pair and ran the skew-100x bot user out of the 25 GiB spill budget.
-- Per-(user, ts) cumulative view counts turn each purchase into three
-- nearest-match lookups: cum at hi (backward asof), cum strictly
-- before lo (backward, <), and the first view at/after lo (forward) —
-- n = cum_hi - cum_lo, first/last come straight off the asof rows.
-- Grouping v by (user, ts) first makes every asof tie-free (one row
-- per timestamp, cum = count through that ts).  Row-exact vs the pair
-- join at sf0.001/0.01/0.1 + skew-10x; 5.6 s at skew-100x.
v3 AS MATERIALIZED (
  SELECT user_id, ts_us,
         CAST(SUM(COUNT(*)) OVER (PARTITION BY user_id ORDER BY ts_us)
              AS BIGINT) AS cum
  FROM v GROUP BY user_id, ts_us
),
hi AS MATERIALIZED (
  SELECT p.purchase_id, p.user_id, p.lo_us, p.hi_us,
         h.cum AS cum_hi, h.ts_us AS ts_hi
  FROM p ASOF LEFT JOIN v3 h
    ON h.user_id = p.user_id AND h.ts_us <= p.hi_us
),
lo AS MATERIALIZED (
  SELECT hi.*, l.cum AS cum_lo
  FROM hi ASOF LEFT JOIN v3 l
    ON l.user_id = hi.user_id AND l.ts_us < hi.lo_us
),
fw AS MATERIALIZED (
  SELECT lo.*, f.ts_us AS ts_fw
  FROM lo ASOF LEFT JOIN v3 f
    ON f.user_id = lo.user_id AND f.ts_us >= lo.lo_us
)
SELECT purchase_id, user_id,
       CAST(cum_hi - COALESCE(cum_lo, 0) AS BIGINT) AS n_views,
       CAST(ts_fw AS BIGINT) AS first_view_us,
       CAST(ts_hi AS BIGINT) AS last_view_us
FROM fw
WHERE cum_hi IS NOT NULL AND cum_hi - COALESCE(cum_lo, 0) > 0""")
def purchase_view_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.interval import interval_join

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts div 1000"))
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("event_id").alias("view_id"), "ts_us")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        (F.col("ts_us") - ATTRIBUTION_WINDOW_US).alias("lo_us"),
        F.col("ts_us").alias("hi_us"))
    pairs = interval_join(
        views, purchases, point_ts="ts_us", lo="lo_us", hi="hi_us",
        on="user_id", bucket_width=ATTRIBUTION_WINDOW_US)
    return (
        pairs.groupBy("purchase_id", "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_views"),
             F.min("ts_us").cast("long").alias("first_view_us"),
             F.max("ts_us").cast("long").alias("last_view_us"))
    )


# ---------------------------------------------------------------------------
# SCD-2-style effective ranges: each event's value is "current" until
# the user's next event (lead window).  The dimension-history builder a
# warehouse derives from a CDC stream — one (user) shuffle, no joins;
# the open-ended current row keeps a NULL valid_to on both engines.
# ---------------------------------------------------------------------------
@register("user_value_history", sql="""
WITH e AS (
  SELECT user_id, event_id,
         CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
         CAST(ROUND(value * 100) AS BIGINT) AS value_cents
  FROM events
)
SELECT user_id, event_id, valid_from_us,
       CAST(LEAD(valid_from_us) OVER (
              PARTITION BY user_id
              ORDER BY valid_from_us, event_id) - 1 AS BIGINT)
         AS valid_to_us,
       value_cents
FROM e""")
def user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.expr("ts div 1000").alias("valid_from_us"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"))
    w = Window.partitionBy("user_id").orderBy("valid_from_us", "event_id")
    return ev.select(
        "user_id", "event_id", "valid_from_us",
        (F.lead("valid_from_us").over(w) - 1).cast("long")
        .alias("valid_to_us"),
        "value_cents")


# ---------------------------------------------------------------------------
# per-user 3-sigma outlier gate with NO float aggregation: count / sum /
# sum-of-squares are exact BIGINT window aggregates (cents), and the
# z-score test |v-mean| > 3*stddev is evaluated as the cross-multiplied
# rational (v*n - S)^2 * (n-1) > 9 * n * (SS*n - S^2) — the squarings
# convert long->double ONCE each (the integer diffs stay in BIGINT
# range; their squares would overflow past ~sf1, and identical IEEE
# expression trees compare identically on both engines).  One user_id
# shuffle; no sqrt, no libm, no stddev_samp float-order sensitivity.
# ---------------------------------------------------------------------------
@register("events_zscore_outliers", sql="""
WITH c AS (
  SELECT event_id, user_id,
         CAST(ROUND(value * 100) AS BIGINT) AS value_cents
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT event_id, user_id, value_cents,
         CAST(COUNT(*) OVER w AS BIGINT) AS n_user,
         CAST(SUM(CAST(value_cents AS HUGEINT)) OVER w AS HUGEINT) AS s,
         CAST(SUM(CAST(value_cents AS HUGEINT) * value_cents) OVER w
              AS HUGEINT) AS ss
  FROM c WINDOW w AS (PARTITION BY user_id)
)
SELECT event_id, user_id, value_cents, n_user
FROM s
WHERE n_user >= 2
  AND CAST(CAST(value_cents AS HUGEINT) * n_user - s AS DOUBLE)
      * CAST(CAST(value_cents AS HUGEINT) * n_user - s AS DOUBLE)
      * CAST(n_user - 1 AS DOUBLE)
    > 9.0 * CAST(n_user AS DOUBLE)
          * (CAST(ss AS DOUBLE) * CAST(n_user AS DOUBLE)
             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))""")
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user |z| > 3 outliers via exact integer moments.  The square
    and cross terms run 128-bit (Spark DECIMAL(38,0) / DuckDB HUGEINT,
    the cct_flame_diff pattern): a single $3*10^7 value makes
    value_cents^2 overflow INT64, and under ANSI that THROWS and kills
    the whole job (adversarial-events probe).  Max |term| is
    (2^63)^2 ~ 8.5e37 — inside both DECIMAL(38,0) and HUGEINT; the
    final to-DOUBLE casts of identical exact integers round identically
    on both engines.  Summed-moments bound (ADVICE r7): the per-user
    SUM of such terms caps lower on Spark (DECIMAL(38,0) throws past
    ~1e38) than DuckDB (HUGEINT ~1.7e38), leaving a narrow band where
    the oracle passes and Spark dies — reaching it needs ~1e9 events
    of ~$9e13 each for ONE user, accepted as out of contract for
    cents data (clamp value_cents at ingest if a deployment ever
    holds such values)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    c = ev.select(
        "event_id", "user_id",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"))
    w = Window.partitionBy("user_id")
    vc_d = F.col("value_cents").cast("decimal(19,0)")
    s = c.select(
        "event_id", "user_id", "value_cents",
        F.count(F.lit(1)).over(w).cast("long").alias("n_user"),
        F.sum(vc_d).over(w).alias("s"),
        F.sum(vc_d * F.col("value_cents")).over(w).alias("ss"))
    d = (vc_d * F.col("n_user") - F.col("s")).cast("double")
    rhs = (F.lit(9.0) * F.col("n_user").cast("double")
           * (F.col("ss").cast("double") * F.col("n_user").cast("double")
              - F.col("s").cast("double") * F.col("s").cast("double")))
    return (s.filter((F.col("n_user") >= 2)
                     & (d * d * (F.col("n_user") - 1).cast("double") > rhs))
            .select("event_id", "user_id", "value_cents", "n_user"))
