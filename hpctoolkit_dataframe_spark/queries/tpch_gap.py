"""TPC-H gap six-pack: the remaining classic query shapes (Q2, Q11,
Q12, Q16, Q20, Q21) the registry did not yet cover.

The testdata has no ``partsupp`` table and ``lineitem`` carries no
shipmode/commitdate/receiptdate columns, so each query keeps the
REFERENCE SHAPE (correlated scalar min, global-fraction HAVING,
CASE-sum pivot, NOT-IN distinct count, nested self-aggregation,
EXISTS/NOT-EXISTS double self-join) over the columns that exist:

- supply cost      -> min observed unit price per (part, supplier)
- availqty         -> quantity the supplier actually shipped that year
- receipt lateness -> ship date vs order date + interval
- supplier complaints -> negative account balance

Determinism: money in scaled BIGINT, thresholds as exact integer
multiplications (never ``v > 0.001 * total`` in doubles), dates
compared as DATE on both engines (see queries/__init__ docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import load_table, register


def _unit_cost_c():
    # l_extendedprice = qty * unit price, so this recovers the unit
    # price in cents; ROUND is half-up for positives in both engines.
    return F.round(F.col("l_extendedprice") * 100 / F.col("l_quantity")).cast("long")


_UNIT_COST_C_SQL = "CAST(ROUND(l_extendedprice * 100 / l_quantity) AS BIGINT)"


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier (correlated scalar min).  Reference shape:
# partsupp min(ps_supplycost) per part within a region; here the supply
# relation is the observed (part, supplier) unit prices in lineitem.
# ---------------------------------------------------------------------------
@register("q2_min_cost_supplier", sql=f"""
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         CAST(MIN({_UNIT_COST_C_SQL}) AS BIGINT) AS cost_c
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT CAST(ROUND(s.s_acctbal * 100) AS BIGINT) AS s_acctbal_c,
       s.s_name, n.n_name, p.p_partkey, p.p_brand, su.cost_c
FROM supply su
JOIN part p ON p.p_partkey = su.l_partkey
JOIN supplier s ON s.s_suppkey = su.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE p.p_type = 'STANDARD' AND p.p_size <= 25 AND r.r_name = 'EUROPE'
  AND su.cost_c = (
    SELECT MIN(s2.cost_c) FROM supply s2
    JOIN supplier sp2 ON sp2.s_suppkey = s2.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = sp2.s_nationkey
    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
    WHERE s2.l_partkey = su.l_partkey AND r2.r_name = 'EUROPE')""")
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape.  The correlated min becomes a per-part window
    over the ALREADY-REDUCED (part, supplier) supply table — one
    lineitem shuffle on (part, supp), then |parts x suppliers|-sized
    work; part/supplier/nation/region all broadcast."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 25))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supply = (li.groupBy("l_partkey", "l_suppkey")
              .agg(F.min(_unit_cost_c()).cast("long").alias("cost_c")))
    # region scoping must precede the min (the correlated subquery is
    # region-filtered too): restrict suppliers first, then window-min.
    eu_supp = (s.join(F.broadcast(n),
                      F.col("n_nationkey") == F.col("s_nationkey"))
               .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey")))
    scoped = supply.join(F.broadcast(eu_supp),
                         F.col("s_suppkey") == F.col("l_suppkey"))
    w = Window.partitionBy("l_partkey")
    best = (scoped.withColumn("min_c", F.min("cost_c").over(w))
            .filter(F.col("cost_c") == F.col("min_c")))
    return (
        best.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select(F.round(F.col("s_acctbal") * 100).cast("long")
                .alias("s_acctbal_c"),
                "s_name", "n_name", "p_partkey", "p_brand", "cost_c")
    )


# ---------------------------------------------------------------------------
# Q11: important stock (global-fraction HAVING).  availqty*supplycost
# becomes the extended price a nation's suppliers shipped per part.
# ---------------------------------------------------------------------------
Q11_NATION = "NATION_7"
Q11_MULT = 1000  # keep parts holding > 1/1000 of the nation's value


@register("q11_important_parts", sql=f"""
WITH val AS (
  SELECT l.l_partkey,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS value_c
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = '{Q11_NATION}'
  GROUP BY l.l_partkey
)
SELECT l_partkey, value_c FROM val
WHERE value_c * {Q11_MULT} > (SELECT CAST(SUM(value_c) AS BIGINT) FROM val)""")
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape.  The HAVING fraction is an exact integer
    comparison (value*1000 > total) — no float threshold drift; the
    global total is an unpartitioned window over the reduced per-part
    table, not a second scan."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == Q11_NATION)
    nat_supp = s.join(F.broadcast(n),
                      F.col("n_nationkey") == F.col("s_nationkey"))
    val = (li.join(F.broadcast(nat_supp.select("s_suppkey")),
                   F.col("s_suppkey") == F.col("l_suppkey"))
           .groupBy("l_partkey")
           .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                .cast("long").alias("value_c")))
    w = Window.partitionBy()
    return (val.withColumn("total_c", F.sum("value_c").over(w))
            .filter(F.col("value_c") * Q11_MULT > F.col("total_c"))
            .select("l_partkey", "value_c"))


# ---------------------------------------------------------------------------
# Q12: shipping buckets x priority pivot (CASE-sum).  Shipmode is
# absent; the bucket is the order->ship delay class instead.
# ---------------------------------------------------------------------------
@register("q12_delay_priority", sql="""
SELECT CASE WHEN d < 30 THEN 'd00_29' WHEN d < 60 THEN 'd30_59'
            WHEN d < 90 THEN 'd60_89' ELSE 'd90_plus' END AS delay_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM (
  SELECT o.o_orderpriority,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS d
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
GROUP BY delay_bucket""")
def q12_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: one lineitem-orders equi join (the unavoidable
    orderkey shuffle) then a 4-group CASE-sum pivot; day arithmetic on
    DATE-truncated values so both engines count calendar days."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    o = load_table(spark, sf_dir, "orders")
    d = F.datediff(F.col("l_shipdate").cast("date"),
                   F.col("o_orderdate").cast("date"))
    bucket = (F.when(d < 30, "d00_29").when(d < 60, "d30_59")
              .when(d < 90, "d60_89").otherwise("d90_plus"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(F.sum(F.when(high, 1).otherwise(0)).cast("long")
             .alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).cast("long")
             .alias("low_line_count"))
    )


# ---------------------------------------------------------------------------
# Q16: supplier counts per part class, excluding flagged suppliers
# (NOT IN).  Complaint comments are absent; negative account balance is
# the excluded set (non-empty in the testdata).
# ---------------------------------------------------------------------------
_Q16_SIZES = (1, 4, 7, 10, 14, 19, 25, 36)


@register("q16_supplier_counts", sql=f"""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#45' AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size IN {_Q16_SIZES}
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size""")
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape.  The NOT IN becomes a broadcast anti-join
    against the (tiny) flagged-supplier set; the distinct count
    aggregates the part-pruned join, which Catalyst turns into the
    standard two-phase expand/partial-count plan."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(*_Q16_SIZES))
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"),
                "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).cast("long")
             .alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20: dominant suppliers of a part family (nested self-aggregation).
# availqty > 1/2 * shipped  becomes  supplier's 1997 shipments > 40% of
# the part's total 1997 demand.
# ---------------------------------------------------------------------------
@register("q20_dominant_suppliers", sql="""
WITH y AS (
  SELECT l_partkey, l_suppkey,
         CAST(ROUND(l_quantity) AS BIGINT) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
),
bysupp AS (
  SELECT l_partkey, l_suppkey, CAST(SUM(qty) AS BIGINT) AS supp_qty
  FROM y GROUP BY l_partkey, l_suppkey
),
demand AS (
  SELECT l_partkey, CAST(SUM(supp_qty) AS BIGINT) AS total_qty
  FROM bysupp GROUP BY l_partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM bysupp b
JOIN demand d ON d.l_partkey = b.l_partkey
JOIN part p ON p.p_partkey = b.l_partkey AND p.p_name LIKE 'small%'
JOIN supplier s ON s.s_suppkey = b.l_suppkey
WHERE b.supp_qty * 5 > d.total_qty * 2""")
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape.  One year-filtered scan reduces to (part,
    supplier) sums; the part-total re-aggregates THAT table (no second
    lineitem pass); the 40% threshold is exact integer math
    (5*supp > 2*total).  Part and supplier broadcast."""
    li = load_table(spark, sf_dir, "lineitem", spread=True).filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01"))
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier")
    # ROUND before the integer cast: DuckDB CAST(double AS BIGINT)
    # rounds-to-nearest while Spark cast truncates — explicit ROUND on
    # both sides removes the latent divergence on fractional quantities
    bysupp = (li.groupBy("l_partkey", "l_suppkey")
              .agg(F.sum(F.round("l_quantity").cast("long")).cast("long")
                   .alias("supp_qty")))
    # derive demand from bysupp (already partitioned by l_partkey-ish
    # keys) instead of re-scanning lineitem
    demand = (bysupp.groupBy("l_partkey")
              .agg(F.sum("supp_qty").cast("long").alias("total_qty")))
    return (
        bysupp.join(demand, "l_partkey")
        .filter(F.col("supp_qty") * 5 > F.col("total_qty") * 2)
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name").distinct()
    )


# ---------------------------------------------------------------------------
# Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS double
# self-join).  Lateness = shipped more than 60 days after the order.
# ---------------------------------------------------------------------------
@register("q21_waiting_suppliers", sql="""
WITH lo AS (
  -- the textbook EXISTS/NOT-EXISTS pair is a correlated lineitem
  -- self-join on l_orderkey with an inequality — quadratic in a hot
  -- order's row count (154 s at the 10x skew clone's 340k-row orders,
  -- ~100x that at skew-100x: infeasible).  DISTINCT window aggregates
  -- per order say the same thing linearly: a late row counts iff its
  -- order has >1 distinct suppliers and exactly 1 distinct LATE
  -- supplier (then the late row's supplier IS that supplier).
  -- Row-exact vs the EXISTS form at sf0.01/sf0.1/skew-10x.
  SELECT l.l_orderkey, l.l_suppkey,
         CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 60
           AS is_late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
),
w AS (
  SELECT l_orderkey, l_suppkey, is_late,
         COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END)
           OVER (PARTITION BY l_orderkey) AS n_late_supp
  FROM lo
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey
WHERE w.is_late AND w.n_supp > 1 AND w.n_late_supp = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100""")
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape.  The EXISTS/NOT-EXISTS pair does NOT run as two
    correlated self-joins (three lineitem shuffles); one per-order
    aggregate — distinct suppliers, distinct LATE suppliers — replaces
    both: an order qualifies iff n_supp > 1 and n_late_supp == 1, and
    then every late row's supplier IS that single late supplier.  One
    extra groupBy instead of two joins; same orderkey partitioning
    reused by the join back.  Total order (numwait desc, name) makes
    the LIMIT cutoff deterministic."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    lo = (li.join(o.select("o_orderkey", "o_orderdate"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
          .select("l_orderkey", "l_suppkey",
                  F.col("l_shipdate").cast("date").alias("ship_d"),
                  F.col("o_orderdate").cast("date").alias("order_d")))
    late = F.col("ship_d") > F.date_add(F.col("order_d"), 60)
    lo = lo.withColumn("is_late", late).localCheckpoint(eager=True)
    per_order = (lo.groupBy("l_orderkey")
                 .agg(F.count_distinct("l_suppkey").alias("n_supp"),
                      F.count_distinct(F.when(F.col("is_late"),
                                              F.col("l_suppkey")))
                      .alias("n_late_supp"))
                 .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
                 .select("l_orderkey"))
    return (
        lo.filter(F.col("is_late"))
        .join(per_order, "l_orderkey", "left_semi")
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )
