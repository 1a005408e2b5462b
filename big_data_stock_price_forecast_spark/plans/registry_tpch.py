"""TPC-H relational query domain (orders/lineitem/part/...).

Split mechanically from the monolithic plans/registry.py (r12);
statement order and text preserved verbatim.
"""
from __future__ import annotations

from .registry_common import *  # noqa: F401,F403 — the
# original monolith's prelude + shared helpers; underscore
# names are imported explicitly below
from .registry_common import (  # noqa: F401
    DataFrame,
    F,
    Q12_LATE_DAYS,
    Q15_END,
    Q15_START,
    Q17_BRAND,
    Q19_ARMS,
    Q21_LATE_DAYS,
    Q7_NATIONS,
    Q8_NATION,
    Q8_REGION,
    Q8_TYPE,
    RFM_BUCKETS,
    SparkSession,
    Window,
    _r6e,
    _rne,
    _sql_q7_nations,
    _sql_rne,
    load_table,
)



# --------------------------------------------------------------------------
# relational queries (TPC-H-shaped tables)
# --------------------------------------------------------------------------


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary. Money sums via exact DECIMAL."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c, p=18, s=2: F.col(c).cast(f"decimal({p},{s})")  # noqa: E731
    one = F.lit(1).cast("decimal(3,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-01-20 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (one - dec("l_discount", 3, 2)))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                dec("l_extendedprice")
                * (one - dec("l_discount", 3, 2))
                * (one + dec("l_tax", 3, 2))
            )
            .cast("double")
            .alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
         AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) *
                (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE)
         AS sum_charge,
       count(*) AS count_order,
       sum(l_quantity) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-01-20 00:00:00'
GROUP BY l_returnflag, l_linestatus"""


def q_tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: top-10 unshipped orders by revenue for one
    market segment. 3-way join — the segment-filtered customer side
    prunes orders, lineitem joins on the order key; exact DECIMAL
    revenue; total (revenue DESC, orderkey) order makes the limit
    deterministic. No broadcast hint: customer is a filtered fraction
    of a table that grows with SF, so the choice is left to AQE, which
    broadcasts it at small scale (observed runtime size under the
    threshold) and falls back to shuffle join when it outgrows that —
    a hardcoded hint would pin the 100x-scale plan to the toy-scale
    decision."""
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    dec = lambda c, p=18, s=2: F.col(c).cast(f"decimal({p},{s})")  # noqa: E731
    one = F.lit(1).cast("decimal(3,2)")
    return (
        li.join(
            orders.join(
                cust, F.col("o_custkey") == F.col("c_custkey")
            ).select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount", 3, 2)))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


SQL_TPCH_Q3 = """
SELECT l_orderkey, o_orderdate,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DOUBLE) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10"""


def q_tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: order counts per priority where at least one
    line shipped >30 days after the order date — a LEFT SEMI join with
    a non-equi condition (EXISTS pushdown shape)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority"""


def q_tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: orders whose total quantity exceeds a
    threshold — an aggregate-subquery SEMI join. The inner aggregate
    shuffles once on l_orderkey; the qualifying key set is tiny (the
    whole point of the HAVING) and semi-joins back into the same
    aggregate's output, so Catalyst reuses the exchange. Quantities
    are exact DECIMAL sums cast to double only for emission."""
    li = load_table(spark, sf_dir, "lineitem")
    totals = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty")
    )
    big = totals.filter(F.col("sum_qty") > 400)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.col("sum_qty").cast("double").alias("total_qty"),
        )
    )


SQL_TPCH_Q18 = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(sum_qty AS DOUBLE) AS total_qty
FROM orders JOIN (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY 1
) ON o_orderkey = l_orderkey
WHERE sum_qty > 400"""


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by exact DECIMAL order value — the
    canonical top-N-per-group window pattern (rank inside the
    customer partition after one keyed aggregate; total ordering via
    the orderkey tie-break keeps the cut deterministic)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("val").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("val"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "o_custkey",
            "rank",
            "o_orderkey",
            F.col("val").cast("double").alias("order_value"),
        )
    )


SQL_TOP_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, rank, o_orderkey, CAST(val AS DOUBLE) AS order_value
FROM (
  SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS val,
         CAST(row_number() OVER (PARTITION BY o_custkey
              ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC,
                       o_orderkey ASC) AS INT) AS rank
  FROM orders
)
WHERE rank <= 3"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment counts of customers with no orders SINCE 2000-01-01 —
    LEFT ANTI join (NOT EXISTS shape)."""
    cust = load_table(spark, sf_dir, "customer")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    return (
        cust.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


SQL_CUSTOMERS_NO_ORDERS = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment"""


def q_top_revenue_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation. Only the 25-row `nation` dim is broadcast;
    lineitem⋈orders⋈customer scale with the fact side, so they are left
    to AQE (shuffle/sort-merge, or runtime broadcast when a side turns
    out small) — an explicit broadcast there OOMs executors at 100x."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    one = F.lit(1).cast("decimal(3,2)")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (one - F.col("l_discount").cast("decimal(3,2)")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


SQL_TOP_REVENUE_NATIONS = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
         AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name"""


def q_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: revenue per nation where the customer and the
    line's supplier share a nation inside one region — the classic
    6-table snowflake join. Join strategy by size class: `region` and
    `nation` are constant-size dims (5/25 rows at every SF) and are
    broadcast EXPLICITLY — their filter (`r_name`, and transitively
    the region's nation set) then prunes the supplier/customer sides
    at the scan instead of after a shuffle. supplier/customer/orders/
    lineitem all grow with SF, so their joins are left to AQE. The
    c_nationkey = s_nationkey condition rides the customer⋈supplier
    equi-join keys instead of a post-join filter, keeping every join
    an equi-join (no nested-loop anywhere)."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    asia_nations = (
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(
                    F.col("r_name") == "ASIA"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(asia_nations),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c, p=18, s=2: F.col(c).cast(f"decimal({p},{s})")  # noqa: E731
    one = F.lit(1).cast("decimal(3,2)")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp.select("s_suppkey", "s_nationkey", "n_name"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            cust.select("c_custkey", "c_nationkey"),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount", 3, 2)))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


SQL_TPCH_Q5 = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name"""


def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: top-20 customers by revenue lost to returned
    lineitems in one quarter. The returnflag + date filters reach the
    scans (pushdown), the l⋈o⋈c joins are AQE-planned, `nation` is an
    explicit broadcast; exact DECIMAL revenue makes the DESC sort —
    and therefore the LIMIT cut (c_custkey tie-break) —
    deterministic."""
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    dec = lambda c, p=18, s=2: F.col(c).cast(f"decimal({p},{s})")  # noqa: E731
    one = F.lit(1).cast("decimal(3,2)")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount", 3, 2)))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20"""


def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped: single-table filter + aggregate. The whole
    query is scan-side: all three predicates push down to the parquet
    scan (range on shipdate, range on discount, bound on quantity),
    the projection prunes to three columns, and the DECIMAL
    revenue/count partially aggregate map-side — at 100 TB this query
    is I/O-bound by exactly the rows and bytes it needs and nothing
    else. The canonical pushdown/pruning probe."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c, p=18, s=2: F.col(c).cast(f"decimal({p},{s})")  # noqa: E731
    out = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return out.agg(
        F.sum(dec("l_extendedprice") * dec("l_discount", 3, 2))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


SQL_TPCH_Q6 = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24"""


def q_tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped: promo revenue share for one month — a
    conditional aggregate over a fact⋈dim join. ``part`` grows with SF
    so the join is AQE-planned (broadcast at toy scale, shuffle at
    100x); the date filter prunes lineitem at the scan BEFORE the
    join. DECIMAL sums make both the numerator and denominator exact,
    so the ratio is one double division — identical in both
    engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    dec = lambda c, p=18, s=2: F.col(c).cast(f"decimal({p},{s})")  # noqa: E731
    one = F.lit(1).cast("decimal(3,2)")
    rev = dec("l_extendedprice") * (one - dec("l_discount", 3, 2))
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(
            F.lit(0).cast("decimal(19,4)")
        )).alias("promo"),
        F.sum(rev).alias("total"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )
    return agg.select(
        _r6e(
            F.lit(100.0) * F.col("promo").cast("double")
            / F.col("total").cast("double"),
            "promo_revenue_pct",
        ),
        F.col("promo").cast("double").alias("promo_revenue"),
        F.col("total").cast("double").alias("total_revenue"),
        "n_lineitems",
    )


SQL_TPCH_Q14 = f"""
WITH j AS (
  SELECT p_type,
         CAST(l_extendedprice AS DECIMAL(18,2)) *
         (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
),
agg AS (
  SELECT sum(CASE WHEN p_type = 'PROMO' THEN rev
             ELSE CAST(0 AS DECIMAL(19,4)) END) AS promo,
         sum(rev) AS total, count(*) AS n_lineitems
  FROM j
)
SELECT {_sql_rne("100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE)",
                 "promo_revenue_pct")},
       CAST(promo AS DOUBLE) AS promo_revenue,
       CAST(total AS DOUBLE) AS total_revenue, n_lineitems
FROM agg"""


def q_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped: order-count distribution over ALL customers —
    the canonical outer-join-then-double-aggregate. The first agg
    shuffles on custkey (AQE plans the customer⋈orders exchange; both
    sides grow with SF so no broadcast); the second groups a
    customer-cardinality frame down to a handful of distribution rows
    with map-side combine. Zero-order customers survive via the left
    join + count(o_orderkey) null semantics."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


SQL_TPCH_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1)
GROUP BY 1"""


def q_tpch_q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: per-nation profile of high-balance customers
    and how many of them never ordered. The global positive-balance
    average arrives as a broadcast one-row frame and the comparison is
    done in exact DECIMAL cross-multiplied form (bal·n > total) so
    neither engine divides — no float threshold ambiguity. The
    no-orders condition is a left join against the per-customer order
    counts with a null-flag count_if (the aggregate form of NOT
    EXISTS); the final rollup is a tiny nation-keyed aggregate with
    the money sum in DECIMAL."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    dec = F.col("c_acctbal").cast("decimal(18,2)")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(dec).alias("total"), F.count(F.lit(1)).alias("n_pos")
    )
    hi = c.join(F.broadcast(pos)).filter(
        dec * F.col("n_pos") > F.col("total")
    )
    ocust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_ord"))
    flagged = hi.join(
        ocust, hi["c_custkey"] == ocust["o_custkey"], "left"
    )
    return (
        flagged.join(
            F.broadcast(n), flagged["c_nationkey"] == n["n_nationkey"]
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.count_if(F.col("o_custkey").isNull()).alias("n_idle"),
            F.sum(dec).cast("double").alias("total_acctbal"),
        )
    )


SQL_TPCH_Q22 = """
WITH pos AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS total,
         count(*) AS n_pos
  FROM customer WHERE c_acctbal > 0),
hi AS (
  SELECT c.* FROM customer c, pos
  WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_pos > total),
oc AS (SELECT o_custkey, count(*) AS n_ord FROM orders GROUP BY 1)
SELECT n_name, count(*) AS n_custs,
       CAST(count(*) FILTER (oc.o_custkey IS NULL) AS BIGINT) AS n_idle,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM hi LEFT JOIN oc ON hi.c_custkey = oc.o_custkey
JOIN nation ON hi.c_nationkey = n_nationkey
GROUP BY 1"""


def q_tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: shipping volume between two nations by year
    and direction — the canonical snowflake with TWO independent
    nation lookups (supplier's and customer's). Both nation arms are
    broadcast (fixed 25 rows at any SF) and their filters prune the
    supplier/customer sides BEFORE the big fact joins; lineitem⋈orders
    shuffles on the order key under AQE. Revenue is the exact DECIMAL
    sum; the year comes from the shipdate so the group-by is a pure
    scan expression."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = F.broadcast(
        n.filter(F.col("n_name").isin(Q7_NATIONS)).select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    cn = F.broadcast(
        n.filter(F.col("n_name").isin(Q7_NATIONS)).select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    dec = lambda col, p=18, sc=2: F.col(col).cast(f"decimal({p},{sc})")  # noqa: E731
    one = F.lit(1).cast("decimal(3,2)")
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount", 3, 2)))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


SQL_TPCH_Q7 = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ({_sql_q7_nations()})
  AND cn.n_name IN ({_sql_q7_nations()})
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3"""


def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped: one nation's market share of a part type's
    sales volume inside a region, by order year. The share is a ratio
    of two exact DECIMAL sums (conditional numerator via a CASE arm)
    converted to DOUBLE only for the final division, then rounded at
    1e-6 on both engines. part is the probe-side filter (AQE decides
    broadcast by runtime size); region⋈nation collapses to a broadcast
    customer-side prune; supplier's nation only labels the numerator."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == Q8_TYPE
    ).select("p_partkey")
    region_nations = F.broadcast(
        n.join(r, n["n_regionkey"] == r["r_regionkey"])
        .filter(F.col("r_name") == Q8_REGION)
        .select(F.col("n_nationkey").alias("rn_key"))
    )
    supp_n = F.broadcast(
        n.select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    dec = lambda col, pr=18, sc=2: F.col(col).cast(f"decimal({pr},{sc})")  # noqa: E731
    one = F.lit(1).cast("decimal(3,2)")
    vol = dec("l_extendedprice") * (one - dec("l_discount", 3, 2))
    zero = F.lit(0).cast("decimal(21,4)")
    base = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(region_nations, F.col("c_nationkey") == F.col("rn_key"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(supp_n, F.col("s_nationkey") == F.col("sn_key"))
    )
    agg = base.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        F.sum(
            F.when(F.col("supp_nation") == Q8_NATION, vol).otherwise(zero)
        ).alias("nation_vol"),
        F.sum(vol).alias("total_vol"),
    )
    share = F.col("nation_vol").cast("double") / F.col("total_vol").cast(
        "double"
    )
    return agg.select(
        "o_year",
        F.col("nation_vol").cast("double").alias("nation_volume"),
        F.col("total_vol").cast("double").alias("total_volume"),
        _rne(share, "mkt_share", 6),
    )


SQL_TPCH_Q8 = f"""
WITH base AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) *
         (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS vol,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = '{Q8_TYPE}'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = '{Q8_REGION}'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey),
agg AS (
  SELECT o_year,
         sum(CASE WHEN supp_nation = '{Q8_NATION}' THEN vol
                  ELSE CAST(0 AS DECIMAL(21,4)) END) AS nation_vol,
         sum(vol) AS total_vol
  FROM base GROUP BY 1)
SELECT CAST(o_year AS BIGINT) AS o_year,
       CAST(nation_vol AS DOUBLE) AS nation_volume,
       CAST(total_vol AS DOUBLE) AS total_volume,
       {_sql_rne('CAST(nation_vol AS DOUBLE) / CAST(total_vol AS DOUBLE)',
                 'mkt_share', 6)}
FROM agg"""


def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped: supplier(s) with the maximum quarterly
    revenue — the view-plus-scalar-max pattern. Per-supplier revenue
    is one map-side-combined DECIMAL aggregate over the date-pruned
    scan; the global max is a one-row broadcast joined back, so the
    equality test compares exact decimals (no float threshold). Ties
    all surface (deterministic without a limit)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_END).cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    dec = lambda col, p=18, sc=2: F.col(col).cast(f"decimal({p},{sc})")  # noqa: E731
    one = F.lit(1).cast("decimal(3,2)")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dec("l_extendedprice") * (one - dec("l_discount", 3, 2))).alias(
            "rev"
        )
    )
    mx = rev.agg(F.max("rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("rev") == F.col("max_rev"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev").cast("double").alias("total_revenue"),
        )
    )


SQL_TPCH_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
           AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_START}'
    AND l_shipdate < TIMESTAMP '{Q15_END}'
  GROUP BY 1)
SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev = (SELECT max(rev) FROM rev)"""


def q_tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped: revenue lost to small-quantity orders of one
    brand — the correlated-scalar-subquery pattern (per-part average
    quantity) as a self-join of the brand-pruned lineitem against its
    own per-part aggregate. The 0.2·avg threshold is evaluated in
    cross-multiplied DECIMAL form (qty·5·n < sum_qty) so neither
    engine divides; the brand filter broadcasts into both arms and
    prunes at the scan. Output is the classic sum/7.0 plus the
    matched-line count so the row is non-degenerate even when no line
    qualifies."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == Q17_BRAND
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    br = li.join(p, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    qdec = F.col("l_quantity").cast("decimal(18,2)")
    stats = br.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(qdec).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return (
        br.join(stats, F.col("l_partkey") == F.col("agg_partkey"))
        .filter(
            qdec * F.lit(5) * F.col("n_lines") < F.col("sum_qty")
        )
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


SQL_TPCH_Q17 = f"""
WITH br AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}'),
stats AS (
  SELECT l_partkey AS agg_partkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         count(*) AS n_lines
  FROM br GROUP BY 1)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       count(*) AS n_small_lines
FROM br JOIN stats ON l_partkey = agg_partkey
WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * n_lines < sum_qty"""


def q_tpch_q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped: late-shipment counts by order priority (the
    synthetic schema has no shipmode, so priority is the reporting
    dimension; the date-arithmetic join predicate is the point). One
    fact⋈fact equi-join on the order key under AQE; the late flag is a
    pure timestamp comparison computed in the join's output projection
    and the two counts partially aggregate map-side into 5 rows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q12_LATE_DAYS} DAYS"
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count_if(late).alias("n_late"),
        )
    )


SQL_TPCH_Q12 = f"""
SELECT o_orderpriority, count(*) AS n_lines,
       CAST(count(*) FILTER (l_shipdate > o_orderdate
         + INTERVAL {Q12_LATE_DAYS} DAY) AS BIGINT) AS n_late
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1"""


def q_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped: revenue under an OR-of-ANDs predicate mixing
    part attributes (brand, size) with lineitem attributes (quantity)
    — the disjunctive-pushdown probe. Catalyst extracts the
    brand/size disjunction as a part-scan filter and the quantity
    bounds as a lineitem-scan filter (constraint propagation), leaving
    only the cross-table residual on the join — the optimizer
    behavior Q19 exists to test. Exact DECIMAL revenue."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    arm = None
    for brand, s_lo, s_hi, q_lo, q_hi in Q19_ARMS:
        a = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        arm = a if arm is None else (arm | a)
    dec = lambda col, pr=18, sc=2: F.col(col).cast(f"decimal({pr},{sc})")  # noqa: E731
    one = F.lit(1).cast("decimal(3,2)")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(arm)
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount", 3, 2)))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def _sql_tpch_q19() -> str:
    arms = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
        f" AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in Q19_ARMS
    )
    return f"""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {arms}"""


def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped: for each qualifying part, the EUROPE supplier(s)
    offering the minimum cost — the correlated-MIN-subquery probe over a
    4-table snowflake (reference core/data/cdd.py has no relational tier;
    this extends the engine's TPC-H surface). The synthetic schema has no
    partsupp, so the supply relation is derived: cost(part, supp) =
    min line price over lineitem, one shuffle on (partkey, suppkey) with
    map-side combine. The correlated min is a window MIN over the part
    partition — the partkey exchange is shared between the cost aggregate
    and the window, so the whole correlation costs one extra sort, not a
    self-join. part/supplier/nation/region dims all broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_brand")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    ).select("r_regionkey")
    eu_supp = F.broadcast(
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(eu_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name",
                 "s_acctbal", "n_name")
        .agg(
            F.min(F.col("l_extendedprice").cast("decimal(18,2)"))
            .alias("cost")
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        cost.withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.col("cost").cast("double").alias("supply_cost"),
        )
    )


SQL_TPCH_Q2 = """
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
cost AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN eu_supp ON l_suppkey = s_suppkey
  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
  GROUP BY 1, 2, 3, 4, 5, 6)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       CAST(cost AS DOUBLE) AS supply_cost
FROM cost
WHERE cost = (SELECT min(c2.cost) FROM cost c2
              WHERE c2.p_partkey = cost.p_partkey)"""


def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped: profit per supplier nation per order year for
    parts whose name carries a color token. No partsupp in the synthetic
    schema, so line cost = p_retailprice × l_quantity (deterministic
    stand-in for ps_supplycost × l_quantity). All three dims (filtered
    part, supplier, nation) broadcast into the lineitem scan; the only
    shuffle is the fact⋈fact orderkey join to fetch the order year,
    then a 2-level groupBy that partially aggregates map-side into
    nations × years rows. Line profit is exact at DECIMAL(18,4):
    both products have scale ≤ 4, so the subtraction never rounds."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    dec = lambda c, pr, sc: F.col(c).cast(f"decimal({pr},{sc})")  # noqa: E731
    one = F.lit(1).cast("decimal(3,2)")
    revenue = (dec("l_extendedprice", 18, 2) * (one - dec("l_discount", 3, 2))
               ).cast("decimal(18,4)")
    supp_cost = (dec("p_retailprice", 18, 2) * dec("l_quantity", 18, 2)
                 ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("profit", revenue - supp_cost)
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.sum("profit").cast("double").alias("profit"))
    )


SQL_TPCH_Q9 = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                     AS DECIMAL(18,4)) -
                CAST(CAST(p_retailprice AS DECIMAL(18,2)) *
                     CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4)))
            AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2"""


def q_tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped: parts whose inventory value held by one
    nation's suppliers exceeds a fraction of that nation's total — the
    scalar-subquery-HAVING probe. Derived supply value (no partsupp):
    sum of line prices per part over NATION_7 suppliers. One shuffle on
    partkey builds the per-part aggregate; the grand total re-reduces
    that same aggregate (Catalyst reuses the exchange) into a one-row
    frame that broadcast-cross-joins back as the threshold. The
    fraction compare is integer-exact: value × 1000 > total, both
    DECIMAL, so no float epsilon in the cut."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    ).select("n_nationkey")
    nat_supp = F.broadcast(
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    per_part = (
        li.join(nat_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .alias("val")
        )
    )
    total = per_part.agg(F.sum("val").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val") * F.lit(1000) > F.col("total"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("val").cast("double").alias("part_value"),
        )
    )


SQL_TPCH_Q11 = """
WITH per_part AS (
  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY 1)
SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS part_value
FROM per_part
WHERE val * 1000 > (SELECT sum(val) FROM per_part)"""


def q_tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped: distinct-supplier counts per (brand, type,
    size) for non-excluded parts, excluding flagged suppliers — the
    NOT-IN-subquery + COUNT DISTINCT probe. The part↔supplier relation
    is the distinct (l_partkey, l_suppkey) projection of lineitem (no
    partsupp in the synthetic schema); the complaint set stand-in is
    suppliers with negative account balance, applied as a broadcast
    LEFT ANTI join (the NULL-safe way Catalyst compiles NOT IN when
    keys are non-null). One partkey-side shuffle for the pair distinct,
    then the count-distinct re-shuffles on the 3 grouping columns —
    both exchanges partial-aggregate map-side."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    flagged = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(flagged),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_TPCH_Q16 = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3"""


def q_tpch_q20_promotion_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped: ASIA suppliers who moved a significant volume
    of 'small' parts in 1997 — the nested-IN-subquery chain compiled as
    LEFT SEMI joins. Innermost: the part-name filter broadcasts into
    the date-pruned lineitem scan; the (suppkey, partkey) volume
    aggregate shuffles once with map-side combine; the HAVING-style
    volume cut produces a tiny key set that broadcast-SEMI-joins into
    the region-filtered supplier dim. No distinct needed after the
    semi join — semi emits each supplier at most once."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    big_movers = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(big_movers),
              F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal", "n_name")
    )


SQL_TPCH_Q20 = """
SELECT s_name, s_acctbal, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 30)"""


def q_tpch_q21_waiting_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped: AMERICA suppliers who were the SOLE late
    shipper on finished multi-supplier orders — the EXISTS +
    NOT-EXISTS double-correlated probe. Late = shipped > 60 days after
    the order date (the synthetic schema has no receipt/commit dates).
    Instead of Q21's textbook two extra self-joins of lineitem, the
    correlation collapses into ONE orderkey-grouped aggregate computing
    (distinct suppliers, distinct late suppliers) per order — EXISTS
    other-supplier ⟺ n_supp > 1, NOT EXISTS other-late-supplier ⟺
    n_late_supp = 1 given this supplier is late. The late-line supplier
    set rides the same orderkey exchange; the status filter pushes to
    the orders scan, supplier/nation/region dims broadcast."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q21_LATE_DAYS} DAYS"
    )
    per_order = joined.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
    )
    sole_late = (
        joined.filter(late)
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            per_order.filter(
                (F.col("n_supp") > 1) & (F.col("n_late") == 1)
            ).select("l_orderkey").withColumnRenamed("l_orderkey", "qok"),
            F.col("l_orderkey") == F.col("qok"),
        )
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    ).select("r_regionkey")
    am_supp = F.broadcast(
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        sole_late.join(am_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def q_part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts: minimize retail price,
    maximize size — the classic non-dominated-set operator. Collapses
    to the (price → best size) grain first (one aggregate), then one
    running-max window over prices sorted ascending keeps a price point
    iff its best size strictly beats every cheaper price's best — the
    O(n log n) sweep formulation, not the O(n²) dominance self-join.
    Frontier parts are those matching a surviving (price, best-size)
    pair; ties (same price and size) all belong to the frontier. The
    running max is the two-phase bucketed prefix (operators/twophase)
    — no single-task global sort even at billion-part scale."""
    from ..operators.twophase import log2_bucket, prefix_agg

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    per_price = p.groupBy("p_retailprice").agg(
        F.max("p_size").alias("best_size")
    )
    frontier = (
        prefix_agg(
            per_price,
            F.col("best_size"),
            log2_bucket(F.col("p_retailprice")),
            [F.col("p_retailprice").asc()],
            agg="max",
            out_col="prev_best",
        )
        .filter(
            F.col("prev_best").isNull()
            | (F.col("best_size") > F.col("prev_best"))
        )
        .select(
            F.col("p_retailprice").alias("f_price"),
            F.col("best_size").alias("f_size"),
        )
    )
    return p.join(
        frontier,
        (F.col("p_retailprice") == F.col("f_price"))
        & (F.col("p_size") == F.col("f_size")),
    ).select("p_partkey", "p_retailprice", "p_size")


SQL_PART_SKYLINE = """
WITH per_price AS (
  SELECT p_retailprice, max(p_size) AS best_size FROM part GROUP BY 1),
frontier AS (
  SELECT p_retailprice, best_size,
         max(best_size) OVER (ORDER BY p_retailprice ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_best
  FROM per_price)
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p JOIN frontier f
  ON p.p_retailprice = f.p_retailprice AND p.p_size = f.best_size
WHERE f.prev_best IS NULL OR f.best_size > f.prev_best"""


def q_lineitem_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification: parts ranked by exact
    DECIMAL revenue, classified A/B/C at the 80%/95% cumulative-share
    cuts — the 80/20 analysis behind stocking policy. One partkey
    aggregate; the cumulative sum is the two-phase bucketed prefix
    (operators/twophase — range-bucket by log2(revenue), parallel
    within-bucket windows, bucket-count-sized global pass) so no
    single task ever sorts the whole part grain; the share is a
    double division of exact DECIMALs, identical in both engines."""
    from ..operators.twophase import log2_bucket, prefix_agg

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (
                F.lit(1).cast("decimal(3,2)")
                - F.col("l_discount").cast("decimal(3,2)")
            )
        ).alias("revenue")
    )
    total = rev.agg(F.sum("revenue").alias("total"))
    ranked = (
        prefix_agg(
            rev.crossJoin(F.broadcast(total)),
            F.col("revenue"),
            log2_bucket(F.col("revenue")),
            [F.col("revenue").desc(), F.col("l_partkey").asc()],
            agg="sum",
            bucket_asc=False,
            strict=False,
            out_col="cum_rev",
        )
        .withColumn(
            "cum_share",
            F.col("cum_rev").cast("double") / F.col("total").cast("double"),
        )
    )
    cls = (
        F.when(F.col("cum_share") <= 0.80, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    return (
        ranked.withColumn("abc", cls)
        .groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("revenue").cast("double").alias("class_revenue"),
        )
    )


SQL_LINEITEM_ABC = """
WITH rev AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
           AS revenue
  FROM lineitem GROUP BY 1),
ranked AS (
  SELECT l_partkey, revenue,
         CAST(sum(revenue) OVER (ORDER BY revenue DESC, l_partkey ASC
           ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           / CAST((SELECT sum(revenue) FROM rev) AS DOUBLE) AS cum_share
  FROM rev)
SELECT CASE WHEN cum_share <= 0.80 THEN 'A'
            WHEN cum_share <= 0.95 THEN 'B'
            ELSE 'C' END AS abc,
       count(*) AS n_parts,
       CAST(sum(revenue) AS DOUBLE) AS class_revenue
FROM ranked GROUP BY 1"""


def q_orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the CRM classic: recency (days
    since last order, anchored at the table's max date), frequency
    (order count), monetary (exact DECIMAL spend) per customer,
    bucketed into quintiles by NTILE over fully tie-broken orders
    (metric, custkey — ntile's even-split rule is deterministic given
    a total order, identical in both engines), then counted per
    (r, f, m) cell with the cell's exact total spend. The customer
    dimension GROWS with the fact table, so the three NTILEs run
    two-phase (operators/twophase.py ntile_two_phase: bucketed prefix
    rank + the rank→tile closed form) — no data-sized single-task
    global sort; the oracle keeps DuckDB's plain ntile() windows,
    which is the cross-engine proof the closed form matches."""
    from ..operators.twophase import log2_bucket, ntile_two_phase

    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("mx"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "monetary"
            ),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.col("mx"), F.col("last_order")).alias("recency"),
            "frequency",
            "monetary",
        )
    )
    scored = per_cust
    for col, asc, out in (
        ("recency", True, "r_bucket"),
        ("frequency", False, "f_bucket"),
        ("monetary", False, "m_bucket"),
    ):
        order = [
            F.col(col).asc() if asc else F.col(col).desc(),
            F.col("o_custkey").asc(),
        ]
        scored = ntile_two_phase(
            scored,
            order,
            log2_bucket(F.col(col)),
            RFM_BUCKETS,
            bucket_asc=asc,
            out_col=out,
        )
    scored = scored.select(
        "o_custkey", "monetary", "r_bucket", "f_bucket", "m_bucket"
    )
    return scored.groupBy("r_bucket", "f_bucket", "m_bucket").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("monetary").cast("double").alias("cell_spend"),
    )


SQL_ORDERS_RFM = f"""
WITH per_cust AS (
  SELECT o_custkey,
         date_diff('day', max(o_orderdate),
                   (SELECT max(o_orderdate) FROM orders)) AS recency,
         count(*) AS frequency,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders GROUP BY 1),
scored AS (
  SELECT o_custkey, monetary,
         ntile({RFM_BUCKETS}) OVER (ORDER BY recency ASC, o_custkey ASC)
           AS r_bucket,
         ntile({RFM_BUCKETS}) OVER (ORDER BY frequency DESC, o_custkey ASC)
           AS f_bucket,
         ntile({RFM_BUCKETS}) OVER (ORDER BY monetary DESC, o_custkey ASC)
           AS m_bucket
  FROM per_cust)
SELECT r_bucket, f_bucket, m_bucket, count(*) AS n_customers,
       CAST(sum(monetary) AS DOUBLE) AS cell_spend
FROM scored GROUP BY 1, 2, 3"""


def q_orders_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap statistics per customer (order cadence: the
    input to churn-risk and replenishment models): day gaps from one
    LAG over the (date, orderkey)-ordered history, exact integer day
    arithmetic, mean as a double quotient of identical integers. One
    custkey exchange."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    )
    return gaps.groupBy("o_custkey").agg(
        (F.count(F.lit(1))).alias("n_orders"),
        F.count("gap_days").alias("n_gaps"),
        F.max("gap_days").alias("max_gap_days"),
        (
            F.sum("gap_days") / F.nullif(F.count("gap_days"), F.lit(0))
        ).alias("mean_gap_days"),
    )


SQL_ORDERS_GAP = """
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC),
                   o_orderdate) AS gap_days
  FROM orders)
SELECT o_custkey, count(*) AS n_orders,
       count(gap_days) AS n_gaps,
       CAST(max(gap_days) AS BIGINT) AS max_gap_days,
       CAST(sum(gap_days) AS BIGINT)
         / CAST(nullif(count(gap_days), 0) AS DOUBLE) AS mean_gap_days
FROM gaps GROUP BY 1"""


def q_part_supply_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source supply-risk report: parts bucketed by their
    distinct supplier count, with part counts and the exact DECIMAL
    revenue exposed at each redundancy level — the n_suppliers = 1 row
    is the procurement risk register. One distinct projection + two
    map-side-combined aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
            "revenue"
        ),
    )
    return per_part.groupBy("n_suppliers").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("revenue").cast("double").alias("revenue_at_risk"),
    )


SQL_PART_SUPPLY_RISK = """
WITH per_part AS (
  SELECT l_partkey, count(DISTINCT l_suppkey) AS n_suppliers,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue
  FROM lineitem GROUP BY 1)
SELECT n_suppliers, count(*) AS n_parts,
       CAST(sum(revenue) AS DOUBLE) AS revenue_at_risk
FROM per_part GROUP BY 1"""


SQL_TPCH_Q21 = f"""
WITH joined AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
per_order AS (
  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT l_suppkey) FILTER (late) AS n_late
  FROM joined GROUP BY 1),
sole_late AS (
  SELECT DISTINCT j.l_orderkey, j.l_suppkey
  FROM joined j JOIN per_order p ON j.l_orderkey = p.l_orderkey
  WHERE j.late AND p.n_supp > 1 AND p.n_late = 1)
SELECT s_name, count(*) AS numwait
FROM sole_late
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
GROUP BY 1"""


def q_orders_open_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order concurrency by day — the classic sweep-line interval
    aggregation (how many orders are in flight on each change day):
    each order contributes +1 at its order date and −1 the day after
    its last shipment; the running sum of day-grouped deltas IS the
    concurrency step function. The running sum uses the two-phase
    bucketed prefix (operators/twophase, bucket = year) so no single
    task ever sorts the full day grain — the same scale discipline as
    ABC/gini — and the day grain itself is calendar-bounded. Output is
    one row per change day (the step function's knots)."""
    from ..operators.twophase import prefix_agg

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("d0")
    )
    ship = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("d1"))
    )
    iv = o.join(ship, F.col("o_orderkey") == F.col("l_orderkey"))
    deltas = (
        iv.select(F.col("d0").alias("day"), F.lit(1).alias("delta"))
        .unionByName(
            iv.select(
                F.date_add(F.col("d1"), 1).alias("day"),
                F.lit(-1).alias("delta"),
            )
        )
        .groupBy("day")
        .agg(F.sum("delta").alias("delta"))
    )
    out = prefix_agg(
        deltas,
        F.col("delta"),
        F.year(F.col("day")).cast("long"),
        [F.col("day").asc()],
        agg="sum",
        strict=False,
        out_col="n_open",
    )
    return out.select("day", "delta", "n_open")


SQL_ORDERS_OPEN_CONCURRENCY = """
WITH iv AS (
  SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS d0,
         CAST(max(l.l_shipdate) AS DATE) AS d1
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2),
deltas AS (
  SELECT day, CAST(sum(delta) AS BIGINT) AS delta FROM (
    SELECT d0 AS day, 1 AS delta FROM iv
    UNION ALL
    SELECT CAST(d1 + INTERVAL 1 DAY AS DATE), -1 FROM iv)
  GROUP BY 1)
SELECT day, delta,
       CAST(sum(delta) OVER (ORDER BY day) AS BIGINT) AS n_open
FROM deltas"""


def q_orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers grouped by first-order
    month, revenue accumulated by months-since-first-order — the
    curve a growth team reads LTV/CAC off. Revenue rides integer
    cents end-to-end (one float division at the very end), the month
    index is exact integer year/month arithmetic (no engine
    months_between conventions), and the cumulative sum runs in a
    cohort-partitioned window whose frame is calendar-bounded
    (months, not orders) — scale-safe without any global sort. Two
    exchanges total: the per-customer first-order aggregate and the
    (cohort, m) aggregate."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    first = o.groupBy("o_custkey").agg(
        F.min(F.to_date(F.date_trunc("month", "o_orderdate"))).alias(
            "cohort_month"
        )
    )
    sizes = first.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    j = o.join(first, "o_custkey")
    m = (
        (F.year("o_orderdate") - F.year("cohort_month")) * 12
        + (F.month("o_orderdate") - F.month("cohort_month"))
    ).cast("int")
    per = (
        j.select("cohort_month", m.alias("m"), "cents")
        .groupBy("cohort_month", "m")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("rev_cents"),
        )
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per.withColumn("cum_cents", F.sum("rev_cents").over(w))
        .join(F.broadcast(sizes), "cohort_month")
        .select(
            "cohort_month",
            "m",
            "n_orders",
            "cum_cents",
            _rne(
                F.col("cum_cents")
                / F.lit(100.0)
                / F.col("cohort_size").cast("double"),
                "ltv_per_customer",
                6,
            ),
        )
    )


SQL_ORDERS_COHORT_LTV = f"""
WITH o AS (
  SELECT o_custkey, o_orderdate,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
first_ AS (
  SELECT o_custkey,
         CAST(date_trunc('month', min(o_orderdate)) AS DATE)
           AS cohort_month
  FROM o GROUP BY 1),
sizes AS (
  SELECT cohort_month, count(*) AS cohort_size FROM first_ GROUP BY 1),
per AS (
  SELECT f.cohort_month,
         CAST((year(o.o_orderdate) - year(f.cohort_month)) * 12
              + (month(o.o_orderdate) - month(f.cohort_month)) AS INT)
           AS m,
         count(*) AS n_orders,
         CAST(sum(o.cents) AS BIGINT) AS rev_cents
  FROM o JOIN first_ f USING (o_custkey)
  GROUP BY 1, 2)
SELECT p.cohort_month, p.m, p.n_orders,
       CAST(sum(p.rev_cents) OVER (PARTITION BY p.cohort_month
         ORDER BY p.m ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
       {_sql_rne(
           'CAST(sum(p.rev_cents) OVER (PARTITION BY p.cohort_month'
           ' ORDER BY p.m ROWS UNBOUNDED PRECEDING) AS DOUBLE)'
           ' / 100.0 / s.cohort_size', 'ltv_per_customer')}
FROM per p JOIN sizes s USING (cohort_month)"""



def q_orders_split_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-payment screen — the approval-threshold-evasion audit an
    AP/fraud team runs: customers placing MULTIPLE orders on the same
    day, with the day's combined amount and the largest single order
    (a cluster of small orders summing to a large amount is the
    signature). One (customer, day) aggregate, amounts in exact
    integer cents; only multi-order days are emitted, so the output is
    incident-sized. At warehouse scale this is a single
    map-side-combined aggregate over the natural ingest partitioning."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    return (
        o.groupBy(F.col("o_custkey").alias("cust"), F.col("d").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
            F.max("cents").alias("max_single_cents"),
        )
        .filter(F.col("n_orders") >= 2)
        .withColumn(
            "split_ratio",
            F.col("max_single_cents")
            / F.col("total_cents").cast("double"),
        )
    )


SQL_ORDERS_SPLIT_PAYMENTS = """
WITH o AS (
  SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS day,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
g AS (
  SELECT cust, day, count(*) AS n_orders,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         max(cents) AS max_single_cents
  FROM o GROUP BY 1, 2)
SELECT cust, day, n_orders, total_cents, max_single_cents,
       CAST(max_single_cents AS DOUBLE) / total_cents AS split_ratio
FROM g WHERE n_orders >= 2"""



def q_orders_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-next-order — the
    repeat-purchase analysis done properly: every order contributes
    either an EVENT (the observed gap to the customer's next order,
    in days) or a CENSORED observation (no next order yet — time from
    the last order to the dataset snapshot), and S(t) multiplies
    (1 − d_t/n_t) over event times. Censoring is what the naive
    gap-histogram gets wrong. Distributed shape: day-grain counts,
    at-risk via total − exclusive prefix (two-phase bucketed — no
    single-task sort), and the product as exp of a prefix sum of
    1e-9-snapped logs in exact DECIMAL, so the curve is
    order-insensitive and engine-exact."""
    from ..operators.twophase import log2_bucket, prefix_agg

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d")
    )
    # per order: next order date (same customer); dataset snapshot
    nxt = o.withColumn("d_next", F.lead("d", 1).over(
        Window.partitionBy("o_custkey").orderBy("d")
    ))
    snapshot = o.agg(F.max("d").alias("snap"))
    obs = nxt.crossJoin(F.broadcast(snapshot)).select(
        F.when(
            F.col("d_next").isNotNull(), F.datediff("d_next", "d")
        )
        .otherwise(F.datediff("snap", "d"))
        .cast("long")
        .alias("t"),
        F.col("d_next").isNotNull().alias("is_event"),
    ).filter(F.col("t") > 0)
    per_t = obs.groupBy("t").agg(
        F.count_if(F.col("is_event")).alias("d_events"),
        F.count_if(~F.col("is_event")).alias("d_censored"),
    )
    total = obs.agg(F.count(F.lit(1)).alias("n_total"))
    # n_at_risk(t) = total - (# observations with time < t)
    pre = prefix_agg(
        per_t.withColumn(
            "w", F.col("d_events") + F.col("d_censored")
        ),
        F.col("w"),
        log2_bucket(F.col("t")),
        [F.col("t").asc()],
        agg="sum",
        strict=True,
        out_col="n_before",
    ).crossJoin(F.broadcast(total))
    risk = pre.select(
        "t",
        "d_events",
        "d_censored",
        (
            F.col("n_total") - F.coalesce(F.col("n_before"), F.lit(0))
        ).alias("n_risk"),
    )
    # the terminal event time can have d == n (everyone remaining
    # events) — S drops to exactly 0 there; ln is undefined, so the
    # term is NULL (excluded from the DECIMAL sum in both engines)
    # and the survival emission overrides to 0.0
    lnterm = F.when(
        F.col("d_events") < F.col("n_risk"),
        F.floor(
            F.log(
                1.0
                - F.col("d_events") / F.col("n_risk").cast("double")
            )
            * 1e9
            + F.lit(0.5)
        )
        / 1e9,
    )
    terms = risk.filter(F.col("d_events") > 0).withColumn(
        "lnr", lnterm.cast("decimal(28,9)")
    )
    surv = prefix_agg(
        terms,
        F.col("lnr"),
        log2_bucket(F.col("t")),
        [F.col("t").asc()],
        agg="sum",
        strict=False,
        out_col="cumln",
    )
    return surv.select(
        "t",
        "n_risk",
        "d_events",
        "d_censored",
        _rne(
            F.when(
                F.col("d_events") == F.col("n_risk"), F.lit(0.0)
            ).otherwise(
                F.exp(F.coalesce(F.col("cumln").cast("double"), F.lit(0.0)))
            ),
            "survival",
            6,
        ),
    )


def _sql_orders_survival_km() -> str:
    return f"""
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
nxt AS (
  SELECT o_custkey, d,
         lead(d) OVER (PARTITION BY o_custkey ORDER BY d) AS d_next
  FROM o),
snap AS (SELECT max(d) AS snap FROM o),
obs AS (
  SELECT CASE WHEN d_next IS NOT NULL
              THEN datediff('day', d, d_next)
              ELSE datediff('day', d, snap) END AS t,
         d_next IS NOT NULL AS is_event
  FROM nxt CROSS JOIN snap
  WHERE CASE WHEN d_next IS NOT NULL
             THEN datediff('day', d, d_next)
             ELSE datediff('day', d, snap) END > 0),
per_t AS (
  SELECT t, CAST(count(*) FILTER (is_event) AS BIGINT) AS d_events,
         CAST(count(*) FILTER (NOT is_event) AS BIGINT) AS d_censored
  FROM obs GROUP BY 1),
total AS (SELECT count(*) AS n_total FROM obs),
risk AS (
  SELECT t, d_events, d_censored,
         n_total - coalesce(sum(d_events + d_censored) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS n_risk
  FROM per_t CROSS JOIN total),
terms AS (
  SELECT t, n_risk, d_events, d_censored,
         CASE WHEN d_events < n_risk THEN
           CAST(floor(ln(1.0 - CAST(d_events AS DOUBLE) / n_risk)
                  * 1000000000.0 + 0.5) / 1000000000.0
                AS DECIMAL(28,9)) END AS lnr
  FROM risk WHERE d_events > 0)
SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d_events, d_censored,
       {_sql_rne(
           "CASE WHEN d_events = n_risk THEN 0.0 ELSE "
           "exp(coalesce(CAST(sum(lnr) OVER ("
           "ORDER BY t ROWS UNBOUNDED PRECEDING) AS DOUBLE), 0.0)) END",
           'survival')}
FROM terms"""


def q_part_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per brand — the pricing
    card every retail warehouse computes: OLS slope of ln(quantity)
    on ln(unit price) across a brand's line items (unit price =
    extendedprice / quantity, the TPC-H convention). Each ln snaps to
    an integer 1e-9 grid so the per-brand normal equations ride exact
    DECIMAL products (the 1e-9 scale cancels in the slope; the
    intercept rescales once); the lineitem→part attach is the
    standard fact-to-dim key join (AQE picks broadcast when part
    fits, shuffle-hash beyond — no plan pin needed: either is
    correct), then ONE map-side-combined groupBy on the 25-brand
    key. Elasticity < 0 = normal good; R² says how much of quantity
    variance price explains."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).filter((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
    pt = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    d = li.join(pt, "l_partkey")
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    xq = F.floor(F.log(unit) * 1e9 + F.lit(0.5)).cast("decimal(38,0)")
    yq = F.floor(
        F.log(F.col("l_quantity")) * 1e9 + F.lit(0.5)
    ).cast("decimal(38,0)")
    d = d.select("p_brand", xq.alias("x"), yq.alias("y"))
    agg = d.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).filter(F.col("n") >= 3)
    nd = F.col("n").cast("decimal(38,0)")
    cov_n = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = nd * F.col("syy") - F.col("sy") * F.col("sy")
    el = F.when(
        varx_n.cast("double") > 0,
        cov_n.cast("double") / varx_n.cast("double"),
    )
    r2 = F.when(
        (varx_n.cast("double") > 0) & (vary_n.cast("double") > 0),
        (cov_n.cast("double") * cov_n.cast("double"))
        / (varx_n.cast("double") * vary_n.cast("double")),
    )
    return agg.select(
        "p_brand",
        F.col("n").cast("long").alias("n"),
        _rne(el, "elasticity", 8),
        _rne(r2, "r2", 8),
    )


def _sql_part_price_elasticity() -> str:
    return f"""
WITH d AS (
  SELECT p.p_brand,
         floor(ln(l.l_extendedprice / l.l_quantity) * 1000000000.0
               + 0.5)::DECIMAL(38,0) AS x,
         floor(ln(l.l_quantity) * 1000000000.0
               + 0.5)::DECIMAL(38,0) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_quantity > 0 AND l.l_extendedprice > 0),
agg AS (
  SELECT p_brand, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM d GROUP BY 1 HAVING count(*) >= 3),
fit AS (
  SELECT p_brand, n,
         (n::DECIMAL(38,0) * sxy - sx * sy)::DOUBLE AS cov_n,
         (n::DECIMAL(38,0) * sxx - sx * sx)::DOUBLE AS varx_n,
         (n::DECIMAL(38,0) * syy - sy * sy)::DOUBLE AS vary_n
  FROM agg)
SELECT p_brand, n::BIGINT AS n,
       {_sql_rne('CASE WHEN varx_n > 0 THEN cov_n / varx_n END',
                 'elasticity', 8)},
       {_sql_rne(
           'CASE WHEN varx_n > 0 AND vary_n > 0 '
           'THEN (cov_n * cov_n) / (varx_n * vary_n) END',
           'r2', 8)}
FROM fit"""


def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier market concentration per nation — Herfindahl–
    Hirschman index of lineitem revenue shares (the supply-risk
    summary statistic next to part_supply_risk's per-part view: HHI >
    0.25 is the antitrust red line; 1/HHI is the 'effective supplier
    count'). Per-supplier revenue rides the TPC-H money device
    (DECIMAL(18,2) × DECIMAL(3,2), exact), converts to exact integer
    1e-4-currency units, and HHI = Σrev²/(Σrev)² is computed from
    exact DECIMAL squares — one float division at the end. nation is
    a constant-size dim, broadcast; the only data-sized shuffle is
    the (supplier) revenue aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    dec = lambda c, p=18, s=2: F.col(c).cast(f"decimal({p},{s})")  # noqa: E731
    one = F.lit(1).cast("decimal(3,2)")
    rev = (
        li.select("l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_name", "l_suppkey")
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount", 3, 2)))
            .alias("rev")
        )
    )
    revu = (F.col("rev") * F.lit(10000)).cast("decimal(38,0)")
    per = rev.select("n_name", revu.alias("u"))
    agg = per.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("u").alias("su"),
        F.sum(F.col("u") * F.col("u")).alias("su2"),
    )
    tot = F.col("su").cast("double")
    hhi = F.when(
        F.col("su") > 0,
        F.col("su2").cast("double") / (tot * tot),
    )
    return agg.select(
        F.col("n_name").alias("nation"),
        F.col("n_suppliers").cast("long").alias("n_suppliers"),
        _rne(tot / F.lit(1e4), "revenue", 2),
        _rne(hhi, "hhi", 10),
        _rne(F.lit(1.0) / hhi, "effective_n", 6),
    )


def _sql_supplier_hhi() -> str:
    return f"""
WITH rev AS (
  SELECT n.n_name, l.l_suppkey,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(3,2))
                - CAST(l.l_discount AS DECIMAL(3,2)))) AS rev
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2),
per AS (
  SELECT n_name, (rev * 10000)::DECIMAL(38,0) AS u FROM rev),
agg AS (
  SELECT n_name, count(*) AS n_suppliers, sum(u) AS su,
         sum(u * u) AS su2
  FROM per GROUP BY 1)
SELECT n_name AS nation, n_suppliers::BIGINT AS n_suppliers,
       {_sql_rne('su::DOUBLE / 10000.0', 'revenue', 2)},
       {_sql_rne(
           'CASE WHEN su > 0 THEN su2::DOUBLE'
           ' / (su::DOUBLE * su::DOUBLE) END', 'hhi', 10)},
       {_sql_rne(
           'CASE WHEN su > 0 THEN 1.0 / (su2::DOUBLE'
           ' / (su::DOUBLE * su::DOUBLE)) END', 'effective_n', 6)}
FROM agg"""


def q_orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order seasonality card: per-month order count + exact DECIMAL
    revenue with month-over-month and year-over-year growth — the
    calendar-trend readout under every cohort/LTV analysis (a
    retention dip reads differently when the whole book is
    seasonal). Months are a CALENDAR-BOUNDED frame, so the two lag
    windows run over ≤ a few hundred rows; counts and money sums are
    exact (cents DECIMAL), growth ratios are final float ops,
    first/gap months yield NULL growth identically in both
    engines."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    m = o.groupBy(
        F.trunc(F.to_date("o_orderdate"), "month").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                "decimal(38,0)"
            )
        ).alias("cents"),
    )
    wm = Window.partitionBy().orderBy("month")
    prev = F.lag("cents", 1).over(wm)
    yoy = F.lag("cents", 12).over(wm)
    prev_m = F.lag("month", 1).over(wm)
    yoy_m = F.lag("month", 12).over(wm)
    d = m.select(
        "month",
        "n_orders",
        "cents",
        # growth only against the ADJACENT calendar month/year — a
        # gap month must not silently compare against an older one
        F.when(
            prev_m == F.add_months(F.col("month"), -1), prev
        ).alias("prev"),
        F.when(
            yoy_m == F.add_months(F.col("month"), -12), yoy
        ).alias("pyoy"),
    )
    g = lambda cur, base: F.when(  # noqa: E731
        base > 0,
        (cur.cast("double") - base.cast("double")) / base.cast("double"),
    )
    return d.select(
        "month",
        F.col("n_orders").cast("long").alias("n_orders"),
        _rne(F.col("cents").cast("double") / F.lit(100.0), "revenue", 2),
        _rne(g(F.col("cents"), F.col("prev")) * F.lit(100.0),
             "mom_pct", 6),
        _rne(g(F.col("cents"), F.col("pyoy")) * F.lit(100.0),
             "yoy_pct", 6),
    )


def _sql_orders_monthly_growth() -> str:
    return f"""
WITH m AS (
  SELECT date_trunc('month', o_orderdate)::DATE AS month,
         count(*) AS n_orders,
         sum(floor(o_totalprice * 100 + 0.5)::DECIMAL(38,0)) AS cents
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY 1),
lagged AS (
  SELECT month, n_orders, cents,
         CASE WHEN lag(month, 1) OVER w = month - INTERVAL 1 MONTH
              THEN lag(cents, 1) OVER w END AS prev,
         CASE WHEN lag(month, 12) OVER w = month - INTERVAL 12 MONTH
              THEN lag(cents, 12) OVER w END AS pyoy
  FROM m WINDOW w AS (ORDER BY month))
SELECT month, n_orders::BIGINT AS n_orders,
       {_sql_rne('cents::DOUBLE / 100.0', 'revenue', 2)},
       {_sql_rne(
           'CASE WHEN prev > 0 THEN (cents::DOUBLE - prev::DOUBLE)'
           ' / prev::DOUBLE * 100.0 END', 'mom_pct', 6)},
       {_sql_rne(
           'CASE WHEN pyoy > 0 THEN (cents::DOUBLE - pyoy::DOUBLE)'
           ' / pyoy::DOUBLE * 100.0 END', 'yoy_pct', 6)}
FROM lagged"""


def q_part_brand_price_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retail-price dispersion per brand — n/mean/CV/median/extremes
    of p_retailprice in exact integer cents: the catalog-pricing
    profile that flags brands whose price architecture drifted (a CV
    jump = inconsistent pricing, a median≠mean gap = a skewed line).
    Exact DECIMAL moments for mean/CV; the median uses the exact
    sort-based percentile device. One map-side groupBy over the part
    scan; |brands| rows."""
    p = load_table(spark, sf_dir, "part").select(
        "p_brand",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("cents"),
    ).filter(F.col("p_brand").isNotNull() & F.col("cents").isNotNull())
    agg = p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
        F.min("cents").alias("mn"),
        F.max("cents").alias("mx"),
        F.expr("percentile(cents, 0.5D)").alias("p50c"),
    )
    n_ = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n_ / F.lit(100.0)
    var = (
        (
            F.col("n").cast("decimal(38,0)") * F.col("s2")
            - F.col("s1") * F.col("s1")
        ).cast("double")
        / (n_ * n_)
        / F.lit(1e4)
    )
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    return agg.select(
        F.col("p_brand").alias("brand"),
        F.col("n").cast("long").alias("n"),
        _rne(mean, "mean_price", 6),
        _rne(F.when(mean > 0, sd / mean), "cv", 8),
        _rne(F.col("p50c") / F.lit(100.0), "median_price", 6),
        _rne(F.col("mn").cast("double") / F.lit(100.0), "min_price", 2),
        _rne(F.col("mx").cast("double") / F.lit(100.0), "max_price", 2),
    )


def _sql_part_brand_price_spread() -> str:
    mean = "s1::DOUBLE / n::DOUBLE / 100.0"
    var = (
        "(n::DECIMAL(38,0) * s2 - s1 * s1)::DOUBLE"
        " / (n::DOUBLE * n::DOUBLE) / 1e4"
    )
    sd = f"sqrt(greatest({var}, 0.0))"
    return f"""
WITH p AS (
  SELECT p_brand,
         floor(p_retailprice * 100 + 0.5)::DECIMAL(38,0) AS cents
  FROM part WHERE p_brand IS NOT NULL AND p_retailprice IS NOT NULL),
agg AS (
  SELECT p_brand, count(*) AS n, sum(cents) AS s1,
         sum(cents * cents) AS s2, min(cents) AS mn, max(cents) AS mx,
         quantile_cont(cents, 0.5) AS p50c
  FROM p GROUP BY 1)
SELECT p_brand AS brand, n::BIGINT AS n,
       {_sql_rne(mean, 'mean_price', 6)},
       {_sql_rne(
           f'CASE WHEN {mean} > 0 THEN {sd} / ({mean}) END', 'cv', 8)},
       {_sql_rne('p50c / 100.0', 'median_price', 6)},
       {_sql_rne('mn::DOUBLE / 100.0', 'min_price', 2)},
       {_sql_rne('mx::DOUBLE / 100.0', 'max_price', 2)}
FROM agg"""


def q_customer_balance_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance profile per market segment — n, exact mean,
    negative-balance share, and p10/p50/p90 (exact sort-based
    percentile; percentile_approx is the 100 TB swap-in): the
    credit-risk mix behind tpch_q22's idle-balance query, segment by
    segment. Money rides exact integer cents; one map-side groupBy;
    |segments| rows."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    ).filter(
        F.col("c_mktsegment").isNotNull() & F.col("cents").isNotNull()
    )
    q = F.expr("percentile(cents, array(0.1D, 0.5D, 0.9D))")
    agg = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.when(F.col("cents") < 0, 1).otherwise(0)).alias("nneg"),
        q.alias("qs"),
    )
    n_ = F.col("n").cast("double")
    return agg.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("n").cast("long").alias("n"),
        _rne(F.col("s1").cast("double") / n_ / F.lit(100.0),
             "mean_bal", 6),
        _rne(F.col("nneg").cast("double") / n_, "pct_negative", 8),
        _rne(F.element_at("qs", 1) / F.lit(100.0), "p10", 6),
        _rne(F.element_at("qs", 2) / F.lit(100.0), "p50", 6),
        _rne(F.element_at("qs", 3) / F.lit(100.0), "p90", 6),
    )


def _sql_customer_balance_profile() -> str:
    return f"""
WITH c AS (
  SELECT c_mktsegment,
         floor(c_acctbal * 100 + 0.5)::BIGINT AS cents
  FROM customer
  WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL),
agg AS (
  SELECT c_mktsegment, count(*) AS n,
         sum(cents::DECIMAL(38,0)) AS s1,
         sum(CASE WHEN cents < 0 THEN 1 ELSE 0 END) AS nneg,
         quantile_cont(cents, 0.1) AS p10c,
         quantile_cont(cents, 0.5) AS p50c,
         quantile_cont(cents, 0.9) AS p90c
  FROM c GROUP BY 1)
SELECT c_mktsegment AS segment, n::BIGINT AS n,
       {_sql_rne('s1::DOUBLE / n::DOUBLE / 100.0', 'mean_bal', 6)},
       {_sql_rne('nneg::DOUBLE / n::DOUBLE', 'pct_negative', 8)},
       {_sql_rne('p10c / 100.0', 'p10', 6)},
       {_sql_rne('p50c / 100.0', 'p50', 6)},
       {_sql_rne('p90c / 100.0', 'p90', 6)}
FROM agg"""


def q_lineitem_brand_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate league table per brand — share of lineitems with
    returnflag 'R', with a Wilson 95% lower bound so small-n brands
    can't top the league on noise (the ranking statistic quality
    teams actually sort by; the plain share is reported beside it).
    part is a broadcast dim; counts are exact; the Wilson bound is
    one closed-form IEEE expression. |brands| rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    agg = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("r"),
    )
    n_ = F.col("n").cast("double")
    ph = F.col("r").cast("double") / n_
    z2 = F.lit(1.959963984540054**2)
    wilson = (
        ph
        + z2 / (F.lit(2.0) * n_)
        - F.sqrt(z2)
        * F.sqrt(ph * (F.lit(1.0) - ph) / n_ + z2 / (F.lit(4.0) * n_ * n_))
    ) / (F.lit(1.0) + z2 / n_)
    return agg.select(
        F.col("p_brand").alias("brand"),
        F.col("n").cast("long").alias("n"),
        F.col("r").cast("long").alias("n_returned"),
        _rne(ph, "return_rate", 8),
        _rne(wilson, "wilson_lb", 8),
    )


def _sql_lineitem_brand_returns() -> str:
    z2 = 1.959963984540054**2
    ph = "r::DOUBLE / n::DOUBLE"
    wilson = (
        f"(({ph}) + {z2!r} / (2.0 * n::DOUBLE)"
        f" - sqrt({z2!r}) * sqrt(({ph}) * (1.0 - ({ph})) / n::DOUBLE"
        f" + {z2!r} / (4.0 * n::DOUBLE * n::DOUBLE)))"
        f" / (1.0 + {z2!r} / n::DOUBLE)"
    )
    return f"""
WITH agg AS (
  SELECT p.p_brand, count(*) AS n,
         sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1)
SELECT p_brand AS brand, n::BIGINT AS n, r::BIGINT AS n_returned,
       {_sql_rne(ph, 'return_rate', 8)},
       {_sql_rne(wilson, 'wilson_lb', 8)}
FROM agg"""


import math as _math

BENFORD_EXPECTED = [
    _math.log10(1.0 + 1.0 / digit) for digit in range(1, 10)
]


def q_orders_benford_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the
    data-quality/fraud screen a finance pipeline runs over any
    organically-generated money column (fabricated or truncated
    amounts bend the log-uniform digit curve). The first digit comes
    from INTEGER cents via a string head (bigint-to-string is
    engine-identical; no float log10, whose boundary behavior at
    exact powers of ten differs across engines — the
    events_user_lifespan lesson). Emits one row per digit with
    observed/expected shares and the chi-square contribution;
    expected shares are python-literal log10(1+1/d) constants."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 0
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    dig = F.substring(cents.cast("string"), 1, 1).cast("long")
    agg = o.select(dig.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = agg.agg(F.sum("n").alias("tot"))
    exp_map = F.element_at(
        F.array(*[F.lit(e) for e in BENFORD_EXPECTED]),
        F.col("digit").cast("int"),
    )
    j = agg.crossJoin(F.broadcast(tot)).withColumn("expected", exp_map)
    share = F.col("n").cast("double") / F.col("tot").cast("double")
    chi = (
        (share - F.col("expected"))
        * (share - F.col("expected"))
        / F.col("expected")
    )
    return j.select(
        F.col("digit").cast("long").alias("digit"),
        F.col("n").cast("long").alias("n"),
        _rne(share, "share", 8),
        _rne(F.col("expected"), "expected", 8),
        _rne(chi, "chi_term", 10),
    )


def _sql_orders_benford_law() -> str:
    arr = ", ".join(repr(e) for e in BENFORD_EXPECTED)
    return f"""
WITH o AS (
  SELECT CAST(substring(CAST(CAST(floor(o_totalprice * 100 + 0.5)
              AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0),
agg AS (SELECT digit, count(*) AS n FROM o GROUP BY 1),
tot AS (SELECT sum(n) AS tot FROM agg),
j AS (
  SELECT digit, n, ([{arr}])[digit::INT] AS expected,
         n::DOUBLE / tot::DOUBLE AS share
  FROM agg CROSS JOIN tot)
SELECT digit::BIGINT AS digit, n::BIGINT AS n,
       {_sql_rne('share', 'share', 8)},
       {_sql_rne('expected', 'expected', 8)},
       {_sql_rne('(share - expected) * (share - expected) / expected',
                 'chi_term', 10)}
FROM j"""
