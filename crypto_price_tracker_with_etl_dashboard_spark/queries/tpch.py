"""TPC-H-derived relational coverage, adapted to the driver's reduced
star schema (no partsupp table, no l_commitdate / l_receiptdate /
l_shipmode / c_phone columns — see TESTDATA.md).  Each query keeps
the defining operator shape of its TPC-H original:

- Q4  — correlated EXISTS  -> left-semi join with a non-equi term
- Q7  — two-nation volume  -> double dimension role-playing (nation
        joined twice under different roles)
- Q8  — market share       -> conditional aggregate ratio per group
- Q9  — product profit     -> multi-fact expression over a 5-way join
- Q10 — returned items     -> group-by over a wide key + top-K
- Q18 — large-volume orders-> agg-as-filter (HAVING) then re-join
- Q19 — disjunctive preds  -> OR-of-ANDs pushed into one scan
- Q22 — idle balances      -> scalar subquery threshold + anti join

Plans to check at scale (SCALE.md): every dimension side is
broadcast; the only shuffles are the fact-table aggregations.
Reference parity context: the reference's single join J1
(api/server.js:67-77) is subsumed by these shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators.exact import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)
from crypto_price_tracker_with_etl_dashboard_spark.queries import register
from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table

def _revenue():
    # Built lazily: Column construction needs an active SparkContext,
    # which doesn't exist at import time.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


SQL_REVENUE = "l_extendedprice * (1 - l_discount)"


# ---- Q4 (adapted): late-shipment order priority check ----------------------
# TPC-H Q4's EXISTS(l_commitdate < l_receiptdate) becomes
# EXISTS(l_shipdate > o_orderdate + 60 days): same correlated-exists
# shape, expressed as a LEFT SEMI join whose condition carries the
# non-equi term alongside the orderkey equi-join.  Catalyst executes
# the equi part as the hash key and the interval term as a residual
# filter — no nested-loop, one shuffle of each side on orderkey.

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-04-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


register(
    "q4_order_priority",
    q4_order_priority,
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-04-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)


# ---- Q7: volume shipping between two nations -------------------------------
# nation role-plays twice (supplier's vs customer's); both copies are
# broadcast, as are supplier and customer, so the whole 6-way join is
# one pass over lineitem plus one shuffle into orders (the only other
# fact-sized table).

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1, n2 = "NATION_1", "NATION_2"
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    supp_n = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_n = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    joined = (
        li.join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_n), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum(_revenue(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


register(
    "q7_volume_shipping",
    q7_volume_shipping,
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             {SQL_REVENUE} AS volume
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                           AND TIMESTAMP '1996-12-31 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)


# ---- Q8: national market share ---------------------------------------------
# Share of one supplier-nation's revenue within a customer-region's
# market for one part type, per year.  The ratio of two exact
# fixed-point sums is a single double division — deterministic across
# partitionings, so it oracle-matches bit-for-bit.

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_region = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    target_vol = F.when(F.col("supp_nation") == "NATION_5", _revenue()).otherwise(F.lit(0.0))
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dsum(target_vol, "nation_volume"),
            dsum(_revenue(), "total_volume"),
        )
        .select(
            "o_year",
            (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


register(
    "q8_market_share",
    q8_market_share,
    f"""
    SELECT o_year, nation_volume / total_volume AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {sql_dsum("CASE WHEN n2.n_name = 'NATION_5' THEN " + SQL_REVENUE + " ELSE 0.0 END")}
               AS nation_volume,
             {sql_dsum(SQL_REVENUE)} AS total_volume
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN supplier  ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                            AND TIMESTAMP '1996-12-31 00:00:00'
      GROUP BY 1
    )
    ORDER BY o_year
    """,
)


# ---- Q9 (adapted): product-type profit by nation and year ------------------
# TPC-H Q9 prices supply cost from partsupp; with no partsupp table
# the unit cost proxies as 40% of p_retailprice.  The operator shape
# is unchanged: a profit expression spanning three tables' columns,
# aggregated by two derived keys.

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    orders = load_table(spark, sf_dir, "orders")
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    profit = _revenue() - F.lit(0.4) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit, "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


register(
    "q9_product_profit",
    q9_product_profit,
    f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           {sql_dsum(SQL_REVENUE + ' - 0.4 * p_retailprice * l_quantity')} AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)


# ---- Q10: returned-item reporting (top 20 customers) -----------------------
# Wide group-by key (everything the report displays) then top-K; the
# unique c_custkey inside the key makes the LIMIT deterministic under
# the revenue-desc, custkey-asc total order.

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_revenue(), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


register(
    "q10_returned_items",
    q10_returned_items,
    f"""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           {sql_dsum(SQL_REVENUE)} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)


# ---- Q18: large-volume customers (agg-as-filter, then re-join) -------------
# The HAVING-side aggregate keeps only orderkeys above the quantity
# threshold; that tiny set broadcasts back into orders/customer.  At
# 100 TB the first aggregation is the only lineitem shuffle, and its
# output (filtered orderkeys) is orders-of-magnitude smaller than its
# input — the canonical agg-before-join reduction.

def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big_orders), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_orderdate"), F.col("o_totalprice"), F.col("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


register(
    "q18_large_volume",
    q18_large_volume,
    f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM (
      SELECT l_orderkey, {sql_dsum('l_quantity')} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
    )
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE sum_qty > 300
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)


# ---- Q19: disjunctive predicate revenue ------------------------------------
# OR-of-ANDs across two tables.  Expressed as one joined filter so
# Catalyst can (a) push the p_brand/p_size disjunction to the part
# scan and the quantity bounds to the lineitem scan as a derived
# OR-envelope, (b) run the residual after a single broadcast join —
# no union-of-three-scans rewrite needed.

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(dsum(_revenue(), "revenue"), F.count("*").alias("n_rows"))
    )


register(
    "q19_disjunctive_revenue",
    q19_disjunctive_revenue,
    f"""
    SELECT {sql_dsum(SQL_REVENUE)} AS revenue, COUNT(*) AS n_rows
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)


# ---- Q22 (adapted): idle balances — rich customers with no orders ----------
# The scalar subquery (average positive balance) computes via exact
# fixed-point mean, broadcasts as a 1-row cross join, then an anti
# join drops customers with any order.  Without c_phone the TPC-H
# country-code grouping becomes nation-name grouping.

def q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    # Anti join against RECENT orders only (customers idle since 2000)
    # — in the dense synthetic data every customer has *some* order,
    # which would make the full-history anti join vacuously empty.
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    nation = load_table(spark, sf_dir, "nation")
    threshold = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal", "avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("n_name")
    )


register(
    "q22_idle_balance",
    q22_idle_balance,
    f"""
    SELECT n_name, COUNT(*) AS numcust, {sql_dsum('c_acctbal')} AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (
        SELECT {sql_davg('c_acctbal')} FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY n_name
    ORDER BY n_name
    """,
)


# ---- Q2 (adapted): minimum-cost supplier per part --------------------------
# TPC-H Q2's correlated MIN(ps_supplycost) subquery has no partsupp
# table here; the unit price actually shipped (l_extendedprice /
# l_quantity) plays the supply-cost role.  The operator shape is
# intact: per-part scalar MIN, equality back-join to recover the
# achieving supplier rows.  The window MIN shuffles only lineitems of
# the ~1/6-of-parts broadcast-filtered subset, and equality on the
# double is safe because both sides compare the *same* computed value.

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    unit = (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    offers = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).select(
        "p_partkey", "p_name", "l_suppkey", unit
    )
    w = Window.partitionBy("p_partkey")
    best = offers.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal", "s_name", "p_partkey", "p_name",
            F.col("unit_cost").alias("min_cost"),
        )
        .distinct()
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
        .limit(100)
    )


register(
    "q2_min_cost_supplier",
    q2_min_cost_supplier,
    """
    SELECT DISTINCT s_acctbal, s_name, p_partkey, p_name,
           l_extendedprice / l_quantity AS min_cost
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_type = 'STANDARD' AND p_size <= 10
      AND l_extendedprice / l_quantity = (
        SELECT MIN(l2.l_extendedprice / l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    ORDER BY s_acctbal DESC, p_partkey, s_name
    LIMIT 100
    """,
)


# ---- Q12 (adapted): shipping-delay buckets vs order priority ---------------
# TPC-H Q12's l_shipmode classes become ship-delay buckets (days from
# order to ship); the defining shape — join + CASE-conditional counts
# per class — is unchanged.

def q12_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay < 30, "fast").when(delay < 90, "mid").otherwise("slow")
    ).alias("delay_bucket")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(bucket, urgent.alias("is_urgent"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("is_urgent"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(F.col("is_urgent"), 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


register(
    "q12_delay_priority",
    q12_delay_priority,
    """
    SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) < 30 THEN 'fast'
                WHEN datediff('day', o_orderdate, l_shipdate) < 90 THEN 'mid'
                ELSE 'slow' END AS delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)
             AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    ORDER BY delay_bucket
    """,
)


# ---- Q15: top supplier(s) by quarterly revenue ------------------------------
# The revenue "view" aggregates lineitem once; its scalar MAX
# broadcasts back as a 1-row cross join.  Revenue equality is exact
# because dsum is fixed-point (operators/exact.py), so the back-join
# is deterministic across partitionings — the classic Q15 pitfall.

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy("l_suppkey").agg(dsum(_revenue(), "total_revenue"))
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


register(
    "q15_top_supplier",
    q15_top_supplier,
    f"""
    WITH revenue AS (
      SELECT l_suppkey, {sql_dsum(SQL_REVENUE)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM revenue JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)


# ---- Q16 (adapted): supplier diversity per part attribute ------------------
# COUNT(DISTINCT supplier) per (brand, type, size) from the shipment
# relation (lineitem stands in for partsupp), minus an excluded
# supplier set (negative balances play Q16's complaints filter) — the
# NOT IN becomes a hash anti join, the distinct-agg shuffles once on
# the grouping key with the suppkey carried for the distinct.

def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


register(
    "q16_supplier_diversity",
    q16_supplier_diversity,
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)


# ---- Q20 (adapted): heavy shippers of a part family ------------------------
# TPC-H Q20's nested partsupp/availqty subquery becomes: suppliers
# who shipped more than 50 units of some 'widget' part during 1996.
# Shape preserved: an aggregation-derived key set feeding a LEFT SEMI
# into the supplier dimension; nation broadcast for display.

def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    widget_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    ).select("p_partkey")
    heavy = (
        li.join(F.broadcast(widget_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum("l_quantity", "qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


register(
    "q20_heavy_shippers",
    q20_heavy_shippers,
    f"""
    SELECT s_name, n_name AS nation
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM (
        SELECT l_suppkey, l_partkey, {sql_dsum('l_quantity')} AS qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
      ) WHERE qty > 50
    )
    ORDER BY s_name
    """,
)


# ---- Q21 (adapted): the supplier who shipped last ---------------------------
# TPC-H Q21 without l_receiptdate/l_commitdate: for finished orders
# involving >= 2 suppliers, count per supplier the lineitems that
# were strictly the LAST shipment of their order (no other supplier
# shipped later).  Same defining shape: EXISTS(other supplier) as a
# hash LEFT SEMI + NOT EXISTS(later other supplier) as a hash LEFT
# ANTI, both on the orderkey hash key with the inequality terms as
# residuals — no nested loop, lineitem shuffles once per side.

def q21_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    f_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l1 = (
        li.join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .alias("l1")
    )
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    waiting = l1.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


register(
    "q21_last_shipper",
    q21_last_shipper,
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE l1.l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)


# ---- Q11: important stock value (global-threshold HAVING) ------------------
# Adapted: the testdata has no partsupp table, so lineitem plays the
# supply ledger (l_partkey, l_suppkey, l_extendedprice as supply
# value) — same operator shape as TPC-H Q11: join the ledger to a
# one-nation supplier slice, aggregate value per part, then keep only
# parts above a FRACTION OF THE GLOBAL TOTAL (correlated scalar
# subquery -> broadcast scalar cross join + filter).  Completes the
# 22-query TPC-H shape inventory (Q2/Q16/Q20 adapt partsupp the same
# way).
#
# 100 TB shape: the ledger shuffles ONCE on l_partkey for the group
# agg; supplier+nation reduce to a broadcast hash set before the
# ledger is touched; the grand total re-aggregates the (already
# small) per-part aggregate, not the ledger, and comes back as a
# broadcast scalar — no second pass over the fact table.

_Q11_NATION = "NATION_7"
_Q11_FRACTION = 0.001


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == _Q11_NATION)
    nat_supp = supp.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    per_part = (
        li.join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(dsum("l_extendedprice", "value"))
    )
    total = per_part.agg(dsum("value").alias("grand"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("grand") * _Q11_FRACTION)
        .select("l_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


register(
    "q11_important_stock",
    q11_important_stock,
    f"""
    WITH per_part AS (
      SELECT l_partkey, {sql_dsum('l_extendedprice')} AS value
      FROM lineitem
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = '{_Q11_NATION}'
      )
      GROUP BY l_partkey
    )
    SELECT l_partkey, round(value, 2) AS value
    FROM per_part
    WHERE value > (SELECT {sql_dsum('value')} FROM per_part) * {_Q11_FRACTION}
    ORDER BY value DESC, l_partkey
    """,
)


# ---- nation trade balance ----------------------------------------------------
# The bilateral view q5/q7 stop short of: per nation, revenue where
# its suppliers SHIP (exports) vs revenue its customers ORDER
# (imports), and the net balance.  Both sides are independent
# fact-table aggregations keyed by the broadcast supplier/customer
# dims (no lineitem-orders-lineitem self-join); the revenue sums are
# the engine's fixed-point dsum, so the balance is deterministic at
# any partitioning.  The two 25-row aggregates meet in a broadcast-
# sized full outer join on nation.


def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    customer = F.broadcast(load_table(spark, sf_dir, "customer"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")

    exports = (
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(dsum(rev, "exports"))
    )
    imports = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(dsum(rev, "imports"))
    )
    return (
        exports.join(imports, "nationkey", "full_outer")
        .join(nation, F.col("nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce("exports", F.lit(0.0)).alias("exports"),
            F.coalesce("imports", F.lit(0.0)).alias("imports"),
            (
                F.coalesce("exports", F.lit(0.0))
                - F.coalesce("imports", F.lit(0.0))
            ).alias("balance"),
        )
        .orderBy("nation")
    )


register(
    "nation_trade_balance",
    q_nation_trade_balance,
    f"""
    WITH exports AS (
      SELECT s_nationkey AS nationkey,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS exports
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1
    ),
    imports AS (
      SELECT c_nationkey AS nationkey,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS imports
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY 1
    )
    SELECT n_name AS nation,
           COALESCE(exports, 0.0) AS exports,
           COALESCE(imports, 0.0) AS imports,
           COALESCE(exports, 0.0) - COALESCE(imports, 0.0) AS balance
    FROM exports FULL OUTER JOIN imports USING (nationkey)
    JOIN nation ON nationkey = n_nationkey
    ORDER BY nation
    """,
)


# ---- supplier-nation lead-time percentiles ------------------------------------
# Order-to-ship latency per supplier nation: exact lower-median and
# ceil-indexed p90 of datediff(l_shipdate, o_orderdate) in days.
# Exact distributed percentiles WITHOUT a per-nation row sort: lead
# times are small integers, so a (nation, lead) count table plus a
# cumulative sum over the few-hundred distinct leads selects the
# order statistics — the stump-split trick, immune to percentile_cont
# interpolation differences between engines.  Shuffles: one hash agg
# on (nation, lead); the cumsum window runs over |nations| x |leads|
# rows, thousands at any corpus size.


def q_supply_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    per_lead = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("lead"),
        )
        .groupBy("nation", "lead")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    w = (
        Window.partitionBy("nation")
        .orderBy("lead")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_lead.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("nation"))
    )
    med = (
        cum.filter(F.expr("cum >= (n + 1) div 2"))
        .groupBy("nation")
        .agg(F.min("lead").alias("med_days"), F.max("n").alias("n_lines"))
    )
    p90 = (
        cum.filter(F.expr("cum >= (n * 9 + 9) div 10"))
        .groupBy("nation")
        .agg(F.min("lead").alias("p90_days"))
    )
    return (
        med.join(p90, "nation")
        .select("nation", "n_lines", "med_days", "p90_days")
        .orderBy("nation")
    )


register(
    "supply_lead_time",
    q_supply_lead_time,
    """
    WITH per_lead AS (
      SELECT n_name AS nation,
             CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS lead,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT nation, lead, c,
             CAST(SUM(c) OVER (PARTITION BY nation ORDER BY lead
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(SUM(c) OVER (PARTITION BY nation) AS BIGINT) AS n
      FROM per_lead
    ),
    med AS (
      SELECT nation, MIN(lead) AS med_days, CAST(MAX(n) AS BIGINT) AS n_lines
      FROM cum WHERE cum >= (n + 1) // 2 GROUP BY 1
    ),
    p90 AS (
      SELECT nation, MIN(lead) AS p90_days
      FROM cum WHERE cum >= (n * 9 + 9) // 10 GROUP BY 1
    )
    SELECT nation, n_lines, med_days, p90_days
    FROM med JOIN p90 USING (nation)
    ORDER BY nation
    """,
)


# ---- supplier scorecard --------------------------------------------------------
# The procurement composite: per supplier — line volume, cent-exact
# net revenue, on-time rate (order-to-ship within 30 days), and
# revenue share of the whole book — top 20 by revenue.  Revenue is
# per-term-rounded integer cents (exact, order-free sums); the share
# ratio is one double op so the int64 product cap never binds.  Plan:
# the lineitem-orders join is co-partitioned on orderkey, supplier is
# broadcast, the top-20 is a distributed TakeOrdered, and the 1-row
# total folds back via a broadcast cross join.

_SCORECARD_TOPN = 20
_SCORECARD_SLA_DAYS = 30


def q_supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    per = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_suppkey",
            F.expr(
                "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
            ).alias("cents"),
            (
                F.datediff("l_shipdate", "o_orderdate") <= _SCORECARD_SLA_DAYS
            ).cast("int").alias("on_time"),
        )
        .groupBy("l_suppkey")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
            F.sum("on_time").cast("bigint").alias("on_time_lines"),
        )
    )
    total = per.agg(F.sum("revenue_cents").cast("bigint").alias("total_cents"))
    return (
        per.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("s_name").alias("supplier"),
            "n_lines",
            "revenue_cents",
            F.expr("on_time_lines * 1000000 div n_lines").alias("on_time_ppm"),
            F.expr(
                "CAST(floor(CAST(revenue_cents AS DOUBLE) * 1000000.0"
                " / CAST(total_cents AS DOUBLE)) AS BIGINT)"
            ).alias("rev_share_ppm"),
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("supplier").asc())
        .limit(_SCORECARD_TOPN)
    )


register(
    "supplier_scorecard",
    q_supplier_scorecard,
    f"""
    WITH per AS (
      SELECT l_suppkey,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS revenue_cents,
             CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate)
                                <= {_SCORECARD_SLA_DAYS}
                           THEN 1 ELSE 0 END) AS BIGINT) AS on_time_lines
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    ),
    total AS (
      SELECT CAST(SUM(revenue_cents) AS BIGINT) AS total_cents FROM per
    )
    SELECT s_name AS supplier, n_lines, revenue_cents,
           on_time_lines * 1000000 // n_lines AS on_time_ppm,
           CAST(floor(CAST(revenue_cents AS DOUBLE) * 1000000.0
                      / CAST(total_cents AS DOUBLE)) AS BIGINT)
             AS rev_share_ppm
    FROM per JOIN supplier ON l_suppkey = s_suppkey
    CROSS JOIN total
    ORDER BY revenue_cents DESC, supplier ASC
    LIMIT {_SCORECARD_TOPN}
    """,
)


# ---- sourcing-depth exposure ---------------------------------------------------
# The procurement risk view q16 (supplier diversity) stops short of:
# band every part by HOW MANY distinct suppliers ship it, and report
# each band's part count and cent-exact revenue — how much revenue
# rides on thinly-sourced parts?  Fixed data-independent band edges
# (<=20 / 21-30 / 31+ suppliers: TPC-H's uniform assignment puts
# every part in the teens-to-forties, so these cut meaningful
# terciles; a literal single-source part lands in the lowest band).
# Revenue uses per-term-rounded integer cents; shares are one double
# op.  Plan: one partkey hash agg, then a 3-row fold.


def q_parts_sourcing_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_part = lineitem.groupBy("l_partkey").agg(
        F.count_distinct("l_suppkey").cast("bigint").alias("n_suppliers"),
        F.sum(
            F.expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
        )
        .cast("bigint")
        .alias("cents"),
    )
    bucket = F.when(F.col("n_suppliers") <= 20, "1-thin(<=20)").when(
        F.col("n_suppliers") <= 30, "2-mid(21-30)"
    ).otherwise("3-deep(31+)")
    per = (
        per_part.groupBy(bucket.alias("sourcing"))
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
    )
    total = per.agg(F.sum("revenue_cents").cast("bigint").alias("total_cents"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "sourcing",
            "n_parts",
            "revenue_cents",
            F.expr(
                "CAST(floor(CAST(revenue_cents AS DOUBLE) * 1000000.0"
                " / CAST(total_cents AS DOUBLE)) AS BIGINT)"
            ).alias("rev_share_ppm"),
        )
        .orderBy("sourcing")
    )


register(
    "parts_sourcing_depth",
    q_parts_sourcing_depth,
    """
    WITH per_part AS (
      SELECT l_partkey,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ),
    per AS (
      SELECT CASE WHEN n_suppliers <= 20 THEN '1-thin(<=20)'
                  WHEN n_suppliers <= 30 THEN '2-mid(21-30)'
                  ELSE '3-deep(31+)' END AS sourcing,
             CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(cents) AS BIGINT) AS revenue_cents
      FROM per_part GROUP BY 1
    ),
    total AS (SELECT CAST(SUM(revenue_cents) AS BIGINT) AS total_cents FROM per)
    SELECT sourcing, n_parts, revenue_cents,
           CAST(floor(CAST(revenue_cents AS DOUBLE) * 1000000.0
                      / CAST(total_cents AS DOUBLE)) AS BIGINT)
             AS rev_share_ppm
    FROM per CROSS JOIN total
    ORDER BY sourcing
    """,
)


# ---- lead-time trend ---------------------------------------------------------------
# Is fulfillment getting faster?  Quarterly exact lower-median lead
# time (the supply_lead_time count-bucket discipline, bucketed by
# quarter instead of nation) plus the OLS slope of the medians
# against the quarter index — the supply-chain SLO trendline.


def q_supply_lead_time_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_lead = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.to_date(F.date_trunc("quarter", "o_orderdate")).alias("quarter"),
            F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("lead"),
        )
        .groupBy("quarter", "lead")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    wcum = (
        Window.partitionBy("quarter")
        .orderBy("lead")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_lead.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("quarter"))
    )
    med = (
        cum.filter(F.expr("cum >= (n + 1) div 2"))
        .groupBy("quarter")
        .agg(F.min("lead").alias("med_days"))
        .withColumn(
            "t",
            F.row_number().over(Window.orderBy("quarter")).cast("bigint"),
        )
    )
    mom = med.agg(
        F.count("*").cast("bigint").alias("n_quarters"),
        F.sum("t").cast("bigint").alias("sx"),
        F.sum("med_days").cast("bigint").alias("sy"),
        F.sum(F.expr("t * med_days")).cast("bigint").alias("sxy"),
        F.sum(F.expr("t * t")).cast("bigint").alias("sxx"),
    )
    slope = (
        "(CAST(n_quarters AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(n_quarters AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    return mom.filter(F.expr("n_quarters >= 3")).select(
        "n_quarters",
        F.expr(f"CAST(floor(({slope}) * 1000.0) AS BIGINT)").alias(
            "slope_milli_days_per_q"
        ),
    )


register(
    "supply_lead_time_trend",
    q_supply_lead_time_trend,
    """
    WITH per_lead AS (
      SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter,
             CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS lead,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT quarter, lead, c,
             CAST(SUM(c) OVER (PARTITION BY quarter ORDER BY lead
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(SUM(c) OVER (PARTITION BY quarter) AS BIGINT) AS n
      FROM per_lead
    ),
    med AS (
      SELECT quarter, MIN(lead) AS med_days,
             CAST(row_number() OVER (ORDER BY quarter) AS BIGINT) AS t
      FROM cum WHERE cum >= (n + 1) // 2 GROUP BY quarter
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_quarters,
             CAST(SUM(t) AS BIGINT) AS sx,
             CAST(SUM(med_days) AS BIGINT) AS sy,
             CAST(SUM(t * med_days) AS BIGINT) AS sxy,
             CAST(SUM(t * t) AS BIGINT) AS sxx
      FROM med
    )
    SELECT n_quarters,
           CAST(floor(((CAST(n_quarters AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n_quarters AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                      * 1000.0) AS BIGINT) AS slope_milli_days_per_q
    FROM mom WHERE n_quarters >= 3
    """,
)


# ---- supplier lead-time variability league --------------------------------------------
# Reliability, not speed: the suppliers whose order-to-ship latency
# swings the most, ranked by exact IQR (p75 - p25 via the
# count-bucket order statistics).  A supplier can have a great median
# and a terrible IQR — this is the one planners actually derate.
# Top-10 by IQR desc, then name.

_LEAD_VAR_TOPN = 10
_LEAD_VAR_MIN_LINES = 20


def q_supplier_lead_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    per_lead = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_suppkey",
            F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("lead"),
        )
        .groupBy("l_suppkey", "lead")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    wcum = (
        Window.partitionBy("l_suppkey")
        .orderBy("lead")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_lead.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("l_suppkey"))
    )
    p25 = cum.filter(F.expr("cum >= (n + 3) div 4")).groupBy("l_suppkey").agg(
        F.min("lead").alias("p25"), F.max("n").cast("bigint").alias("n_lines")
    )
    p75 = cum.filter(F.expr("cum >= (n * 3 + 3) div 4")).groupBy(
        "l_suppkey"
    ).agg(F.min("lead").alias("p75"))
    return (
        p25.join(p75, "l_suppkey")
        .filter(F.col("n_lines") >= _LEAD_VAR_MIN_LINES)
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_name").alias("supplier"),
            "n_lines",
            "p25",
            "p75",
            (F.col("p75") - F.col("p25")).alias("iqr_days"),
        )
        .orderBy(F.col("iqr_days").desc(), F.col("supplier").asc())
        .limit(_LEAD_VAR_TOPN)
    )


register(
    "supplier_lead_variability",
    q_supplier_lead_variability,
    f"""
    WITH per_lead AS (
      SELECT l_suppkey,
             CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS lead,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT l_suppkey, lead, c,
             CAST(SUM(c) OVER (PARTITION BY l_suppkey ORDER BY lead
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(SUM(c) OVER (PARTITION BY l_suppkey) AS BIGINT) AS n
      FROM per_lead
    ),
    p25 AS (
      SELECT l_suppkey, MIN(lead) AS p25, CAST(MAX(n) AS BIGINT) AS n_lines
      FROM cum WHERE cum >= (n + 3) // 4 GROUP BY 1
    ),
    p75 AS (
      SELECT l_suppkey, MIN(lead) AS p75
      FROM cum WHERE cum >= (n * 3 + 3) // 4 GROUP BY 1
    )
    SELECT s_name AS supplier, n_lines, p25, p75, p75 - p25 AS iqr_days
    FROM p25 JOIN p75 USING (l_suppkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE n_lines >= {_LEAD_VAR_MIN_LINES}
    ORDER BY iqr_days DESC, supplier ASC
    LIMIT {_LEAD_VAR_TOPN}
    """,
)


# ---- per-priority shipping SLA medians --------------------------------------------
# The fairness audit on fulfillment: exact median lead time per order
# priority (count-bucket order statistics) plus a PRIORITY-INVERSION
# flag — true when some nominally-higher priority class ships slower
# at the median than a lower one (ordering by the priority prefix,
# '1-URGENT' < '5-LOW').


def q_orders_priority_slas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_lead = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderpriority",
            F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("lead"),
        )
        .groupBy("o_orderpriority", "lead")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    wcum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("lead")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_lead.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("o_orderpriority"))
    )
    med = cum.filter(F.expr("cum >= (n + 1) div 2")).groupBy(
        "o_orderpriority"
    ).agg(
        F.min("lead").alias("med_days"),
        F.max("n").cast("bigint").alias("n_lines"),
    )
    # inversion: any pair where the lexicographically-earlier (more
    # urgent) priority has a strictly larger median — |priorities|^2
    # comparisons over a 5-row table
    a = med.select(
        F.col("o_orderpriority").alias("pa"), F.col("med_days").alias("ma")
    )
    b = med.select(
        F.col("o_orderpriority").alias("pb"), F.col("med_days").alias("mb")
    )
    inv = (
        a.join(b, F.expr("pa < pb AND ma > mb"))
        .agg(F.count("*").cast("bigint").alias("inversions"))
    )
    return (
        med.crossJoin(F.broadcast(inv))
        .select(
            "o_orderpriority",
            "n_lines",
            "med_days",
            (F.col("inversions") > 0).alias("priority_inversion"),
        )
        .orderBy("o_orderpriority")
    )


register(
    "orders_priority_slas",
    q_orders_priority_slas,
    """
    WITH per_lead AS (
      SELECT o_orderpriority,
             CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS lead,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT o_orderpriority, lead, c,
             CAST(SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY lead
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(SUM(c) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
      FROM per_lead
    ),
    med AS (
      SELECT o_orderpriority, MIN(lead) AS med_days,
             CAST(MAX(n) AS BIGINT) AS n_lines
      FROM cum WHERE cum >= (n + 1) // 2 GROUP BY 1
    ),
    inv AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS inversions
      FROM med a JOIN med b
        ON a.o_orderpriority < b.o_orderpriority
       AND a.med_days > b.med_days
    )
    SELECT o_orderpriority, n_lines, med_days,
           inversions > 0 AS priority_inversion
    FROM med CROSS JOIN inv
    ORDER BY o_orderpriority
    """,
)


# ---- region revenue trend ------------------------------------------------------
# The region-level rollup missing between the nation trade balance
# (per-nation totals) and the brand share-shift (YoY movers): yearly
# discounted revenue per supplier region with a year-over-year growth
# rate.  Revenue is the fixed-point exact dsum, so both engines see
# the IDENTICAL double and the derived ppm growth is one identical
# float expression; the lag window is partitioned by region (no
# partitionless window).  All three dimensions broadcast — the only
# shuffle is the 35-group aggregate on the fact table.

_RRT_YOY = (
    "CASE WHEN prev_rev > 0 THEN"
    " CAST(floor((revenue - prev_rev) * 1000000.0 / prev_rev) AS BIGINT)"
    " ELSE NULL END"
)


def q_region_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    yearly = (
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region"),
            F.year("l_shipdate").alias("year"),
        )
        .agg(dsum(_revenue(), "revenue"))
    )
    w = Window.partitionBy("region").orderBy("year")
    return (
        yearly.withColumn("prev_rev", F.lag("revenue").over(w))
        .select(
            "region",
            "year",
            "revenue",
            F.expr(_RRT_YOY).alias("yoy_ppm"),
        )
        .orderBy("region", "year")
    )


register(
    "region_revenue_trend",
    q_region_revenue_trend,
    f"""
    WITH yearly AS (
      SELECT r.r_name AS region, CAST(year(l.l_shipdate) AS INTEGER) AS "year",
             {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ),
    lagged AS (
      SELECT region, "year", revenue,
             lag(revenue) OVER (PARTITION BY region ORDER BY "year")
               AS prev_rev
      FROM yearly
    )
    SELECT region, "year", revenue, {_RRT_YOY} AS yoy_ppm
    FROM lagged ORDER BY region, "year"
    """,
)


# ---- order-priority mix drift ----------------------------------------------------
# The composition-drift audit on the order stream: does any year's
# priority mix deviate from the all-time mix?  A procurement system
# whose URGENT share creeps up is a different workload than its SLA
# models assume (the mix-shift cousin of orders_quarter_end_loading's
# timing forensics).  Shares are integer ppm (cnt*1e6 div total) on
# both engines; drift is their exact difference — no chi-square
# float sum whose cell order could differ.  Two scan-bound
# aggregates, 35 output rows.

_PMIX_FLAG_PPM = 20_000  # |drift| >= 2 percentage points


def q_orders_priority_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.year("o_orderdate").alias("year"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    wy = Window.partitionBy("year")
    wp = Window.partitionBy("priority")
    ww = Window.partitionBy()
    # the windows are over the 35-row AGGREGATE, not the fact table —
    # partitionless is fine at this cardinality
    return (
        cells.withColumn("year_total", F.sum("cnt").over(wy).cast("bigint"))
        .withColumn("prio_total", F.sum("cnt").over(wp).cast("bigint"))
        .withColumn("grand_total", F.sum("cnt").over(ww).cast("bigint"))
        .select(
            "year",
            "priority",
            "cnt",
            F.expr("cnt * 1000000 div year_total").alias("share_ppm"),
            F.expr(
                "cnt * 1000000 div year_total"
                " - prio_total * 1000000 div grand_total"
            ).alias("drift_ppm"),
            F.expr(
                "abs(cnt * 1000000 div year_total"
                f" - prio_total * 1000000 div grand_total) >= {_PMIX_FLAG_PPM}"
            ).alias("flagged"),
        )
        .orderBy("year", "priority")
    )


register(
    "orders_priority_mix_drift",
    q_orders_priority_mix_drift,
    f"""
    WITH cells AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS "year",
             o_orderpriority AS priority,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2
    ),
    tot AS (
      SELECT "year", priority, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY "year") AS BIGINT) AS year_total,
             CAST(SUM(cnt) OVER (PARTITION BY priority) AS BIGINT) AS prio_total,
             CAST(SUM(cnt) OVER () AS BIGINT) AS grand_total
      FROM cells
    )
    SELECT "year", priority, cnt,
           cnt * 1000000 // year_total AS share_ppm,
           cnt * 1000000 // year_total - prio_total * 1000000 // grand_total
             AS drift_ppm,
           abs(cnt * 1000000 // year_total
               - prio_total * 1000000 // grand_total) >= {_PMIX_FLAG_PPM}
             AS flagged
    FROM tot ORDER BY "year", priority
    """,
)


# ---- join-blowup pre-flight estimator ---------------------------------------------
# Batch 58.  The decision tool you run BEFORE a 100 TB self-join:
# predict the output cardinality of lineitem JOIN lineitem ON
# l_partkey (the "compare suppliers of the same part" pattern) from
# the key histogram alone — sum(cnt^2) over keys — without executing
# the join.  The report gives the exact predicted rows, the blowup
# factor vs the input (milli), and the top-5 hot keys with their ppm
# contribution: precisely the inputs to the broadcast / salt /
# bucket decision (operators/skew.py, operators/bucketing.py) and
# the two-sided complement of events_key_skew's one-table histogram.
# One map-side-combinable key aggregate; summaries are 1-row
# broadcasts.  All integer (DECIMAL(38,0)/HUGEINT sums: cnt^2 over
# billions of keys exceeds BIGINT long before the join itself is
# even representable).

_BLOWUP_TOP = 5


def q_lineitem_join_blowup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    hist = lineitem.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    totals = hist.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * cnt"))
        .cast("decimal(38,0)")
        .alias("predicted_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
    )
    top = (
        hist.orderBy(F.desc("cnt"), F.asc("l_partkey"))
        .limit(_BLOWUP_TOP)
        .withColumn(
            "rank",
            # window over the already-limited 5-row relation only
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.asc("l_partkey"))
            ),
        )
    )
    return (
        top.join(F.broadcast(totals))
        .select(
            "rank",
            "l_partkey",
            "cnt",
            F.expr("CAST(CAST(cnt AS DECIMAL(38,0)) * cnt AS BIGINT)").alias(
                "key_pairs"
            ),
            F.expr("CAST(predicted_rows AS BIGINT)").alias("predicted_rows"),
            F.expr(
                "CAST(predicted_rows * 1000 div n_rows AS BIGINT)"
            ).alias("blowup_milli"),
            F.expr(
                "CAST(CAST(cnt AS DECIMAL(38,0)) * cnt * 1000000"
                " div predicted_rows AS BIGINT)"
            ).alias("contribution_ppm"),
        )
        .orderBy("rank")
    )


register(
    "lineitem_join_blowup",
    q_lineitem_join_blowup,
    f"""
    WITH hist AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ),
    totals AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
             SUM(CAST(cnt AS HUGEINT) * cnt) AS predicted_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys
      FROM hist
    ),
    top AS (
      SELECT l_partkey, cnt,
             row_number() OVER (ORDER BY cnt DESC, l_partkey ASC) AS rank
      FROM hist
      ORDER BY cnt DESC, l_partkey ASC LIMIT {_BLOWUP_TOP}
    )
    SELECT rank, l_partkey, cnt,
           CAST(CAST(cnt AS HUGEINT) * cnt AS BIGINT) AS key_pairs,
           CAST(predicted_rows AS BIGINT) AS predicted_rows,
           CAST(predicted_rows * 1000 // n_rows AS BIGINT) AS blowup_milli,
           CAST(CAST(cnt AS HUGEINT) * cnt * 1000000 // predicted_rows
                AS BIGINT) AS contribution_ppm
    FROM top CROSS JOIN totals
    ORDER BY rank
    """,
)
