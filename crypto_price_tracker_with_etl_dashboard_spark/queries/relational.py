"""General relational coverage over the TPC-H-ish star schema:
scan/filter/project, multi-way joins (broadcast for dims), hash
aggregation with decimal-exact double sums, window top-K per group,
pivot, sessionization, tumbling windows.

These generalize the reference's operator inventory (SURVEY.md
section 2: equi-join J1, hash agg A1-A4, sort/top-K O1-O5) to
arbitrary fact/dimension shapes — the plans Catalyst produces here
(broadcast hash joins against dims, partial+final hash agg, take
ordered-and-project for top-K) are the ones that survive a 100x
scale-up of the fact tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crypto_price_tracker_with_etl_dashboard_spark.operators.exact import davg, dsum, sql_davg, sql_dsum
from crypto_price_tracker_with_etl_dashboard_spark.queries import register
from crypto_price_tracker_with_etl_dashboard_spark.queries.tpch import (
    SQL_REVENUE,
    _revenue,
)
from crypto_price_tracker_with_etl_dashboard_spark.sources import load_table


# ---- TPC-H Q1: pricing summary report (scan+filter+hash agg) --------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _revenue()
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


register(
    "q1_pricing_summary",
    q1_pricing_summary,
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum(SQL_REVENUE)} AS sum_disc_price,
           {sql_dsum(SQL_REVENUE + ' * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)


# ---- TPC-H Q3: shipping priority (3-way join + agg + top-K) ----------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    revenue = _revenue()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


register(
    "q3_shipping_priority",
    q3_shipping_priority,
    f"""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           {sql_dsum(SQL_REVENUE)} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)


# ---- TPC-H Q5: local supplier volume (6-way join) --------------------------

def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = _revenue()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


register(
    "q5_local_supplier",
    q5_local_supplier,
    f"""
    SELECT n_name, {sql_dsum(SQL_REVENUE)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)


# ---- TPC-H Q6: forecasting revenue change (pure filter + scalar agg) -------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


register(
    "q6_forecast_revenue",
    q6_forecast_revenue,
    f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)


# ---- Window: top-3 orders per customer -------------------------------------

def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


register(
    "top_orders_per_customer",
    q_top_orders_per_customer,
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
    FROM orders
    QUALIFY rnk <= 3
    """,
)


# ---- Left join + per-segment rollup ---------------------------------------

def q_segment_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice", "total_revenue"),
        )
        .orderBy("c_mktsegment")
    )


register(
    "segment_order_stats",
    q_segment_order_stats,
    f"""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_custkey) AS n_customers,
           COUNT(o_orderkey) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_revenue
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)


# ---- Tumbling window aggregation over the event stream ---------------------
# Spark's window() and DuckDB's time_bucket share the epoch-aligned
# 5-minute grid (1970-01-01 and 2000-01-03 are both midnight-aligned).

def q_events_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("window.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


register(
    "events_tumbling_5min",
    q_events_tumbling_5min,
    f"""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)


# ---- Hopping (sliding) window aggregation ----------------------------------
# 10-minute windows advancing every 5: each event contributes to TWO
# overlapping windows.  Spark's window(ts, len, slide) expands
# map-side; the oracle mirrors by unnesting the two epoch-aligned
# starts each event covers.

def q_events_hopping_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("window.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


register(
    "events_hopping_10m",
    q_events_hopping_10m,
    f"""
    WITH starts AS (
      SELECT event_type, value,
             unnest([time_bucket(INTERVAL '5 minutes', ts),
                     time_bucket(INTERVAL '5 minutes', ts)
                       - INTERVAL '5 minutes']) AS bucket_start
      FROM events
    )
    SELECT bucket_start, event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM starts
    GROUP BY 1, 2
    """,
)


# ---- Per-user inter-arrival statistics -------------------------------------
# The behavioral cadence metric (bot detection, engagement scoring):
# integer-second gaps between consecutive events per user, one user
# window + one agg; mean is a SINGLE division of two exact integers
# so both engines emit the identical double.

def q_events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w_user))
    return (
        ev.withColumn("__gap", gap)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.count("__gap").alias("n_gaps"),
            F.sum("__gap").cast("bigint").alias("sum_gap_sec"),
            F.max("__gap").cast("bigint").alias("max_gap_sec"),
        )
        .filter(F.col("n_gaps") > 0)
        .withColumn(
            "mean_gap_sec",
            F.col("sum_gap_sec").cast("double") / F.col("n_gaps"),
        )
    )


register(
    "events_interarrival",
    q_events_interarrival,
    """
    WITH gaps AS (
      -- epoch_us // 1e6 FLOORS to whole seconds like Spark's
      -- unix_timestamp (CAST(epoch(...) AS BIGINT) would ROUND)
      SELECT user_id,
             epoch_us(ts) // 1000000
               - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)) // 1000000
               AS gap
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(gap) AS n_gaps,
           CAST(SUM(gap) AS BIGINT) AS sum_gap_sec,
           CAST(MAX(gap) AS BIGINT) AS max_gap_sec,
           CAST(SUM(gap) AS DOUBLE) / COUNT(gap) AS mean_gap_sec
    FROM gaps
    GROUP BY user_id
    HAVING COUNT(gap) > 0
    """,
)


# ---- Sessionization: 30-minute-gap sessions per user -----------------------

def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w_user))
    with_new = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0))
    )
    with_sess = with_new.withColumn(
        "session_id",
        F.sum("is_new").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


register(
    "events_sessionize",
    q_events_sessionize,
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sess AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess
    GROUP BY user_id, session_id
    """,
)


# ---- Pivot: daily event-type counts ---------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
        .orderBy("day")
    )


register(
    "events_daily_pivot",
    q_events_daily_pivot,
    """
    SELECT CAST(ts AS DATE) AS day,
           COUNT(*) FILTER (event_type = 'click')    AS click,
           COUNT(*) FILTER (event_type = 'error')    AS error,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup')   AS signup,
           COUNT(*) FILTER (event_type = 'view')     AS view
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)


# ---- TPC-H Q14: promotion effect (conditional agg over a dim join) ---------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    revenue = _revenue()
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            dsum(promo, "promo_revenue"),
            dsum(revenue, "total_revenue"),
        )
        .select(
            F.round(
                F.col("promo_revenue") * 100.0 / F.col("total_revenue"), 6
            ).alias("promo_pct"),
            "promo_revenue",
            "total_revenue",
        )
    )


register(
    "q14_promo_revenue",
    q14_promo_revenue,
    f"""
    SELECT round(promo_revenue * 100.0 / total_revenue, 6) AS promo_pct,
           promo_revenue, total_revenue
    FROM (
      SELECT
        {sql_dsum(f"CASE WHEN p_type = 'PROMO' THEN {SQL_REVENUE} ELSE 0.0 END")} AS promo_revenue,
        {sql_dsum(SQL_REVENUE)} AS total_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    )
    """,
)


# ---- TPC-H Q13: customer order-count distribution (outer join + histogram) -

def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


register(
    "q13_order_distribution",
    q13_order_distribution,
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)


# ---- TPC-H Q17: small-quantity-order revenue (correlated subquery) ---------
# The classic decorrelation pattern: a per-part average threshold
# compared against each lineitem row.  Spark expresses the decorrelated
# form directly: aggregate per part, broadcast back, filter, aggregate.

def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    brand_parts = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10)
    )
    li_b = li.join(F.broadcast(brand_parts), li.l_partkey == brand_parts.p_partkey)
    # Plain avg is safe here: l_quantity values are integral doubles,
    # so the partial sums are exact and order-independent (verified on
    # the testdata; non-integral metrics would need davg).
    thresholds = li_b.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li_b.join(F.broadcast(thresholds), on="l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            dsum("l_extendedprice", "total_price"),
            F.count("*").alias("n_rows"),
        )
        .select(
            (F.col("total_price") / 7.0).alias("avg_yearly"),
            "n_rows",
        )
    )


register(
    "q17_small_quantity",
    q17_small_quantity,
    f"""
    SELECT total_price / 7.0 AS avg_yearly, n_rows
    FROM (
      SELECT {sql_dsum('l_extendedprice')} AS total_price,
             COUNT(*) AS n_rows
      FROM lineitem, part
      WHERE p_partkey = l_partkey
        AND p_brand = 'Brand#1' AND p_size <= 10
        AND l_quantity < (
          SELECT 0.2 * AVG(l_quantity) FROM lineitem
          WHERE l_partkey = p_partkey
            AND l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_brand = 'Brand#1' AND p_size <= 10)
        )
    )
    """,
)


# ---- Unpivot (melt): wide daily counts back to long ------------------------
# The inverse reshape of events_daily_pivot: native df.unpivot emits
# (day, event_type, n) rows in ONE narrow map over the wide table —
# no shuffle, no union-of-selects re-scan.  The oracle expresses the
# same reshape as a portable UNION ALL.

def q_events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = q_events_daily_pivot(spark, sf_dir)
    return (
        wide.unpivot(
            ids=["day"],
            values=_EVENT_TYPES,
            variableColumnName="event_type",
            valueColumnName="n",
        )
        .filter(F.col("n") > 0)
        .orderBy("day", "event_type")
    )


register(
    "events_unpivot",
    q_events_unpivot,
    """
    WITH wide AS (
      SELECT CAST(ts AS DATE) AS day,
             COUNT(*) FILTER (event_type = 'click')    AS click,
             COUNT(*) FILTER (event_type = 'error')    AS error,
             COUNT(*) FILTER (event_type = 'purchase') AS purchase,
             COUNT(*) FILTER (event_type = 'signup')   AS signup,
             COUNT(*) FILTER (event_type = 'view')     AS view
      FROM events GROUP BY 1
    )
    SELECT day, event_type, n FROM (
      SELECT day, 'click' AS event_type, click AS n FROM wide
      UNION ALL SELECT day, 'error', error FROM wide
      UNION ALL SELECT day, 'purchase', purchase FROM wide
      UNION ALL SELECT day, 'signup', signup FROM wide
      UNION ALL SELECT day, 'view', view FROM wide
    )
    WHERE n > 0
    ORDER BY day, event_type
    """,
)


# ---- MERGE INTO (CDC apply) ------------------------------------------------
# The warehouse upsert primitive (operators/merge.py) certified over
# a deterministic change set synthesized from orders:
#   %13 == 0 -> 'U' seq 1 (price bumped +100.0)
#   %17 == 0 -> 'D' seq 2 (so %221 keys get U then D: keep-last
#               CDC resolution deletes them — the cardinality rule
#               under test)
#   %19 == 0 -> 'I' seq 1 at a shifted key (brand-new rows)
# One full-outer shuffle join on the key; updates dedup by
# max(struct(seq, op, payload)) — no window, map-side partials.

_MERGE_INS_SHIFT = 100_000_000


def q_orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_price_tracker_with_etl_dashboard_spark.operators.merge import (
        merge_upsert,
    )

    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    upd_u = target.filter(k % 13 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
        F.lit("U").alias("op"), F.lit(1).alias("seq"),
    )
    upd_d = target.filter(k % 17 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.lit("D").alias("op"), F.lit(2).alias("seq"),
    )
    upd_i = target.filter(k % 19 == 0).select(
        (k + _MERGE_INS_SHIFT).alias("o_orderkey"),
        "o_custkey", "o_orderstatus",
        (F.col("o_totalprice") / 2).alias("o_totalprice"),
        F.lit("I").alias("op"), F.lit(1).alias("seq"),
    )
    updates = upd_u.unionByName(upd_d).unionByName(upd_i)
    return merge_upsert(target, updates, "o_orderkey", seq_col="seq")


def _merge_sql() -> str:
    from crypto_price_tracker_with_etl_dashboard_spark.operators.merge import (
        sql_merge_upsert,
    )

    target_cte = """target AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
    )"""
    updates_cte = f"""updates AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 100.0 AS o_totalprice,
             'U' AS op, 1 AS seq
      FROM target WHERE o_orderkey % 13 = 0
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             'D' AS op, 2 AS seq
      FROM target WHERE o_orderkey % 17 = 0
      UNION ALL
      SELECT o_orderkey + {_MERGE_INS_SHIFT}, o_custkey, o_orderstatus,
             o_totalprice / 2, 'I' AS op, 1 AS seq
      FROM target WHERE o_orderkey % 19 = 0
    )"""
    return sql_merge_upsert(
        target_cte, updates_cte, "o_orderkey",
        ["o_custkey", "o_orderstatus", "o_totalprice"], seq_col="seq",
    )


register("orders_merge_upsert", q_orders_merge_upsert, _merge_sql())
