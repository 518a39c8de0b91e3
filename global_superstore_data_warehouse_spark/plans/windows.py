"""Window-function analytics — the Business_Template §"Benefits"
questions that need per-group ranking (SURVEY §7 step 7: "best month
per segment, top employee per year"). The reference itself has no
window functions (§2.6) — these are the natural Spark expression of
questions its Power BI layer answers with drill-downs.

Scale shape: aggregate first (shuffle on low-cardinality group
keys), then window over the *aggregated* rows — the window partition
count is tiny (segments / years), so the rank step is negligible; the
heavy lifting stays in the partial-aggregated groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.operators.hints import stats_gated
from global_superstore_data_warehouse_spark.plans.views import SALES, SALES_SQL


def best_month_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highest-sales (year, month) for each customer segment."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
    )
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    monthly = (
        lineitem.join(stats_gated(orders, sf_dir, "orders"), lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "order_year", "order_month")
        .agg(F.round(F.sum(SALES()), 2).alias("total_sales"))
    )
    w = Window.partitionBy("segment").orderBy(
        F.desc("total_sales"), "order_year", "order_month"
    )
    return (
        monthly.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("segment")
    )


BEST_MONTH_PER_SEGMENT_ORACLE = f"""
    WITH monthly AS (
        SELECT c.c_mktsegment AS segment,
               CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
               CAST(month(o.o_orderdate) AS INTEGER) AS order_month,
               ROUND(SUM({SALES_SQL}), 2) AS total_sales
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2, 3
    )
    SELECT segment, order_year, order_month, total_sales
    FROM monthly
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY segment ORDER BY total_sales DESC, order_year, order_month
    ) = 1
    ORDER BY segment
"""


def top_employees_per_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 employees (suppliers) by sales within each order year."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("order_year")
    )
    supplier = load(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_name").alias("employee_name")
    )
    yearly = (
        lineitem.join(stats_gated(orders, sf_dir, "orders"), lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .groupBy("order_year", "employee_name")
        .agg(F.round(F.sum(SALES()), 2).alias("total_sales"))
    )
    w = Window.partitionBy("order_year").orderBy(F.desc("total_sales"), "employee_name")
    return (
        yearly.withColumn("sales_rank", F.row_number().over(w))
        .filter(F.col("sales_rank") <= 3)
        .orderBy("order_year", "sales_rank")
    )


TOP_EMPLOYEES_PER_YEAR_ORACLE = f"""
    WITH yearly AS (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
               s.s_name AS employee_name,
               ROUND(SUM({SALES_SQL}), 2) AS total_sales
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    )
    SELECT order_year, employee_name, total_sales,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY order_year ORDER BY total_sales DESC, employee_name
           ) AS INTEGER) AS sales_rank
    FROM yearly
    QUALIFY sales_rank <= 3
    ORDER BY order_year, sales_rank
"""


def customer_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value deciles — ntile window over per-customer
    sales totals, then per-decile aggregates. The ntile runs over one
    global ordering; at 100 TB swap to approx percentile_approx cuts
    (documented scale path) — here exact for oracle parity."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # per-customer totals as integer CENTS: the per-decile sum then
    # runs in exact integer arithmetic — summing ~1500 rounded doubles
    # carries ~5e-4 error against a 0.005 rounding granularity, which
    # hash-mismatched the oracle at sf0.1 (order-dependent boundary
    # hits); integers cannot drift
    per_cust = (
        lineitem.join(stats_gated(orders, sf_dir, "orders"), lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.round(F.sum(SALES()) * 100).cast("long").alias("customer_cents"))
    )
    w = Window.orderBy(F.desc("customer_cents"), "custkey")
    return (
        per_cust.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            (F.sum("customer_cents") / 100.0).alias("decile_sales"),
        )
        .orderBy("decile")
    )


CUSTOMER_LTV_DECILES_ORACLE = f"""
    WITH per_cust AS (
        SELECT o.o_custkey AS custkey,
               CAST(ROUND(SUM({SALES_SQL}) * 100) AS BIGINT) AS customer_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    ), tiled AS (
        SELECT ntile(10) OVER (ORDER BY customer_cents DESC, custkey) AS decile,
               customer_cents
        FROM per_cust
    )
    SELECT CAST(decile AS INTEGER) AS decile,
           COUNT(*) AS customers,
           SUM(customer_cents) / 100.0 AS decile_sales
    FROM tiled
    GROUP BY 1
    ORDER BY 1
"""


def rolling_7d_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day sales per market: a RANGE-frame window over
    day numbers (frame [-6, 0] days). Daily totals are materialized
    as integer CENTS before the window, so the sliding sum is exact
    integer arithmetic — engine-independent regardless of how the
    window implementation associates the additions (Spark re-scans
    the frame; DuckDB uses segment trees; float sums would drift).

    Scale shape: the heavy aggregation is the daily groupBy
    (partial, on (market, day)); the window then runs over ~days ×
    markets rows — trivial."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("order_date")
    )
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    customer = load(spark, sf_dir, "customer")
    cust_market = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", F.col("r_name").alias("market"))
    )
    daily = (
        lineitem.join(stats_gated(orders, sf_dir, "orders"), lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_market), orders.o_custkey == cust_market.c_custkey)
        .groupBy("market", "order_date")
        .agg(
            F.round(F.sum(SALES()) * 100)
            .cast("long")
            .alias("day_cents")
        )
        .withColumn("day_no", F.datediff("order_date", F.to_date(F.lit("1970-01-01"))).cast("long"))
    )
    w = (
        Window.partitionBy("market")
        .orderBy("day_no")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "market",
        F.date_format("order_date", "yyyy-MM-dd").alias("day"),
        (F.col("day_cents") / 100.0).alias("day_sales"),
        (F.sum("day_cents").over(w) / 100.0).alias("rolling_7d_sales"),
    ).orderBy("market", "day")


ROLLING_7D_SALES_ORACLE = f"""
    WITH daily AS (
        SELECT r.r_name AS market,
               CAST(o.o_orderdate AS DATE) AS order_date,
               CAST(ROUND(SUM({SALES_SQL}) * 100) AS BIGINT) AS day_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    ), numbered AS (
        SELECT market, order_date, day_cents,
               date_diff('day', DATE '1970-01-01', order_date) AS day_no
        FROM daily
    )
    SELECT market,
           strftime(order_date, '%Y-%m-%d') AS day,
           day_cents / 100.0 AS day_sales,
           SUM(day_cents) OVER (
               PARTITION BY market ORDER BY day_no
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) / 100.0 AS rolling_7d_sales
    FROM numbered
    ORDER BY market, day
"""


# --- gaps and islands -------------------------------------------------


def order_day_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-activity ISLANDS of the order calendar: maximal
    runs of days that all had at least one order, with each island's
    bounds, length, and the gap to the next island — the classic
    gaps-and-islands analysis (outage detection, coverage audits).

    The island key is the date minus the day's dense rank: constant
    within a consecutive run, strictly changing across a gap — the
    canonical O(n) window formulation (no self-join, no sequence
    explode). Plan: distinct days (tiny), one global-order window
    over the days-sized frame, island aggregate, one lead window for
    the gap column.
    """
    orders = load(spark, sf_dir, "orders")
    days = orders.select(F.to_date("o_orderdate").alias("day")).distinct()
    w = Window.orderBy("day")
    islands = (
        days.withColumn("rn", F.row_number().over(w))
        .withColumn("island_key", F.date_sub("day", F.col("rn")))
        .groupBy("island_key")
        .agg(
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )
    nxt = Window.orderBy("start_day")
    return islands.select(
        F.date_format("start_day", "yyyy-MM-dd").alias("start_day"),
        F.date_format("end_day", "yyyy-MM-dd").alias("end_day"),
        "n_days",
        F.datediff(F.lead("start_day").over(nxt), F.col("end_day")).alias(
            "gap_to_next_days"
        ),
    )


ORDER_DAY_ISLANDS_ORACLE = """
    WITH days AS (
        SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders
    ), keyed AS (
        SELECT day,
               day - CAST(ROW_NUMBER() OVER (ORDER BY day) AS INTEGER)
                   AS island_key
        FROM days
    ), islands AS (
        SELECT island_key, MIN(day) AS start_day, MAX(day) AS end_day,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM keyed GROUP BY island_key
    )
    SELECT strftime(start_day, '%Y-%m-%d') AS start_day,
           strftime(end_day, '%Y-%m-%d') AS end_day,
           n_days,
           CAST(date_diff('day', end_day,
                LEAD(start_day) OVER (ORDER BY start_day)) AS INTEGER)
               AS gap_to_next_days
    FROM islands
"""


# --- cumulative adoption ----------------------------------------------


def cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-adoption curve from the event stream: per day, how many
    users were seen for the FIRST time, and the running total of
    distinct users ever seen — the growth chart that a naive
    per-day COUNT(DISTINCT) over expanding windows cannot produce
    scalably.

    Plan shape: first-seen day is one per-user MIN aggregate
    (map-side-combined — the corpus never re-scans per day); the
    curve is a days-sized aggregate plus one cumulative window over
    at most |days| rows. The expanding-window COUNT DISTINCT this
    replaces would be O(days x users).
    """
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    per_day = first_seen.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        F.date_format("first_day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("total_users"),
    )


CUMULATIVE_NEW_USERS_ORACLE = """
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY user_id
    ), per_day AS (
        SELECT first_day, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM first_seen GROUP BY first_day
    )
    SELECT strftime(first_day, '%Y-%m-%d') AS day,
           new_users,
           CAST(SUM(new_users) OVER (ORDER BY first_day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS total_users
    FROM per_day
"""
