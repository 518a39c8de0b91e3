"""Retail-analytics layer: market-basket co-occurrence, Pareto (ABC)
classification, and RFM segmentation — the standing analytical
queries a Global-Superstore-style warehouse serves daily (the
reference's mat views cover sales/profit rollups, bl_dm.sql:274-300;
these are the next three every retail BI stack adds).

Scale shapes:

- ``market_basket_pairs``: the pair generator is a SELF-JOIN ON THE
  ORDER KEY, so its cost is sum over orders of (items/order)^2 —
  bounded by basket size (single digits), never by catalog size; the
  support/confidence/lift math happens after aggregation on
  pair-sized rows. The naive item×item join (catalog²) is never
  formed. One shuffle on order key + one on the pair.
- ``pareto_products``: one product-sized aggregate, then a cumulative
  window over products ordered by revenue. The window is
  single-partition over the AGGREGATED (catalog-sized) frame — fine
  to ~10^8 products; beyond that the two-phase form (per-bucket
  partials + broadcast running offsets, the pack_chunks trick)
  replaces the global window.
- ``rfm_segments``: per-customer aggregate, then three ntile windows
  over the customer-sized frame with fully-specified total orders
  (metric, key) so quartile boundaries are deterministic under ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.operators.hints import stats_gated

MIN_SUPPORT = 3  # co-occurrence pairs seen in fewer orders are noise


def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part pairs with support / confidence / lift: parts
    co-occurring in >= MIN_SUPPORT orders, confidence(a→b) =
    P(b in basket | a in basket), lift = observed co-occurrence over
    the independence expectation. Directed output (a→b and b→a rows)
    since confidence is asymmetric; a < b pairs carry the same
    support and lift mirrored."""
    li = load(spark, sf_dir, "lineitem")
    # per-order set collapse instead of the basket self-join (round-14,
    # guide §2.3/§2.4 — same rewrite as linkrank._copurchase_edges):
    # collect_set dedups (order, part) map-side in ONE order-keyed
    # exchange, and the ordered pairs explode post-shuffle with no
    # join build. The order total and per-part counts read the same
    # exchange (one set row per order).
    sets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
    )
    # 1-row total as a broadcast frame, not a driver-side .count():
    # keeps the whole query one lazy Catalyst plan
    n = sets.agg(F.count(F.lit(1)).cast("double").alias("n_orders"))
    part_orders = (
        sets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("part_n"))
    )

    pairs = (
        sets.select(F.explode("ps").alias("part_a"), "ps")
        .select("part_a", F.explode("ps").alias("part_b"))
        .filter(F.col("part_a") != F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= MIN_SUPPORT)
    )
    ca = part_orders.select(
        F.col("l_partkey").alias("part_a"), F.col("part_n").alias("n_a")
    )
    cb = part_orders.select(
        F.col("l_partkey").alias("part_b"), F.col("part_n").alias("n_b")
    )
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "support",
            F.round(F.col("support") / F.col("n_a"), 6).alias("confidence"),
            F.round(
                F.col("support") * F.col("n_orders") / (F.col("n_a") * F.col("n_b")), 6
            ).alias("lift"),
        )
    )


MARKET_BASKET_PAIRS_ORACLE = f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM op),
    po AS (SELECT l_partkey, COUNT(*) AS part_n FROM op GROUP BY l_partkey),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS support
        FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {MIN_SUPPORT}
    )
    SELECT part_a, part_b, support,
           ROUND(support * 1.0 / ca.part_n, 6) AS confidence,
           ROUND(support * n.n_orders / (ca.part_n * cb.part_n), 6) AS lift
    FROM pairs
    JOIN po ca ON ca.l_partkey = part_a
    JOIN po cb ON cb.l_partkey = part_b
    CROSS JOIN n
"""


def pareto_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC classification: products ranked by revenue; class A covers
    the first 80% of cumulative revenue share, B to 95%, C the tail —
    the classic Pareto cut used for stocking and catalog decisions.
    The cumulative share uses the running sum INCLUDING the current
    row over a fully-deterministic order (revenue desc, key asc)."""
    li = load(spark, sf_dir, "lineitem")
    # ROUND at 4 decimals, not 2: price(2dp) x (1 - discount(2dp)) has
    # EXACTLY 4 true decimals, so the sum's true value is a multiple
    # of 1e-4 — never near a 4dp half-boundary — and cross-engine
    # float summation order cannot flip the rounding. At 2dp the true
    # value can sit exactly ON the half-cent boundary and engines
    # disagree (observed at sf0.01: 3 of 2000 parts off by a cent).
    rev = li.groupBy("l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        )
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = Window.partitionBy()
    cum_share = F.sum("revenue").over(w) / F.sum("revenue").over(total)
    return rev.select(
        "l_partkey",
        "revenue",
        F.round(cum_share, 6).alias("cum_share"),
        F.when(cum_share <= 0.80, "A")
        .when(cum_share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


PARETO_PRODUCTS_ORACLE = """
    WITH rev AS (
        SELECT l_partkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem GROUP BY l_partkey
    ),
    c AS (
        SELECT l_partkey, revenue,
               SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / SUM(revenue) OVER () AS cum_share
        FROM rev
    )
    SELECT l_partkey, revenue, ROUND(cum_share, 6) AS cum_share,
           CASE WHEN cum_share <= 0.80 THEN 'A'
                WHEN cum_share <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c
"""


RFM_ASOF = "1998-12-31"  # recency anchor (max order date in TPC-H-ish data)


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, Recency (days since last
    order), Frequency (order count), Monetary (total spend), each
    quartiled 1-4 by ntile over a deterministic total order; the
    concatenated code (e.g. '144') is the marketing segment. Ntile
    order ties are broken by customer key, so quartile boundaries
    are stable across engines and re-runs."""
    o = load(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(F.lit(RFM_ASOF), F.max(F.to_date("o_orderdate"))).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    r_q = F.ntile(4).over(Window.orderBy(F.asc("recency_days"), F.asc("o_custkey")))
    f_q = F.ntile(4).over(Window.orderBy(F.desc("frequency"), F.asc("o_custkey")))
    m_q = F.ntile(4).over(Window.orderBy(F.desc("monetary"), F.asc("o_custkey")))
    return rfm.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        r_q.alias("r_quartile"),
        f_q.alias("f_quartile"),
        m_q.alias("m_quartile"),
    ).withColumn(
        "rfm_code",
        F.concat(F.col("r_quartile"), F.col("f_quartile"), F.col("m_quartile")),
    )


RFM_SEGMENTS_ORACLE = f"""
    WITH rfm AS (
        SELECT o_custkey,
               datediff('day', MAX(CAST(o_orderdate AS DATE)), DATE '{RFM_ASOF}')
                   AS recency_days,
               COUNT(*) AS frequency,
               ROUND(SUM(o_totalprice), 2) AS monetary
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, CAST(recency_days AS INTEGER) AS recency_days,
           frequency, monetary,
           CAST(NTILE(4) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS INTEGER)
               AS r_quartile,
           CAST(NTILE(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS INTEGER)
               AS f_quartile,
           CAST(NTILE(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS INTEGER)
               AS m_quartile,
           CAST(NTILE(4) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS VARCHAR)
           || CAST(NTILE(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS VARCHAR)
           || CAST(NTILE(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS VARCHAR)
               AS rfm_code
    FROM rfm
"""


# --- purchase cadence -------------------------------------------------


def order_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence per market segment: day gaps between
    each customer's consecutive orders, aggregated to
    count/mean/median/max per segment — the repurchase-cycle input
    to replenishment and churn models.

    Scale shape: one customer-partitioned lag window over orders
    (the events_sessionize shuffle shape), a broadcast join to the
    customer dim for the segment, then a segment-sized aggregate.
    ``percentile`` is exact over the per-segment gap lists; at
    extreme cardinality the documented swap-in is
    ``percentile_approx``.
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("prev_date", F.lag("o_orderdate").over(w))
        .filter(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            F.datediff(F.to_date("o_orderdate"), F.to_date("prev_date")).alias(
                "gap_days"
            ),
        )
    )
    joined = gaps.join(F.broadcast(cust), gaps.o_custkey == cust.c_custkey)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("gap_days"), 6).alias("mean_gap_days"),
        F.round(F.expr("percentile(gap_days, 0.5)"), 6).alias("median_gap_days"),
        F.max("gap_days").alias("max_gap_days"),
    )


ORDER_CADENCE_ORACLE = """
    WITH gaps AS (
        SELECT o_custkey,
               date_diff('day',
                         CAST(LAG(o_orderdate) OVER w AS DATE),
                         CAST(o_orderdate AS DATE)) AS gap_days
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        QUALIFY LAG(o_orderdate) OVER w IS NOT NULL
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(AVG(gap_days), 6) AS mean_gap_days,
           ROUND(quantile_cont(gap_days, 0.5), 6) AS median_gap_days,
           CAST(MAX(gap_days) AS INTEGER) AS max_gap_days
    FROM gaps g JOIN customer c ON g.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
"""


# --- revenue cohorts --------------------------------------------------


def revenue_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic acquisition-cohort revenue curve: customers grouped by
    first-order month, revenue tracked by months-since-acquisition,
    with the running cumulative per cohort — the retention-economics
    view every subscription/repeat-purchase business reads weekly.

    Scale shape: the cohort assignment is a per-customer MIN
    aggregate (map-side-combined) joined back broadcast; monthly
    cells aggregate before any window runs, so the cumulative window
    only ever sees |cohorts| x |months| rows. Monthly revenue is
    rounded BEFORE the running sum so the cumulative column is an
    exact deterministic sum of exact 2-decimal values on both
    engines.
    """
    orders = load(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort_month")
    )
    j = orders.join(F.broadcast(first), "o_custkey").select(
        F.date_format("cohort_month", "yyyy-MM").alias("cohort"),
        F.months_between(
            F.date_trunc("month", "o_orderdate"), F.col("cohort_month")
        ).cast("int").alias("month_index"),
        "o_totalprice",
    )
    monthly = j.groupBy("cohort", "month_index").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("month_index")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        "cohort",
        "month_index",
        "n_orders",
        "revenue",
        F.round(F.sum("revenue").over(w), 2).alias("cum_revenue"),
    )


REVENUE_COHORTS_ORACLE = """
    WITH first AS (
        SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cohort_month
        FROM orders GROUP BY o_custkey
    ), monthly AS (
        SELECT strftime(f.cohort_month, '%Y-%m') AS cohort,
               CAST(date_diff('month', f.cohort_month,
                              date_trunc('month', o.o_orderdate)) AS INTEGER)
                   AS month_index,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2) AS revenue
        FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
    )
    SELECT cohort, month_index, n_orders, revenue,
           ROUND(SUM(revenue) OVER (PARTITION BY cohort ORDER BY month_index
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS cum_revenue
    FROM monthly
"""


# --- churn flags ------------------------------------------------------

CHURN_DAYS = 90


def churn_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment churn report as of the corpus's last order date:
    a customer is CHURNED when their most recent order is more than
    CHURN_DAYS before the as-of date (never-ordered customers are
    counted separately — they are prospects, not churn). The weekly
    retention dashboard every repeat-purchase business runs.

    Scale shape: per-customer MAX(date) partial-aggregates
    map-side; the as-of date is a 1-row broadcast; the segment join
    broadcasts the customer dim; output is segment-sized. One scan
    of orders, one of customers.
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    last = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order")
    )
    asof = last.agg(F.max("last_order").alias("asof_date"))
    per_cust = (
        cust.join(last, cust.c_custkey == last.o_custkey, "left")
        .crossJoin(F.broadcast(asof))
        .select(
            "c_mktsegment",
            F.col("last_order").isNull().cast("int").alias("never_ordered"),
            (
                F.col("last_order").isNotNull()
                & (F.datediff("asof_date", "last_order") > CHURN_DAYS)
            ).cast("int").alias("churned"),
        )
    )
    return per_cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("churned").alias("n_churned"),
        F.sum("never_ordered").alias("n_never_ordered"),
        F.round(F.sum("churned") / F.count(F.lit(1)), 6).alias("churn_rate"),
    )


CHURN_FLAGS_ORACLE = f"""
    WITH last AS (
        SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_order
        FROM orders GROUP BY o_custkey
    ), asof_cte AS (SELECT MAX(last_order) AS asof_date FROM last),
    per_cust AS (
        SELECT c.c_mktsegment,
               CASE WHEN l.last_order IS NULL THEN 1 ELSE 0 END AS never_ordered,
               CASE WHEN l.last_order IS NOT NULL
                     AND date_diff('day', l.last_order, a.asof_date)
                         > {CHURN_DAYS}
                    THEN 1 ELSE 0 END AS churned
        FROM customer c
        LEFT JOIN last l ON c.c_custkey = l.o_custkey
        CROSS JOIN asof_cte a
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(churned) AS BIGINT) AS n_churned,
           CAST(SUM(never_ordered) AS BIGINT) AS n_never_ordered,
           ROUND(SUM(churned) * 1.0 / COUNT(*), 6) AS churn_rate
    FROM per_cust
    GROUP BY c_mktsegment
"""


# --- supplier concentration (HHI) -------------------------------------


def supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of each part's supplier
    base: per part, HHI = sum over suppliers of (revenue share)^2 —
    1.0 is single-sourced, 1/n is evenly split across n suppliers.
    The supply-chain-risk screen: high-revenue, high-HHI parts are
    the fragile ones.

    Scale shape: two keyed aggregates (part x supplier revenue, then
    per-part fold), both map-side-combined; no window, no join.
    Revenue rounds at 4 decimals BEFORE shares (the repo's money
    discipline: the true value has 4 decimals, so cross-engine sum
    order cannot flip a cent).
    """
    li = load(spark, sf_dir, "lineitem")
    rev = F.round(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
    )
    per_supp = li.groupBy("l_partkey", "l_suppkey").agg(rev.alias("supp_rev"))
    return per_supp.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("supp_rev"), 4).alias("part_revenue"),
        F.round(
            F.sum(F.col("supp_rev") * F.col("supp_rev"))
            / (F.sum("supp_rev") * F.sum("supp_rev")),
            6,
        ).alias("hhi"),
    )


SUPPLIER_CONCENTRATION_ORACLE = """
    WITH per_supp AS (
        SELECT l_partkey, l_suppkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS supp_rev
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(SUM(supp_rev), 4) AS part_revenue,
           ROUND(SUM(supp_rev * supp_rev)
                 / (SUM(supp_rev) * SUM(supp_rev)), 6) AS hhi
    FROM per_supp
    GROUP BY l_partkey
"""


# --- fulfillment lead time --------------------------------------------


def fulfillment_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead-time distribution per order priority:
    count, mean, exact median, p95, and max of
    datediff(l_shipdate, o_orderdate) — the SLA dashboard (does
    1-URGENT actually ship faster?).

    Scale shape: one stats-gated lineitem ⋈ orders equi-join on the
    order key (broadcast orders below the catalog gate so lineitem
    is never shuffled; past it the warehouse's standard
    co-partitioned join — bucketed tables make it shuffle-free),
    then a priority-sized aggregate with exact percentiles —
    ``percentile_approx`` is the documented swap-in at extreme
    cardinality.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = stats_gated(
        load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate", "o_orderpriority"
        ),
        sf_dir,
        "orders",
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "lead_days"
        ),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.avg("lead_days"), 6).alias("mean_days"),
        F.round(F.expr("percentile(lead_days, 0.5)"), 6).alias("median_days"),
        F.round(F.expr("percentile(lead_days, 0.95)"), 6).alias("p95_days"),
        F.max("lead_days").alias("max_days"),
    )


FULFILLMENT_LEAD_TIME_ORACLE = """
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(AVG(lead_days), 6) AS mean_days,
           ROUND(quantile_cont(lead_days, 0.5), 6) AS median_days,
           ROUND(quantile_cont(lead_days, 0.95), 6) AS p95_days,
           CAST(MAX(lead_days) AS INTEGER) AS max_days
    FROM (
        SELECT l.l_orderkey,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS lead_days,
               o.o_orderpriority
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ) o
    GROUP BY o.o_orderpriority
"""


# --- seasonal index ---------------------------------------------------


def seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic seasonal index per order priority: monthly revenue
    divided by that priority's all-months average — index > 1 marks
    the high season. (Priority stands in for product category in
    this schema; the plan is category-agnostic.)

    Plan shape: one partial-aggregated groupBy(priority, month) to
    |priorities| x 12 cells; the per-priority mean rides a window
    over that tiny aggregate. Monthly revenue rounds at 2 before the
    index division (the repo's money-determinism rule).
    """
    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority", F.month("o_orderdate").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    per_prio = Window.partitionBy("o_orderpriority")
    return monthly.select(
        "o_orderpriority",
        "month",
        "revenue",
        F.round(F.col("revenue") / F.avg("revenue").over(per_prio), 6).alias(
            "seasonal_index"
        ),
    )


SEASONAL_INDEX_ORACLE = """
    WITH monthly AS (
        SELECT o_orderpriority, CAST(month(o_orderdate) AS INTEGER) AS month,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority, month, revenue,
           ROUND(revenue / AVG(revenue) OVER (PARTITION BY o_orderpriority), 6)
               AS seasonal_index
    FROM monthly
"""


# --- ABC class migration ----------------------------------------------


def abc_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-class TRANSITION MATRIX between the first and second half
    of the order timeline: how many products moved A->C, C->A, etc.
    (plus 'N' for absent-in-half) — assortment churn at a glance;
    a stable catalog concentrates on the diagonal.

    The halves split at the midpoint EPOCH SECOND (integer floor of
    (min+max)/2 — engine-identical arithmetic, no calendar math).
    Per half, the classification replays pareto_products' rules
    (revenue at 4 decimals, cumulative share over revenue-desc/key-
    asc, A<=0.80, B<=0.95). Full-outer join of the two class maps,
    then a 4x4-bounded matrix aggregate.

    Scale shape: two partial-aggregated part-revenue frames, each
    with a catalog-sized cumulative window (pareto_products'
    documented bound), one part-keyed full-outer join, matrix-sized
    output.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    # stats-gated: broadcast the 2-column orders projection below the
    # catalog gate (no lineitem shuffle); shuffle join past it
    orders = stats_gated(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
        sf_dir,
        "orders",
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    bounds = orders.agg(
        F.floor(
            (
                F.min(F.col("o_orderdate").cast("timestamp_ltz").cast("double"))
                + F.max(F.col("o_orderdate").cast("timestamp_ltz").cast("double"))
            )
            / 2
        ).alias("mid_sec")
    )
    halves = j.crossJoin(F.broadcast(bounds)).withColumn(
        "half",
        F.when(
            F.col("o_orderdate").cast("timestamp_ltz").cast("double")
            < F.col("mid_sec"),
            F.lit(1),
        ).otherwise(F.lit(2)),
    )

    def classify(half_df):
        rev = half_df.groupBy("l_partkey").agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        w = Window.orderBy(F.desc("revenue"), F.asc("l_partkey")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        total = Window.partitionBy()
        cum = F.sum("revenue").over(w) / F.sum("revenue").over(total)
        return rev.select(
            "l_partkey",
            F.when(cum <= 0.80, "A").when(cum <= 0.95, "B").otherwise("C").alias(
                "cls"
            ),
        )

    c1 = classify(halves.filter(F.col("half") == 1)).withColumnRenamed(
        "cls", "class_h1"
    )
    c2 = classify(halves.filter(F.col("half") == 2)).withColumnRenamed(
        "cls", "class_h2"
    )
    matrix = (
        c1.join(c2, "l_partkey", "full_outer")
        .select(
            F.coalesce("class_h1", F.lit("N")).alias("class_h1"),
            F.coalesce("class_h2", F.lit("N")).alias("class_h2"),
        )
        .groupBy("class_h1", "class_h2")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    tot = Window.partitionBy()
    return matrix.select(
        "class_h1",
        "class_h2",
        "n_parts",
        F.round(F.col("n_parts") / F.sum("n_parts").over(tot), 6).alias("share"),
    )


ABC_MIGRATION_ORACLE = """
    WITH j AS (
        SELECT l.l_partkey, l.l_extendedprice, l.l_discount, o.o_orderdate
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), bounds AS (
        SELECT CAST(floor((epoch(MIN(o_orderdate)) + epoch(MAX(o_orderdate))) / 2)
               AS BIGINT) AS mid_sec
        FROM orders
    ), halves AS (
        SELECT j.*, CASE WHEN epoch(j.o_orderdate) < b.mid_sec THEN 1 ELSE 2 END
               AS half
        FROM j CROSS JOIN bounds b
    ), rev AS (
        SELECT half, l_partkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM halves GROUP BY half, l_partkey
    ), classed AS (
        SELECT half, l_partkey,
               CASE WHEN cum <= 0.80 THEN 'A'
                    WHEN cum <= 0.95 THEN 'B' ELSE 'C' END AS cls
        FROM (
            SELECT half, l_partkey,
                   SUM(revenue) OVER (PARTITION BY half
                       ORDER BY revenue DESC, l_partkey ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   / SUM(revenue) OVER (PARTITION BY half) AS cum
            FROM rev
        )
    ), matrix AS (
        SELECT COALESCE(a.cls, 'N') AS class_h1,
               COALESCE(b.cls, 'N') AS class_h2,
               CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM (SELECT l_partkey, cls FROM classed WHERE half = 1) a
        FULL OUTER JOIN (SELECT l_partkey, cls FROM classed WHERE half = 2) b
          ON a.l_partkey = b.l_partkey
        GROUP BY 1, 2
    )
    SELECT class_h1, class_h2, n_parts,
           ROUND(n_parts * 1.0 / SUM(n_parts) OVER (), 6) AS share
    FROM matrix
"""


# --- 2-D skyline (Pareto frontier) ------------------------------------


def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKYLINE operator (Borzsony/Kossmann/Stocker, ICDE'01) in
    two dimensions: parts not DOMINATED on (cheaper-or-equal price,
    bigger-or-equal size, at least one strict) — the "best
    price-for-size frontier" query class relational engines added a
    dedicated operator for.

    Spark formulation — NOT the O(n^2) dominance join: in 2-D the
    skyline is exactly { points carrying their price-group's max
    size, whose size strictly exceeds the running max size over all
    STRICTLY cheaper price groups }. So: one per-price aggregate
    (map-side combined), one ROWS-frame running max over the
    distinct-PRICE table (price-cardinality-sized — the window never
    sees the parts table), and a broadcast join back. Equal-price
    ties keep every co-maximal part (equal points do not dominate
    each other). The O(n^2) NOT EXISTS join survives only as the
    DuckDB oracle, proving the window formulation exact.

    At 100 TB: the per-price aggregate is the only corpus-sized
    shuffle; if price cardinality itself outgrows one node's window,
    the running max decomposes into the same two-phase
    per-partition-offset shape as ``operators/keys.py``.
    """
    part = load(spark, sf_dir, "part")
    per_price = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("grp_max_size")
    )
    w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = per_price.withColumn(
        "cheaper_max", F.max("grp_max_size").over(w)
    )
    sky = (
        part.join(F.broadcast(frontier), "p_retailprice")
        .filter(
            (F.col("p_size") == F.col("grp_max_size"))
            & (
                F.col("cheaper_max").isNull()
                | (F.col("p_size") > F.col("cheaper_max"))
            )
        )
        .select(
            "p_partkey",
            "p_name",
            F.round("p_retailprice", 2).alias("p_retailprice"),
            "p_size",
        )
    )
    return sky


PART_SKYLINE_ORACLE = """
    SELECT p.p_partkey, p.p_name,
           ROUND(p.p_retailprice, 2) AS p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
"""


# --- exact integer allocation (largest remainder) ---------------------

ALLOC_BUDGET_CENTS = 1_000_000


def market_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocate an integer budget (1,000,000 cents per order-year)
    across market segments proportional to revenue, EXACTLY — the
    largest-remainder (Hamilton) method every finance/planning system
    needs and floating division cannot give: floor each proportional
    share, then hand the leftover cents, one each, to the largest
    fractional remainders (ties broken by segment name). Per-year
    sums equal the budget to the cent by construction.

    Plan: one partial-aggregated groupBy to (year, segment) revenue
    cells, a year-window total, and a remainder-rank window over the
    CELLS frame (years x segments — tiny); the corpus is scanned
    once. The same shape allocates ad budgets, quota seats
    (apportionment), and prorated costs.
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    cells = (
        orders.join(F.broadcast(cust.select("c_custkey", "c_mktsegment")),
                    orders.o_custkey == F.col("c_custkey"))
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    per_year = Window.partitionBy("order_year")
    share = F.col("revenue") / F.sum("revenue").over(per_year)
    # round the raw share BEFORE floor/remainder: Spark and DuckDB sum
    # revenue in different orders, and a ULP-level divergence at a
    # floor boundary (or between two near-equal remainders) would flip
    # alloc_cents by +-1. At 6 decimals the ~1e-10 cross-engine noise
    # cannot straddle a boundary, and near-equal remainders collapse
    # to exact ties that the (rem DESC, segment ASC) order then breaks
    # identically in both engines.
    exact = F.round(share * ALLOC_BUDGET_CENTS, 6)
    floored = cells.withColumn("base", F.floor(exact).cast("long")).withColumn(
        "rem", exact - F.floor(exact)
    )
    leftover = (
        F.lit(ALLOC_BUDGET_CENTS) - F.sum("base").over(per_year)
    ).cast("long")
    rank = F.row_number().over(
        per_year.orderBy(F.desc("rem"), F.asc("segment"))
    )
    return floored.select(
        "order_year",
        "segment",
        F.round("revenue", 2).alias("revenue"),
        (F.col("base") + F.when(rank <= leftover, 1).otherwise(0)).alias(
            "alloc_cents"
        ),
    )


MARKET_BUDGET_ALLOCATION_ORACLE = f"""
    WITH cells AS (
        SELECT year(o.o_orderdate) AS order_year,
               c.c_mktsegment AS segment,
               SUM(o.o_totalprice) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ), shared AS (
        SELECT order_year, segment, revenue,
               ROUND(revenue / SUM(revenue) OVER (PARTITION BY order_year)
                   * {ALLOC_BUDGET_CENTS}, 6) AS exact
        FROM cells
    ), floored AS (
        SELECT order_year, segment, revenue,
               CAST(FLOOR(exact) AS BIGINT) AS base,
               exact - FLOOR(exact) AS rem
        FROM shared
    )
    SELECT order_year, segment,
           ROUND(revenue, 2) AS revenue,
           base + CASE WHEN ROW_NUMBER() OVER (
                      PARTITION BY order_year
                      ORDER BY rem DESC, segment ASC)
                  <= {ALLOC_BUDGET_CENTS}
                     - SUM(base) OVER (PARTITION BY order_year)
                  THEN 1 ELSE 0 END AS alloc_cents
    FROM floored
"""


# --- Gini coefficient of customer revenue --------------------------------


def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI COEFFICIENT of customer revenue per market segment (plus
    how many customers hold the top half of the segment's revenue) —
    the inequality lens next to ``supplier_concentration``'s HHI:
    HHI measures concentration among a part's FEW suppliers; Gini
    measures it across a segment's MANY customers, the
    "whale-dependence" number a revenue-risk review wants.

    Exactness: with per-customer revenue in integer cents and rank i
    ascending within the segment, G = (2*sum(i*x_i) - (n+1)*sum(x))
    / (n*sum(x)) — every term BIGINT (sum(i*x) tops out ~5e17 at
    sf0.1), ONE double division at the end, ROUND 6. top_half_n is
    the count of suffix customers whose cumulative revenue first
    reaches half the total — integer comparisons on 2*cum >= total.

    Scale shape: one orders groupBy(custkey) + broadcast segment
    lookup; ranks and cumulative sums are windows PARTITIONED BY
    SEGMENT (bounded, parallel — never a global window); the final
    aggregate is segment-sized.
    """
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    seg = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rows = per_cust.join(
        F.broadcast(seg), per_cust.o_custkey == seg.c_custkey
    ).select(F.col("c_mktsegment").alias("segment"), "o_custkey", "cents")
    w_rank = Window.partitionBy("segment").orderBy("cents", "o_custkey")
    w_cum = Window.partitionBy("segment").orderBy(
        F.desc("cents"), F.desc("o_custkey")
    ).rowsBetween(Window.unboundedPreceding, 0)
    ranked = (
        rows.withColumn("i", F.row_number().over(w_rank))
        .withColumn("cum_desc", F.sum("cents").over(w_cum))
        .withColumn(
            "seg_total", F.sum("cents").over(Window.partitionBy("segment"))
        )
    )
    return (
        ranked.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("cents").cast("bigint").alias("total_cents"),
            F.sum(F.col("i") * F.col("cents")).cast("bigint").alias("s_ix"),
            F.sum(
                F.when(
                    2 * (F.col("cum_desc") - F.col("cents"))
                    < F.col("seg_total"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("top_half_n"),
        )
        .select(
            "segment",
            "n_customers",
            "total_cents",
            "top_half_n",
            F.round(
                (
                    2.0 * F.col("s_ix")
                    - (F.col("n_customers") + 1) * F.col("total_cents")
                )
                / (F.col("n_customers") * F.col("total_cents")).cast("double"),
                6,
            ).alias("gini"),
        )
    )


REVENUE_GINI_ORACLE = """
    WITH per_cust AS (
        SELECT o_custkey,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey
    ), rows_ AS (
        SELECT c.c_mktsegment AS segment, p.o_custkey, p.cents
        FROM per_cust p JOIN customer c ON c.c_custkey = p.o_custkey
    ), ranked AS (
        SELECT segment, o_custkey, cents,
               ROW_NUMBER() OVER (PARTITION BY segment
                   ORDER BY cents, o_custkey) AS i,
               SUM(cents) OVER (PARTITION BY segment
                   ORDER BY cents DESC, o_custkey DESC
                   ROWS UNBOUNDED PRECEDING) AS cum_desc,
               SUM(cents) OVER (PARTITION BY segment) AS seg_total
        FROM rows_
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN 2 * (cum_desc - cents) < seg_total
                    THEN 1 ELSE 0 END) AS BIGINT) AS top_half_n,
           ROUND((2.0 * SUM(i * cents)
                  - (COUNT(*) + 1) * SUM(cents))
                 / (COUNT(*) * SUM(cents)), 6) AS gini
    FROM ranked
    GROUP BY segment
"""
