"""Fact table build (SURVEY §2 item 6, f_orders bl_cl.sql:1190-1348):
multi-way FK resolution to surrogate keys, measure casts,
composite-grain dedup, and the yearly partition column that replaces
the reference's INHERITS/CHECK partition machinery (C6,
bl_cl.sql:1147-1187).

Join strategy at scale: lineitem ⋈ orders is stats-gated
(``stats_gated`` on the catalog rowcount of orders — broadcast below
the 5M gate so the grain-dedup window's (orderkey, linenumber)
shuffle stays lineitem's ONLY exchange; past the gate it degrades to
the co-partitioned big-big shuffle on orderkey); customer surrogate keys
come from the size-gated key path (``add_surrogate_key_auto``:
global window when the measured dimension is small, the distributed
range-partition path past 5M rows), and the customer-lookup join
rides the size-gated ``maybe_broadcast`` — the RDD-backed key frame
has no Catalyst stats, so without the measured hint the planner
falls back to a SortMergeJoin that re-shuffles every joined lineitem
row on custkey (the single biggest exchange in the round-1..5 plan);
below the gate the lookup broadcasts, above it (100 TB customer
dims) the same code degrades to the shuffle join deliberately.
Supplier/part/market lookups broadcast unconditionally (node-sized).
Missing FKs resolve to the -1 default member (P7) so the fact never
carries NULL keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load, table_rows
from global_superstore_data_warehouse_spark.operators.hints import (
    maybe_broadcast,
    stats_gated,
)
from global_superstore_data_warehouse_spark.operators.keys import (
    add_surrogate_key,
    add_surrogate_key_auto,
)


def fact_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")

    # Surrogate-key lookup tables (row_number by natural key — same
    # ids the dim builders assign). The customer path is size-gated:
    # window below 5M rows, the distributed range-partition path
    # above. The count comes from the parquet-footer catalog stat —
    # driver-side metadata, no Spark job (a .count() here cost a
    # full scan job per fact build).
    n_customers = table_rows(sf_dir, "customer")
    cust_sk = add_surrogate_key_auto(
        customer.select("c_custkey", "c_nationkey"), ["c_custkey"],
        name="fk_customer", n_rows=n_customers,
    )
    supp_sk = add_surrogate_key(
        supplier.select("s_suppkey"), ["s_suppkey"], name="fk_employee"
    )
    part_sk = add_surrogate_key(
        part.select("p_partkey"), ["p_partkey"], name="fk_product"
    )
    market_sk = add_surrogate_key(
        region.select(F.col("r_name").alias("market")).dropDuplicates(["market"]),
        ["market"],
        name="fk_market",
    )
    geo = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", F.col("r_name").alias("market"))
        .join(F.broadcast(market_sk), "market")
        .select("n_nationkey", "fk_market")
    )
    cust_lookup = cust_sk.join(F.broadcast(geo), cust_sk.c_nationkey == geo.n_nationkey, "left").select(
        "c_custkey", "fk_customer", "fk_market"
    )

    # Date FK: days since first order date (same id rule as dim_date).
    lo = orders.agg(F.min(F.to_date("o_orderdate")).alias("lo"))
    ord_keyed = orders.crossJoin(F.broadcast(lo)).select(
        "o_orderkey",
        "o_custkey",
        (F.datediff(F.to_date("o_orderdate"), "lo") + 1).cast("long").alias("fk_date"),
        F.year("o_orderdate").alias("order_year"),
    )
    # Stats-gated broadcast (matches the DM twin, dmstar.py): the
    # grain-dedup window below shuffles lineitem on (orderkey,
    # linenumber), which CANNOT be reused for the orderkey join — so
    # without the gate the plan pays a SECOND lineitem exchange.
    # ord_keyed is a 1:1 projection of orders, so the catalog
    # rowcount bounds it; past the 5M gate (100 TB) this degrades to
    # the co-partitioned shuffle join described above.
    ord_keyed = stats_gated(ord_keyed, sf_dir, "orders")

    # Composite-grain dedup (the reference's fact PK + ON CONFLICT DO
    # NOTHING, bl_3nf.sql:217): the testdata deliberately contains
    # duplicate (orderkey, linenumber) rows with differing measures,
    # so "first wins" must be made deterministic — keep the row with
    # the highest extendedprice (tie-broken by part/supp key). A
    # partitioned window, so it scales: shuffle on the grain key only.
    from pyspark.sql import Window

    grain_w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        F.desc("l_extendedprice"), F.desc("l_partkey"), F.desc("l_suppkey")
    )
    lineitem = (
        lineitem.withColumn("__rn", F.row_number().over(grain_w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    fact = (
        lineitem.join(ord_keyed, lineitem.l_orderkey == ord_keyed.o_orderkey)
        .join(
            # cardinality is known without executing the key pipeline:
            # the lookup is exactly one row per customer (left join to
            # geo preserves)
            maybe_broadcast(cust_lookup, n_rows=n_customers),
            ord_keyed.o_custkey == cust_lookup.c_custkey,
            "left",
        )
        .join(F.broadcast(supp_sk), lineitem.l_suppkey == supp_sk.s_suppkey, "left")
        .join(F.broadcast(part_sk), lineitem.l_partkey == part_sk.p_partkey, "left")
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
            F.coalesce("fk_date", F.lit(-1)).alias("fk_date"),
            F.coalesce("fk_customer", F.lit(-1)).alias("fk_customer"),
            F.coalesce("fk_employee", F.lit(-1)).alias("fk_employee"),
            F.coalesce("fk_product", F.lit(-1)).alias("fk_product"),
            F.coalesce("fk_market", F.lit(-1)).alias("fk_market"),
            # Row-level measures stay un-rounded: the raw IEEE
            # product is bit-identical across engines (same operands,
            # same order), whereas ROUND() on a double differs at
            # repr boundaries (Spark half-ups the shortest decimal
            # string; DuckDB rounds the binary value). Rounding is
            # applied only at aggregation time (views layer).
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sales"),
            F.col("l_quantity").cast("int").alias("quantity"),
            F.col("l_discount").alias("discount"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 - F.col("l_tax"))
            ).alias("profit"),
            "order_year",
        )
    )
    return fact


FACT_ORDERS_ORACLE = """
    WITH cust_sk AS (
        SELECT c_custkey, c_nationkey,
               CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT) AS fk_customer
        FROM customer
    ), supp_sk AS (
        SELECT s_suppkey, CAST(ROW_NUMBER() OVER (ORDER BY s_suppkey) AS BIGINT) AS fk_employee
        FROM supplier
    ), part_sk AS (
        SELECT p_partkey, CAST(ROW_NUMBER() OVER (ORDER BY p_partkey) AS BIGINT) AS fk_product
        FROM part
    ), market_sk AS (
        SELECT market, CAST(ROW_NUMBER() OVER (ORDER BY market) AS BIGINT) AS fk_market
        FROM (SELECT DISTINCT r_name AS market FROM region)
    ), geo AS (
        SELECT n.n_nationkey, m.fk_market
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        JOIN market_sk m ON m.market = r.r_name
    ), lo AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS lo FROM orders),
    ord_keyed AS (
        SELECT o_orderkey, o_custkey,
               CAST(date_diff('day', lo.lo, CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS fk_date,
               CAST(year(o_orderdate) AS INTEGER) AS order_year
        FROM orders, lo
    )
    SELECT l.l_orderkey AS order_key,
           l.l_linenumber AS line_number,
           COALESCE(o.fk_date, -1) AS fk_date,
           COALESCE(c.fk_customer, -1) AS fk_customer,
           COALESCE(s.fk_employee, -1) AS fk_employee,
           COALESCE(p.fk_product, -1) AS fk_product,
           COALESCE(g.fk_market, -1) AS fk_market,
           l.l_extendedprice * (1 - l.l_discount) AS sales,
           CAST(l.l_quantity AS INTEGER) AS quantity,
           l.l_discount AS discount,
           l.l_extendedprice * (1 - l.l_discount) * (1 - l.l_tax) AS profit,
           o.order_year
    FROM (
        SELECT * FROM lineitem
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY l_orderkey, l_linenumber
            ORDER BY l_extendedprice DESC, l_partkey DESC, l_suppkey DESC
        ) = 1
    ) l
    JOIN ord_keyed o ON l.l_orderkey = o.o_orderkey
    LEFT JOIN cust_sk c ON o.o_custkey = c.c_custkey
    LEFT JOIN geo g ON c.c_nationkey = g.n_nationkey
    LEFT JOIN supp_sk s ON l.l_suppkey = s.s_suppkey
    LEFT JOIN part_sk p ON l.l_partkey = p.p_partkey
"""
