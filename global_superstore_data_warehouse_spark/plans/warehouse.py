"""3NF warehouse layer — dimension builders, surrogate keys, the
generated date dimension, and snowflaked hierarchies (SURVEY §1
items 4-7, §2.6, S8).

Role mapping (FIXTURES.md §3): region↔market, nation↔country,
part↔product hierarchy (p_brand=category, p_type=subcategory),
supplier↔employee, customer↔customer.

Every dim gets: deterministic dense surrogate key (ordered by the
natural key), the lineage triplet (source_system/source_entity/
source_id — bl_3nf.sql:46-47 style), and the ``-1`` default member
(init_dimensions, bl_3nf.sql:221-277) so fact FKs are never NULL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.operators.keys import (
    add_surrogate_key,
    add_surrogate_key_distributed,
)

SOURCE_SYSTEM = "GLOBAL_SUPERSTORE"


def with_lineage(df: DataFrame, entity: str, source_id_col: str) -> DataFrame:
    """Source-lineage triplet carried by every 3NF dim (bl_3nf.sql:46-47)."""
    return (
        df.withColumn("source_system", F.lit(SOURCE_SYSTEM))
        .withColumn("source_entity", F.lit(entity))
        .withColumn("source_id", F.col(source_id_col).cast("string"))
    )


def default_member(spark: SparkSession, id_col: str, attr_cols: Sequence[str]) -> DataFrame:
    """The -1 'NA' row (init_dimensions, bl_3nf.sql:221-277)."""
    row = {id_col: -1, "source_system": "MANUAL", "source_entity": "MANUAL", "source_id": "NA"}
    for a in attr_cols:
        row[a] = "NA"
    schema = (
        f"{id_col} long, "
        + ", ".join(f"{a} string" for a in attr_cols)
        + ", source_system string, source_entity string, source_id string"
    )
    return spark.createDataFrame([row], schema)


def build_dim(
    src: DataFrame,
    natural_key: str,
    entity: str,
    id_col: str,
    attr_cols: Sequence[str] = (),
) -> DataFrame:
    """Generic SCD1 dimension build: dedup on natural key → dense
    surrogate key ordered by it → lineage triplet → union the -1
    member. Columns: id, natural key, attrs, lineage."""
    spark = src.sparkSession
    dedup = src.dropDuplicates([natural_key])
    keyed = add_surrogate_key(dedup, [natural_key], name=id_col)
    dim = with_lineage(keyed, entity, natural_key).select(
        id_col, natural_key, *attr_cols, "source_system", "source_entity", "source_id"
    )
    na = default_member(spark, id_col, [natural_key, *attr_cols])
    return dim.unionByName(na)


# --- queries + oracles ------------------------------------------------

def surrogate_keys_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed dense surrogate keys at table scale (§2.6) — the
    scale path: no global single-partition sort."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return add_surrogate_key_distributed(cust, ["c_custkey"], name="sk")


SURROGATE_KEYS_CUSTOMERS_ORACLE = """
    SELECT c_custkey, c_name,
           ROW_NUMBER() OVER (ORDER BY c_custkey) AS sk
    FROM customer
"""


def dim_market(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market dimension from region (d_market, bl_cl.sql:404-446)."""
    region = load(spark, sf_dir, "region").select(F.col("r_name").alias("market"))
    return build_dim(region, "market", "region", "market_id")


DIM_MARKET_ORACLE = """
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY market) AS BIGINT) AS market_id,
           market, 'GLOBAL_SUPERSTORE' AS source_system,
           'region' AS source_entity, market AS source_id
    FROM (SELECT DISTINCT r_name AS market FROM region)
    UNION ALL
    SELECT -1, 'NA', 'MANUAL', 'MANUAL', 'NA'
"""


def dim_geography(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflaked geography: countries with FK into regions
    (Dim_Countries.FK_Region_ID → Dim_Regions, bl_3nf.sql:103;
    loaded by d_countries' lookup join, bl_cl.sql:574-575). The
    region dim is tiny → broadcast lookup."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    dim_region = add_surrogate_key(
        region.select(F.col("r_name").alias("region")).dropDuplicates(["region"]),
        ["region"],
        name="region_id",
    )
    country_src = (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .select(F.col("n_name").alias("country"), F.col("r_name").alias("region"))
        .dropDuplicates(["country"])
    )
    countries = add_surrogate_key(country_src, ["country"], name="country_id")
    out = countries.join(F.broadcast(dim_region), "region", "left").select(
        "country_id", "country", "region_id", "region"
    )
    na = spark.createDataFrame(
        [(-1, "NA", -1, "NA")], "country_id long, country string, region_id long, region string"
    )
    return out.unionByName(na)


DIM_GEOGRAPHY_ORACLE = """
    WITH dim_region AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY region) AS BIGINT) AS region_id, region
        FROM (SELECT DISTINCT r_name AS region FROM region)
    ), country_src AS (
        SELECT DISTINCT n.n_name AS country, r.r_name AS region
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    ), countries AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY country) AS BIGINT) AS country_id,
               country, region
        FROM country_src
    )
    SELECT c.country_id, c.country, d.region_id, c.region
    FROM countries c LEFT JOIN dim_region d USING (region)
    UNION ALL
    SELECT -1, 'NA', -1, 'NA'
"""


def dim_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-level snowflaked geography: addresses with FK into
    countries, countries with FK into regions
    (Dim_Addresses.FK_Country → Dim_Countries.FK_Region_ID →
    Dim_Regions, bl_3nf.sql:100-135; loaded by d_addresses' country
    lookup join, bl_cl.sql:671-697).

    The address level is table-scale (one row per distinct customer
    address) so its surrogate key uses the distributed path (no
    global single-partition sort); the country/region levels are
    tiny → broadcast lookups. At 100 TB the only shuffle is the
    distinct + key assignment on the address itself.
    """
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")

    dim_region = add_surrogate_key(
        region.select(F.col("r_name").alias("region")).dropDuplicates(["region"]),
        ["region"],
        name="region_id",
    )
    country_src = (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .select(
            "n_nationkey",
            F.col("n_name").alias("country"),
            F.col("r_name").alias("region"),
        )
        .dropDuplicates(["country"])
    )
    countries = add_surrogate_key(country_src, ["country"], name="country_id").join(
        F.broadcast(dim_region), "region", "left"
    )
    # the test tables carry no address column; synthesize the
    # deterministic per-customer shipping address the reference
    # stages (Shipping_Address strings, d_addresses src queries)
    address_src = (
        customer.select(
            F.concat(F.lit("ADDR_"), F.col("c_custkey").cast("string")).alias(
                "address"
            ),
            F.col("c_nationkey").alias("n_nationkey"),
        )
        .dropDuplicates(["address"])
        .join(F.broadcast(countries), "n_nationkey", "left")
    )
    out = add_surrogate_key_distributed(
        address_src, ["address"], name="address_id"
    ).select(
        "address_id",
        "address",
        F.coalesce("country_id", F.lit(-1)).alias("country_id"),
        F.coalesce("country", F.lit("NA")).alias("country"),
        F.coalesce("region_id", F.lit(-1)).alias("region_id"),
        F.coalesce("region", F.lit("NA")).alias("region"),
    )
    na = spark.createDataFrame(
        [(-1, "NA", -1, "NA", -1, "NA")],
        "address_id long, address string, country_id long, country string, "
        "region_id long, region string",
    )
    return out.unionByName(na)


DIM_ADDRESS_ORACLE = """
    WITH dim_region AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY region) AS BIGINT) AS region_id, region
        FROM (SELECT DISTINCT r_name AS region FROM region)
    ), country_src AS (
        SELECT DISTINCT ON (n.n_name) n.n_nationkey, n.n_name AS country, r.r_name AS region
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        ORDER BY n.n_name
    ), countries AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY c.country) AS BIGINT) AS country_id,
               c.n_nationkey, c.country, c.region, d.region_id
        FROM country_src c LEFT JOIN dim_region d USING (region)
    ), address_src AS (
        SELECT DISTINCT ON (address) address, n_nationkey
        FROM (SELECT 'ADDR_' || CAST(c_custkey AS VARCHAR) AS address,
                     c_nationkey AS n_nationkey
              FROM customer)
        ORDER BY address
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY a.address) AS BIGINT) AS address_id,
           a.address,
           COALESCE(c.country_id, -1) AS country_id,
           COALESCE(c.country, 'NA') AS country,
           COALESCE(c.region_id, -1) AS region_id,
           COALESCE(c.region, 'NA') AS region
    FROM address_src a LEFT JOIN countries c USING (n_nationkey)
    UNION ALL
    SELECT -1, 'NA', -1, 'NA', -1, 'NA'
"""


def dim_product_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category → subcategory → product snowflake
    (Dim_Subcategories.FK_Category_ID → Dim_Categories,
    bl_3nf.sql:142; products load via lookup, bl_cl.sql:793).
    p_brand=category, (p_brand,p_type)=subcategory."""
    part = load(spark, sf_dir, "part")
    categories = add_surrogate_key(
        part.select(F.col("p_brand").alias("category")).dropDuplicates(["category"]),
        ["category"],
        name="category_id",
    )
    subcat_src = part.select(
        F.col("p_brand").alias("category"), F.col("p_type").alias("subcategory")
    ).dropDuplicates(["category", "subcategory"])
    subcategories = add_surrogate_key(
        subcat_src, ["category", "subcategory"], name="subcategory_id"
    ).join(F.broadcast(categories), "category", "left")
    products = (
        part.select(
            "p_partkey",
            F.col("p_name").alias("product"),
            F.col("p_brand").alias("category"),
            F.col("p_type").alias("subcategory"),
        )
        .join(F.broadcast(subcategories), ["category", "subcategory"], "left")
        .select(
            F.col("p_partkey").alias("product_key"),
            "product",
            "subcategory_id",
            "subcategory",
            "category_id",
            "category",
        )
    )
    return products


DIM_PRODUCT_HIERARCHY_ORACLE = """
    WITH categories AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY category) AS BIGINT) AS category_id, category
        FROM (SELECT DISTINCT p_brand AS category FROM part)
    ), subcategories AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY category, subcategory) AS BIGINT) AS subcategory_id,
               category, subcategory
        FROM (SELECT DISTINCT p_brand AS category, p_type AS subcategory FROM part)
    )
    SELECT p.p_partkey AS product_key, p.p_name AS product,
           s.subcategory_id, p.p_type AS subcategory,
           c.category_id, p.p_brand AS category
    FROM part p
    LEFT JOIN subcategories s ON s.category = p.p_brand AND s.subcategory = p.p_type
    LEFT JOIN categories c ON c.category = p.p_brand
"""


def dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated date dimension (S8): the reference's recursive CTE
    (bl_cl.sql:1487-1507) becomes ``explode(sequence(min, max))`` —
    bounds discovered from the data (A4 min/max scan,
    bl_cl.sql:1172-1180). date_id = days since the first date
    (arithmetic, not a window — scales to any range)."""
    orders = load(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"), F.max(F.to_date("o_orderdate")).alias("hi")
    )
    dates = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d"),
        "lo",
    )
    return dates.select(
        (F.datediff("d", "lo") + 1).cast("long").alias("date_id"),
        F.date_format("d", "yyyy-MM-dd").alias("full_date"),
        F.year("d").alias("year"),
        F.quarter("d").alias("quarter"),
        F.month("d").alias("month"),
        F.dayofmonth("d").alias("day"),
        (F.weekday("d") + 1).alias("iso_dow"),
    )


DIM_DATE_ORACLE = """
    WITH bounds AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS lo, CAST(MAX(o_orderdate) AS DATE) AS hi
        FROM orders
    ), days AS (
        SELECT CAST(gs.g AS DATE) AS d, b.lo
        FROM bounds b, LATERAL (SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS g) gs
    )
    SELECT CAST(date_diff('day', lo, d) + 1 AS BIGINT) AS date_id,
           strftime(d, '%Y-%m-%d') AS full_date,
           CAST(year(d) AS INTEGER) AS year,
           CAST(quarter(d) AS INTEGER) AS quarter,
           CAST(month(d) AS INTEGER) AS month,
           CAST(dayofmonth(d) AS INTEGER) AS day,
           CAST(isodow(d) AS INTEGER) AS iso_dow
    FROM days
"""
