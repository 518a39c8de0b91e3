"""SCD2 scenario queries (SURVEY §2.9 — the reference's most
intricate operator: two-phase MERGE close-out + insert,
bl_cl.sql:806-875/879-1037/1042-1139).

A deterministic change scenario is synthesized from the customer
table so the full merge result is oracle-checkable:

- open dim rows:    customers with c_custkey%2=0 (v1, start 2020-01-01)
- closed history:   customers with c_custkey%10=0 (v0, 2019→2020)
- incoming source:  customers with c_custkey%3=0, where keys with
                    c_custkey%12=0 carry a changed name (' v2')

Since %2 ∧ %3 ⇒ %6, the overlap splits exactly into: changed
(%12=0) → close + re-insert; unchanged (%6=0, %12≠0) → pass through;
new keys (%3=0, odd) → first version; untouched (%2=0, %3≠0) → pass
through. Effective date is injected (2024-06-15) so the run is
reproducible — the reference uses now() (bl_cl.sql:836).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.operators.merge import scd2_merge

EFFECTIVE = "2024-06-15"


def _dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    open_rows = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.to_date(F.lit("2020-01-01")).alias("start_dt"),
        F.to_date(F.lit("9999-12-31")).alias("end_dt"),
        F.lit(True).alias("is_active"),
    )
    closed_rows = cust.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("k"),
        F.concat("c_name", F.lit(" v0")).alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.to_date(F.lit("2019-01-01")).alias("start_dt"),
        F.to_date(F.lit("2020-01-01")).alias("end_dt"),
        F.lit(False).alias("is_active"),
    )
    return open_rows.unionByName(closed_rows)


def _source(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return cust.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("k"),
        F.concat(
            "c_name",
            F.when(F.col("c_custkey") % 12 == 0, F.lit(" v2")).otherwise(F.lit("")),
        ).alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )


def scd2_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    merged = scd2_merge(
        _dim(spark, sf_dir),
        _source(spark, sf_dir),
        keys=["k"],
        attrs=["name", "segment"],
        effective_date=EFFECTIVE,
    )
    return merged.select(
        "k",
        "name",
        "segment",
        F.date_format("start_dt", "yyyy-MM-dd").alias("start_dt"),
        F.date_format("end_dt", "yyyy-MM-dd").alias("end_dt"),
        "is_active",
    )


SCD2_CUSTOMERS_ORACLE = """
    WITH closed_hist AS (
        SELECT c_custkey AS k, c_name || ' v0' AS name, c_mktsegment AS segment,
               '2019-01-01' AS start_dt, '2020-01-01' AS end_dt, false AS is_active
        FROM customer WHERE c_custkey % 10 = 0
    ), open_rows AS (
        SELECT c_custkey AS k, c_name AS name, c_mktsegment AS segment
        FROM customer WHERE c_custkey % 2 = 0
    ),
    -- changed: in both dim and source with a differing tracked attr
    changed AS (SELECT k FROM open_rows WHERE k % 12 = 0),
    open_out AS (
        SELECT o.k, o.name, o.segment, '2020-01-01' AS start_dt,
               CASE WHEN c.k IS NOT NULL THEN '2024-06-15' ELSE '9999-12-31' END AS end_dt,
               c.k IS NULL AS is_active
        FROM open_rows o LEFT JOIN changed c USING (k)
    ), new_out AS (
        SELECT c_custkey AS k,
               c_name || CASE WHEN c_custkey % 12 = 0 THEN ' v2' ELSE '' END AS name,
               c_mktsegment AS segment,
               '2024-06-15' AS start_dt, '9999-12-31' AS end_dt, true AS is_active
        FROM customer
        WHERE c_custkey % 3 = 0
          AND (c_custkey % 12 = 0 OR c_custkey % 2 = 1)
    )
    SELECT * FROM closed_hist
    UNION ALL SELECT * FROM open_out
    UNION ALL SELECT * FROM new_out
"""
