"""Cleansing-layer queries — SURVEY §2.3 scalar functions, §2.5/§2.7
dedup & set ops, §2.4 J3/J4/J6 joins, S5/S6 conflict-handling sinks —
each exercised over the driver test tables with a DuckDB oracle.

Reference citations (all into /root/reference/Database/BL_CL/bl_cl.sql
unless noted):
- id/name suffix stripping: bl_cl.sql:101-110,143-152,189-193
- name split: bl_cl.sql:1069-1070,1103-1104
- date parse dd-MM-yyyy: bl_cl.sql:633,644,1173-1180
- distinct-union of two sources (U1): bl_cl.sql:319,416,432,544
- UNION ALL segments (U2): bl_cl.sql:473
- anti-join new-rows (J4/S5): bl_cl.sql:259-261,356,483
- full-outer+coalesce merge (J3/P7): bl_cl.sql:346-355,782-792
- duplicate probe (A6/C8): bl_cl.sql:2217-2226
- SCD1 upsert (S6/J5): bl_cl.sql:439
- case-insensitive join (J6/F3): bl_cl.sql:908,938

Dirty data (``#``-suffixed ids, ``' -'``-suffixed names — FIXTURES.md
§1) is synthesized in-query deterministically from c_custkey so the
oracle applies the identical expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.functions import cleaning as C
from global_superstore_data_warehouse_spark.operators import dedup as D
from global_superstore_data_warehouse_spark.operators import merge as M
from global_superstore_data_warehouse_spark.operators.hints import spread_scan


# --- F1/P6: id & name suffix stripping -------------------------------

def clean_dirty_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    dirty_id = F.concat(
        F.col("c_custkey").cast("string"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit("#dup")).otherwise(F.lit("")),
    )
    dirty_name = F.concat(
        F.col("c_name"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit(" -old")).otherwise(F.lit("")),
    )
    return cust.select(
        "c_custkey",
        dirty_id.alias("dirty_id"),
        C.clean_id(dirty_id).alias("clean_id"),
        C.clean_name(dirty_name).alias("clean_name"),
    )


CLEAN_DIRTY_IDS_ORACLE = """
    SELECT c_custkey,
           CAST(c_custkey AS VARCHAR)
             || CASE WHEN c_custkey % 3 = 0 THEN '#dup' ELSE '' END AS dirty_id,
           split_part(CAST(c_custkey AS VARCHAR)
             || CASE WHEN c_custkey % 3 = 0 THEN '#dup' ELSE '' END, '#', 1) AS clean_id,
           split_part(c_name
             || CASE WHEN c_custkey % 5 = 0 THEN ' -old' ELSE '' END, ' -', 1) AS clean_name
    FROM customer
"""


# --- F2/F3/F4: name split / upper / concat ---------------------------

def split_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        C.first_name("p_name").alias("first_word"),
        C.last_name("p_name").alias("last_word"),
        F.upper("p_name").alias("name_upper"),
        C.full_name(C.first_name("p_name"), C.last_name("p_name")).alias("rejoined"),
    )


SPLIT_NAMES_ORACLE = """
    SELECT p_partkey,
           split_part(p_name, ' ', 1) AS first_word,
           split_part(p_name, ' ', 2) AS last_word,
           upper(p_name) AS name_upper,
           split_part(p_name, ' ', 1) || ' ' || split_part(p_name, ' ', 2) AS rejoined
    FROM part
"""


# --- F5-F10: date parse / extract / arithmetic -----------------------

def parse_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    date_str = F.date_format("o_orderdate", "dd-MM-yyyy")
    d = C.parse_date_ddmmyyyy(date_str)
    # Date-valued outputs are serialized to ISO strings so the
    # engine-side repr (date vs timestamp) can never skew the
    # driver's value hash; parsing/arithmetic still happens on DATE.
    iso = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    return orders.select(
        "o_orderkey",
        date_str.alias("date_str"),
        iso(d).alias("order_date"),
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.quarter(d).alias("order_quarter"),
        F.dayofmonth(d).alias("order_day"),
        iso(F.date_add(d, 1)).alias("next_day"),
        iso(F.add_months(d, 12)).alias("next_year"),
    )


PARSE_DATES_ORACLE = """
    WITH s AS (
        SELECT o_orderkey,
               strftime(o_orderdate, '%d-%m-%Y') AS date_str,
               CAST(strptime(strftime(o_orderdate, '%d-%m-%Y'), '%d-%m-%Y') AS DATE) AS d
        FROM orders
    )
    SELECT o_orderkey, date_str,
           strftime(d, '%Y-%m-%d') AS order_date,
           CAST(year(d) AS INTEGER) AS order_year,
           CAST(month(d) AS INTEGER) AS order_month,
           CAST(quarter(d) AS INTEGER) AS order_quarter,
           CAST(dayofmonth(d) AS INTEGER) AS order_day,
           strftime(d + INTERVAL 1 DAY, '%Y-%m-%d') AS next_day,
           strftime(d + INTERVAL 1 YEAR, '%Y-%m-%d') AS next_year
    FROM s
"""


# --- U1/A1: distinct union of two conformed sources ------------------

def distinct_union_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    a = part.filter(F.col("p_partkey") % 2 == 0).select(F.col("p_brand").alias("brand"))
    b = part.filter(F.col("p_partkey") % 2 == 1).select(F.col("p_brand").alias("brand"))
    return D.distinct_union(a, b)


DISTINCT_UNION_BRANDS_ORACLE = """
    SELECT p_brand AS brand FROM part WHERE p_partkey % 2 = 0
    UNION
    SELECT p_brand AS brand FROM part WHERE p_partkey % 2 = 1
"""


# --- U2: union all + group count -------------------------------------

def union_all_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_custkey") % 2 == 0).select(F.col("c_mktsegment").alias("segment"))
    b = cust.filter(F.col("c_custkey") % 2 == 1).select(F.col("c_mktsegment").alias("segment"))
    return (
        D.union_all(a, b)
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("row_count"))
        .orderBy("segment")
    )


UNION_ALL_SEGMENTS_ORACLE = """
    SELECT segment, COUNT(*) AS row_count FROM (
        SELECT c_mktsegment AS segment FROM customer WHERE c_custkey % 2 = 0
        UNION ALL
        SELECT c_mktsegment AS segment FROM customer WHERE c_custkey % 2 = 1
    ) GROUP BY segment ORDER BY segment
"""


# --- J4/S5: anti-join "new rows only" (ON CONFLICT DO NOTHING) -------

def new_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers absent from the 1995 order book — the staging-side
    "which incoming rows are NEW" anti-join (ON CONFLICT DO NOTHING's
    read half). The probe is restricted to one order year so the
    result is NON-EMPTY at every test SF: at sf0.01 every customer
    has *some* order, and the round-11 verdict flagged the unfiltered
    variant as a trivially-green 0-row driver row (matching the
    oracle on the empty set proves nothing)."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    existing = (
        load(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return D.new_rows(cust, existing, ["c_custkey"])


NEW_CUSTOMERS_ORACLE = """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1995
    )
"""


# --- J3/P7: full-outer + coalesce two-source merge -------------------

def merged_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    consumer = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", F.col("c_name").alias("name"), F.col("c_mktsegment").alias("segment")
    )
    corporate = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey", F.upper("c_name").alias("name"), F.col("c_mktsegment").alias("segment")
    )
    return D.full_outer_coalesce(consumer, corporate, ["c_custkey"], ["name", "segment"])


MERGED_ENTITIES_ORACLE = """
    WITH cons AS (
        SELECT c_custkey, c_name AS name, c_mktsegment AS segment
        FROM customer WHERE c_custkey % 2 = 0
    ), corp AS (
        SELECT c_custkey, upper(c_name) AS name, c_mktsegment AS segment
        FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT COALESCE(cons.c_custkey, corp.c_custkey) AS c_custkey,
           COALESCE(cons.name, corp.name) AS name,
           COALESCE(cons.segment, corp.segment) AS segment
    FROM cons FULL OUTER JOIN corp ON cons.c_custkey = corp.c_custkey
"""


# --- A6/C8: duplicate checker ----------------------------------------

def duplicate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return D.check_duplicates(orders, ["o_custkey"])


DUPLICATE_ORDERS_ORACLE = """
    SELECT o_custkey, COUNT(*) AS dup_count
    FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1
"""


# --- S6/J5: SCD1 upsert ----------------------------------------------

def scd1_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    target = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", F.col("c_name").alias("name"), F.round("c_acctbal", 2).alias("balance")
    )
    source = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit(" v2")).alias("name"),
        F.round(F.col("c_acctbal") + 100, 2).alias("balance"),
    )
    return M.scd1_upsert(target, source, ["c_custkey"], ["name", "balance"])


SCD1_UPSERT_CUSTOMERS_ORACLE = """
    WITH t AS (
        SELECT c_custkey, c_name AS name, ROUND(c_acctbal, 2) AS balance
        FROM customer WHERE c_custkey % 2 = 0
    ), s AS (
        SELECT c_custkey, c_name || ' v2' AS name, ROUND(c_acctbal + 100, 2) AS balance
        FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.name ELSE t.name END AS name,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.balance ELSE t.balance END AS balance,
           (t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL) AS is_updated
    FROM t FULL OUTER JOIN s ON t.c_custkey = s.c_custkey
"""


# --- J6: case-insensitive equi-join ----------------------------------

def case_insensitive_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    segs = cust.select(F.lower("c_mktsegment").alias("seg")).distinct()
    return (
        cust.join(F.broadcast(segs), F.upper(segs.seg) == F.upper(cust.c_mktsegment))
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("customer_count"))
        .orderBy("seg")
    )


CASE_INSENSITIVE_SEGMENTS_ORACLE = """
    WITH segs AS (SELECT DISTINCT lower(c_mktsegment) AS seg FROM customer)
    SELECT seg, COUNT(*) AS customer_count
    FROM customer c JOIN segs ON upper(segs.seg) = upper(c.c_mktsegment)
    GROUP BY seg ORDER BY seg
"""


# --- JSON prop extraction (events) -----------------------------------

def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`props` is a JSON string column; extraction stays JVM-side via
    get_json_object (no UDF)."""
    events = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select("event_type", k.alias("prop_k"))
        .groupBy("event_type")
        .agg(
            F.sum("prop_k").alias("sum_k"),
            F.count(F.lit(1)).alias("event_count"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_PROPS_ORACLE = """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           COUNT(*) AS event_count
    FROM events GROUP BY event_type ORDER BY event_type
"""


# --- semi/anti set-membership (EXISTS / EXCEPT family) ---------------

def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (the EXISTS idiom): customers having at least
    one order — no duplication, no payload from the probe side, the
    planner's cheapest membership join."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


CUSTOMERS_WITH_ORDERS_ORACLE = """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def types_missing_from_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference): part types present in the
    full catalog but absent from a sparse key sample — the coverage-gap
    QA question. The reference has no INTERSECT/EXCEPT (§2.7);
    included for set-op completeness. ``subtract`` = EXCEPT DISTINCT
    (one dedup shuffle per side, then a left-anti under the hood)."""
    part = load(spark, sf_dir, "part")
    all_types = part.select(F.col("p_type").alias("part_type"))
    sampled_types = part.filter(F.col("p_partkey") % 500 == 0).select(
        F.col("p_type").alias("part_type")
    )
    return all_types.subtract(sampled_types)


TYPES_MISSING_FROM_SAMPLE_ORACLE = """
    SELECT p_type AS part_type FROM part
    EXCEPT
    SELECT p_type AS part_type FROM part WHERE p_partkey % 500 = 0
"""


def types_in_both_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set intersection): part types present in
    both key-parity halves of the catalog — completes the set-op
    family with EXCEPT above (§2.7 notes the reference has neither)."""
    part = load(spark, sf_dir, "part")
    evens = part.filter(F.col("p_partkey") % 2 == 0).select(F.col("p_type").alias("part_type"))
    odds = part.filter(F.col("p_partkey") % 2 == 1).select(F.col("p_type").alias("part_type"))
    return evens.intersect(odds)


TYPES_IN_BOTH_HALVES_ORACLE = """
    SELECT p_type AS part_type FROM part WHERE p_partkey % 2 = 0
    INTERSECT
    SELECT p_type AS part_type FROM part WHERE p_partkey % 2 = 1
"""


def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by edit distance: customers from the two
    synthesized feeds whose names are within Levenshtein distance 2,
    blocked on nation (candidate pairs bounded by block size, never
    all-pairs — same blocking discipline as the text dedup family).
    Integer distances are engine-exact."""
    cust = load(spark, sf_dir, "customer")
    # the probe side carries the blocked-pair Levenshtein work — a
    # single-split scan would run it all in one task (measured 6.2 s
    # single-task at sf0.1); spread_scan is a no-op once the table is
    # big enough to split on its own (guide §2.5)
    consumer = spread_scan(
        cust.filter(F.col("c_custkey") % 2 == 0), sf_dir, "customer", by="c_custkey"
    ).select(
        F.col("c_custkey").alias("id_a"), F.col("c_name").alias("name_a"), "c_nationkey"
    )
    corporate = cust.filter(F.col("c_custkey") % 2 == 1).select(
        F.col("c_custkey").alias("id_b"), F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nk_b"),
    )
    pairs = consumer.join(
        corporate, consumer.c_nationkey == corporate.nk_b
    )
    # THRESHOLDED levenshtein (guide §1.2 per-task work): the banded
    # DP early-exits on the >2 majority instead of filling the full
    # matrix per pair; for every SURVIVING pair it returns the exact
    # distance (and -1 for the discarded ones), so the output is
    # row-identical to the unbounded form the oracle computes.
    dist = F.levenshtein("name_a", "name_b", threshold=2)
    return (
        pairs.select("id_a", "id_b", "name_a", "name_b", dist.alias("edit_distance"))
        .filter(F.col("edit_distance") >= 0)
    )


FUZZY_NAME_MATCH_ORACLE = """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS edit_distance
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_custkey % 2 = 0 AND b.c_custkey % 2 = 1
    WHERE levenshtein(a.c_name, b.c_name) <= 2
"""


# --- FastSS deletion-neighborhood fuzzy match -------------------------


def fuzzy_match_fastss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance <= 1 name matching via FastSS deletion
    neighborhoods — the EXACT blocking technique for string
    similarity at scale: every name emits itself plus each
    single-character-deletion variant (n+1 short strings); two names
    within Levenshtein 1 PROVABLY share a variant (equality shares
    the name, insert/delete makes one equal the other's deletion,
    substitution makes their same-position deletions equal), so the
    variant equi-join is a complete candidate generator and the
    levenshtein() verify keeps exactly the true pairs. Compare
    ``fuzzy_name_match`` (attribute blocking: cheap but recall
    depends on the blocking key being clean) — FastSS needs no
    blocking attribute and its recall is a theorem.

    Scale shape: variant generation is a zero-shuffle explode
    (length+1 rows per name, short strings); the equi-join on the
    variant carries (id, name) only; candidates dedupe before the
    verify. Index size is names x avg_length — the standard
    spelling-correction trade.
    """
    cust = load(spark, sf_dir, "customer")
    # spread before the zero-shuffle variant explode so generation
    # and the verify run cluster-wide, not in the scan's single
    # split (no-op once the table splits on its own — guide §2.5)
    consumer = spread_scan(
        cust.filter(F.col("c_custkey") % 2 == 0), sf_dir, "customer", by="c_custkey"
    ).select(F.col("c_custkey").alias("id_a"), F.col("c_name").alias("name_a"))
    corporate = spread_scan(
        cust.filter(F.col("c_custkey") % 2 == 1), sf_dir, "customer", by="c_custkey"
    ).select(F.col("c_custkey").alias("id_b"), F.col("c_name").alias("name_b"))

    # variant emitter: position 0 = the name itself, position i>0 =
    # the name with character i removed
    def with_variants(df, id_col, name_col):
        name = F.col(name_col)
        return df.select(
            id_col,
            name_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.length(name)),
                    lambda i: F.when(i == 0, name).otherwise(
                        F.concat(
                            name.substr(F.lit(1), i - 1),
                            name.substr(i + 1, F.length(name)),
                        )
                    ),
                )
            ).alias("variant"),
        )

    va = with_variants(consumer, "id_a", "name_a")
    vb = with_variants(corporate, "id_b", "name_b")
    cands = (
        va.join(vb, "variant")
        .select("id_a", "name_a", "id_b", "name_b")
        .distinct()
    )
    # thresholded verify: exact distance for survivors, -1 for the rest
    dist = F.levenshtein("name_a", "name_b", threshold=1)
    return cands.select(
        "id_a", "id_b", "name_a", "name_b", dist.alias("edit_distance")
    ).filter(F.col("edit_distance") >= 0)


# brute-force oracle (no blocking): identical output proves the
# deletion-neighborhood candidate generator misses nothing
FUZZY_MATCH_FASTSS_ORACLE = """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS edit_distance
    FROM customer a JOIN customer b
      ON a.c_custkey % 2 = 0 AND b.c_custkey % 2 = 1
    WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


# --- sorted-neighborhood blocking (Hernández & Stolfo 1995) -----------

SNM_WINDOW = 6  # slide-window width (compare rank distance < W)
SNM_MAX_DIST = 2  # verify: Levenshtein threshold


def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass SORTED-NEIGHBORHOOD entity-resolution blocking: sort
    the customer roster by a key, compare only records within a
    sliding window of ``SNM_WINDOW`` ranks, verify survivors with an
    exact Levenshtein threshold. Two passes (name ascending, REVERSED
    name ascending) union their candidates — the standard multi-pass
    trick that recovers pairs a single sort order separates. This is
    the third blocking family in the repo (attribute blocking =
    ``fuzzy_name_match``, deletion neighborhoods =
    ``fuzzy_match_fastss``): SNM's candidate count is n*(W-1) per
    pass BY CONSTRUCTION, independent of key skew — the property that
    makes it the classic choice when attribute blocks blow up.

    Scale shape: the rank comes from ``add_surrogate_key_auto``
    (global window at dimension size, the range-partition +
    offset-broadcast path past 5M rows — NO single-reducer sort at
    scale); the window itself is an explode(1..W-1) + equi-join on
    rank, an ordinary shuffle join. Verify is engine-exact integer
    edit distance. Window recall vs the full quadratic verify is
    pinned in pytest at sf0.001.
    """
    from global_superstore_data_warehouse_spark.operators.keys import (
        add_surrogate_key_auto,
    )

    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    cand = None
    for key in (F.col("name"), F.reverse(F.col("name"))):
        ranked = add_surrogate_key_auto(
            cust.withColumn("k", key), ["k", "id"], name="rn"
        )
        a = ranked.select(
            F.col("id").alias("id_a"),
            F.col("name").alias("name_a"),
            F.col("rn").alias("rn_a"),
        ).withColumn(
            "rn_b",
            F.explode(
                F.sequence(
                    F.col("rn_a") + 1, F.col("rn_a") + (SNM_WINDOW - 1)
                )
            ),
        )
        b = ranked.select(
            F.col("id").alias("id_b"),
            F.col("name").alias("name_b"),
            F.col("rn").alias("rn_b"),
        )
        p = a.join(b, "rn_b").select("id_a", "name_a", "id_b", "name_b")
        cand = p if cand is None else cand.unionByName(p)
    canon = cand.select(
        F.least("id_a", "id_b").alias("cid_a"),
        F.greatest("id_a", "id_b").alias("cid_b"),
        F.when(F.col("id_a") < F.col("id_b"), F.col("name_a"))
        .otherwise(F.col("name_b"))
        .alias("cname_a"),
        F.when(F.col("id_a") < F.col("id_b"), F.col("name_b"))
        .otherwise(F.col("name_a"))
        .alias("cname_b"),
    ).distinct()
    # thresholded verify (same rewrite as fuzzy_name_match): exact
    # distance for survivors, -1 early-exit for the discarded bulk
    dist = F.levenshtein("cname_a", "cname_b", threshold=SNM_MAX_DIST)
    return canon.select(
        F.col("cid_a").alias("id_a"),
        F.col("cid_b").alias("id_b"),
        F.col("cname_a").alias("name_a"),
        F.col("cname_b").alias("name_b"),
        dist.cast("int").alias("edit_distance"),
    ).filter(F.col("edit_distance") >= 0)


SORTED_NEIGHBORHOOD_PAIRS_ORACLE = f"""
    WITH c AS (
        SELECT c_custkey AS id, c_name AS name FROM customer
    ), fwd AS (
        SELECT id, name,
               ROW_NUMBER() OVER (ORDER BY name, id) AS rn
        FROM c
    ), rev AS (
        SELECT id, name,
               ROW_NUMBER() OVER (ORDER BY reverse(name), id) AS rn
        FROM c
    ), cand AS (
        SELECT a.id AS id_a, a.name AS name_a, b.id AS id_b,
               b.name AS name_b
        FROM fwd a JOIN fwd b
          ON b.rn > a.rn AND b.rn <= a.rn + {SNM_WINDOW - 1}
        UNION ALL
        SELECT a.id, a.name, b.id, b.name
        FROM rev a JOIN rev b
          ON b.rn > a.rn AND b.rn <= a.rn + {SNM_WINDOW - 1}
    ), canon AS (
        SELECT DISTINCT
               LEAST(id_a, id_b) AS id_a,
               GREATEST(id_a, id_b) AS id_b,
               CASE WHEN id_a < id_b THEN name_a ELSE name_b END AS name_a,
               CASE WHEN id_a < id_b THEN name_b ELSE name_a END AS name_b
        FROM cand
    )
    SELECT id_a, id_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INTEGER) AS edit_distance
    FROM canon
    WHERE levenshtein(name_a, name_b) <= {SNM_MAX_DIST}
"""
