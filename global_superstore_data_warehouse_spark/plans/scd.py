"""SCD2 scenario queries (SURVEY §2.9 — the reference's most
intricate operator: two-phase MERGE close-out + insert).

The reference versions three dimensions the same way — products
(bl_cl.sql:806-875), customers (bl_cl.sql:879-1037), employees
(bl_cl.sql:1042-1139) — so one parametrized scenario covers all
three, instantiated over the customer / part / supplier test tables.

A deterministic change scenario is synthesized from each table so
the full merge result is oracle-checkable:

- open dim rows:    keys with key%2=0 (v1, start 2020-01-01)
- closed history:   keys with key%10=0 (v0, 2019→2020)
- incoming source:  keys with key%3=0, where keys with key%12=0
                    carry a changed tracked attribute (' v2')

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
from global_superstore_data_warehouse_spark.operators.keys import add_surrogate_key
from global_superstore_data_warehouse_spark.operators.merge import (
    scd2_merge,
    scd2_propagate,
)

EFFECTIVE = "2024-06-15"


def _dim(
    spark: SparkSession,
    sf_dir: str,
    table: str = "customer",
    key: str = "c_custkey",
    name: str = "c_name",
    attr: str = "c_mktsegment",
) -> DataFrame:
    """Existing dim state: open v1 rows (key%2=0) + closed v0 history
    (key%10=0)."""
    src_tbl = load(spark, sf_dir, table)
    open_rows = src_tbl.filter(F.col(key) % 2 == 0).select(
        F.col(key).alias("k"),
        F.col(name).alias("name"),
        F.col(attr).cast("string").alias("attr"),
        F.to_date(F.lit("2020-01-01")).alias("start_dt"),
        F.to_date(F.lit("9999-12-31")).alias("end_dt"),
        F.lit(True).alias("is_active"),
    )
    closed_rows = src_tbl.filter(F.col(key) % 10 == 0).select(
        F.col(key).alias("k"),
        F.concat(name, F.lit(" v0")).alias("name"),
        F.col(attr).cast("string").alias("attr"),
        F.to_date(F.lit("2019-01-01")).alias("start_dt"),
        F.to_date(F.lit("2020-01-01")).alias("end_dt"),
        F.lit(False).alias("is_active"),
    )
    return open_rows.unionByName(closed_rows)


def _source(
    spark: SparkSession,
    sf_dir: str,
    table: str = "customer",
    key: str = "c_custkey",
    name: str = "c_name",
    attr: str = "c_mktsegment",
) -> DataFrame:
    """Incoming load: key%3=0, with changed tracked attrs on key%12=0."""
    src_tbl = load(spark, sf_dir, table)
    return src_tbl.filter(F.col(key) % 3 == 0).select(
        F.col(key).alias("k"),
        F.concat(
            name,
            F.when(F.col(key) % 12 == 0, F.lit(" v2")).otherwise(F.lit("")),
        ).alias("name"),
        F.col(attr).cast("string").alias("attr"),
    )


def _scd2_merged(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    name: str,
    attr: str,
) -> DataFrame:
    """Date-typed post-load 3NF state for the scenario (shared by the
    scd2_* queries and the DM propagation)."""
    return scd2_merge(
        _dim(spark, sf_dir, table, key, name, attr),
        _source(spark, sf_dir, table, key, name, attr),
        keys=["k"],
        attrs=["name", "attr"],
        effective_date=EFFECTIVE,
    )


def _scd2_scenario(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    name: str,
    attr: str,
) -> DataFrame:
    """Build dim + source from the modular scenario and run the merge."""
    merged = _scd2_merged(spark, sf_dir, table, key, name, attr)
    return merged.select(
        "k",
        "name",
        "attr",
        F.date_format("start_dt", "yyyy-MM-dd").alias("start_dt"),
        F.date_format("end_dt", "yyyy-MM-dd").alias("end_dt"),
        "is_active",
    )


def _scd2_oracle(table: str, key: str, name: str, attr: str) -> str:
    return f"""
    WITH closed_hist AS (
        SELECT {key} AS k, {name} || ' v0' AS name, CAST({attr} AS VARCHAR) AS attr,
               '2019-01-01' AS start_dt, '2020-01-01' AS end_dt, false AS is_active
        FROM {table} WHERE {key} % 10 = 0
    ), open_rows AS (
        SELECT {key} AS k, {name} AS name, CAST({attr} AS VARCHAR) AS attr
        FROM {table} WHERE {key} % 2 = 0
    ),
    -- changed: in both dim and source with a differing tracked attr
    changed AS (SELECT k FROM open_rows WHERE k % 12 = 0),
    open_out AS (
        SELECT o.k, o.name, o.attr, '2020-01-01' AS start_dt,
               CASE WHEN c.k IS NOT NULL THEN '{EFFECTIVE}' ELSE '9999-12-31' END AS end_dt,
               c.k IS NULL AS is_active
        FROM open_rows o LEFT JOIN changed c USING (k)
    ), new_out AS (
        SELECT {key} AS k,
               {name} || CASE WHEN {key} % 12 = 0 THEN ' v2' ELSE '' END AS name,
               CAST({attr} AS VARCHAR) AS attr,
               '{EFFECTIVE}' AS start_dt, '9999-12-31' AS end_dt, true AS is_active
        FROM {table}
        WHERE {key} % 3 = 0
          AND ({key} % 12 = 0 OR {key} % 2 = 1)
    )
    SELECT * FROM closed_hist
    UNION ALL SELECT * FROM open_out
    UNION ALL SELECT * FROM new_out
"""


def scd2_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim_Customers_SCD2 analogue (bl_cl.sql:879-1037)."""
    return _scd2_scenario(spark, sf_dir, "customer", "c_custkey", "c_name", "c_mktsegment")


def scd2_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim_Products_SCD2 analogue (bl_cl.sql:806-875); tracked attrs
    are product name + brand."""
    return _scd2_scenario(spark, sf_dir, "part", "p_partkey", "p_name", "p_brand")


def scd2_employees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim_Employees_SCD2 analogue (bl_cl.sql:1042-1139); supplier
    plays the employee role (FIXTURES.md §3), nation as tracked attr."""
    return _scd2_scenario(spark, sf_dir, "supplier", "s_suppkey", "s_name", "s_nationkey")


SCD2_CUSTOMERS_ORACLE = _scd2_oracle("customer", "c_custkey", "c_name", "c_mktsegment")
SCD2_PRODUCTS_ORACLE = _scd2_oracle("part", "p_partkey", "p_name", "p_brand")
SCD2_EMPLOYEES_ORACLE = _scd2_oracle("supplier", "s_suppkey", "s_name", "s_nationkey")


def dm_scd2_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3NF→DM SCD2 propagation for the customer scenario — the
    reference's Dm_Customers (bl_cl.sql:1885-2067): the DM copy
    starts in sync with the PRE-load 3NF state, the 3NF side runs
    its load, and the propagation (operators.merge.scd2_propagate)
    applies phase-1 closures + phase-2 active inserts to the DM
    copy with the FK re-keyed against the DM's own segment dim
    (the subcategory remap of Dm_Products, bl_cl.sql:1858-1860).

    The segment dim is tiny → broadcast re-key join; the version
    algebra shuffles only on the version identity. Invariant
    (property-tested): the propagated DM state equals the post-load
    3NF state modulo the added DM surrogate FK.
    """
    dm_prior = _dim(spark, sf_dir)  # DM copy, in sync pre-load
    nf = _scd2_merged(spark, sf_dir, "customer", "c_custkey", "c_name", "c_mktsegment")
    prop = scd2_propagate(dm_prior, nf, version_cols=["k", "name", "attr"])

    dm_segments = add_surrogate_key(
        load(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").cast("string").alias("attr"))
        .dropDuplicates(["attr"]),
        ["attr"],
        name="dm_segment_id",
    )
    return prop.join(F.broadcast(dm_segments), "attr", "left").select(
        "k",
        "name",
        "attr",
        F.coalesce("dm_segment_id", F.lit(-1)).alias("dm_segment_id"),
        F.date_format("start_dt", "yyyy-MM-dd").alias("start_dt"),
        F.date_format("end_dt", "yyyy-MM-dd").alias("end_dt"),
        "is_active",
    )


DM_SCD2_PROPAGATION_ORACLE = f"""
    WITH base AS ({_scd2_oracle("customer", "c_custkey", "c_name", "c_mktsegment")}
    ), dm_segments AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY attr) AS BIGINT) AS dm_segment_id,
               attr
        FROM (SELECT DISTINCT CAST(c_mktsegment AS VARCHAR) AS attr FROM customer)
    )
    SELECT b.k, b.name, b.attr,
           COALESCE(s.dm_segment_id, -1) AS dm_segment_id,
           b.start_dt, b.end_dt, b.is_active
    FROM base b LEFT JOIN dm_segments s USING (attr)
"""


def scd2_two_load_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental two-load SCD2 lifecycle — the reference's defining
    runtime behavior (multiple staged load_ids flowing through the
    same MERGE, bl_cl.sql:43-68 sequencer + 806-875 merge) replayed
    as a driver-checkable query: two deterministic "loads" are
    derived from the static customer parquet and pushed through
    ``scd2_merge`` in sequence, starting from an empty dim; the
    result is the final version chain.

    Load 1 (effective 2024-01-01): customers with key%3=0.
    Load 2 (effective 2024-06-15): customers with key%2=0, where
    key%12=0 rows carry a changed tracked name (' v2').

    Expected chain (key%6=0 keys appear in both loads):
      - key%3=0 odd         → single version from load 1, open;
      - key%6=0, key%12≠0   → unchanged across loads, single open v1;
      - key%12=0            → v1 closed at 2024-06-15 + open ' v2';
      - key%2=0, key%3≠0    → first version from load 2, open.

    Plan: each merge is one full-outer shuffle join on the key +
    union-all (merge.py); chaining keeps everything lazy — Catalyst
    sees one DAG for both loads. At 100 TB each load touches only
    changed partitions under a Delta MERGE (SURVEY §2.9 swap-in).
    """
    cust = load(spark, sf_dir, "customer")
    k, name, attr = "c_custkey", "c_name", "c_mktsegment"

    empty_dim = cust.select(
        F.col(k).alias("k"),
        F.col(name).alias("name"),
        F.col(attr).cast("string").alias("attr"),
        F.to_date(F.lit("2024-01-01")).alias("start_dt"),
        F.to_date(F.lit("9999-12-31")).alias("end_dt"),
        F.lit(True).alias("is_active"),
    ).filter(F.lit(False))

    load1 = cust.filter(F.col(k) % 3 == 0).select(
        F.col(k).alias("k"),
        F.col(name).alias("name"),
        F.col(attr).cast("string").alias("attr"),
    )
    load2 = cust.filter(F.col(k) % 2 == 0).select(
        F.col(k).alias("k"),
        F.concat(
            name,
            F.when(F.col(k) % 12 == 0, F.lit(" v2")).otherwise(F.lit("")),
        ).alias("name"),
        F.col(attr).cast("string").alias("attr"),
    )

    state1 = scd2_merge(empty_dim, load1, keys=["k"], attrs=["name", "attr"], effective_date="2024-01-01")
    state2 = scd2_merge(state1, load2, keys=["k"], attrs=["name", "attr"], effective_date=EFFECTIVE)
    return state2.select(
        "k",
        "name",
        "attr",
        F.date_format("start_dt", "yyyy-MM-dd").alias("start_dt"),
        F.date_format("end_dt", "yyyy-MM-dd").alias("end_dt"),
        "is_active",
    )


SCD2_TWO_LOAD_LIFECYCLE_ORACLE = f"""
    WITH c AS (
        SELECT c_custkey AS k, c_name AS name,
               CAST(c_mktsegment AS VARCHAR) AS attr
        FROM customer
    )
    -- load-1-only keys (odd multiples of 3): single open version
    SELECT k, name, attr, '2024-01-01' AS start_dt,
           '9999-12-31' AS end_dt, true AS is_active
    FROM c WHERE k % 3 = 0 AND k % 2 = 1
    UNION ALL
    -- in both loads, unchanged: v1 passes through open
    SELECT k, name, attr, '2024-01-01', '9999-12-31', true
    FROM c WHERE k % 6 = 0 AND k % 12 <> 0
    UNION ALL
    -- changed keys: v1 closed at load 2's effective date
    SELECT k, name, attr, '2024-01-01', '{EFFECTIVE}', false
    FROM c WHERE k % 12 = 0
    UNION ALL
    -- changed keys: replacement version open from load 2
    SELECT k, name || ' v2', attr, '{EFFECTIVE}', '9999-12-31', true
    FROM c WHERE k % 12 = 0
    UNION ALL
    -- load-2-only keys (even, not multiple of 3): first version
    SELECT k, name, attr, '{EFFECTIVE}', '9999-12-31', true
    FROM c WHERE k % 2 = 0 AND k % 3 <> 0
"""


def fact_pit_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) join: each order resolves the customer
    dim VERSION that was valid on its order date — the historical
    counterpart of the fact build's open-version lookup (J2). The
    version intervals are half-open [start_dt, end_dt), so with the
    SCD2 invariant (non-overlapping versions per key) every order
    matches at most one version.

    Scale shape: a broadcast range join when the dim fits (here), a
    shuffle join on the customer key with an interval filter when it
    does not — either way no window and no explode. Orders outside
    every version interval (before the key's first version) resolve
    to NULL lineage, reported as matched=false.
    """
    dim = _dim(spark, sf_dir)  # customer scenario dim: k/name/attr + validity
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("order_date"),
    )
    d = dim.alias("d")
    o = orders.alias("o")
    joined = o.join(
        F.broadcast(d),
        (F.col("o.o_custkey") == F.col("d.k"))
        & (F.col("d.start_dt") <= F.col("o.order_date"))
        & (F.col("o.order_date") < F.col("d.end_dt")),
        "left",
    )
    return joined.select(
        F.col("o.o_orderkey").alias("order_key"),
        F.col("o.o_custkey").alias("custkey"),
        F.date_format("o.order_date", "yyyy-MM-dd").alias("order_date"),
        F.col("d.name").alias("customer_version_name"),
        F.date_format("d.start_dt", "yyyy-MM-dd").alias("version_start"),
        F.col("d.k").isNotNull().alias("matched"),
    )


FACT_PIT_CUSTOMERS_ORACLE = """
    WITH dim AS (
        SELECT c_custkey AS k, c_name AS name,
               DATE '2020-01-01' AS start_dt, DATE '9999-12-31' AS end_dt
        FROM customer WHERE c_custkey % 2 = 0
        UNION ALL
        SELECT c_custkey, c_name || ' v0',
               DATE '2019-01-01', DATE '2020-01-01'
        FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT o.o_orderkey AS order_key,
           o.o_custkey AS custkey,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
           d.name AS customer_version_name,
           strftime(d.start_dt, '%Y-%m-%d') AS version_start,
           d.k IS NOT NULL AS matched
    FROM orders o
    LEFT JOIN dim d
      ON o.o_custkey = d.k
     AND d.start_dt <= CAST(o.o_orderdate AS DATE)
     AND CAST(o.o_orderdate AS DATE) < d.end_dt
"""


# --- snapshot diff (time travel between two as-of states) -------------

SNAP_T1 = "2024-03-01"
SNAP_T2 = "2024-12-01"


def snapshot_diff(
    chain: DataFrame, t1: str, t2: str, key: str, attrs: list[str]
) -> DataFrame:
    """Diff two as-of snapshots of an SCD2 version chain: for each
    key, classify added / removed / changed / unchanged between the
    state valid at ``t1`` and at ``t2``, carrying the before/after
    attribute values. The "what changed between yesterday's close and
    today's" question every warehouse audit asks — answered from the
    version chain alone, no stored snapshots.

    Plan: two as-of filters over the SAME chain scan (predicates on
    [start_dt, end_dt) — partition-prunable when the chain is stored
    partitioned by version date) + one full-outer shuffle join on the
    key. With the SCD2 invariant (non-overlapping versions) each
    snapshot has at most one row per key, so the join is 1:1.
    """
    def snap(t: str, suffix: str) -> DataFrame:
        return chain.filter(
            (F.col("start_dt") <= F.lit(t)) & (F.col("end_dt") > F.lit(t))
        ).select(
            F.col(key),
            *[F.col(a).alias(f"{a}_{suffix}") for a in attrs],
        )

    s1, s2 = snap(t1, "t1"), snap(t2, "t2")
    changed = F.lit(False)
    for a in attrs:
        changed = changed | (F.col(f"{a}_t1") != F.col(f"{a}_t2"))
    change_type = (
        F.when(F.col(f"{attrs[0]}_t1").isNull() & F.col(f"{attrs[0]}_t2").isNotNull(), "added")
        .when(F.col(f"{attrs[0]}_t2").isNull() & F.col(f"{attrs[0]}_t1").isNotNull(), "removed")
        .when(changed, "changed")
        .otherwise("unchanged")
    )
    return s1.join(s2, key, "full_outer").select(
        key, change_type.alias("change_type"),
        *[c for a in attrs for c in (f"{a}_t1", f"{a}_t2")],
    )


def scd2_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff over the two-load lifecycle chain: the state
    as of {SNAP_T1} (after load 1) vs {SNAP_T2} (after load 2).
    Expected classes follow the lifecycle algebra: keys only in
    load 1 or unchanged across loads → 'unchanged'; key%12=0 →
    'changed' (name gained ' v2'); load-2-only keys → 'added';
    nothing is ever deleted → no 'removed'."""
    cust = load(spark, sf_dir, "customer")
    k, name, attr = "c_custkey", "c_name", "c_mktsegment"

    empty_dim = cust.select(
        F.col(k).alias("k"),
        F.col(name).alias("name"),
        F.col(attr).cast("string").alias("attr"),
        F.to_date(F.lit("2024-01-01")).alias("start_dt"),
        F.to_date(F.lit("9999-12-31")).alias("end_dt"),
        F.lit(True).alias("is_active"),
    ).filter(F.lit(False))
    load1 = cust.filter(F.col(k) % 3 == 0).select(
        F.col(k).alias("k"),
        F.col(name).alias("name"),
        F.col(attr).cast("string").alias("attr"),
    )
    load2 = cust.filter(F.col(k) % 2 == 0).select(
        F.col(k).alias("k"),
        F.concat(
            name, F.when(F.col(k) % 12 == 0, F.lit(" v2")).otherwise(F.lit(""))
        ).alias("name"),
        F.col(attr).cast("string").alias("attr"),
    )
    state1 = scd2_merge(empty_dim, load1, keys=["k"], attrs=["name", "attr"], effective_date="2024-01-01")
    chain = scd2_merge(state1, load2, keys=["k"], attrs=["name", "attr"], effective_date=EFFECTIVE)
    return snapshot_diff(chain, SNAP_T1, SNAP_T2, "k", ["name"])


SCD2_SNAPSHOT_DIFF_ORACLE = """
    WITH c AS (SELECT c_custkey AS k, c_name AS name FROM customer)
    SELECT k, 'unchanged' AS change_type, name AS name_t1, name AS name_t2
    FROM c WHERE (k % 3 = 0 AND k % 2 = 1) OR (k % 6 = 0 AND k % 12 <> 0)
    UNION ALL
    SELECT k, 'changed', name, name || ' v2' FROM c WHERE k % 12 = 0
    UNION ALL
    SELECT k, 'added', NULL, name FROM c WHERE k % 2 = 0 AND k % 3 <> 0
"""
