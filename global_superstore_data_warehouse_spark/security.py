"""Role/GRANT security layer — SURVEY §2 C9, the last reference
component (previously declared out of scope, now implemented).

Reference parity: the reference creates one role per warehouse layer
and wires a grant matrix along the data lineage — sources readable by
the cleansing layer (consumer.sql:91-92, corporate.sql:93-94), the
3NF layer writable by cleansing (bl_3nf.sql:281-284), the DM layer's
procedures executable by cleansing (bl_dm.sql:230-246).

Spark-first re-expression: an embedded Spark session has no
engine-level ACL (clusters delegate table ACLs to the catalog
service). What IS expressible engine-side — and what warehouses pair
with GRANTs in practice — is policy enforcement at plan-construction
time plus a SECURED VIEW layer:

- a ``GrantMatrix`` holds (role, table) -> privileges and raises
  ``PermissionDenied`` before any plan is built — the moral
  equivalent of the reference's GRANT failing at parse time;
- per-(role, table) view policies apply COLUMN-level security
  (pruning + masking expressions) and ROW-level security (filter
  predicates) as ordinary Catalyst expressions, so masks stay
  whole-stage-codegen'd and row filters PUSH DOWN into the parquet
  scan (a secured view costs nothing extra at 100 TB — the filter
  prunes row groups like any other predicate).

Masking is deterministic (keyed md5), so secured views remain
joinable on masked keys across tables — same property the
pii_pseudonymize pass guarantees (plans/curation.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import TABLES, load

PRIVILEGES = frozenset({"select", "insert", "update", "delete"})

# Default masking key — the documented TEST key, also what the
# driver-checked query uses so its hash stays stable. As a privacy
# control the key is INJECTABLE: every masking entry point threads a
# ``mask_key`` parameter (deploy with a secret-manager value, never
# this literal); changing the key changes every mask while preserving
# join-consistency (test_security proves both properties).
MASK_PEPPER = "gsdw-mask-v1"


class PermissionDenied(Exception):
    """Raised when a role lacks the privilege for an operation."""


@dataclass
class ViewPolicy:
    """Column/row security for one (role, table) secured view.

    ``columns`` — the visible columns, in order. A plain string
    passes the column through; a (alias, builder) pair emits
    ``builder()`` under ``alias`` (masking, banding, ...).
    ``row_filter`` — optional predicate builder; rows failing it do
    not exist for the role (row-level security).
    """

    columns: tuple[str | tuple[str, Callable[[], Column]], ...]
    row_filter: Callable[[], Column] | None = None


@dataclass
class GrantMatrix:
    """(role, table) -> privileges, plus optional view policies.

    Mirrors the reference's role graph: privileges gate access
    outright; view policies shape what a SELECT returns.
    """

    grants: dict[tuple[str, str], frozenset[str]] = field(default_factory=dict)
    policies: dict[tuple[str, str], ViewPolicy] = field(default_factory=dict)

    def grant(
        self,
        role: str,
        table: str,
        privs: str | tuple[str, ...],
        policy: ViewPolicy | None = None,
    ) -> "GrantMatrix":
        if isinstance(privs, str):
            privs = (privs,)
        bad = set(privs) - PRIVILEGES
        if bad:
            raise ValueError(f"unknown privileges {sorted(bad)}")
        if table != "*" and table not in TABLES:
            raise KeyError(f"unknown table {table!r}")
        key = (role, table)
        self.grants[key] = self.grants.get(key, frozenset()) | frozenset(privs)
        if policy is not None:
            self.policies[key] = policy
        return self

    def check(self, role: str, table: str, priv: str) -> None:
        """The GRANT gate: raise unless ``role`` holds ``priv`` on
        ``table`` (directly or via a ``*`` whole-schema grant, the
        reference's ``ON ALL TABLES IN SCHEMA`` shape)."""
        if priv not in PRIVILEGES:
            raise ValueError(f"unknown privilege {priv!r}")
        held = self.grants.get((role, table), frozenset()) | self.grants.get(
            (role, "*"), frozenset()
        )
        if priv not in held:
            raise PermissionDenied(
                f"role {role!r} lacks {priv.upper()} on {table!r}"
            )

    def secured_load(
        self, spark: SparkSession, sf_dir: str, role: str, table: str
    ) -> DataFrame:
        """SELECT through the role's secured view: privilege check,
        then the (role, table) policy's column masks + row filter as
        one Catalyst projection/filter over the lazy scan. With no
        policy the full table is returned (a plain table grant)."""
        self.check(role, table, "select")
        df = load(spark, sf_dir, table)
        pol = self.policies.get((role, table))
        if pol is None:
            return df
        if pol.row_filter is not None:
            df = df.filter(pol.row_filter())
        cols = [
            F.col(c) if isinstance(c, str) else c[1]().alias(c[0])
            for c in pol.columns
        ]
        return df.select(*cols)


    def slicer_load(
        self,
        spark: SparkSession,
        sf_dir: str,
        role: str,
        table: str,
        slicers: Mapping[str, object],
    ) -> DataFrame:
        """Parameterized SELECT through the secured view — the BI
        slicer / drill-through analogue (the reference ships a Power
        BI layer whose slicers become WHERE clauses on its views).

        ``slicers`` maps VIEW OUTPUT columns to a filter spec:
        a scalar (equality), a list/tuple/set of scalars (IN), or a
        2-tuple ``(lo, hi)`` of strings/numbers (inclusive BETWEEN).
        Slicing any column the policy does not expose raises
        ``PermissionDenied`` — a slicer must not become a side
        channel onto masked or hidden data.

        Scale shape: slicer predicates are ordinary Catalyst filters
        over the view projection. For passthrough columns they land
        in the parquet scan's PushedFilters alongside the row-level
        security predicate (asserted in tests/test_security.py), so
        a sliced secured view prunes row groups exactly like a plain
        filtered scan; for masked/derived columns they filter on the
        derived expression — correct, just not scan-pruned.
        """
        df = self.secured_load(spark, sf_dir, role, table)
        pol = self.policies.get((role, table))
        visible = (
            set(df.columns)
            if pol is None
            else {c if isinstance(c, str) else c[0] for c in pol.columns}
        )
        for col, spec in slicers.items():
            if col not in visible:
                raise PermissionDenied(
                    f"role {role!r} cannot slice {table!r} on {col!r}: "
                    f"not exposed by its secured view"
                )
            if isinstance(spec, tuple) and len(spec) == 2:
                lo, hi = spec
                df = df.filter(F.col(col).between(F.lit(lo), F.lit(hi)))
            elif isinstance(spec, (list, set, frozenset)):
                df = df.filter(F.col(col).isin(*sorted(map(str, spec))))
            else:
                df = df.filter(F.col(col) == F.lit(spec))
        return df


def keyed_mask(col: str, mask_key: str = MASK_PEPPER) -> Column:
    """Deterministic keyed mask: md5(key || value). Irreversible
    without the key, stable across runs, join-preserving. The key
    defaults to the documented test pepper; production injects its
    own."""
    return F.md5(F.concat(F.lit(mask_key + "|"), F.col(col).cast("string")))


def band(col: str, width: float) -> Column:
    """Generalize a numeric quasi-identifier to a band index."""
    return F.floor(F.col(col) / F.lit(width)).cast("int")


ANALYST_SEGMENTS = ("AUTOMOBILE", "BUILDING")
ANALYST_BAND = 1000.0


def reference_matrix(mask_key: str = MASK_PEPPER) -> GrantMatrix:
    """The reference's grant matrix re-expressed over this engine's
    tables, plus a masked analyst role (the modern column/row-level
    half of C9).

    - source-agent roles own their staging tables
      (consumer.sql:91-92 / corporate.sql:93-94 grant the cleansing
      and 3NF layers read/write on the source schemas);
    - ``bl_cl`` reads every source table (ON ALL TABLES IN SCHEMA);
    - ``bl_dm`` reads the conformed tables it builds marts from;
    - ``analyst`` gets customer ONLY through a secured view: names
      keyed-masked, balances banded, rows limited to the analyst
      segments.
    """
    m = GrantMatrix()
    m.grant("sa_superstore_consumer", "customer", ("select", "insert", "update"))
    m.grant("sa_superstore_consumer", "orders", ("select", "insert", "update"))
    m.grant("sa_superstore_corporate", "supplier", ("select", "insert", "update"))
    m.grant("sa_superstore_corporate", "part", ("select", "insert", "update"))
    m.grant("bl_cl", "*", ("select", "insert", "update", "delete"))
    for t in ("customer", "orders", "lineitem", "supplier", "part", "nation", "region"):
        m.grant("bl_dm", t, "select")
    m.grant(
        "analyst",
        "customer",
        "select",
        ViewPolicy(
            columns=(
                "c_custkey",
                ("name_masked", lambda: keyed_mask("c_name", mask_key)),
                "c_mktsegment",
                ("acctbal_band", lambda: band("c_acctbal", ANALYST_BAND)),
            ),
            row_filter=lambda: F.col("c_mktsegment").isin(*ANALYST_SEGMENTS),
        ),
    )
    # analyst also reads orders through a secured view (the BI layer's
    # fact page): comment hidden, totals banded, pending orders
    # filtered out by RLS; o_custkey passes through so the view stays
    # joinable to the secured customer view
    m.grant(
        "analyst",
        "orders",
        "select",
        ViewPolicy(
            columns=(
                "o_orderkey",
                "o_custkey",
                "o_orderdate",
                "o_orderpriority",
                "o_orderstatus",
                ("total_band", lambda: band("o_totalprice", ANALYST_BAND)),
            ),
            row_filter=lambda: F.col("o_orderstatus").isin("O", "F"),
        ),
    )
    return m


def secured_customers_analyst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query for C9: the analyst role's secured view of
    customer — privilege-gated, name keyed-masked, balance banded,
    rows filtered to the granted segments. The row filter is an
    ordinary pushed-down predicate and every mask is a codegen'd
    expression: security costs one projection."""
    return reference_matrix().secured_load(spark, sf_dir, "analyst", "customer")


_SEGS = ", ".join(f"'{s}'" for s in ANALYST_SEGMENTS)

SECURED_CUSTOMERS_ANALYST_ORACLE = f"""
    SELECT c_custkey,
           md5('{MASK_PEPPER}|' || c_name) AS name_masked,
           c_mktsegment,
           CAST(FLOOR(c_acctbal / {ANALYST_BAND}) AS INTEGER) AS acctbal_band
    FROM customer
    WHERE c_mktsegment IN ({_SEGS})
"""


# --- parameterized secured view (BI slicer analogue) -----------------

SLICE_YEAR = ("1995-01-01", "1995-12-31")
SLICE_PRIORITIES = ["1-URGENT", "2-HIGH"]


def secured_orders_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Power BI drill-through page as a plan: the analyst role's
    secured orders view, sliced by the year + priority parameters a
    report page would bind, aggregated to the monthly trend the
    reference's BI layer charts (Final Task docx §Benefits: demand
    over time by priority). The slicer values here are the fixed
    driver bindings; callers pass any others through ``slicer_load``.

    Plan shape (asserted in tests/test_security.py): both slicer
    predicates AND the policy's RLS predicate reach the parquet
    scan's PushedFilters — parameterized security costs nothing at
    100 TB; the banded measure is one codegen'd expression."""
    df = reference_matrix().slicer_load(
        spark,
        sf_dir,
        "analyst",
        "orders",
        {"o_orderdate": SLICE_YEAR, "o_orderpriority": SLICE_PRIORITIES},
    )
    return (
        df.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.col("o_orderpriority"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("total_band").alias("sum_total_band"),
        )
        .orderBy("order_month", "o_orderpriority")
    )


_SLICE_PRIOS = ", ".join(f"'{p}'" for p in SLICE_PRIORITIES)

SECURED_ORDERS_SLICE_ORACLE = f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice / {ANALYST_BAND}) AS INTEGER)) AS BIGINT)
               AS sum_total_band
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_orderdate BETWEEN DATE '{SLICE_YEAR[0]}' AND DATE '{SLICE_YEAR[1]}'
      AND o_orderpriority IN ({_SLICE_PRIOS})
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


# --- right-to-erasure cascade (privacy governance) -------------------

# deterministic erasure request set: ~1/16 of parties, derived from a
# content hash so the "requests" are stable across runs and engines
ERASE_HEX = "1"


def _erasure_requests(c: DataFrame) -> DataFrame:
    return c.filter(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1) == ERASE_HEX
    ).select("c_custkey")


def gdpr_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure (GDPR art. 17) propagated through the
    warehouse lineage: an erasure-request keyset removes the party
    row AND every downstream fact derived from it — orders of erased
    customers, line items of erased orders — then reports what
    SURVIVES per market segment (the audit evidence a DPO signs off
    on). The reference's grant matrix gates who may read party data;
    erasure is the matching write-side obligation on the same
    lineage (customer -> orders -> lineitem).

    Plan: the request set rides ``broadcast()`` into two LEFT-ANTI
    joins (customer, orders) — an erasure batch is tiny relative to
    the corpus, so neither big table shuffles for it. Line items
    cascade via a LEFT-SEMI join against the surviving orders' keys:
    that join shuffles on orderkey — unavoidable, because the
    surviving-order set is corpus-sized — and AQE plans it as a
    normal equi-join. One final star aggregation groups the
    survivors by segment. Nothing is rewritten twice: each table is
    scanned once, and the anti/semi joins prune BEFORE the wide
    aggregation join.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    erase = _erasure_requests(c)
    kept_c = c.join(F.broadcast(erase), "c_custkey", "left_anti")
    kept_o = o.join(
        F.broadcast(erase.withColumnRenamed("c_custkey", "o_custkey")),
        "o_custkey",
        "left_anti",
    )
    kept_li = li.join(
        kept_o.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    )

    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_order = kept_li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_li"), rev.alias("rev")
    )
    joined = (
        kept_o.join(per_order, kept_o.o_orderkey == per_order.l_orderkey)
        .join(kept_c, kept_o.o_custkey == kept_c.c_custkey)
    )
    return joined.groupBy("c_mktsegment").agg(
        F.countDistinct("c_custkey").alias("customers_kept"),
        F.countDistinct("o_orderkey").alias("orders_kept"),
        F.sum("n_li").cast("bigint").alias("lineitems_kept"),
        F.round(F.sum("rev"), 2).alias("revenue_kept"),
    )


GDPR_ERASURE_CASCADE_ORACLE = f"""
    WITH erase AS (
        SELECT c_custkey FROM customer
        WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) = '{ERASE_HEX}'
    ), kept_c AS (
        SELECT * FROM customer WHERE c_custkey NOT IN (SELECT * FROM erase)
    ), kept_o AS (
        SELECT * FROM orders WHERE o_custkey NOT IN (SELECT * FROM erase)
    ), per_order AS (
        SELECT l_orderkey, COUNT(*) AS n_li,
               SUM(l_extendedprice * (1 - l_discount)) AS rev
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM kept_o)
        GROUP BY l_orderkey
    )
    SELECT c.c_mktsegment,
           COUNT(DISTINCT c.c_custkey) AS customers_kept,
           COUNT(DISTINCT o.o_orderkey) AS orders_kept,
           CAST(SUM(p.n_li) AS BIGINT) AS lineitems_kept,
           ROUND(SUM(p.rev), 2) AS revenue_kept
    FROM kept_o o
    JOIN per_order p ON o.o_orderkey = p.l_orderkey
    JOIN kept_c c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
"""


# --- k-anonymity / l-diversity audit ----------------------------------

K_ANON_THRESHOLD = 5
ACCTBAL_BAND = 1000  # acctbal generalization band width


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy re-identification audit BEFORE data release — the
    check a warehouse must run on any extract the secured views
    (above) don't fully mask: a row is k-anonymous when at least k
    rows share its quasi-identifier (QI) combination, so an attacker
    who knows someone's QIs can't narrow below k candidates.

    QIs here: (c_mktsegment, c_nationkey, acctbal band of width
    {ACCTBAL_BAND}). Per QI equivalence class this reports the class
    size (its k), its l-DIVERSITY (distinct sensitive values — the
    exact balance — inside the class: a class can be k-anonymous yet
    leak the sensitive value when all members share it), whether it
    violates k >= {K_ANON_THRESHOLD}, and whether one step of
    GENERALIZATION (dropping the acctbal band, the standard
    hierarchy climb) repairs the violation — the exact decision a
    release pipeline automates.

    Scale shape: two groupBys (QI-level, then generalized level —
    the second is a rollup of the first's partials), one
    classes-sized broadcast-able join back; no windows, no
    row-scale collects. Everything is exact integer arithmetic.
    """
    cust = load(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / ACCTBAL_BAND).cast("long")
    qi = cust.select(
        "c_mktsegment",
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
        band.alias("acctbal_band"),
        "c_acctbal",
    )
    classes = qi.groupBy("c_mktsegment", "c_nationkey", "acctbal_band").agg(
        F.count(F.lit(1)).alias("k_size"),
        F.countDistinct("c_acctbal").alias("l_diversity"),
    )
    general = qi.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("k_general")
    )
    return (
        classes.join(general, ["c_mktsegment", "c_nationkey"])
        .select(
            "c_mktsegment",
            "c_nationkey",
            "acctbal_band",
            F.col("k_size").cast("bigint").alias("k_size"),
            F.col("l_diversity").cast("bigint").alias("l_diversity"),
            F.col("k_general").cast("bigint").alias("k_general"),
            (F.col("k_size") < K_ANON_THRESHOLD).cast("int").alias("violates_k"),
            (
                (F.col("k_size") < K_ANON_THRESHOLD)
                & (F.col("k_general") >= K_ANON_THRESHOLD)
            ).cast("int").alias("fixed_by_generalization"),
        )
    )


K_ANONYMITY_AUDIT_ORACLE = f"""
    WITH qi AS (
        SELECT c_mktsegment,
               CAST(c_nationkey AS INTEGER) AS c_nationkey,
               CAST(FLOOR(c_acctbal / {ACCTBAL_BAND}) AS BIGINT)
                   AS acctbal_band,
               c_acctbal
        FROM customer
    ), classes AS (
        SELECT c_mktsegment, c_nationkey, acctbal_band,
               COUNT(*) AS k_size,
               COUNT(DISTINCT c_acctbal) AS l_diversity
        FROM qi GROUP BY 1, 2, 3
    ), general AS (
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS k_general
        FROM qi GROUP BY 1, 2
    )
    SELECT c.c_mktsegment, c.c_nationkey, c.acctbal_band,
           CAST(c.k_size AS BIGINT) AS k_size,
           CAST(c.l_diversity AS BIGINT) AS l_diversity,
           CAST(g.k_general AS BIGINT) AS k_general,
           CAST(CASE WHEN c.k_size < {K_ANON_THRESHOLD} THEN 1 ELSE 0 END
               AS INTEGER) AS violates_k,
           CAST(CASE WHEN c.k_size < {K_ANON_THRESHOLD}
                      AND g.k_general >= {K_ANON_THRESHOLD}
                THEN 1 ELSE 0 END AS INTEGER) AS fixed_by_generalization
    FROM classes c
    JOIN general g USING (c_mktsegment, c_nationkey)
"""
