"""Oracle-parity tests for the cleansing layer (SURVEY §2.3/§2.5/§2.7)."""

import pytest

from tests.conftest import assert_matches_oracle

CLEANSING_QUERIES = [
    "clean_dirty_ids",
    "split_names",
    "parse_dates",
    "distinct_union_brands",
    "union_all_segments",
    "new_customers",
    "merged_entities",
    "duplicate_orders",
    "scd1_upsert_customers",
    "case_insensitive_segments",
    "events_json_props",
]


@pytest.mark.parametrize("name", CLEANSING_QUERIES)
def test_cleansing_matches_oracle(spark, duck, name, sf_dir):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_semi_and_except_match_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "customers_with_orders", sf_dir)
    assert_matches_oracle(spark, duck, "types_missing_from_sample", sf_dir)
    assert_matches_oracle(spark, duck, "types_in_both_halves", sf_dir)
    assert_matches_oracle(spark, duck, "fuzzy_name_match", sf_dir)


def test_scd1_explicit_source_null_overwrites(spark):
    """ADVICE r1: ON CONFLICT DO UPDATE semantics — a matched source
    row's explicit NULL must overwrite the target value (the round-1
    coalesce kept the old value)."""
    from global_superstore_data_warehouse_spark.operators.merge import scd1_upsert

    target = spark.createDataFrame(
        [(1, "old", 10.0), (2, "keep", 20.0)], "k int, name string, bal double"
    )
    source = spark.createDataFrame(
        [(1, None, 11.0), (3, "new", 30.0)], "k int, name string, bal double"
    )
    out = {
        r.k: (r.name, r.bal, r.is_updated)
        for r in scd1_upsert(target, source, ["k"], ["name", "bal"]).collect()
    }
    assert out[1] == (None, 11.0, True)  # explicit NULL wins
    assert out[2] == ("keep", 20.0, False)
    assert out[3] == ("new", 30.0, False)


def test_quality_rules_are_lazy(spark, sf_dir):
    """ADVICE r1: building dq_report's DataFrame must not run jobs —
    the rules are plans, executed only when the report is acted on."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.operators.quality import (
        referential_rule,
        uniqueness_rule,
    )

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    # snapshot AFTER the loads: parquet schema inference may run its
    # own footer-reading job, which is not what this test polices
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    fk = referential_rule(orders, customer, "o_custkey", "c_custkey", "fk")
    uq = uniqueness_rule(orders, ["o_orderkey"], "uq")
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "rule construction ran Spark jobs"
    # ...and they still compute the right thing when executed
    rows = {r.rule_name: (r.violations, r.total) for r in fk.unionByName(uq).collect()}
    n = orders.count()
    assert rows["fk"] == (0, n)
    assert rows["uq"] == (0, n)
