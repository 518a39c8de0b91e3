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
