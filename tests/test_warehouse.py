"""Oracle-parity + invariant tests for the 3NF warehouse layer."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

WAREHOUSE_QUERIES = [
    "surrogate_keys_customers",
    "dim_market",
    "dim_geography",
    "dim_address",
    "dim_product_hierarchy",
    "dim_date",
]


@pytest.mark.parametrize("name", WAREHOUSE_QUERIES)
def test_warehouse_matches_oracle(spark, duck, name, sf_dir):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_surrogate_keys_distributed_equals_window(spark, sf_dir):
    """The distributed two-phase surrogate-key path must be
    bit-identical to the global-window path."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.operators.keys import (
        add_surrogate_key,
        add_surrogate_key_distributed,
    )

    cust = load(spark, sf_dir, "customer").select("c_custkey")
    a = add_surrogate_key(cust, ["c_custkey"], name="sk").orderBy("c_custkey").collect()
    b = (
        add_surrogate_key_distributed(cust, ["c_custkey"], name="sk", num_partitions=7)
        .orderBy("c_custkey")
        .collect()
    )
    assert a == b


def test_dims_have_default_member_and_unique_keys(spark, sf_dir):
    """Reference invariants (FIXTURES.md §4): every dim carries the
    -1 member; surrogate + natural keys are duplicate-free."""
    from global_superstore_data_warehouse_spark.operators.dedup import check_duplicates
    from global_superstore_data_warehouse_spark.plans import warehouse

    for fn, id_col, nk in [
        (warehouse.dim_market, "market_id", "market"),
        (warehouse.dim_geography, "country_id", "country"),
    ]:
        dim = fn(spark, sf_dir)
        assert dim.filter(F.col(id_col) == -1).count() == 1
        assert check_duplicates(dim, [id_col]).count() == 0
        assert check_duplicates(dim, [nk]).count() == 0
