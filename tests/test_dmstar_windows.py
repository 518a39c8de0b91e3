"""DM star join (J8), QA rowcounts (C8), SCD2 product/employee dims,
and window analytics — oracle parity + structural invariants."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize(
    "name",
    [
        "scd2_products",
        "scd2_employees",
        "order_details_wide",
        "qa_rowcounts",
        "best_month_per_segment",
        "top_employees_per_year",
        "customer_ltv_deciles",
    "rolling_7d_sales",
    ],
)
def test_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_order_details_wide_is_lineitem_grain(spark, sf_dir):
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.dmstar import order_details_wide

    wide = order_details_wide(spark, sf_dir)
    assert wide.count() == load(spark, sf_dir, "lineitem").count()


def test_top_employees_at_most_three_per_year(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.windows import top_employees_per_year

    top = top_employees_per_year(spark, sf_dir)
    bad = top.groupBy("order_year").count().filter(F.col("count") > 3)
    assert bad.count() == 0


def test_dq_report_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "dq_report", sf_dir)


def test_dq_rules_catch_injected_violations(spark, sf_dir):
    """The rule engine must actually count bad rows, not just pass on
    clean data."""
    from pyspark.sql import functions as F

    from global_superstore_data_warehouse_spark.operators.quality import column_rules

    df = spark.range(100).select(
        F.col("id"), F.when(F.col("id") < 7, -1.0).otherwise(1.0).alias("price")
    )
    report = column_rules(df, [("neg_price", F.col("price") < 0)]).collect()
    assert report[0].violations == 7 and report[0].total == 100


def test_qa_duplicates_any_table_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "qa_duplicates_any_table", sf_dir)
