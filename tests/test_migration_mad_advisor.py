"""ABC migration / MAD anomalies / partition advisor — oracle parity
+ invariants."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

NEW_QUERIES = ["abc_migration", "daily_revenue_anomalies", "partition_advisor"]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_abc_migration_partitions_catalog(spark, sf_dir):
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.retail import abc_migration

    rows = abc_migration(spark, sf_dir).collect()
    assert rows
    total = sum(r["n_parts"] for r in rows)
    sold_parts = (
        load(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    )
    assert total == sold_parts  # every ever-sold part appears once
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    classes = {"A", "B", "C", "N"}
    for r in rows:
        assert r["class_h1"] in classes and r["class_h2"] in classes
    # 'N' only appears on one side at a time (a part absent from
    # both halves was never sold and cannot appear)
    assert not any(r["class_h1"] == "N" and r["class_h2"] == "N" for r in rows)


def test_mad_outliers_are_extreme(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.observability import (
        MAD_Z,
        daily_revenue_anomalies,
    )

    rows = daily_revenue_anomalies(spark, sf_dir).collect()
    for r in rows:
        assert abs(r["robust_z"]) > MAD_Z
        # flagged days really are far from the median
        assert r["revenue"] != r["median_revenue"]


def test_advisor_verdicts(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.observability import (
        partition_advisor,
    )

    rows = {r["candidate"]: r for r in partition_advisor(spark, sf_dir).collect()}
    assert len(rows) == 5
    # status has only 3 values -> below the pruning sweet spot
    assert rows["o_orderstatus"]["partitionable"] == 0
    # year/month sit squarely in the sweet spot at every test SF
    assert rows["order_year"]["partitionable"] == 1
    assert rows["order_month"]["partitionable"] == 1
    for r in rows.values():
        assert r["max_rows"] >= r["mean_rows"] - 1e-9
        assert 0 < r["top_value_share"] <= 1
