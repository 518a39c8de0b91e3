"""Seasonal index + lateness profile — oracle parity + invariants."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

NEW_QUERIES = ["seasonal_index", "lateness_profile"]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_seasonal_index_averages_to_one(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.retail import seasonal_index

    out = seasonal_index(spark, sf_dir)
    means = out.groupBy("o_orderpriority").agg(
        F.avg("seasonal_index").alias("m"), F.count(F.lit(1)).alias("n")
    )
    rows = means.collect()
    assert rows
    for r in rows:
        assert r["n"] == 12  # every month present
        assert abs(r["m"] - 1.0) < 1e-4  # index averages to 1 by construction
    assert out.filter(F.col("seasonal_index") <= 0).count() == 0


def test_lateness_bounds(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.events import lateness_profile

    rows = lateness_profile(spark, sf_dir).collect()
    assert rows
    # the jittered arrival order must actually produce late events
    assert any(r["n_late"] > 0 for r in rows)
    for r in rows:
        assert 0 <= r["n_late"] <= r["n_events"]
        assert 0.0 <= r["late_share"] <= 1.0
        assert r["p50_late_s"] <= r["p95_late_s"] <= r["max_late_s"]
