"""Interval-overlap join / order cadence / revenue cohorts — oracle
parity + structural invariants, plus a property test of the
bucket-blocked overlap join against the naive inequality join."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

NEW_QUERIES = ["session_maintenance_overlap", "order_cadence", "revenue_cohorts"]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


@pytest.mark.parametrize("width", [7, 60, 3600])
def test_overlap_join_equals_naive(spark, width):
    """Bucket-blocked overlap join == naive inequality join, for any
    bucket width, on adversarial intervals (instant, nested,
    touching, disjoint, negative epochs)."""
    from global_superstore_data_warehouse_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 6), (3, 10, 11), (4, -7200, -3600), (5, 100, 101), (6, 0, 10)],
        "lid int, l_start long, l_end long",
    )
    right = spark.createDataFrame(
        [(1, 9, 12), (2, 0, 100), (3, 10, 20), (4, -7000, -6999), (5, -1, 1)],
        "rid int, r_start long, r_end long",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "l_start", "l_end", "r_start", "r_end", width
        ).collect()
    )
    naive = sorted(
        (r["lid"], r["rid"])
        for r in left.join(
            right,
            (F.col("l_start") < F.col("r_end")) & (F.col("r_start") < F.col("l_end")),
        ).collect()
    )
    assert got == naive
    assert len(got) == len(set(got))  # responsibility: no dup pairs


def test_overlap_counts_consistent(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.events import (
        session_maintenance_overlap,
    )

    rows = session_maintenance_overlap(spark, sf_dir).collect()
    assert rows
    assert any(r["n_sessions"] > 0 for r in rows)
    for r in rows:
        assert 0 <= r["n_users"] <= r["n_sessions"]


def test_cadence_positive_gaps(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.retail import order_cadence

    rows = order_cadence(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_gaps"] > 0
        assert 0 <= r["mean_gap_days"] <= r["max_gap_days"]
        assert r["median_gap_days"] <= r["max_gap_days"]


def test_cohort_cumulative_monotone(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.retail import revenue_cohorts

    rows = revenue_cohorts(spark, sf_dir).orderBy("cohort", "month_index").collect()
    assert rows
    last = {}
    for r in rows:
        assert r["month_index"] >= 0
        prev = last.get(r["cohort"], 0.0)
        assert r["cum_revenue"] >= prev - 1e-6  # running sum never decreases
        last[r["cohort"]] = r["cum_revenue"]
