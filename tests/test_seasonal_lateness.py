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


def test_nearest_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "nearest_purchase_to_error", sf_dir)


def test_nearest_is_truly_nearest(spark, sf_dir):
    """Spot-verify against brute force: for every error, no purchase
    of the same user is strictly closer than the chosen one."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.events import (
        nearest_purchase_to_error,
    )

    out = {r["error_id"]: r for r in nearest_purchase_to_error(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.col("ts").cast("long").alias("sec")
    )
    rows = ev.collect()
    purchases = {}
    errors = []
    for r in rows:
        if r["event_type"] == "purchase":
            purchases.setdefault(r["user_id"], []).append((r["sec"], r["event_id"]))
        elif r["event_type"] == "error":
            errors.append(r)
    assert len(out) == len(errors)
    for e in errors:
        got = out[e["event_id"]]
        ps = purchases.get(e["user_id"], [])
        if not ps:
            assert got["purchase_id"] is None
            continue
        best = min(abs(s - e["sec"]) for s, _ in ps)
        assert abs(got["gap_s"]) == best
