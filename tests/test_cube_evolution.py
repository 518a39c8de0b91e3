"""CUBE grouping sets + schema-evolution union — oracle parity +
invariants."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

NEW_QUERIES = ["sales_cube", "schema_evolution_union"]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_cube_subtotals_consistent(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.stats import sales_cube

    rows = sales_cube(spark, sf_dir).collect()
    grand = [r for r in rows if r["g_priority"] == 1 and r["g_status"] == 1]
    assert len(grand) == 1
    detail = [r for r in rows if r["g_priority"] == 0 and r["g_status"] == 0]
    assert grand[0]["n_orders"] == sum(r["n_orders"] for r in detail)
    # each one-dim margin also sums to the grand total
    for flag in ("g_priority", "g_status"):
        margin = [
            r
            for r in rows
            if r[flag] == 1 and r["g_priority"] + r["g_status"] == 1
        ]
        assert grand[0]["n_orders"] == sum(r["n_orders"] for r in margin)
    # the 'ALL' label appears exactly on subtotal rows
    for r in rows:
        assert (r["priority"] == "ALL") == (r["g_priority"] == 1)
        assert (r["status"] == "ALL") == (r["g_status"] == 1)


def test_evolution_fill_rates(spark, sf_dir):
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.conformance import (
        schema_evolution_union,
    )

    rows = {r["feed_version"]: r for r in schema_evolution_union(spark, sf_dir).collect()}
    assert set(rows) == {"v1", "v2"}
    assert rows["v1"]["priority_fill_rate"] == 0.0  # column absent pre-evolution
    assert rows["v2"]["priority_fill_rate"] == 1.0
    total = rows["v1"]["n_rows"] + rows["v2"]["n_rows"]
    assert total == load(spark, sf_dir, "orders").count()  # nothing dropped


def test_fastss_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "fuzzy_match_fastss", sf_dir)


def test_fastss_equals_unblocked_join(spark, sf_dir):
    """Deletion-neighborhood candidates must find every pair the
    brute-force (unblocked) Levenshtein join finds — recall 1.0 by
    theorem, verified."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.cleansing import (
        fuzzy_match_fastss,
    )

    got = sorted(
        (r["id_a"], r["id_b"])
        for r in fuzzy_match_fastss(spark, sf_dir).collect()
    )
    cust = load(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("id_a"), F.col("c_name").alias("na")
    )
    b = cust.filter(F.col("c_custkey") % 2 == 1).select(
        F.col("c_custkey").alias("id_b"), F.col("c_name").alias("nb")
    )
    brute = sorted(
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.levenshtein("na", "nb") <= 1)
        .collect()
    )
    assert got == brute


@pytest.mark.parametrize("name", ["order_day_islands", "cumulative_new_users"])
def test_islands_adoption_match_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_islands_partition_the_calendar(spark, sf_dir):
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.windows import (
        order_day_islands,
    )

    rows = sorted(
        order_day_islands(spark, sf_dir).collect(), key=lambda r: r["start_day"]
    )
    assert rows
    n_active_days = (
        load(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate").alias("d"))
        .distinct()
        .count()
    )
    assert sum(r["n_days"] for r in rows) == n_active_days  # exact partition
    for a, b in zip(rows, rows[1:]):
        assert a["gap_to_next_days"] >= 2  # islands are maximal runs
        assert a["end_day"] < b["start_day"]
    assert rows[-1]["gap_to_next_days"] is None


def test_adoption_curve_monotone_and_complete(spark, sf_dir):
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.windows import (
        cumulative_new_users,
    )

    rows = sorted(
        cumulative_new_users(spark, sf_dir).collect(), key=lambda r: r["day"]
    )
    assert rows
    totals = [r["total_users"] for r in rows]
    assert totals == sorted(totals)
    assert totals[-1] == (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r["new_users"] for r in rows) == totals[-1]
