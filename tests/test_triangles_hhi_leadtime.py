"""Triangle census / supplier HHI / fulfillment lead time — oracle
parity + structural invariants."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

NEW_QUERIES = [
    "copurchase_triangles",
    "supplier_concentration",
    "fulfillment_lead_time",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_triangle_census_bounds(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.linkrank import (
        copurchase_triangles,
    )

    r = copurchase_triangles(spark, sf_dir).collect()[0]
    assert r["n_nodes"] > 0 and r["n_edges"] > 0
    # every triangle contains 3 wedges; 3T <= wedges always
    assert 0 <= 3 * r["n_triangles"] <= r["n_wedges"]
    assert 0.0 <= r["clustering_coeff"] <= 1.0
    # wedge identity: sum C(deg,2) >= edges for any graph with a
    # node of degree >= 2
    assert r["n_wedges"] >= r["n_edges"] - r["n_nodes"]


def test_triangles_match_brute_force(spark, sf_dir):
    """Degree-ordered count == brute-force i<j<k enumeration."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.linkrank import (
        copurchase_triangles,
    )

    li = load(spark, sf_dir, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct()
    a, b = basket.alias("a"), basket.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    brute = (
        e1.join(e2, F.col("e1.u") == F.col("e2.u"))
        .filter(F.col("e1.v") < F.col("e2.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.v")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .count()
    )
    got = copurchase_triangles(spark, sf_dir).collect()[0]["n_triangles"]
    assert got == brute


def test_hhi_bounds(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.retail import (
        supplier_concentration,
    )

    rows = supplier_concentration(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # HHI lives in [1/n, 1]
        assert 1.0 / r["n_suppliers"] - 1e-6 <= r["hhi"] <= 1.0 + 1e-6
        assert r["part_revenue"] > 0


def test_lead_time_ordering(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.retail import (
        fulfillment_lead_time,
    )

    rows = fulfillment_lead_time(spark, sf_dir).collect()
    assert len(rows) == 5  # all priorities present
    for r in rows:
        assert r["median_days"] <= r["p95_days"] <= r["max_days"]
