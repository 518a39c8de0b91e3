"""Retail analytics — oracle parity + invariants."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

RETAIL_QUERIES = ["market_basket_pairs", "pareto_products", "rfm_segments"]


@pytest.mark.parametrize("name", RETAIL_QUERIES)
def test_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_market_basket_symmetry_and_bounds(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.retail import (
        MIN_SUPPORT,
        market_basket_pairs,
    )

    out = market_basket_pairs(spark, sf_dir)
    rows = out.collect()
    assert rows, "no frequent pairs at this scale"
    pairs = {(r["part_a"], r["part_b"]): r for r in rows}
    for (a, b), r in pairs.items():
        assert (b, a) in pairs  # support is symmetric -> mirror exists
        assert pairs[(b, a)]["support"] == r["support"]
        assert r["support"] >= MIN_SUPPORT
        assert 0 < r["confidence"] <= 1
        assert r["lift"] > 0


def test_pareto_classes_are_monotone(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.retail import pareto_products

    rows = (
        pareto_products(spark, sf_dir)
        .orderBy(F.desc("revenue"), F.asc("l_partkey"))
        .collect()
    )
    shares = [r["cum_share"] for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-6
    order = {"A": 0, "B": 1, "C": 2}
    classes = [order[r["abc_class"]] for r in rows]
    assert classes == sorted(classes)  # A block, then B, then C


def test_rfm_quartiles_balanced(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.retail import rfm_segments

    out = rfm_segments(spark, sf_dir)
    n = out.count()
    for col in ("r_quartile", "f_quartile", "m_quartile"):
        sizes = {r[col]: r["n"] for r in out.groupBy(col).agg(F.count(F.lit(1)).alias("n")).collect()}
        assert set(sizes) == {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1  # ntile guarantee
    assert out.filter(F.length("rfm_code") != 3).count() == 0
    assert n == out.select("o_custkey").distinct().count()
