"""Oracle parity + invariants for the exact set-similarity join,
incremental MV maintenance, and embedding standardization."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle, normalize

NEW_QUERIES = [
    "jaccard_prefix_pairs",
    "incremental_mv_refresh",
    "embedding_standardize",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_prefix_filter_recall_is_exactly_one(spark, sf_dir):
    """The prefix-filter candidate set must contain EVERY pair the
    brute-force all-pairs Jaccard finds — recall 1.0, not approx
    (this is the exactness theorem, checked mechanically against a
    Spark-side brute-force on the token sets)."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.functions.text import tokens
    from global_superstore_data_warehouse_spark.plans.setsim import (
        TAU,
        jaccard_prefix_pairs,
    )

    got = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_prefix_pairs(spark, sf_dir).collect()
    }

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.array_distinct(F.filter(tokens("text"), lambda t: t != "")).alias("ts"),
    ).withColumn("n", F.size("ts"))
    a = toks.select(
        F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"), F.col("n").alias("na")
    )
    b = toks.select(
        F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"), F.col("n").alias("nb")
    )
    sh = F.size(F.array_intersect("ts_a", "ts_b"))
    brute = {
        (r["doc_a"], r["doc_b"])
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("jac", sh / (F.col("na") + F.col("nb") - sh))
        .filter(F.col("jac") >= TAU)
        .select("doc_a", "doc_b")
        .collect()
    }
    assert got == brute


def test_incremental_refresh_equals_full_recompute(spark, sf_dir):
    """merge(state_old, delta) must equal the one-shot direct
    aggregation (float-tolerant compare — the hash oracle pins the
    bit-stable two-phase form; this pins the semantic IVM claim)."""
    import pandas as pd

    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.pipeline import (
        incremental_mv_refresh,
    )

    got = normalize(incremental_mv_refresh(spark, sf_dir).toPandas())
    orders = load(spark, sf_dir, "orders")
    full = normalize(
        orders.groupBy(
            F.year("o_orderdate").alias("order_year"), F.col("o_orderpriority")
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice") / F.count(F.lit(1)), 6).alias("avg_price"),
        )
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, full, check_dtype=False, rtol=1e-6, atol=1e-6)


def test_standardized_dims_are_zero_mean_unit_var(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.embeddings import (
        embedding_standardize,
    )

    stats = (
        embedding_standardize(spark, sf_dir)
        .groupBy("dim")
        .agg(F.avg("z").alias("mu"), F.stddev_samp("z").alias("sigma"))
        .collect()
    )
    assert len(stats) == 64
    for r in stats:
        assert abs(r["mu"]) < 1e-4
        assert abs(r["sigma"] - 1.0) < 1e-4
