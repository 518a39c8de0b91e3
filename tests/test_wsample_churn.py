"""Weighted sampling + churn flags — oracle parity + invariants."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

NEW_QUERIES = ["weighted_sample_topk", "churn_flags"]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_weighted_sample_favors_heavy_docs(spark, sf_dir):
    """The E-S sample must over-represent long documents: mean
    n_chars inside the sample > corpus mean (weights = n_chars)."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.mixtures import (
        WSAMPLE_K,
        weighted_sample_topk,
    )

    out = weighted_sample_topk(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == min(
        WSAMPLE_K, load(spark, sf_dir, "documents").count()
    )
    assert len({r["doc_id"] for r in rows}) == len(rows)  # without replacement
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    corpus_mean = (
        load(spark, sf_dir, "documents").agg(F.avg("n_chars")).collect()[0][0]
    )
    assert sample_mean > corpus_mean


def test_weighted_sample_is_deterministic(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.mixtures import (
        weighted_sample_topk,
    )

    a = sorted(r["doc_id"] for r in weighted_sample_topk(spark, sf_dir).collect())
    b = sorted(r["doc_id"] for r in weighted_sample_topk(spark, sf_dir).collect())
    assert a == b


def test_churn_partitions_customers(spark, sf_dir):
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.retail import churn_flags

    rows = churn_flags(spark, sf_dir).collect()
    assert rows
    total = sum(r["n_customers"] for r in rows)
    assert total == load(spark, sf_dir, "customer").count()
    for r in rows:
        assert 0 <= r["n_churned"] + r["n_never_ordered"] <= r["n_customers"]
        assert 0.0 <= r["churn_rate"] <= 1.0
