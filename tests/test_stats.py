"""Corpus stats / sampling / rollup — oracle parity + determinism."""

import pytest

from tests.conftest import assert_matches_oracle

STATS_QUERIES = [
    "vocab_topk",
    "tfidf_topk_terms",
    "deterministic_sample",
    "stratified_sample",
    "priority_price_quantiles",
    "sales_rollup",
    "sales_pivot",
    "lineitem_measures_unpivot",
    "winsorized_segment_balances",
]


@pytest.mark.parametrize("name", STATS_QUERIES)
def test_stats_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_sample_stable_under_repartition(spark, sf_dir):
    """md5-bucket sampling must select identical rows regardless of
    physical partitioning (the property rand(seed) lacks)."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.stats import deterministic_sample

    base = sorted(r.doc_id for r in deterministic_sample(spark, sf_dir).collect())
    docs = load(spark, sf_dir, "documents").repartition(17)
    docs.createOrReplaceTempView("___tmp")
    # same filter over a differently-partitioned source
    from global_superstore_data_warehouse_spark.plans.stats import SAMPLE_PCT, _md5_bucket
    from pyspark.sql import functions as F

    again = sorted(
        r.doc_id
        for r in docs.filter(_md5_bucket(F.col("doc_id")) < SAMPLE_PCT).collect()
    )
    assert base == again
