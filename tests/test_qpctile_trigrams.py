"""Quality percentiles + 3-step path mining — oracle parity +
invariants."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

NEW_QUERIES = ["quality_percentiles", "event_trigrams"]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_percentiles_per_source_span(spark, sf_dir):
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.textops import (
        quality_percentiles,
    )

    out = quality_percentiles(spark, sf_dir)
    assert out.count() == load(spark, sf_dir, "documents").count()
    per_source = out.groupBy("source").agg(
        F.min("source_pctile").alias("lo"), F.max("source_pctile").alias("hi")
    )
    for r in per_source.collect():
        assert r["lo"] == 0.0  # percent_rank starts at 0 per partition
        assert r["hi"] <= 1.0
    # monotone: higher score never gets a lower percentile in-source
    joined = out.alias("a").join(
        out.alias("b"),
        (F.col("a.source") == F.col("b.source"))
        & (F.col("a.quality_score") > F.col("b.quality_score"))
        & (F.col("a.source_pctile") < F.col("b.source_pctile")),
    )
    assert joined.count() == 0


def test_trigrams_consistent_with_transitions(spark, sf_dir):
    """Total 3-path occurrences = sum over users of max(0, n_u - 2)."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.events import event_trigrams

    rows = event_trigrams(spark, sf_dir).collect()
    assert rows
    assert all(" > " in r["path"] for r in rows)
    counts = [r["n_paths"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert counts == sorted(counts, reverse=True)
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total_paths = sum(max(0, r["n"] - 2) for r in per_user)
    # the top-K is a subset; its total can't exceed all paths
    assert sum(counts) <= total_paths
