"""Burst dedup / BPE pair counts / doc-length histogram — oracle
parity + structural invariants."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

NEW_QUERIES = ["events_dedup_bursts", "bpe_pair_counts", "doclen_histogram"]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_burst_dedup_covers_all_events(spark, sf_dir):
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.events import (
        events_dedup_bursts,
    )

    out = events_dedup_bursts(spark, sf_dir)
    total = load(spark, sf_dir, "events").count()
    assert out.count() == total  # verdict per event, none dropped
    assert out.select("event_id").distinct().count() == total
    # the first occurrence of every key is never a duplicate: at
    # least one keeper exists per (user, type, value) key
    keys_total = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type", "value")
        .distinct()
        .count()
    )
    keepers = out.filter(F.col("is_dup") == 0).count()
    assert keepers >= keys_total


def test_bpe_pairs_ranked_and_bounded(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.textops import (
        BPE_TOP_PAIRS,
        bpe_pair_counts,
    )

    rows = bpe_pair_counts(spark, sf_dir).orderBy("rank").collect()
    assert 0 < len(rows) <= BPE_TOP_PAIRS
    counts = [r["n_occurrences"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(" " in r["pair"] for r in rows)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_doclen_histogram_shares_sum_to_one(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.textops import doclen_histogram

    out = doclen_histogram(spark, sf_dir)
    sums = out.groupBy("source").agg(F.sum("share").alias("s")).collect()
    assert sums
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-4  # rounded shares per source
    assert out.filter((F.col("len_bucket") < 0)).count() == 0
