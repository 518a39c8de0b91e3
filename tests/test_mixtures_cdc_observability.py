"""Oracle parity + semantic properties for the training-mix, CDC, and
observability operators."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

NEW_QUERIES = [
    "temperature_mixture_sample",
    "leakage_safe_splits",
    "training_shards",
    "cdc_apply_orders",
    "join_skew_report",
    "psi_event_drift",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_temperature_sample_flattens_toward_uniform(spark, sf_dir):
    """Post-sample source shares must be strictly flatter than
    pre-sample shares: the largest source's share shrinks, and the
    keep rate decreases monotonically with source size."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.mixtures import (
        temperature_mixture_sample,
    )

    pre = {
        r["source"]: r["n"]
        for r in load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out = temperature_mixture_sample(spark, sf_dir)
    post = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rates = {
        r["source"]: r["keep_permille"]
        for r in out.select("source", "keep_permille").distinct().collect()
    }
    # monotone: bigger source -> rate no larger
    ordered = sorted(pre.items(), key=lambda kv: kv[1])
    for (s_small, _), (s_big, _) in zip(ordered, ordered[1:]):
        if s_small in rates and s_big in rates:
            assert rates[s_big] <= rates[s_small]
    # the dominant source's share must not grow
    top = max(pre, key=pre.get)
    pre_share = pre[top] / sum(pre.values())
    post_share = post.get(top, 0) / max(1, sum(post.values()))
    assert post_share <= pre_share + 0.02


def test_leakage_splits_never_split_a_content_group(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.mixtures import (
        leakage_safe_splits,
    )

    out = leakage_safe_splits(spark, sf_dir)
    spans = (
        out.groupBy("content_key")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
    )
    assert spans.count() == 0
    # all three splits exist and train dominates
    shares = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(shares) == {"train", "val", "test"}
    assert shares["train"] > shares["val"] and shares["train"] > shares["test"]


def test_training_shards_cover_all_docs_and_balance(spark, sf_dir):
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.mixtures import (
        SHARDS,
        training_shards,
    )

    out = training_shards(spark, sf_dir).collect()
    n_total = load(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in out) == n_total
    assert len(out) == SHARDS  # every shard non-empty at sf0.001+
    counts = [r["n_docs"] for r in out]
    assert max(counts) <= 3 * (n_total / SHARDS)  # no pathological shard


def test_cdc_apply_semantics(spark, sf_dir):
    """Deleted keys vanish; updated keys carry the bumped price; keys
    with update-then-delete are deleted (ordering respected)."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.cdc import cdc_apply_orders

    out = cdc_apply_orders(spark, sf_dir)
    # every key divisible by 11 got a trailing tombstone
    assert out.filter(F.col("o_orderkey") % 11 == 0).count() == 0
    # updated-but-not-deleted keys show the update
    upd = out.filter((F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 11 != 0))
    assert upd.count() > 0
    assert upd.filter(F.col("last_op") != "U").count() == 0
    # untouched keys retain snapshot values exactly
    base = load(spark, sf_dir, "orders")
    untouched = out.filter(
        (F.col("o_orderkey") % 7 != 0) & (F.col("o_orderkey") % 11 != 0)
    )
    joined = untouched.alias("a").join(base.alias("b"), "o_orderkey")
    assert (
        joined.filter(F.col("a.o_totalprice") != F.col("b.o_totalprice")).count() == 0
    )
    # version_count: snapshot/insert contributes 1, update +1, delete +1
    assert out.filter(F.col("version_count") < 1).count() == 0


def test_join_skew_report_consistency(spark, sf_dir):
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.observability import (
        join_skew_report,
    )

    row = join_skew_report(spark, sf_dir).collect()[0]
    li = load(spark, sf_dir, "lineitem")
    assert row["total_rows"] == li.count()
    assert row["n_keys"] == li.select("l_partkey").distinct().count()
    assert row["max_rows"] >= row["p99_rows"] >= 0
    assert row["skew_ratio"] >= 1.0
    assert 0 < row["top_key_share"] <= 1.0


def test_psi_terms_bounded_and_signed(spark, sf_dir):
    """PSI terms are finite; the per-type shares on each side sum
    to ~1; a term is positive iff the shares differ."""
    from global_superstore_data_warehouse_spark.plans.observability import (
        psi_event_drift,
    )

    rows = psi_event_drift(spark, sf_dir).collect()
    assert rows, "no event types"
    assert abs(sum(r["p_weekday"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["q_weekend"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r["psi_term"] >= 0.0  # (p-q)ln(p/q) is always >= 0
        assert r["psi_term"] < 10.0
