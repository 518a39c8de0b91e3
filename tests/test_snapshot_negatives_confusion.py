"""Oracle parity + invariants: SCD2 snapshot diff, hard-negative
mining, language-ID confusion matrix."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle

NEW_QUERIES = [
    "scd2_snapshot_diff",
    "hard_negative_mining",
    "lang_id_confusion",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle(spark, duck, sf_dir, name):
    assert_matches_oracle(spark, duck, name, sf_dir)


def test_snapshot_diff_classes_follow_lifecycle_algebra(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.scd import scd2_snapshot_diff

    out = scd2_snapshot_diff(spark, sf_dir)
    # changed keys are exactly the %12 family, and gained ' v2'
    ch = out.filter(F.col("change_type") == "changed")
    assert ch.filter(F.col("k") % 12 != 0).count() == 0
    assert ch.filter(~F.col("name_t2").endswith(" v2")).count() == 0
    # the lifecycle never deletes
    assert out.filter(F.col("change_type") == "removed").count() == 0
    # added rows have no t1 state
    assert (
        out.filter((F.col("change_type") == "added") & F.col("name_t1").isNotNull())
        .count() == 0
    )


def test_hard_negatives_never_share_the_query_label(spark, sf_dir):
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.plans.embeddings import (
        HN_K,
        hard_negative_mining,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    out = hard_negative_mining(spark, sf_dir)
    joined = (
        out.join(emb.withColumnRenamed("vec_id", "negative_id").withColumnRenamed("label", "neg_label"), "negative_id")
        .join(
            emb.withColumnRenamed("vec_id", "query_id").withColumnRenamed("label", "q_label"),
            "query_id",
        )
    )
    assert joined.filter(F.col("neg_label") == F.col("q_label")).count() == 0
    per_q = out.groupBy("query_id").count().collect()
    assert all(r["count"] == HN_K for r in per_q)


def test_confusion_matrix_shares_sum_to_one(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.textops import lang_id_confusion

    rows = lang_id_confusion(spark, sf_dir).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["labeled_lang"], 0.0)
        by_label[r["labeled_lang"]] += r["recall_share"]
    for lang, s in by_label.items():
        assert abs(s - 1.0) < 1e-3, (lang, s)
