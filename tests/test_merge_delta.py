"""Delta MERGE SCD variants: condition-builder unit tests run
everywhere; the executable MERGE paths run only where delta-spark is
installed (skipped in the no-Delta sandbox) and assert equality with
the full-rewrite operators in operators/merge.py."""

import pytest
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.operators.merge_delta import (
    any_attr_changed_condition,
    delta_available,
    key_match_condition,
)


def test_key_match_condition_is_null_safe_and_open_restricted():
    assert key_match_condition(["k"]) == "t.k <=> s.k"
    assert (
        key_match_condition(["k1", "k2"], active_col="is_active")
        == "t.k1 <=> s.k1 AND t.k2 <=> s.k2 AND t.is_active = true"
    )


def test_any_attr_changed_condition_is_null_safe():
    assert (
        any_attr_changed_condition(["name", "attr"])
        == "NOT (t.name <=> s.name) OR NOT (t.attr <=> s.attr)"
    )


@pytest.mark.skipif(not delta_available(), reason="delta-spark not installed: sandbox has no network (pip DNS fails) and pyspark 4.1.2 ships no delta jars — see README capability matrix")
def test_scd2_delta_merge_equals_full_rewrite(spark, sf_dir, tmp_path):
    """With Delta present, the MERGE path must produce exactly the
    full-rewrite scd2_merge state for the shared customer scenario."""
    from global_superstore_data_warehouse_spark.operators.merge_delta import (
        scd2_merge_delta,
    )
    from global_superstore_data_warehouse_spark.plans import scd

    want = scd._scd2_merged(
        spark, sf_dir, "customer", "c_custkey", "c_name", "c_mktsegment"
    )
    path = str(tmp_path / "dim_delta")
    scd._dim(spark, sf_dir).write.format("delta").save(path)
    scd2_merge_delta(
        spark,
        path,
        scd._source(spark, sf_dir),
        keys=["k"],
        attrs=["name", "attr"],
        effective_date=scd.EFFECTIVE,
    )
    got = spark.read.format("delta").load(path)
    cols = ["k", "name", "attr", "start_dt", "end_dt", "is_active"]
    assert got.count() == want.count()
    assert got.select(*cols).exceptAll(want.select(*cols)).count() == 0
    assert want.select(*cols).exceptAll(got.select(*cols)).count() == 0


@pytest.mark.skipif(not delta_available(), reason="delta-spark not installed: sandbox has no network (pip DNS fails) and pyspark 4.1.2 ships no delta jars — see README capability matrix")
def test_scd1_delta_upsert_matches_full_rewrite(spark, sf_dir, tmp_path):
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.operators.merge import scd1_upsert
    from global_superstore_data_warehouse_spark.operators.merge_delta import (
        scd1_upsert_delta,
    )

    cust = load(spark, sf_dir, "customer")
    target = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    source = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.concat("c_name", F.lit(" upd")).alias("c_name"),
        "c_mktsegment",
    )
    want = scd1_upsert(
        target, source, keys=["c_custkey"], attrs=["c_name", "c_mktsegment"]
    ).drop("is_updated")
    path = str(tmp_path / "scd1_delta")
    target.write.format("delta").save(path)
    scd1_upsert_delta(
        spark, path, source, keys=["c_custkey"], attrs=["c_name", "c_mktsegment"]
    )
    got = spark.read.format("delta").load(path)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
