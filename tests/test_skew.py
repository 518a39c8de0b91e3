"""Salted skew-join: result equivalence with the plain join and the
salted shuffle key in the plan."""

from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark, sf_dir):
    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")

    plain = lineitem.join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
    salted = salted_join(lineitem, supplier, "l_suppkey", "s_suppkey", salt=4)

    assert salted.count() == plain.count()
    cols = ["l_orderkey", "l_suppkey", "l_quantity", "s_suppkey", "s_name"]
    assert salted.select(*cols).exceptAll(plain.select(*cols)).count() == 0
    assert plain.select(*cols).exceptAll(salted.select(*cols)).count() == 0


def test_salted_join_left_outer_preserves_unmatched(spark, sf_dir):
    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # restrict the small side so some large rows miss
    supplier = load(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 2 == 0).select(
        "s_suppkey", "s_name"
    )
    plain = lineitem.join(supplier, lineitem.l_suppkey == supplier.s_suppkey, "left")
    salted = salted_join(lineitem, supplier, "l_suppkey", "s_suppkey", how="left", salt=4)
    assert salted.count() == plain.count()
    assert (
        salted.filter(F.col("s_suppkey").isNull()).count()
        == plain.filter(F.col("s_suppkey").isNull()).count()
    )


def test_salted_join_rejects_replication_corrupting_how(spark, sf_dir):
    """right/full outer would emit each unmatched small-side row once
    per salt value — the operator must refuse rather than mis-join."""
    import pytest

    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(lineitem, supplier, "l_suppkey", "s_suppkey", how=how)


def test_salted_join_salt_is_deterministic(spark, sf_dir):
    """Retry safety (SPARK-23207 family): the salt must be a pure
    function of row data — two independent evaluations over the same
    rows assign identical salts, so a retried task re-produces the
    exact partition layout consumers already read."""
    from global_superstore_data_warehouse_spark.operators.skew import SALT_COL

    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    salted = lineitem.withColumn(
        SALT_COL,
        F.pmod(F.hash(*[F.col(c) for c in lineitem.columns]), F.lit(4)).cast("int"),
    )
    a = salted.orderBy("l_orderkey", "l_suppkey", "l_quantity").collect()
    b = salted.repartition(7).orderBy("l_orderkey", "l_suppkey", "l_quantity").collect()
    assert a == b


def test_salted_join_spread_cols_override(spark, sf_dir):
    """Caller-named spread column still yields the plain-join result."""
    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    plain = lineitem.join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
    salted = salted_join(
        lineitem, supplier, "l_suppkey", "s_suppkey", salt=4,
        spread_cols=["l_orderkey"],
    )
    cols = ["l_orderkey", "l_suppkey", "s_suppkey", "s_name"]
    assert salted.select(*cols).exceptAll(plain.select(*cols)).count() == 0
    assert plain.select(*cols).exceptAll(salted.select(*cols)).count() == 0


def test_salted_join_same_named_keys_resolve(spark, sf_dir):
    """Round-1 ambiguity bug: identically-named key columns on both
    sides must resolve against their own side, not throw or
    cross-capture."""
    lineitem = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey"), F.col("l_suppkey").alias("k"))
    )
    supplier = (
        load(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"), "s_name")
    )
    plain = lineitem.join(
        supplier, lineitem["k"] == supplier["k"]
    ).select("l_orderkey", "s_name")
    salted = salted_join(lineitem, supplier, "k", "k", salt=4).select(
        "l_orderkey", "s_name"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
