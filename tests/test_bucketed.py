"""Bucketed co-located join: the lineitem ⋈ orders shuffle must
vanish when both sides are bucketed on the join key."""

from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.sources.bucketed import (
    colocated_join,
    write_bucketed,
)


def _plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    write_bucketed(
        load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        "b_lineitem",
        "l_orderkey",
    )
    write_bucketed(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
        "b_orders",
        "o_orderkey",
    )
    # at test scale the planner would rightly broadcast the small
    # side; force the big-big path to show the bucketed SMJ is
    # shuffle-free (the 100 TB situation, where neither side fits a
    # broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "b_lineitem", "b_orders", "l_orderkey", "o_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # co-located buckets: no shuffle on either join input
        assert "Exchange" not in plan, plan
        # correctness: same rowcount as the plain join
        li = load(spark, sf_dir, "lineitem")
        od = load(spark, sf_dir, "orders")
        assert joined.count() == li.join(od, li.l_orderkey == od.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_reuses_layout(spark, sf_dir):
    """groupBy on the bucket key over a bucketed-sorted table also
    needs no shuffle for the partial→final aggregation."""
    write_bucketed(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        "b_lineitem_agg",
        "l_orderkey",
    )
    agg = (
        spark.table("b_lineitem_agg")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert "Exchange" not in _plan(agg)
