"""ORC source/sink — roundtrip, partition pruning, pushdown."""

from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.catalog import load
from global_superstore_data_warehouse_spark.sources.orc import read_orc, write_orc


def test_orc_roundtrip_exact(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "customer")
    path = str(tmp_path / "cust_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_orc_partitioned_write_prunes(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_orc")
    write_orc(src, path, partition_by=["order_year"])
    back = read_orc(spark, path)
    one_year = back.filter(F.col("order_year") == 1995)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at the source, not post-scan
    assert "order_year" in plan
    assert one_year.count() == src.filter("order_year = 1995").count()


def test_orc_predicate_pushdown_reaches_scan(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "customer")
    path = str(tmp_path / "cust_orc2")
    write_orc(src, path)
    q = read_orc(spark, path).filter(F.col("c_custkey") < 100).select("c_custkey")
    plan = q._jdf.queryExecution().toString()
    assert "PushedFilters: [" in plan
    assert "c_custkey" in plan.split("PushedFilters")[1][:200]


def test_orc_explicit_schema_skips_inference(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "region")
    path = str(tmp_path / "region_orc")
    write_orc(src, path)
    ddl = "r_regionkey BIGINT, r_name STRING, r_comment STRING"
    back = read_orc(spark, path, schema=ddl)
    assert [f.name for f in back.schema.fields] == [
        "r_regionkey",
        "r_name",
        "r_comment",
    ]
    assert back.count() == src.count()
