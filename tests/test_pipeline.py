"""Pipeline orchestration tests: staging guards, load-id sequencing,
audit log, partitioned fact output, view materialization (SURVEY §3,
C1-C7; reference invariants FIXTURES.md §4)."""

import os

import pytest
from pyspark.sql import functions as F


def test_pipeline_end_to_end(spark, sf_dir, tmp_path):
    from global_superstore_data_warehouse_spark.plans.pipeline import run_pipeline
    from global_superstore_data_warehouse_spark.sources.audit import read_log

    out = str(tmp_path / "wh")
    counts = run_pipeline(spark, sf_dir, out)
    assert counts["staging.orders"] > 0
    assert counts["3nf/fct_orders"] > 0
    assert counts["dm/yearly_sales_profit"] > 0

    # fact is directory-partitioned by order_year (C6 replacement)
    years = [d for d in os.listdir(os.path.join(out, "3nf/fct_orders")) if d.startswith("order_year=")]
    assert len(years) > 1

    # audit log has one row per step (C7)
    log = read_log(spark, os.path.join(out, "etl_log"))
    assert log.count() == len(counts)
    assert log.filter(F.col("rows_affected") <= 0).count() == 0

    # partition pruning works on the staged load (P3)
    from global_superstore_data_warehouse_spark.sources.staging import read_load

    staged = read_load(spark, os.path.join(out, "staging/orders"), 1)
    assert staged.count() == counts["staging.orders"]


def test_staging_guards(spark, sf_dir, tmp_path):
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.sources.staging import (
        AlreadyLoadedError,
        EmptySourceError,
        LoadIdSequencer,
        stage_append,
    )

    seq = LoadIdSequencer(str(tmp_path / "meta/load_id.json"))
    assert seq.current() == 0
    assert seq.next() == 1
    assert seq.next() == 2
    assert seq.current() == 2

    region = load(spark, sf_dir, "region")
    target = str(tmp_path / "staging/region")
    stage_append(region, target, 1)
    with pytest.raises(AlreadyLoadedError):
        stage_append(region, target, 1)  # C4: double-load guard
    with pytest.raises(EmptySourceError):
        stage_append(region.filter(F.lit(False)), target, 2)  # C3: empty source


def test_csv_roundtrip_all_string(spark, sf_dir, tmp_path):
    """S1: CSV read with declared all-string schema (no inference)."""
    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.sources.csv import read_csv

    nation = load(spark, sf_dir, "nation")
    csv_dir = str(tmp_path / "nation_csv")
    nation.coalesce(1).write.option("header", True).csv(csv_dir)
    back = read_csv(spark, csv_dir, ["n_nationkey", "n_name", "n_regionkey"])
    assert [f.dataType.simpleString() for f in back.schema.fields] == ["string"] * 3
    assert back.count() == nation.count()
    # values survive the string roundtrip
    assert back.filter(F.col("n_name").isNull()).count() == 0


def test_incremental_pipeline(spark, sf_dir, tmp_path):
    """Two-load incremental build: staging gains one load_id partition
    per load, the double-load guard fires, and the incrementally
    assembled fact equals the full rebuild."""
    import pytest as _pytest

    from global_superstore_data_warehouse_spark.plans.fact import fact_orders
    from global_superstore_data_warehouse_spark.plans.pipeline import (
        run_incremental_pipeline,
    )
    from global_superstore_data_warehouse_spark.sources.staging import (
        AlreadyLoadedError,
        stage_append,
    )

    out = str(tmp_path / "inc")
    counts = run_incremental_pipeline(spark, sf_dir, out)
    staged = spark.read.parquet(f"{out}/staging_inc/orders")
    assert sorted(r.load_id for r in staged.select("load_id").distinct().collect()) == [1, 2]
    # incremental fact == full rebuild
    full = fact_orders(spark, sf_dir)
    inc = spark.read.parquet(f"{out}/3nf_inc/fct_orders")
    assert inc.count() == full.count() == counts["fact_total"]
    assert inc.select("order_key", "line_number").exceptAll(
        full.select("order_key", "line_number")
    ).count() == 0
    # double-load guard
    from global_superstore_data_warehouse_spark.catalog import load as _load

    with _pytest.raises(AlreadyLoadedError):
        stage_append(_load(spark, sf_dir, "orders"), f"{out}/staging_inc/orders", 2)


def test_tune_shuffle_for_input(spark, sf_dir):
    from global_superstore_data_warehouse_spark.session import tune_shuffle_for_input

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        n = tune_shuffle_for_input(spark, [f"{sf_dir}/lineitem.parquet"])
        assert n >= spark.sparkContext.defaultParallelism
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_compact_parquet_preserves_data(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from global_superstore_data_warehouse_spark.catalog import load
    from global_superstore_data_warehouse_spark.sources.staging import compact_parquet

    target = str(tmp_path / "fragmented")
    src = load(spark, sf_dir, "orders")
    # simulate a micro-batch sink: many tiny appends
    for i in range(5):
        src.filter(F.col("o_orderkey") % 5 == i).repartition(8).write.mode(
            "append"
        ).parquet(target)
    import os

    before_files = len([f for f in os.listdir(target) if f.endswith(".parquet")])
    before_rows = spark.read.parquet(target).count()
    after_files = compact_parquet(spark, target)
    assert after_files < before_files
    assert spark.read.parquet(target).count() == before_rows == src.count()
