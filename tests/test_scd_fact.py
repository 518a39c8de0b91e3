"""SCD2 property tests (version-chain invariants, idempotence —
SURVEY §7 step 5) and fact-build parity/invariants."""

from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle


def test_scd2_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "scd2_customers", sf_dir)


def test_fact_orders_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "fact_orders", sf_dir)


def _merged(spark, sf_dir):
    from global_superstore_data_warehouse_spark.operators.merge import scd2_merge
    from global_superstore_data_warehouse_spark.plans import scd

    return scd2_merge(
        scd._dim(spark, sf_dir),
        scd._source(spark, sf_dir),
        keys=["k"],
        attrs=["name", "attr"],
        effective_date=scd.EFFECTIVE,
    )


def test_scd2_exactly_one_open_row_per_key(spark, sf_dir):
    merged = _merged(spark, sf_dir)
    bad = (
        merged.filter(F.col("is_active"))
        .groupBy("k")
        .count()
        .filter(F.col("count") != 1)
    )
    assert bad.count() == 0
    # closed rows all carry a real end date
    assert (
        merged.filter(~F.col("is_active"))
        .filter(F.col("end_dt") == F.to_date(F.lit("9999-12-31")))
        .count()
        == 0
    )


def test_scd2_idempotent(spark, sf_dir):
    """Re-merging the same source into the merged dim is a no-op."""
    from global_superstore_data_warehouse_spark.operators.merge import scd2_merge
    from global_superstore_data_warehouse_spark.plans import scd

    once = _merged(spark, sf_dir)
    twice = scd2_merge(
        once,
        scd._source(spark, sf_dir),
        keys=["k"],
        attrs=["name", "attr"],
        effective_date="2024-07-01",  # later run date; still no changes
    )
    assert once.count() == twice.count()
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


def test_scd2_two_load_lifecycle_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "scd2_two_load_lifecycle", sf_dir)


def test_scd2_two_load_lifecycle_chain_invariants(spark, sf_dir):
    """After two loads: exactly one open row per key, and every
    changed key's closed v1 abuts its open v2 (end_dt == start_dt)."""
    from global_superstore_data_warehouse_spark.plans.scd import (
        scd2_two_load_lifecycle,
    )

    chain = scd2_two_load_lifecycle(spark, sf_dir)
    assert (
        chain.filter(F.col("is_active"))
        .groupBy("k").count().filter("count != 1").count() == 0
    )
    closed = chain.filter(~F.col("is_active")).select("k", F.col("end_dt").alias("closed_at"))
    reopened = chain.filter(F.col("is_active")).select("k", "start_dt")
    mismatched = closed.join(reopened, "k").filter(F.col("closed_at") != F.col("start_dt"))
    assert closed.count() > 0 and mismatched.count() == 0


def test_fact_grain_unique_and_no_null_fks(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.fact import fact_orders

    f = fact_orders(spark, sf_dir)
    assert (
        f.groupBy("order_key", "line_number").count().filter("count > 1").count() == 0
    )
    fk_cols = ["fk_date", "fk_customer", "fk_employee", "fk_product", "fk_market"]
    for c in fk_cols:
        assert f.filter(F.col(c).isNull()).count() == 0


def test_pit_join_matches_oracle(spark, duck, sf_dir):
    assert_matches_oracle(spark, duck, "fact_pit_customers", sf_dir)


def test_pit_join_at_most_one_version_per_order(spark, sf_dir):
    from global_superstore_data_warehouse_spark.plans.scd import fact_pit_customers

    pit = fact_pit_customers(spark, sf_dir)
    assert pit.groupBy("order_key").count().filter("count > 1").count() == 0
