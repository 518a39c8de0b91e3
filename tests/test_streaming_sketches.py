"""Streaming count-min maintenance: the streamed grid must be
IDENTICAL to the batch-computed grid (merge algebra is commutative/
associative), estimates must never undercount, and at-least-once
replay must be a no-op."""

from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.streaming.sketches import (
    cms_partial,
    cms_rollup_stream,
    read_cms_estimates,
)


def _grid_set(df):
    return {(r["i"], r["cell"], r["c"]) for r in df.collect()}


def test_streamed_grid_equals_batch_grid_and_replay_noop(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "events_batches")
    # three deterministic chunk files = three micro-batches
    events.withColumn(
        "chunk", (F.col("event_id") % 3).cast("int")
    ).write.partitionBy("chunk").parquet(src)

    state = str(tmp_path / "cms_state")
    cms_rollup_stream(spark, src, state, str(tmp_path / "ckpt_cms"))

    streamed = spark.read.parquet(state).drop("_last_batch_id")
    batch = cms_partial(events)  # the whole table as one "batch"
    assert _grid_set(streamed) == _grid_set(batch)

    # replay with a fresh checkpoint over the same source + state:
    # every batch id is <= the stored one, so the state is untouched
    before = sorted(map(tuple, spark.read.parquet(state).collect()))
    cms_rollup_stream(spark, src, state, str(tmp_path / "ckpt_cms_replay"))
    after = sorted(map(tuple, spark.read.parquet(state).collect()))
    assert after == before


def test_streamed_estimates_never_undercount(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "events_batches2")
    events.withColumn(
        "chunk", (F.col("event_id") % 2).cast("int")
    ).write.partitionBy("chunk").parquet(src)
    state = str(tmp_path / "cms_state2")
    cms_rollup_stream(spark, src, state, str(tmp_path / "ckpt_cms2"))

    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = read_cms_estimates(spark, state, exact.select("user_id"))
    joined = est.join(exact, "user_id")
    assert joined.filter(F.col("cms_est") < F.col("exact_cnt")).count() == 0


def test_streamed_quantile_histogram_equals_batch_and_bounds(spark, sf_dir, tmp_path):
    """The streamed binned histogram equals the batch histogram over
    the full table (merge algebra), and the percentile read off the
    merged state brackets the exact rank element within one bin."""
    from global_superstore_data_warehouse_spark.plans.observability import (
        QSKETCH_BIN,
    )
    from global_superstore_data_warehouse_spark.streaming.sketches import (
        quantile_partial,
        quantile_rollup_stream,
        read_quantile_estimates,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src = str(tmp_path / "orders_batches")
    orders.withColumn(
        "chunk", (F.col("o_orderkey") % 3).cast("int")
    ).write.partitionBy("chunk").parquet(src)

    state = str(tmp_path / "q_state")
    quantile_rollup_stream(spark, src, state, str(tmp_path / "ckpt_q"))

    streamed = {
        (r["bin"], r["c"])
        for r in spark.read.parquet(state).drop("_last_batch_id").collect()
    }
    batch = {(r["bin"], r["c"]) for r in quantile_partial(orders).collect()}
    assert streamed == batch

    est = {r["q"]: r["upper_edge"] for r in read_quantile_estimates(spark, state).collect()}
    n = orders.count()
    vals = [
        r["o_totalprice"]
        for r in orders.select("o_totalprice").orderBy("o_totalprice").collect()
    ]
    import math

    for q, edge in est.items():
        true = vals[math.ceil(q * n) - 1]
        assert true < edge <= true + QSKETCH_BIN, (q, true, edge)
