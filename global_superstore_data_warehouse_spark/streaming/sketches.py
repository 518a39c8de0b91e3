"""Streaming mergeable-sketch maintenance — the Structured Streaming
twin of the batch sketch trio (``plans/events.daily_user_sketch_rollup``
HLL, ``plans/observability.quantile_sketch_rollup``,
``plans/events.countmin_heavy_hitters``): a file stream of event
batches folds into a PERSISTED count-min grid via ``foreachBatch``,
using the identical merge algebra as the batch plan — per batch, hash
the batch's keys into (row, cell) partial counts, CELL-SUM merge with
the stored grid, persist. Because the sketch merge is commutative and
associative, the streamed grid is hash-identical to the grid the
batch plan computes over the full table — the equality is pinned in
``tests/test_streaming_sketches.py``, which is exactly the claim that
lets a 100 TB pipeline maintain frequency state per micro-batch
without ever re-scanning history.

Crash-replay discipline mirrors ``events.mv_refresh_stream``: state
rows carry the batch_id that produced them (written atomically WITH
the state — a sidecar could go stale between writes, a column
cannot); an at-least-once replay of the same batch_id is skipped as a
no-op instead of double-counting. State existence is an explicit
filesystem check so a transient read error propagates rather than
silently resetting the grid. The state and the checkpoint are a unit
— delete both or neither.

At 100 TB the parquet overwrite becomes a Delta MERGE on (i, cell) —
the grid is depth x width rows regardless of stream volume, so the
per-batch state work is O(grid), not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.plans.events import (
    CMS_DEPTH,
    _cms_cell,
)
from global_superstore_data_warehouse_spark.streaming.state import path_exists


def cms_partial(batch_df: DataFrame, key: str = "user_id") -> DataFrame:
    """(i, cell, c) partial grid of one micro-batch — the same
    md5-seeded cells as the batch plan (``plans/events._cms_cell``),
    map-side combined before any state is touched."""
    return (
        batch_df.select(
            F.posexplode(
                F.array(*[_cms_cell(i, F.col(key)) for i in range(CMS_DEPTH)])
            ).alias("i", "cell")
        )
        .groupBy("i", "cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(stored: DataFrame, delta: DataFrame) -> DataFrame:
    """Sketch MERGE: cell-sum of two grids — commutative/associative,
    so any batching of the input stream lands on the same grid."""
    return (
        stored.unionByName(delta)
        .groupBy("i", "cell")
        .agg(F.sum("c").alias("c"))
    )


def cms_rollup_stream(
    spark: SparkSession,
    src_dir: str,
    state_path: str,
    checkpoint: str,
    key: str = "user_id",
    max_files_per_trigger: int = 1,
) -> None:
    """Fold a parquet file stream into the persisted count-min grid;
    drains everything available (``availableNow``) then returns."""
    sketch_rollup_stream(
        spark,
        src_dir,
        state_path,
        checkpoint,
        partial_fn=lambda b: cms_partial(b, key),
        merge_fn=cms_merge,
        max_files_per_trigger=max_files_per_trigger,
    )


def sketch_rollup_stream(
    spark: SparkSession,
    src_dir: str,
    state_path: str,
    checkpoint: str,
    partial_fn,
    merge_fn,
    max_files_per_trigger: int = 1,
) -> None:
    """Generic streamed sketch maintenance: ANY sketch whose state is
    a DataFrame with a commutative/associative ``merge_fn`` (CMS cell
    grids, binned histograms, HLL binaries via hll_union_agg) folds a
    file stream into persisted state with the same at-least-once
    replay discipline — ``partial_fn(batch_df)`` builds the batch's
    partial sketch, ``merge_fn(stored, delta)`` merges. The batch id
    rides the state atomically; replays skip."""
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = partial_fn(batch_df)
        if path_exists(spark, state_path):
            stored = spark.read.parquet(state_path)
            last = stored.agg(F.max("_last_batch_id")).collect()[0][0]
            if last is not None and batch_id <= last:
                return  # at-least-once replay: already folded
            merged = merge_fn(stored.drop("_last_batch_id"), delta)
        else:
            merged = delta
        out = merged.withColumn(
            "_last_batch_id", F.lit(int(batch_id)).cast("long")
        )
        out.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            state_path
        )

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def quantile_partial(batch_df: DataFrame, value_col: str = "o_totalprice") -> DataFrame:
    """(bin, c) binned-histogram partial of one micro-batch — the
    same fixed bins as ``plans/observability.quantile_sketch_rollup``
    (bin width ``QSKETCH_BIN``), so the streamed state is
    hash-identical to the batch plan's merged sketch."""
    from global_superstore_data_warehouse_spark.plans.observability import (
        QSKETCH_BIN,
    )

    return (
        batch_df.groupBy(
            F.floor(F.col(value_col) / QSKETCH_BIN).cast("int").alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )


def quantile_merge(stored: DataFrame, delta: DataFrame) -> DataFrame:
    return (
        stored.unionByName(delta).groupBy("bin").agg(F.sum("c").alias("c"))
    )


def quantile_rollup_stream(
    spark: SparkSession,
    src_dir: str,
    state_path: str,
    checkpoint: str,
    value_col: str = "o_totalprice",
    max_files_per_trigger: int = 1,
) -> None:
    """Streamed binned-quantile maintenance — the percentile twin of
    ``cms_rollup_stream`` over the same generic fold."""
    sketch_rollup_stream(
        spark,
        src_dir,
        state_path,
        checkpoint,
        partial_fn=lambda b: quantile_partial(b, value_col),
        merge_fn=quantile_merge,
        max_files_per_trigger=max_files_per_trigger,
    )


def read_quantile_estimates(
    spark: SparkSession, state_path: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Read percentile upper-edge estimates off the persisted
    histogram: rank r = ceil(q*n); the estimate is the upper edge of
    the first bin whose cumulative count reaches r (one row per q).
    The state is |bins| rows, so this is driver-cheap by design."""
    from pyspark.sql import Window

    from global_superstore_data_warehouse_spark.plans.observability import (
        QSKETCH_BIN,
    )

    hist = spark.read.parquet(state_path).drop("_last_batch_id")
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    t = (
        hist.withColumn("cum", F.sum("c").over(w_cum))
        .crossJoin(hist.agg(F.sum("c").alias("n")))
        .crossJoin(
            F.broadcast(
                spark.createDataFrame([(q,) for q in qs], "q double")
            )
        )
    )
    return (
        t.filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q")
        .agg(
            F.min((F.col("bin") + 1) * QSKETCH_BIN).cast("long").alias("upper_edge")
        )
    )


def read_cms_estimates(
    spark: SparkSession, state_path: str, keys_df: DataFrame, key: str = "user_id"
) -> DataFrame:
    """Probe the persisted grid for arbitrary keys: min over rows of
    the key's hashed cell — (key, cms_est). The grid is depth x width
    rows, so it broadcasts; probing N keys is one broadcast join."""
    grid = spark.read.parquet(state_path).drop("_last_batch_id")
    probes = keys_df.select(
        key,
        F.posexplode(
            F.array(*[_cms_cell(i, F.col(key)) for i in range(CMS_DEPTH)])
        ).alias("i", "cell"),
    )
    return (
        probes.join(F.broadcast(grid), ["i", "cell"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_est"))
    )
