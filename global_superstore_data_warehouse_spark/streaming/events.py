"""Structured Streaming over the events source (beyond-reference —
SURVEY §2.11: the reference's batch micro-increments become real
streams; the load_id maps to the streaming batch id).

``ts`` has shipped as both TIMESTAMP(NANOS) (needs the nanosAsLong
conf + explicit long schema) and plain TIMESTAMP(MICROS) across
driver data generations; the batch footer is probed once to pick the
stream schema, and ``ts`` is normalized to a µs TimestampType exactly
like catalog.load does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_events_stream(
    spark: SparkSession, sf_dir: str, path_glob: str = "events.parquet"
) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # file-stream sources require an explicit schema; probe the parquet
    # footer with a (lazy, metadata-only) batch read to build one that
    # matches the data generation in use
    batch_schema = spark.read.option("pathGlobFilter", path_glob).parquet(sf_dir).schema
    ts_is_long = isinstance(batch_schema["ts"].dataType, T.LongType)
    # the file-stream source needs a directory; glob-filter down to
    # the events file(s)
    raw = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", path_glob)
        .parquet(sf_dir)
    )
    if ts_is_long:
        # integer `div` — see catalog.load: float division corrupts ns epochs
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(batch_schema["ts"].dataType, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


def hourly_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts with a watermark bounding late-data
    state — the streaming twin of plans/events.events_hourly. State
    is keyed by (window, event_type): bounded and partition-parallel."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding-window counts (1h window / 30min slide) — streaming
    twin of plans/events.events_sliding. Each event lands in two
    windows; state per (window, event_type) is bounded by the
    watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_stats_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Gap-based session rollups with ``F.session_window`` — the
    streaming twin of plans/events.events_session_window (identical
    aggregate shape, same merge-at-exact-gap boundary semantics).
    This is the one sessionizer Structured Streaming runs natively:
    the state store merges overlapping session candidates per
    (key, session) and the watermark closes sessions whose gap has
    provably expired — state per user is open sessions only, never
    event history. (The lag+cumsum batch formulation has no direct
    streaming form; applyInPandasWithState in streaming/stateful.py
    covers the custom-state variant.)"""
    from global_superstore_data_warehouse_spark.plans.events import (
        SESSION_GAP_SECONDS,
    )

    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{SESSION_GAP_SECONDS} seconds"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(
    stream: DataFrame,
    spark: SparkSession,
    table_name: str,
    checkpoint: str,
    output_mode: str = "complete",
) -> None:
    """Drain the stream with an availableNow trigger into an
    in-memory sink (test/dev harness; a production job would write a
    parquet/Delta sink with the same query). ``complete`` for
    windowed aggregations; ``append`` for row streams (dedup)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once repair over an at-least-once source:
    drop re-delivered events by event_id, keeping dedup state only
    within the watermark horizon (``dropDuplicatesWithinWatermark``)
    — the streaming twin of the batch exact-dedup family. State is
    one entry per event_id seen inside the horizon: bounded, keyed,
    partition-parallel; an unbounded ``dropDuplicates`` would grow
    state forever at 100 TB/day."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_incremental_staging(
    spark: SparkSession,
    sf_dir: str,
    target_path: str,
    checkpoint: str,
) -> None:
    """foreachBatch incremental staging: each micro-batch is staged
    with the batch id as the load_id — the reference's load-id
    micro-increment pattern (bl_cl.sql:43-68) driven by the stream
    engine instead of an operator-invoked sequencer."""
    from global_superstore_data_warehouse_spark.functions.cleaning import (
        with_audit_cols,
    )

    events = read_events_stream(spark, sf_dir)

    def stage_batch(batch_df: DataFrame, batch_id: int) -> None:
        staged = with_audit_cols(batch_df, int(batch_id) + 1)
        staged.write.mode("append").partitionBy("load_id").parquet(target_path)

    q = (
        events.writeStream.foreachBatch(stage_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def click_purchase_join_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    horizon_minutes: int = 30,
) -> DataFrame:
    """Stream-STREAM interval join — the streaming twin of the batch
    as-of attribution (plans/curation.asof_click_attribution): each
    purchase joins every click by the same user in the preceding
    ``horizon_minutes``. Both sides carry a watermark AND the join
    condition bounds purchase_ts relative to click_ts, which is what
    lets the state store EXPIRE buffered rows: a click older than
    (watermark + horizon) can provably never match a future purchase
    and is evicted — without the time bound, stream-stream join state
    grows forever. State is keyed by user_id: bounded, partition-
    parallel, the only stream-stream join shape that runs at 100
    TB/day. (The batch as-of keeps only the LAST click per purchase;
    the interval join emits ALL clicks in the horizon — the fan-out
    a downstream attribution model consumes. The batch twin of THIS
    operator is the range join, operators/rangejoin.py.)
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    c = clicks.withWatermark("click_ts", watermark)
    p = purchases.withWatermark("purchase_ts", watermark)
    cond = F.expr(
        "c_user_id = p_user_id"
        " AND purchase_ts >= click_ts"
        f" AND purchase_ts <= click_ts + interval {horizon_minutes} minutes"
    )
    return c.join(p, cond, "inner").select(
        F.col("p_user_id").alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        "purchase_value",
    )


def enrich_events_stream(events: DataFrame, type_dim: DataFrame) -> DataFrame:
    """Stream-STATIC enrichment join: every micro-batch joins the
    (small, slowly-changing) dimension as an ordinary broadcast hash
    join — STATELESS, no watermark needed, because the static side is
    re-resolvable per batch. This is how streams pick up reference
    data (type weights, geo lookups, model routing tables) at
    100 TB/day: the dim rides the broadcast, the stream never
    shuffles. Left join so unknown types pass through with NULL
    enrichment instead of silently dropping."""
    return events.join(F.broadcast(type_dim), "event_type", "left").withColumn(
        "weighted_value", F.round(F.col("value") * F.col("type_weight"), 6)
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def type_mix_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    window: str = "6 hours",
    types: tuple[str, ...] = EVENT_TYPES,
) -> DataFrame:
    """Streaming twin of the PSI drift monitor's input
    (plans/observability.psi_event_drift): one row per tumbling
    window with the PIVOTED per-type counts, the window total, and
    each type's share — the live event-mix feed a drift alarm
    consumes. Pivoting via conditional sums keeps this a SINGLE
    streaming aggregation (Structured Streaming forbids stacking a
    second aggregate for the totals on top of a first); state is one
    bounded row per window.

    ``types`` is the declared dimension — an unexpected type lands
    in ``n_other`` so schema stays fixed while the data drifts (the
    monitoring-friendly posture: new categories are themselves a
    drift signal)."""
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in types
    ]
    aggs.append(
        F.sum(F.when(~F.col("event_type").isin(*types), 1).otherwise(0)).alias(
            "n_other"
        )
    )
    aggs.append(F.count(F.lit(1)).alias("n_total"))
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(*aggs)
    )
    shares = [
        F.round(F.col(f"n_{t}") / F.col("n_total"), 6).alias(f"share_{t}")
        for t in types
    ]
    return agg.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        *[F.col(f"n_{t}") for t in types],
        "n_other",
        "n_total",
        *shares,
    )


def mv_refresh_stream(
    spark: SparkSession,
    src_dir: str,
    state_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
) -> None:
    """STREAMING incremental view maintenance: a file stream of
    orders batches folds into the persisted MV state via foreachBatch
    — literally the same algebraic pieces as the batch plan
    (``plans/pipeline.mv_partial/mv_merge``): per batch, aggregate
    the micro-batch to mergeable partials, merge with the stored
    state (groups-sized work), persist. The non-mergeable outputs
    (avg, rounding) are derived only at READ time
    (``pipeline.mv_finalize``) — raw partials are what's stored, the
    invariant that makes merge == recompute exact.

    The state overwrite is materialized through an eager
    ``localCheckpoint`` before the write so the new state never reads
    lazily from the files it replaces; production swaps the
    parquet-overwrite for a Delta MERGE keyed on the group columns
    and keeps everything else identical.

    Crash-replay discipline: foreachBatch is at-least-once — a crash
    between the state overwrite and the checkpoint commit replays the
    batch with the SAME batch_id, and re-merging the delta would
    silently double-count. The state rows therefore carry the
    batch_id that produced them (``_last_batch_id``, written
    ATOMICALLY with the state — a sidecar file could go stale between
    two writes; a column cannot), and a replayed batch_id is skipped
    as a no-op. The max() over the state is groups-sized, not
    table-sized, so the check is as cheap as the merge itself.
    Existence of the state is an explicit filesystem check — any
    actual read error (corrupt file, permissions) propagates instead
    of silently resetting the state.

    Lifecycle caveat the pattern implies: batch ids are meaningful
    only per-checkpoint, so the state and the checkpoint are a UNIT —
    delete both or neither. Pointing a fresh checkpoint at existing
    state correctly no-ops redelivered source files (they were
    already folded), but it would also skip genuinely new batches
    whose restarted ids fall at or below the stored one.
    """
    from global_superstore_data_warehouse_spark.plans.pipeline import (
        mv_merge,
        mv_partial,
    )
    from global_superstore_data_warehouse_spark.streaming.state import path_exists

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = mv_partial(batch_df)
        if path_exists(spark, state_path):
            stored = spark.read.parquet(state_path)
            if "_last_batch_id" in stored.columns:
                last = stored.agg(F.max("_last_batch_id")).collect()[0][0]
                if last is not None and batch_id <= last:
                    return  # at-least-once replay: already folded
            merged = mv_merge(stored.drop("_last_batch_id"), delta)
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


def read_mv_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Finalized view over the streamed MV state (avg derived last)."""
    from global_superstore_data_warehouse_spark.plans.pipeline import mv_finalize

    return mv_finalize(spark.read.parquet(state_path))
