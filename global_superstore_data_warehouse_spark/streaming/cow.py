"""Structured Streaming sink into the COW transaction-log table —
exactly-once upserts WITHOUT a separate watermark sidecar.

``streaming/scd.py`` and ``streaming/events.py`` make foreachBatch
idempotent with a watermark sidecar because plain parquet state has
no transactional metadata. The COW table does: every MERGE commit is
atomic (create-exclusive link) and can carry the Structured
Streaming ``batch_id``, so the TRANSACTION LOG ITSELF is the
exactly-once ledger — exactly how Delta's streaming sink works
(txn appId/version in the commit):

- crash AFTER the commit, BEFORE the checkpoint advances → the
  replayed batch sees its batch_id in the log and no-ops;
- crash DURING the merge (files staged, commit never linked) → the
  staged files are invisible orphans (never referenced by the log;
  a vacuum can delete them) and the replay re-merges cleanly;
- two writers racing a version → one ConcurrentWriteError, no torn
  state.

The first batch CREATEs the table (bucket bounds frozen from that
batch's keys; later out-of-range keys clamp into the edge buckets —
acceptable for a demo, a production table would pre-declare bounds).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from global_superstore_data_warehouse_spark.sources import cowtable
from global_superstore_data_warehouse_spark.streaming.state import path_exists


def apply_stream_batch(
    spark: SparkSession,
    root: str,
    batch_df: DataFrame,
    batch_id: int,
    key: str,
    keys: Sequence[str],
    attrs: Sequence[str],
    nbuckets: int = 8,
) -> str:
    """One foreachBatch application; returns what happened
    ('created' | 'merged' | 'replay_noop' | 'empty_noop') so tests
    and callers can assert the exactly-once ledger behavior."""
    if batch_df.isEmpty():
        return "empty_noop"
    if not path_exists(spark, cowtable._meta_path(root)):
        cowtable.create(spark, root, batch_df, key=key, nbuckets=nbuckets)
        # stamp the creating batch into the create commit so a replay
        # of batch 0 is detected too: rewrite is NOT possible (the
        # commit is immutable), so record it as a follow-up no-data
        # commit carrying the ledger entry
        v = cowtable.current_version(root)
        cowtable._commit(
            root,
            v + 1,
            {"op": "txn", "adds": [], "removes": [], "batch_id": int(batch_id)},
        )
        return "created"
    last = cowtable.last_batch_id(root)
    if last is not None and batch_id <= last:
        return "replay_noop"
    cowtable.merge_scd1(
        spark,
        root,
        batch_df,
        keys=keys,
        attrs=attrs,
        extra={"batch_id": int(batch_id)},
        # fail-fast, never replay: a commit conflict here can only be
        # a zombie writer racing the SAME batch — optimistic retry
        # would re-apply it without re-running the batch_id dedupe
        # check above, breaking exactly-once
        retries=0,
    )
    return "merged"


def cow_upsert_stream(
    spark: SparkSession,
    src_dir: str,
    root: str,
    checkpoint: str,
    key: str,
    keys: Sequence[str],
    attrs: Sequence[str],
    nbuckets: int = 8,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain a parquet file stream into the COW table as SCD1
    upserts (availableNow trigger), exactly-once via the commit
    log's batch_id ledger."""
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        apply_stream_batch(
            spark, root, batch_df, batch_id, key, keys, attrs, nbuckets
        )

    (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
