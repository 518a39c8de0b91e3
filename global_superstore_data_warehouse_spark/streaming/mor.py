"""Structured Streaming sink into the MERGE-ON-READ table — the
write-cheap twin of ``streaming/cow.py``, same exactly-once design.

Each foreachBatch application is one MOR merge commit (equality-
delete file + the batch's rows, nothing rewritten — O(batch) write
cost regardless of table size, the shape a high-frequency streaming
upsert workload actually wants), and the commit carries the
Structured Streaming ``batch_id``, so the SHARED transaction-log
format is the exactly-once ledger exactly as in the COW sink:

- crash AFTER the commit, BEFORE the checkpoint advances → the
  replayed batch sees its batch_id in the log and no-ops;
- crash DURING the merge (files staged, commit never linked) → the
  staged files are unreferenced orphans and the replay re-merges
  cleanly;
- two writers racing a version → one ConcurrentWriteError surfaces
  (never silently replayed past the dedupe check).

Read amplification grows one small delete file per drained batch;
a table service runs ``mortable.compact()`` on a threshold of
``mortable.stats(root)["delete_rows"]`` — the trade the MOR format
makes so the HOT path (per-batch commit latency) stays flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from global_superstore_data_warehouse_spark.sources import cowtable, mortable
from global_superstore_data_warehouse_spark.streaming.state import path_exists


def apply_stream_batch(
    spark: SparkSession,
    root: str,
    batch_df: DataFrame,
    batch_id: int,
    key: str,
    nbuckets: int = 8,
) -> str:
    """One foreachBatch application; returns what happened
    ('created' | 'merged' | 'replay_noop' | 'empty_noop')."""
    if batch_df.isEmpty():
        return "empty_noop"
    if not path_exists(spark, cowtable._meta_path(root)):
        mortable.create(spark, root, batch_df, key=key, nbuckets=nbuckets)
        # ledger the creating batch in a follow-up no-data commit
        # (commits are immutable), same as the COW sink
        v = mortable.current_version(root)
        cowtable._commit(
            root, v + 1,
            {"op": "txn", "adds": [], "removes": [],
             "delete_adds": [], "delete_removes": [],
             "batch_id": int(batch_id)},
        )
        return "created"
    last = cowtable.last_batch_id(root)
    if last is not None and batch_id <= last:
        return "replay_noop"
    mortable.merge_upsert(
        spark, root, batch_df, key=key, extra={"batch_id": int(batch_id)}
    )
    return "merged"


def mor_upsert_stream(
    spark: SparkSession,
    src_dir: str,
    root: str,
    checkpoint: str,
    key: str,
    nbuckets: int = 8,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain a parquet file stream into the MOR table (availableNow
    trigger), exactly-once via the commit log's batch_id ledger."""
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        apply_stream_batch(spark, root, batch_df, batch_id, key, nbuckets)

    (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
