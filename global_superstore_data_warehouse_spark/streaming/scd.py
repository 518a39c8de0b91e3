"""Streaming SCD2 dimension maintenance — the reference's defining
operator (§2.9: the staged-load MERGE lifecycle of bl_cl.sql:43-68 +
806-875) driven by Structured Streaming instead of an orchestrator
loop: each arriving load folds into the persisted version chain via
the SAME two-phase ``operators/merge.scd2_merge`` the batch plans
use.

Ordering discipline: SCD2 is order-sensitive, and a file stream's
batching is an engine concern — so ordering rides IN THE DATA. Every
source row carries (load_seq, effective_date); a micro-batch may
contain any number of loads, and ``foreachBatch`` folds them in
load_seq order (the per-batch distinct load list is loads-sized, a
handful of rows). WITHIN any batching the result is invariant — one
file per trigger, all at once, or anything between (the equivalence
test drives both extremes).

ACROSS triggers the source must deliver loads in sequence order —
true by construction when each staged load lands as its own file
(the file source orders by modification time, and load N is written
before load N+1 exists). Because a mis-staged queue would otherwise
CORRUPT history silently, the operator persists the applied
high-watermark and enforces CONTIGUITY: loads at or below the
watermark are SKIPPED (foreachBatch is at-least-once — a crash
between the state write and the checkpoint commit replays the batch,
and replay must be a no-op, not a wedge), while any GAP — the first
unapplied load not being watermark+1, or non-consecutive seqs within
the batch — raises. Skipped-ahead delivery is a loud failure, never
a wrong version chain; duplicate delivery is a no-op.

The watermark lives in a one-row sidecar (``streaming/state.py``) so
the per-batch ordering check is O(1) metadata, not a full scan of
the stored version chain; the chain itself still carries
``_applied_seq`` and is the fallback source of truth when the
sidecar is missing (dim write lands first, sidecar second).

State posture at 100 TB: the stored dim is the full version chain;
the parquet overwrite here becomes a Delta MERGE keyed on the natural
key (only changed partitions rewrite), with everything else —
including the merge algebra — byte-identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.operators.merge import scd2_merge
from global_superstore_data_warehouse_spark.streaming.state import (
    path_exists,
    read_watermark,
    write_watermark,
)


class OutOfOrderLoadError(RuntimeError):
    """A batch delivered a load sequence with a GAP — the first
    unapplied load is not watermark+1, or the batch's loads are not
    consecutive. The staging queue skipped a load; applying past it
    would silently corrupt the version chain. (Loads at or below the
    watermark are NOT an error: at-least-once replay re-delivers
    applied loads, and those are skipped as idempotent no-ops.)"""


def _empty_dim(batch_df: DataFrame, keys: Sequence[str], attrs: Sequence[str]) -> DataFrame:
    return (
        batch_df.select(*keys, *attrs)
        .withColumn("start_dt", F.to_date(F.lit("1900-01-01")))
        .withColumn("end_dt", F.to_date(F.lit("9999-12-31")))
        .withColumn("is_active", F.lit(True))
        .withColumn("_applied_seq", F.lit(0).cast("long"))
        .filter(F.lit(False))
    )


def scd2_dim_stream(
    spark: SparkSession,
    src_dir: str,
    dim_path: str,
    checkpoint: str,
    keys: Sequence[str],
    attrs: Sequence[str],
    seq_col: str = "load_seq",
    eff_col: str = "effective_date",
    max_files_per_trigger: int = 1,
) -> None:
    """Drain a parquet stream of staged loads into the persisted SCD2
    dim at ``dim_path``. Source rows carry key + attrs + (seq_col,
    eff_col); loads fold strictly in seq order within each batch."""
    keys, attrs = list(keys), list(attrs)
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        loads = (
            batch_df.select(seq_col, eff_col).distinct().orderBy(seq_col).collect()
        )  # loads-sized (a handful of rows), never row-sized
        if not loads:
            return
        if path_exists(spark, dim_path):
            stored = spark.read.parquet(dim_path)
            # O(1) sidecar; fall back to the chain scan only when the
            # sidecar is missing (first run on pre-sidecar state, or a
            # crash before the sidecar write — the chain is the truth)
            watermark = read_watermark(spark, dim_path)
            if watermark is None:
                watermark = stored.agg(F.max("_applied_seq")).collect()[0][0] or 0
            dim = stored.drop("_applied_seq")
        else:
            watermark = 0
            dim = _empty_dim(batch_df, keys, attrs).drop("_applied_seq")
        # at-least-once replay: already-applied loads are no-ops
        loads = [row for row in loads if row[seq_col] > watermark]
        if not loads:
            return
        # contiguity: the chain may not skip a load — neither from the
        # watermark to the batch nor within the batch itself
        expected = list(range(watermark + 1, watermark + 1 + len(loads)))
        got = [int(row[seq_col]) for row in loads]
        if got != expected:
            raise OutOfOrderLoadError(
                f"batch {batch_id} delivers load_seqs {got} but loads through "
                f"{watermark} were applied — expected the contiguous "
                f"{expected}; a load was skipped or mis-staged"
            )
        for row in loads:
            src = batch_df.filter(F.col(seq_col) == row[seq_col]).select(
                *keys, *attrs
            )
            dim = scd2_merge(
                dim, src, keys=keys, attrs=attrs, effective_date=str(row[eff_col])
            )
        out = dim.withColumn(
            "_applied_seq", F.lit(int(loads[-1][seq_col])).cast("long")
        )
        # materialize before overwriting the path the lineage reads;
        # dim first, sidecar second (stale sidecar => replay no-op,
        # never a skipped load)
        out.localCheckpoint(eager=True).write.mode("overwrite").parquet(dim_path)
        write_watermark(spark, dim_path, int(loads[-1][seq_col]))

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
