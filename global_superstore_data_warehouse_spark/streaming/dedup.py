"""Streaming crawl deduplication — the per-batch production shape of
``plans/textops.dedup_incremental``: a file stream of document batches
probes a PERSISTED near-dup index (exact md5 fingerprints + banded
MinHash signatures within the (lang, length-bucket) block), emits a
verdict per incoming document ('exact_dup' > 'near_dup' > 'new' with
the matched earlier doc), and then APPENDS the batch's own signatures
to the index — so each batch is O(batch) signature work plus index
probes, never a re-scan of the accumulated corpus. This is the loop a
training-data pipeline runs per crawl dump.

Semantics: a document is a duplicate iff it matches a document from an
EARLIER batch (within-batch duplicates surface on the NEXT probe of
the grown index — the index append is atomic per batch, so the
definition is stable under replay). Verdicts accumulate in a results
directory, partitioned by the batch id that produced them.

Crash-replay discipline (same as streaming/sketches.py): the index
rows carry the batch_id that appended them; an at-least-once replay of
a batch_id at or below the index's high-watermark skips BOTH the probe
and the append, so results are never double-emitted and the index
never double-grows. Index existence is an explicit filesystem check —
a transient read error propagates instead of silently resetting state.

At 100 TB the index is a bucketed table on the band-bucket key
(sources/bucketed.py) or a Delta table MERGEd per batch; the probe
join is then shuffle-free on the corpus side. Signature cost rides the
round-6 XOR-mix family: one md5 pass per token, 8 integer mixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from global_superstore_data_warehouse_spark.functions import text as T
from global_superstore_data_warehouse_spark.plans.textops import (
    CLUSTER_JACCARD,
    LEN_BUCKET,
    NUM_HASHES,
)
from global_superstore_data_warehouse_spark.streaming.state import path_exists


def doc_signatures(docs: DataFrame) -> DataFrame:
    """Per-document dedup signature row: content fingerprint, block
    keys, hashed token set, 8-seed minhash — the persisted index
    schema (one narrow row per doc)."""
    base = docs.select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / F.lit(LEN_BUCKET)).cast("int").alias("len_b"),
        F.md5("text").alias("fp"),
        T.hashed_set(T.tokens("text")).alias("toks"),
    )
    return base.select(
        "doc_id",
        "lang",
        "len_b",
        "fp",
        "toks",
        *T.minhash_signature(F.col("toks"), NUM_HASHES),
    )


def probe_index(batch_sig: DataFrame, index: DataFrame) -> DataFrame:
    """Verdict per batch doc against the index: exact fingerprint
    probe, then banded signature probe verified by hashed-token
    Jaccard — both joins are block-bounded, never batch x corpus."""
    exact = (
        batch_sig.select("doc_id", "fp")
        .join(index.select("fp", F.col("doc_id").alias("c_id")), "fp")
        .groupBy("doc_id")
        .agg(F.min("c_id").alias("exact_match"))
    )

    def _bands(df: DataFrame, id_alias: str) -> DataFrame:
        return df.select(
            F.col("doc_id").alias(id_alias),
            "lang",
            "len_b",
            F.posexplode(
                F.array(*[F.col(f"mh{i}") for i in range(NUM_HASHES)])
            ).alias("band_id", "bucket"),
        )

    cand = (
        _bands(batch_sig, "b_id")
        .join(_bands(index, "c_id"), ["lang", "len_b", "band_id", "bucket"])
        .select("b_id", "c_id")
        .dropDuplicates()
    )
    bt = batch_sig.select(F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks"))
    ct = index.select(F.col("doc_id").alias("c_id"), F.col("toks").alias("c_toks"))
    near = (
        cand.join(bt, "b_id")
        .join(ct, "c_id")
        .filter(T.jaccard(F.col("b_toks"), F.col("c_toks")) >= CLUSTER_JACCARD)
        .groupBy("b_id")
        .agg(F.min("c_id").alias("near_match"))
        .withColumnRenamed("b_id", "doc_id")
    )
    return (
        batch_sig.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("exact_match").isNotNull(), F.lit("exact_dup"))
            .when(F.col("near_match").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
            F.coalesce("exact_match", "near_match").alias("matched_doc_id"),
        )
    )


def dedup_docs_stream(
    spark: SparkSession,
    src_dir: str,
    index_path: str,
    results_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain a parquet file stream of document batches: probe, emit
    verdicts, grow the index (``availableNow`` trigger)."""
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        sig = doc_signatures(batch_df).localCheckpoint(eager=True)
        if path_exists(spark, index_path):
            index = spark.read.parquet(index_path)
            last = index.agg(F.max("_batch_id")).collect()[0][0]
            if last is not None and batch_id <= last:
                return  # at-least-once replay: probed AND appended
            verdicts = probe_index(sig, index.drop("_batch_id"))
        else:
            verdicts = sig.select(
                "doc_id",
                F.lit("new").alias("verdict"),
                F.lit(None).cast("long").alias("matched_doc_id"),
            )
        # results first, index second: a crash between the two writes
        # replays the batch with the same id; the index watermark is
        # still the OLD one, so the rerun re-probes against the same
        # index and overwrites this batch's results partition with
        # identical rows before appending — no double-grow, no drift
        verdicts.withColumn("_batch_id", F.lit(int(batch_id)).cast("long")).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "_batch_id"
        ).parquet(results_path)
        sig.withColumn("_batch_id", F.lit(int(batch_id)).cast("long")).write.mode(
            "append"
        ).parquet(index_path)

    q = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
